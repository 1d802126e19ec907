package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.{toColumn, toExpr}

/** Column-level API over graft's native Catalyst expressions, plus
  * SQL registration (see [[graft.GraftExtensions]] for the
  * SparkSessionExtensions route).
  */
package object functions {

  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSimilarity(toExpr(a), toExpr(b)))

  def dot_product(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpr(a), toExpr(b)))

  def compress_ratio(text: Column): Column =
    toColumn(CompressRatio(toExpr(text)))

  def sorted_intersect_count(a: Column, b: Column): Column =
    toColumn(SortedIntersectCount(toExpr(a), toExpr(b)))

  def ws_token_count(text: Column): Column =
    toColumn(WsTokenCount(toExpr(text)))

  def bpe_token_count(text: Column): Column =
    toColumn(BpeTokenCount(toExpr(text)))

  def word_lane_hashes(words: Column): Column =
    toColumn(WordLaneHashes(toExpr(words)))

  /** Arity gate for SQL builders: extra arguments must not be
    * silently discarded and a missing one must raise a NAMED error,
    * not a bare NoSuchElement from exprs.head. */
  private[graft] def arity(
      name: String, n: Int)(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    require(exprs.length == n,
      s"$name expects $n argument(s), got ${exprs.length}")
    exprs
  }

  /** Register graft functions on an existing session (temp scope). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => { val a = arity("cosine_sim", 2)(exprs); CosineSimilarity(a.head, a(1)) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => { val a = arity("dot_product", 2)(exprs); DotProduct(a.head, a(1)) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "compress_ratio",
      exprs => { val a = arity("compress_ratio", 1)(exprs); CompressRatio(a.head) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => { val a = arity("sorted_intersect_count", 2)(exprs)
        SortedIntersectCount(a.head, a(1)) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ws_token_count",
      exprs => { val a = arity("ws_token_count", 1)(exprs); WsTokenCount(a.head) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_token_count",
      exprs => { val a = arity("bpe_token_count", 1)(exprs); BpeTokenCount(a.head) },
      "scala_udf")
  }
}
