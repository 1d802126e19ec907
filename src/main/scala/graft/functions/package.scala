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

  /** Register graft functions on an existing session (temp scope). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "compress_ratio", exprs => CompressRatio(exprs.head), "scala_udf")
  }
}
