package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One operator from SURVEY.md §2: a Spark implementation plus an
  * optional DuckDB oracle SQL over the same parquet tables.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def sql: Option[(String, String)] = oracle.map(name -> _)
}

object QueryDef {
  /** Exact-arithmetic helpers: double columns are cast to
    * DECIMAL(18,2) before sum/multiply so Spark and DuckDB produce
    * bit-identical results regardless of summation order. Final cast
    * back to double keeps the output schema engine-neutral.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  def asDouble(c: Column): Column = c.cast("double")
  /** exact decimal sum exposed as double */
  def dsum(c: Column): Column = asDouble(sum(dec(c)))
  /** avg over exact decimal sum: identical division on both engines */
  def davg(c: Column): Column = asDouble(sum(dec(c))) / count(c)
}
