package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-handling patterns, demonstrated with oracle-checked results.
  *
  * q19_salted_agg: two-phase (salted) aggregation over a column with
  * only 5 distinct values — the worst-case hot-key layout for a
  * single-phase hash agg at 100 TB (5 reducers own everything).
  * Salting fans each hot key over 16 sub-keys for the first
  * (map-side-combining) phase, then re-aggregates the 5×16 partials.
  * The oracle proves the salted plan is value-identical to the naive
  * group-by. Decimal sums make the two-phase re-aggregation exact
  * (double sums would not associate).
  */
object Skew {

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q19_salted_agg", salted, Some(saltedSql))
  )

  private val Salts = 16

  private def salted(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val phase1 = o
      .withColumn("__salt", pmod(col("o_orderkey"), lit(Salts)))
      .groupBy(col("o_orderpriority"), col("__salt"))
      .agg(
        sum(dec(col("o_totalprice"))).as("part_sum"),
        count(lit(1)).as("part_n"))
    phase1
      .groupBy("o_orderpriority")
      .agg(
        asDouble(sum(col("part_sum"))).as("total_value"),
        sum(col("part_n")).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  private val saltedSql =
    """SELECT o_orderpriority,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      | COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
}
