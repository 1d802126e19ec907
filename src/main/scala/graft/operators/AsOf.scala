package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef._
import graft.cdc.Changelog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the lookup every CDC consumer needs:
  * "for each fact row, the newest dimension row at or before its
  * timestamp". Spark has no native ASOF join; the preferred
  * composition (SURVEY §3 rule (a): compose built-ins before custom
  * plans) is the union-and-carry-forward window:
  *
  *   tag both sides, union, sort per key by (ts, side), carry the
  *   last dimension payload forward with last_value(ignoreNulls),
  *   keep fact rows.
  *
  * ONE shuffle on the join key (same as any keyed join) and no
  * range-explosion: a naive `t2 <= t1` theta-join is a per-key cross
  * product that dies at 100 TB; this stays O(n log n) per key.
  * The oracle is DuckDB's NATIVE `ASOF LEFT JOIN` — two independent
  * implementations of the semantics must agree row-for-row.
  */
object AsOf {

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q25_asof_join", asofQuery, Some(asofSql))
  )

  /** Generic as-of left join.
    *
    * @param left      fact side, one row per lookup
    * @param right     dimension side; (key, ts) must be unique
    * @param key       join key column name present on both sides
    * @param leftTs    fact timestamp
    * @param rightTs   dimension effective-from timestamp
    * @param payload   dimension columns to carry onto facts
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val lCols = left.columns
    val collisions = payload.toSet.intersect(lCols.toSet)
    require(collisions.isEmpty,
      s"payload columns ${collisions.mkString(", ")} also exist on the left side — " +
        "rename them on one side before joining (silent nulling otherwise)")
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // facts sort after dims at equal ts
      .withColumn("__k", col(key))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__k", col(key))
    val lNorm = payload.foldLeft(l)((df, c) => df.withColumn(s"__p_$c", lit(null).cast(r.schema(c).dataType)))
    val rNorm = lCols.foldLeft(r.select((Seq("__ts", "__side", "__k") ++ payload).map(col): _*)) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lNorm
      .select((lCols.toSeq ++ Seq("__ts", "__side", "__k") ++ payload.map(c => s"__p_$c")).map(col): _*)
      .unionByName(
        rNorm.select((lCols.toSeq ++ Seq("__ts", "__side", "__k")).map(col) ++
          payload.map(c => col(c).as(s"__p_$c")): _*))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      // equi/ASOF semantics: a NULL key matches NOTHING. The window
      // groups all NULL keys into one partition, which would carry a
      // NULL-key dim's payload onto NULL-key fact rows — mask it.
      .select(lCols.map(col) ++ payload.map(c =>
        when(col("__k").isNotNull, col(s"__asof_$c")).as(c)): _*)
  }

  /** events ← latest order of the same customer at or before the
    * event time (ties on o_orderdate collapsed to MAX(o_orderkey) so
    * both engines see a unique (key, ts) right side).
    */
  private def asofQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = Changelog.fromEvents(s, dir) // ns→µs ts conversion lives here
      .select(col("key").cast("long").as("user_id"),
        col("offset").as("event_id"), col("ts"))
    val ord = Tables.orders(s, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("best_order"))
      .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("best_order"))
    joinAsOf(ev, ord, key = "user_id", leftTs = "ts", rightTs = "o_orderdate",
      payload = Seq("best_order"))
      .select(col("event_id"), col("user_id"), col("best_order"))
      .orderBy("event_id")
  }

  private val asofSql =
    """WITH o AS (
      |  SELECT o_custkey AS user_id, o_orderdate, MAX(o_orderkey) AS best_order
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, o.best_order
      |FROM events e ASOF LEFT JOIN o
      |  ON e.user_id = o.user_id AND o.o_orderdate <= e.ts
      |ORDER BY event_id""".stripMargin
}
