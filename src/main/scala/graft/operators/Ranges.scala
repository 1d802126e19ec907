package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join — the second lookup shape Spark lacks
  * natively (alongside the as-of join in [[AsOf]]): "which intervals
  * contain this point" / "which interval pairs overlap".
  *
  * A naive theta join (`p BETWEEN s AND e`) has no equi-key, so Spark
  * plans BroadcastNestedLoopJoin — O(n·m) comparisons and a broadcast
  * of a whole side; it dies when both sides are big. The scalable
  * formulation bucketizes time into fixed-width buckets:
  *
  *   - every interval explodes into the buckets it touches
  *     (ceil(len/width)+1 rows, a small constant for bounded
  *     intervals),
  *   - every point maps to exactly ONE bucket,
  *   - equi-join on the bucket id, then the exact BETWEEN residual.
  *
  * The join becomes a plain shuffled hash/sort-merge equi-join:
  * linear shuffle volume, AQE-skew-splittable, no broadcast of a big
  * side — the same plan shape at 100 TB as at sf0.01. DuckDB's native
  * IEJoin (`ON d BETWEEN s AND e`) is the oracle: two independent
  * range-join implementations must agree row-for-row.
  *
  * Bucket width trades explode factor (long intervals → more bucket
  * rows) against join selectivity (wide buckets → more residual
  * misses). Pick it near the median interval length.
  */
object Ranges {

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q29_range_join", rangeJoinQuery, Some(rangeJoinSql))
  )

  /** One week, in seconds — the default bucket for day-scale intervals. */
  val WeekSeconds: Long = 7L * 86400

  /** Epoch-second bucket id. The timestamp cast first normalizes
    * DATE/TIMESTAMP_NTZ inputs (NTZ → LTZ is the identity under the
    * project-wide UTC session; NTZ casts straight to long are
    * rejected by Spark 4).
    */
  private def bucketOf(c: Column, width: Long): Column =
    floor(c.cast("timestamp").cast("long") / width)

  /** Point-in-interval join: every `points` row joined to every
    * `intervals` row whose `[startCol, endCol]` (inclusive) contains
    * its `pointCol`. Timestamp/date columns on both sides; column
    * names must be disjoint. Intervals must satisfy start <= end.
    * Each matching pair appears exactly once (a point has exactly one
    * bucket, and an interval covers that bucket exactly once).
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketSeconds: Long = WeekSeconds): DataFrame = {
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet)
    require(collisions.isEmpty,
      s"columns ${collisions.mkString(", ")} exist on both sides — rename one")
    val p = points.withColumn("__b", bucketOf(col(pointCol), bucketSeconds))
    val i = intervals.withColumn("__b",
      explode(sequence(bucketOf(col(startCol), bucketSeconds),
        bucketOf(col(endCol), bucketSeconds))))
    p.join(i, Seq("__b"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__b")
  }

  /** Interval-overlap join: every `(a, b)` pair whose closed
    * intervals intersect. Both sides explode into their buckets and
    * equi-join; the pair survives only in the FIRST bucket the two
    * intervals share (`max(bucket(aStart), bucket(bStart))`), so each
    * overlapping pair appears exactly once with no distinct() pass.
    */
  def intervalOverlap(
      a: DataFrame,
      aStart: String,
      aEnd: String,
      b: DataFrame,
      bStart: String,
      bEnd: String,
      bucketSeconds: Long = WeekSeconds): DataFrame = {
    val collisions = a.columns.toSet.intersect(b.columns.toSet)
    require(collisions.isEmpty,
      s"columns ${collisions.mkString(", ")} exist on both sides — rename one")
    def exploded(df: DataFrame, s: String, e: String) =
      df.withColumn("__b", explode(sequence(bucketOf(col(s), bucketSeconds),
        bucketOf(col(e), bucketSeconds))))
    exploded(a, aStart, aEnd).join(exploded(b, bStart, bEnd), Seq("__b"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("__b") === greatest(bucketOf(col(aStart), bucketSeconds),
          bucketOf(col(bStart), bucketSeconds)))
      .drop("__b")
  }

  // ---------------------------------------------------------------
  // q29_range_join: "open fulfillment windows per ship date".
  // Each order opens a deterministic window [o_orderdate,
  // o_orderdate + (o_orderkey % 30 + 1) days]; for every distinct
  // ship date, count the windows containing it and their total value.
  // Distinct dates × 150k windows at sf0.1 — a big×big range join
  // that must NOT plan as a nested-loop.
  // ---------------------------------------------------------------
  private def rangeJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val points = Tables.lineitem(s, dir)
      .select(col("l_shipdate").as("ship_date")).distinct()
    // interval explosion + residual filter are the compute: spread
    // the single-row-group orders scan first
    val intervals = Tables.parallelized(Tables.orders(s, dir)).select(
      col("o_totalprice"),
      col("o_orderdate").as("w_start"),
      expr("timestampadd(DAY, CAST(o_orderkey % 30 AS INT) + 1, o_orderdate)")
        .as("w_end"))
    // distinct ship dates are calendar-bounded (~2.5k rows at ANY
    // scale factor) — broadcast them so the exploded intervals side
    // never shuffles; without the hint Catalyst broadcasts whichever
    // side its size estimate favors, and at sf0.1+ the exploded
    // intervals outgrow the threshold → sort-merge join of both sides
    pointInInterval(broadcast(points), "ship_date", intervals, "w_start", "w_end")
      .groupBy("ship_date")
      .agg(count(lit(1)).as("n_open"), dsum(col("o_totalprice")).as("open_value"))
      .orderBy("ship_date")
  }

  private val rangeJoinSql =
    """SELECT d AS ship_date, COUNT(*) AS n_open,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_value
      |FROM (SELECT DISTINCT l_shipdate AS d FROM lineitem) p
      |JOIN (SELECT o_totalprice, o_orderdate AS s,
      |             o_orderdate + INTERVAL (o_orderkey % 30 + 1) DAY AS e
      |      FROM orders) i
      |  ON d BETWEEN s AND e
      |GROUP BY d ORDER BY d""".stripMargin
}
