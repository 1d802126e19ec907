package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GTID executed-set compaction — the relational analog of MySQL's
  * `gtid_executed` bookkeeping that the reference decodes from
  * GTID_EVENT / PREVIOUS_GTIDS_EVENT (rust-cdc
  * `src/mysql/event/mod.rs:26-120`: Gtid, AnonymousGtid,
  * PreviousGtids). A replica tracking which transactions it has
  * applied stores them per source UUID as coalesced intervals
  * (`uuid:1-5:7-9`), not as one row per transaction.
  *
  * Scale: the islands trick (`gno - row_number()`) needs ONE shuffle
  * on the source column for the window, and the follow-up group-by
  * reuses that partitioning (no second exchange). State is bounded by
  * the number of intervals, not transactions — exactly why MySQL
  * stores GTID sets this way.
  */
object GtidSet {

  /** Coalesce per-source transaction numbers into contiguous
    * `[gno_start, gno_end]` intervals. Duplicate (source, gno) pairs
    * are tolerated (redelivery): the set is deduplicated first.
    *
    * Output columns: sourceCol, gno_start, gno_end, n_txns.
    */
  def intervals(txns: DataFrame, sourceCol: String, gnoCol: String): DataFrame = {
    val w = Window.partitionBy(sourceCol).orderBy(gnoCol)
    // dedup redelivered (source, gno) pairs with lag over the SAME
    // window instead of distinct(): a distinct would shuffle on
    // (source, gno) and the window again on source — this plan has
    // ONE exchange total (the filter preserves partitioning+order,
    // so the second window pass reuses it)
    txns.select(col(sourceCol), col(gnoCol))
      .withColumn("_prev", lag(gnoCol, 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(gnoCol))
      .drop("_prev")
      .withColumn("_island", col(gnoCol) - row_number().over(w))
      .groupBy(col(sourceCol), col("_island"))
      .agg(
        min(gnoCol).as("gno_start"),
        max(gnoCol).as("gno_end"),
        count(lit(1)).as("n_txns"))
      .drop("_island")
  }

  /** Render a coalesced interval set as the canonical MySQL GTID-set
    * text form, one row per source: `source:1-5:7:9-12`. Intervals
    * are sorted within each source; singleton intervals print as a
    * bare number.
    */
  def rendered(txns: DataFrame, sourceCol: String, gnoCol: String): DataFrame =
    intervals(txns, sourceCol, gnoCol)
      .withColumn("_iv",
        when(col("gno_start") === col("gno_end"), col("gno_start").cast("string"))
          .otherwise(concat_ws("-", col("gno_start"), col("gno_end"))))
      .groupBy(col(sourceCol))
      .agg(concat_ws(":",
        array_sort(collect_list(struct(col("gno_start"), col("_iv"))))
          .getField("_iv")).as("gtid_set"))
}
