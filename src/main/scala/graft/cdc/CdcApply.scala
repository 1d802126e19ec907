package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch changelog materialization — the upsert fold.
  *
  * Reference semantics (rust-cdc `src/delta/mod.rs:160-180` +
  * `value_buffer.rs`): per (partition, unique_key) the ValueBuffers
  * keep the LAST value seen; update = remove(before)+add(after);
  * delete = remove. Materializing a snapshot therefore reduces to
  * "latest change per key wins, deletes drop the key".
  *
  * Spark-first: an algebraic argmax — `max_by(struct(payload),
  * offset)` per key — NOT a `row_number` window. The two are
  * result-identical (latest event wins; a trailing delete drops the
  * key), but only the aggregate is skew-proof: a window's
  * ClusteredDistribution puts EVERY row of a key in one task, and
  * AQE's skew splitting applies to joins and rebalance only, never
  * to a window — one hot key (a celebrity row updated in every
  * batch) is one straggler task at 100 TB. The aggregate gets
  * map-side PARTIAL combining instead: each input partition
  * collapses its slice of the hot key to ONE buffer row before the
  * shuffle, so post-shuffle work per key is ≤ the map-partition
  * count regardless of how hot the key is (SkewSpec measures this —
  * 50%-hot changelog folds within 2× of uniform). ONE shuffle on
  * the key, keyed exactly like the downstream merge target so a
  * writer can bucket by the same key with no extra exchange.
  */
object CdcApply {

  /** Latest surviving row per key: last-writer-wins, deletes removed.
    * Output schema = input schema (column order preserved; payload
    * columns come back nullable — they ride an aggregate buffer).
    * `offsetCol` must be NON-NULL: `max_by` ignores null ordering
    * values, so a key whose rows all carry null offsets is dropped
    * (the windowed twin would keep an arbitrary row). Every graft
    * changelog assigns offsets from the source position — a null
    * offset is a malformed feed, not an ordering.
    */
  def snapshot(
      changelog: DataFrame,
      keyCols: Seq[String] = Seq("key"),
      offsetCol: String = "offset",
      opCol: String = "op"): DataFrame = {
    val payload = changelog.columns.filterNot(keyCols.contains).toSeq
    changelog
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(offsetCol)).as("__last"))
      .select(changelog.columns.toSeq.map { c =>
        if (keyCols.contains(c)) col(c) else col("__last").getField(c).as(c)
      }: _*)
      .filter(col(opCol) =!= Op.Delete)
  }

  /** The window formulation of [[snapshot]] — kept as the semantic
    * twin SkewSpec checks the aggregate against, and as the shape to
    * reach for when the caller needs rank &gt; 1 (version history)
    * rather than just the survivor. NOT skew-proof: all rows of a
    * key land in one task (see object doc).
    */
  private[graft] def snapshotWindowed(
      changelog: DataFrame,
      keyCols: Seq[String] = Seq("key"),
      offsetCol: String = "offset",
      opCol: String = "op"): DataFrame = {
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(offsetCol).desc)
    changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= Op.Delete)
      .drop("__rn")
  }

  /** Changelog statistics per operation — the bookkeeping the
    * reference's ingest loop tracks (message counts, offset ranges)
    * before deciding to flush (`src/delta/mod.rs:186-199`).
    */
  def opStats(changelog: DataFrame, opCol: String = "op"): DataFrame =
    changelog
      .groupBy(opCol)
      .agg(
        count(lit(1)).as("n_events"),
        min(col("offset")).as("min_offset"),
        max(col("offset")).as("max_offset"),
        countDistinct(col("key")).as("n_keys"))

  /** Update events paired with their before-image — the reference
    * emits Update(before, after) (`src/delta/mod.rs:52-54`); on a
    * flat changelog the before-image is the previous value of the
    * same key, i.e. a lag window.
    */
  def beforeAfter(
      changelog: DataFrame,
      valueCol: Column,
      keyCols: Seq[String] = Seq("key"),
      offsetCol: String = "offset"): DataFrame = {
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(offsetCol))
    changelog
      .withColumn("before_value", lag(valueCol, 1).over(w))
      .withColumn("after_value", valueCol)
  }

  /** Incremental view maintenance — merge ONE changelog batch into a
    * maintained `groupBy(group).agg(count, sum(value))` without
    * recomputing the base. This is the capability that makes a CDC
    * feed worth having over nightly recompute: refresh work is
    * ∝ |batch| + |touched keys|, never ∝ |base table|.
    *
    * Inputs: `maintained` is the stored aggregate (groupCol, n_rows,
    * total — total kept DECIMAL-exact so merges never drift);
    * `baseState` is the stored live-row table the aggregate was
    * computed from (keyCols ++ groupCol, valueCol — at scale a
    * key-bucketed table, so the retract semi-join below co-locates);
    * `batch` is the new changelog slice.
    *
    * Delta algebra (reference upsert semantics, `src/delta/mod.rs:
    * 124-155`: update = remove(before) + add(after), delete =
    * remove, last write per key wins): within one batch a key's
    * intermediate states telescope away, so only two terms survive —
    * RETRACT the key's stored live row (if any), ADD its post-batch
    * live row (if its last op isn't a delete). Group migration
    * (an update that moves a key between groups) falls out for free:
    * the retract hits the old group, the add hits the new one.
    */
  def incrementalAgg(
      maintained: DataFrame,
      baseState: DataFrame,
      batch: DataFrame,
      groupCol: String,
      valueCol: String,
      keyCols: Seq[String] = Seq("key"),
      offsetCol: String = "offset",
      opCol: String = "op"): DataFrame = {
    import graft.QueryDef.dec
    val touched = batch.select(keyCols.map(col): _*).distinct()
    val retract = baseState.join(touched, keyCols, "left_semi")
      .select(col(groupCol).as("__g"), lit(-1L).as("__dn"),
        (dec(col(valueCol)) * -1).as("__dt"))
    val add = snapshot(batch, keyCols, offsetCol, opCol)
      .select(col(groupCol).as("__g"), lit(1L).as("__dn"),
        dec(col(valueCol)).as("__dt"))
    maintained
      .select(col(groupCol).as("__g"), col("n_rows").as("__dn"),
        col("total").as("__dt"))
      .unionAll(retract).unionAll(add)
      .groupBy(col("__g"))
      .agg(sum(col("__dn")).as("n_rows"), sum(col("__dt")).as("total"))
      .filter(col("n_rows") > 0) // a group whose last live row left drops out
      .select(col("__g").as(groupCol), col("n_rows"), col("total"))
  }

  /** LogCommitter semantics (reference `snapshot/mod.rs:60-80`):
    * commits are monotone per source; re-committing an already
    * committed position is a no-op. Relationally: the number of
    * EFFECTIVE commits per source is the number of distinct running
    * maxima of the offset sequence.
    */
  def offsetCommits(
      changelog: DataFrame,
      sourceCols: Seq[String] = Seq("source_file"),
      offsetCol: String = "offset",
      arrivalCol: Option[String] = None): DataFrame = {
    // Without a separate arrival column the replay is offset-ordered,
    // and the running max of a sequence ordered by itself IS the
    // sequence — distinct watermarks degenerate to distinct offsets.
    // So the default form is a plain aggregate: one exchange,
    // map-side combined, no per-source ordered window (which puts a
    // source's ENTIRE history on one reducer — measured 9.1s at sf1
    // on the single-source testdata changelog, 0.9s as an agg).
    // With a real arrival column (out-of-order replay), the
    // watermark window is genuinely needed — that form is kept
    // below, partitioned per source.
    val base = arrivalCol match {
      case None => changelog.withColumn("__watermark", col(offsetCol))
      case Some(a) =>
        // offsetCol as the tie-break keeps equal-arrival rows in a
        // deterministic order — without it the distinct-watermark
        // count could differ run to run on arrival collisions
        val w = Window
          .partitionBy(sourceCols.map(col): _*)
          .orderBy(col(a), col(offsetCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        changelog.withColumn("__watermark", max(col(offsetCol)).over(w))
    }
    base
      .groupBy(sourceCols.map(col): _*)
      .agg(
        max(col(offsetCol)).as("committed_offset"),
        countDistinct(col("__watermark")).as("n_commits"),
        count(lit(1)).as("n_events"))
  }
}
