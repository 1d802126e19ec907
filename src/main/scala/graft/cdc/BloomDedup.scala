package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{toColumn, toExpr}

/** Probabilistic duplicate suppression — the reference's
  * StableBloomFilter (rust-cdc `src/delta/mod.rs:81`
  * `StableBloomFilter::new_default(10_000, 0.01)`) re-expressed with
  * Spark's native bloom sketch expressions (the same machinery the
  * optimizer injects for runtime row-filters).
  *
  * Shape at scale: the filter is built with a partial-merge
  * aggregate over seen keys (one pass, map-side combine), then
  * broadcast into `might_contain` probes on the incoming stream — a
  * scan-local predicate, no shuffle of the probe side.
  */
object BloomDedup {

  /** Aggregate a key column into a serialized bloom filter. */
  def bloomAgg(key: Column, expectedItems: Long = 10000L, numBits: Long = 80000L): Column =
    toColumn(new BloomFilterAggregate(
      toExpr(xxhash64(key)), toExpr(lit(expectedItems)), toExpr(lit(numBits)))
      .toAggregateExpression())

  /** Probe: true when `key` may already be in `bloom` (serialized). */
  def mightContain(bloom: Column, key: Column): Column =
    toColumn(BloomFilterMightContain(toExpr(bloom), toExpr(xxhash64(key))))

  /** Suppress events whose key was already seen in `history`:
    * probabilistic pre-filter (no false negatives — every truly-new
    * key survives) followed by an exact anti-join only on the
    * bloom-positive subset. Mirrors how the reference uses its
    * bloom filter as a cheap front gate.
    */
  def suppressSeen(
      incoming: DataFrame,
      history: DataFrame,
      keyCol: String): DataFrame = {
    // the sketch is fixed-size (~numBits/8 bytes) regardless of data
    // volume, so collecting it to the driver and shipping it as a
    // literal into every probe task is the scale-correct move —
    // might_contain requires a constant/scalar-subquery filter side
    val bloomBytes = history.agg(bloomAgg(col(keyCol)).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    // empty history (or all-null keys): the aggregate is null and
    // might_contain(null, …) would null-drop EVERY row — nothing has
    // been seen, so everything passes through
    if (bloomBytes == null) return incoming
    // NOTE: probed is referenced by both branches, so a batch caller
    // pays the (cheap) bloom probe twice; kept as a pure expression
    // because materializing here (checkpoint/persist) would break
    // streaming callers and force eager evaluation
    val probed = incoming
      .withColumn("__maybe_seen", mightContain(lit(bloomBytes), col(keyCol)))
    val certainlyNew = probed.filter(!col("__maybe_seen")).drop("__maybe_seen")
    val needsCheck = probed.filter(col("__maybe_seen")).drop("__maybe_seen")
      .join(history.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    certainlyNew.unionByName(needsCheck)
  }
}
