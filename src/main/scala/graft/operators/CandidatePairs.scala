package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared shape of every banded near-dup candidate miner in the
  * library (minhashPairs, embeddingDedupPairs, mm_phash): explode to
  * (id, bucket-key) rows, drop over-populated buckets, self-join on
  * the bucket key with `a.id < b.id`. The cap is a count window over
  * the bucket-key partition so it RIDES the self-join's own hash
  * exchange — the expensive upstream projection (signatures, hashes)
  * is evaluated once per row, never re-derived per consumer (the
  * groupBy + broadcast-join-back formulation measured ~4× the
  * projection cost in embeddingDedupPairs; see its scaladoc).
  *
  * A bucket above `maxBucket` is dropped, not sampled: a bucket that
  * hot is not discriminating (exact-dup mass or hash degeneracy —
  * exact dedup's job), and dropping bounds the join at
  * O(maxBucket × rows) instead of Σ bucket².
  *
  * `pinShuffleHash` forces a shuffled hash join. For corpus-scale
  * inputs Catalyst's compressed-size estimate can pick a broadcast
  * build of an ENTIRE side (measured in embeddingDedupPairs at
  * sf0.1), which duplicates the banded subtree and ships the corpus
  * to every executor at scale; SMJ adds two join sorts the hash join
  * doesn't need. Callers whose measured plan is already the wanted
  * one may leave the pin off to avoid perf churn.
  */
object CandidatePairs {

  def cappedBandSelfJoin(
      banded: DataFrame,
      idCol: String,
      keyCols: Seq[String],
      maxBucket: Int,
      pinShuffleHash: Boolean): DataFrame = {
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    val capped0 = banded
      .withColumn("__bn", count(lit(1)).over(wBucket))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
    val capped = if (pinShuffleHash) capped0.hint("shuffle_hash") else capped0
    val a = capped.as("a"); val b = capped.as("b")
    val cond: Column = keyCols
      .map(k => col(s"a.$k") === col(s"b.$k"))
      .reduce(_ && _) && (col(s"a.$idCol") < col(s"b.$idCol"))
    a.join(b, cond)
  }
}
