package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.DetHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distinct-count sketching with a TRUE cross-engine
  * oracle — the answer to "sketches are engine-specific, so approx
  * queries can only be rows-only checked" (q27's HLL/quantile path):
  * a KMV (k-minimum-values) estimator built on md5 fractions is
  * fully deterministic, so DuckDB reproduces the estimate BIT-FOR-
  * BIT and the driver hash-check applies to a sketch query.
  *
  * Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in
  * a data stream"): hash every value to [0,1); if the k-th smallest
  * hash is f_k, the distinct count ≈ (k-1)/f_k. With k=256 the
  * relative error concentrates near 1/sqrt(k) ≈ 6%.
  *
  * Scale shape: the k smallest hashes per group come from the
  * custom TopKPerKey physical operator — a bounded k-element heap
  * per key behind ONE keyed exchange of (group, hash) pairs, O(n
  * log k), constant memory; NOT a per-group full sort (the
  * row_number formulation) and NOT a collect_list. The exact
  * distinct count rides the same distinct relation for comparison.
  */
object Sketches {

  private val K = 256

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q30_kmv_sketch", kmv, Some(kmvSql))
  )

  private def kmv(s: SparkSession, dir: String): DataFrame = {
    // distinct BEFORE md5: hashing after the distinct computes
    // |distinct| md5s instead of |rows| (~10× fewer at sf10) and the
    // dedup exchange carries 16-byte rows instead of 32-char hex
    // strings. Cross-engine equivalence: the oracle dedups on the
    // DIGEST, this side on the raw key — they diverge only if two
    // distinct partkey decimal strings collide under md5, which is
    // cryptographically negligible (no known md5 collision exists
    // for inputs this short, let alone among ~2M decimal strings)
    val d = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("flag"), col("l_partkey"))
      .distinct()
      .withColumn("h", md5(col("l_partkey").cast("string")))
      .drop("l_partkey")
      .withColumn("frac", DetHash.fracOfHex(col("h")))
      .withColumn("negfrac", -col("frac")) // TopKPerKey orders desc
    val kept = graft.plans.TopKPerKey(d, Seq("flag"), "negfrac", K)
    val kth = kept.groupBy("flag")
      .agg(max(col("frac")).as("fk"), count(lit(1)).as("n_kept"))
    val exact = d.groupBy("flag").agg(count(lit(1)).as("n_exact"))
    exact.join(kth, Seq("flag"), "left")
      .select(col("flag"),
        when(col("n_kept") < K, col("n_exact"))
          .otherwise(floor(lit((K - 1).toDouble) / col("fk"))).as("est_distinct"),
        col("n_exact"))
      .orderBy("flag")
  }

  // The oracle mirrors the estimator arithmetic exactly: same md5,
  // same exact 48-bit fraction, same k-th-smallest VALUE (ties at
  // the boundary share the value, so row_number picking any of them
  // yields the same f_k), same (k-1)/f_k division.
  private lazy val kmvSql =
    s"""WITH d AS (
       |  SELECT DISTINCT l_returnflag AS flag, md5(CAST(l_partkey AS VARCHAR)) AS h
       |  FROM lineitem
       |), f AS (
       |  SELECT flag, ${DetHash.fracOfHexSql("h")} AS frac FROM d
       |), r AS (
       |  SELECT flag, frac,
       |         row_number() OVER (PARTITION BY flag ORDER BY frac) AS rn
       |  FROM f
       |), kth AS (
       |  SELECT flag, frac AS fk FROM r WHERE rn = $K
       |), cnt AS (
       |  SELECT flag, count(*) AS n_exact FROM d GROUP BY flag
       |)
       |SELECT cnt.flag AS flag,
       |       CAST(CASE WHEN kth.fk IS NULL THEN cnt.n_exact
       |                 ELSE floor(CAST(${K - 1} AS DOUBLE) / kth.fk) END AS BIGINT)
       |         AS est_distinct,
       |       CAST(cnt.n_exact AS BIGINT) AS n_exact
       |FROM cnt LEFT JOIN kth ON cnt.flag = kth.flag
       |ORDER BY flag""".stripMargin
}
