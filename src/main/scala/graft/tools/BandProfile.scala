package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: compares the per-row (HOF) banding against the batch
  * (explode+groupBy) banding on the same increment, to locate the
  * stream gate's compute cost.
  */
object BandProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/bench-data/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "48g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"## $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.operators.Dedup
    import graft.Tables
    val inc = Tables.parallelized(
      Tables.documents(spark, dir).select("doc_id", "text")
        .filter(col("doc_id") % 10 === 0))
      .select((col("doc_id") + 1000000L).as("inc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
      .filter(size(split(col("text"), "\\s+")) >= 3)
      .persist()
    println(s"## inc docs: ${inc.count()}")
    timed("rowBandSignatures (HOF)") {
      inc.select(col("inc_id"),
        explode(Dedup.rowBandSignatures(col("text"))).as("bs"))
        .queryExecution.toRdd.count()
    }
    timed("batch bandSignatures (explode+groupBy)") {
      Dedup.bandSignatures(inc, "inc_id", "text", md5Hash = true)
        .queryExecution.toRdd.count()
    }
    timed("two-projection rowBands") {
      inc.select(col("inc_id"), Dedup.rowShingleHalves(col("text")).as("__vs"))
        .select(col("inc_id"), explode(Dedup.rowBandsFromHalves(col("__vs"))).as("bs"))
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
