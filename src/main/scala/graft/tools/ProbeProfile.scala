package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the incremental-dedup probe path: times each
  * stage of dedup_incremental's plan separately and prints the data
  * volumes (candidate pairs, touched docs, gram sizes) that drive
  * them. Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProbeProfile
  */
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/bench-data/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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

    val index = timed("standingIndex (cached build)") {
      Dedup.standingIndex(spark, dir)
    }
    println(s"## index rows: ${timed("index count")(index.count())}")

    val increment = Tables.parallelized(
      Tables.documents(spark, dir).select("doc_id", "text")
        .filter(col("doc_id") % 10 === 0))
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val corpusTexts = Tables.documents(spark, dir).select("doc_id", "text")
      .unionAll(increment)

    val cand = timed("candidates plan") {
      Dedup.incrementalCandidates(
        index, increment, "doc_id", "text", 12, 3, true, Dedup.MaxBucket).persist()
    }
    println(s"## cand pairs: ${timed("cand materialize")(cand.count())}")

    val g = timed("gram table plan") {
      Dedup.touchedGramTable(cand, corpusTexts, "doc_id", "text").persist()
    }
    println(s"## touched docs: ${timed("gram materialize")(g.count())}")
    val gs = g.select(avg(size(col("g"))), max(size(col("g")))).head()
    println(s"## avg grams/doc: ${gs.get(0)}, max: ${gs.get(1)}")

    val v = timed("verify join + checkpoint") {
      Dedup.verifyJoin(cand, g, 0.7).localCheckpoint()
    }
    timed("output count")(println(s"## verdicts: ${v.count()}"))
    spark.stop()
  }
}
