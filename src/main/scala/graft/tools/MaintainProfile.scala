package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dedup_index_maintain's stage costs: standing
  * build, day-1 banding (the grown index), the grown pop table, day-2
  * candidates, gram table, verify. Run:
  * SPARK_GRAFT_SF_DIR=... runMain graft.tools.MaintainProfile
  */
object MaintainProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/bench-data/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    val MutantBase = 1000000L

    val index = timed("standingIndex (cached build)") {
      val i = Dedup.standingIndex(spark, dir); i.count(); i
    }
    def docsWhere(c: org.apache.spark.sql.Column) = Tables.parallelized(
      Tables.documents(spark, dir).select("doc_id", "text").filter(c))
    val day1 = docsWhere(col("doc_id") % 10 === 0)
      .select((col("doc_id") + MutantBase).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val day2 = docsWhere(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 2 * MutantBase).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+\\S+\\s+", "").as("text"))
    val grown = timed("grown build (union + persist + count)") {
      val g = index.select(col("doc_id"), col("band"), col("sig"))
        .unionAll(Dedup.bandSignatures(day1, "doc_id", "text", md5Hash = true))
        .persist()
      g.count(); g
    }
    val pop = timed("grown pop (groupBy + persist + count)") {
      val p = grown.groupBy("band", "sig").agg(count(lit(1)).as("__idx_n"))
        .sortWithinPartitions("band", "sig").persist()
      p.count(); p
    }
    val cand = timed("day2 candidates (plan + persist + count)") {
      val c = Dedup.incrementalCandidates(
        grown, day2, "doc_id", "text", 12, 3, true, Dedup.MaxBucket,
        Some(pop)).persist()
      println(s"## cand pairs: ${c.count()}")
      c
    }
    val corpusTexts = Tables.documents(spark, dir).select("doc_id", "text")
      .unionAll(day1).unionAll(day2)
    val g = timed("gram table (plan + persist + count)") {
      val t = Dedup.touchedGramTable(cand, corpusTexts, "doc_id", "text").persist()
      println(s"## touched docs: ${t.count()}")
      t
    }
    val v = timed("verify join + checkpoint") {
      Dedup.verifyJoin(cand, broadcast(g), 0.7).localCheckpoint()
    }
    timed("output count")(println(s"## verdicts: ${v.count()}"))
    spark.stop()
  }
}
