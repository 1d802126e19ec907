package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the formatted physical plan of one or
  * more SparkEntry queries. Usage:
  *   sbt "runMain graft.Explain <sfDir> <query> [<query> ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    // --exec: run the query (collect) first and print the FINAL
    // adaptive plan — exchange/stage reuse only materializes at
    // runtime, so the static plan can show N copies of a subtree AQE
    // will actually evaluate once (and vice versa: reuse one assumes
    // may not happen). Plan-audit claims about reuse must come from
    // this mode.
    val exec = args.contains("--exec")
    val rest = args.filterNot(_ == "--exec")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (rest.length > 1) rest.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (exec) df.collect()
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
