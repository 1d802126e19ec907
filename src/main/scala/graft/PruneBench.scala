package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cdc.{CdcSink, TxnLog}

/** Micro-benchmark for the key-range-pruned merge: the SAME localized
  * change batch is merged into the SAME range-compacted table twice —
  * once with the per-file stats manifest (pruned path), once after
  * republishing the manifest with stats stripped (the legacy
  * full-rewrite path). Prints one JSON line.
  *
  * The quantity under test is the one that decides 100 TB viability:
  * pruned-merge cost must track the TOUCHED-file volume, not the
  * table. Table size is driven by SPARK_GRAFT_SF_DIR's orders table
  * (1.5M rows at sf1, 15M at sf10), batch is a fixed 1000 adjacent
  * keys — so the legacy path grows ~10× per decade while the pruned
  * path stays ~flat.
  */
object PruneBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS",
      (Runtime.getRuntime.availableProcessors() min 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~64 key-disjoint files regardless of sf — the many-file shape a
    // 100 TB table has (its absolute file count is larger, but prune
    // cost scales with TOUCHED files either way; what matters here is
    // untouched >> touched)
    def buildTable(): String = {
      val dir = java.nio.file.Files.createTempDirectory("prune_bench_").toString
      val base = Tables.orders(spark, sfDir).select(
        format_string("k%012d", col("o_orderkey")).as("key"),
        lit("c").as("op"),
        col("o_orderkey").as("offset"),
        col("o_totalprice").cast("double").as("value"),
        lit("bin.1").as("source_file"))
      CdcSink.writeSnapshot(base, dir)
      val target = math.max(10000L, Tables.orders(spark, sfDir).count() / 64)
      CdcSink.compact(spark, dir, None, targetRecordsPerFile = target)
      dir
    }

    def batch(n: Int) = spark.range(1, n + 1).select(
      format_string("k%012d", col("id") * 4).as("key"),
      lit("u").as("op"),
      (col("id") + 1000000000L).as("offset"),
      lit(-1.0).as("value"),
      lit("bin.2").as("source_file"))

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

    // read side: the same locality argument for point lookups —
    // readRange on the stats manifest must open O(touched) files and
    // its wall must stay ~flat per decade, while a stats-less
    // manifest degrades to opening (and row-filtering) every file.
    // Runs BEFORE each table's merge so both paths read the identical
    // compaction-shaped file layout.
    def readAll(dir: String): (Double, Long) = {
      var opened = 0L
      val t = time {
        val df = CdcSink.readRange(spark, dir, f"k${4L}%012d", f"k${4000L}%012d")
        // inputFiles = the files the scan will OPEN (the metadata-
        // level quantity manifest pruning bounds); input_file_name()
        // would only count files that survive the row filter
        opened = df.inputFiles.length.toLong
        df.agg(count(lit(1)), sum("value")).collect()
      }
      (t, opened)
    }

    // pruned: stats manifest as compaction left it
    val prunedDir = buildTable()
    val nFiles = TxnLog.current(fs, prunedDir).get.entries.length
    val (tReadPruned, openedPruned) = readAll(prunedDir)
    val tPruned = time(CdcSink.merge(spark, batch(1000), prunedDir, None))
    val carried = {
      val vs = TxnLog.versions(fs, prunedDir)
      val before = TxnLog.manifestAt(fs, prunedDir, vs(vs.length - 2)).get
      val after = TxnLog.current(fs, prunedDir).get
      after.entries.map(_.path).toSet.intersect(before.entries.map(_.path).toSet).size
    }

    // legacy: same table, stats stripped from the manifest
    val legacyDir = buildTable()
    val m = TxnLog.current(fs, legacyDir).get
    TxnLog.commit(fs, legacyDir, m.version + 1, m.schema,
      m.entries.map(_.copy(min = None, max = None)))
    val (tReadLegacy, openedLegacy) = readAll(legacyDir)
    val tLegacy = time(CdcSink.merge(spark, batch(1000), legacyDir, None))

    val rows = Tables.orders(spark, sfDir).count()
    println(s"""{"metric":"prune_merge","sf":"$sfDir","table_rows":$rows,""" +
      s""""files":$nFiles,"carried":$carried,""" +
      s""""pruned_sec":${f"$tPruned%.3f"},"legacy_sec":${f"$tLegacy%.3f"},""" +
      s""""read_pruned_sec":${f"$tReadPruned%.3f"},"read_opened":$openedPruned,""" +
      s""""read_legacy_sec":${f"$tReadLegacy%.3f"},"read_legacy_opened":$openedLegacy}""")
    spark.stop()
  }
}
