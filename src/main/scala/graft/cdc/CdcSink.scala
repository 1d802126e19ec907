package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-table sink — the reference's Delta ingest re-expressed
  * over plain partitioned parquet (rust-cdc `src/delta/mod.rs`
  * IngestProcessor/DataWriter: partition_field extraction, composite
  * unique_key_fields, buffered upsert flush, commit offsets in
  * `__commit_offset__.json`, dead-letter table).
  *
  * Design for scale:
  *  - the snapshot table is hash-partitioned parquet, partitioned on
  *    the user's partition column (like `IngestOptions
  *    .partition_field`) so merges prune;
  *  - [[merge]] rewrites ONLY the partitions the incoming changelog
  *    touches: read-side partition pruning via an IN filter over the
  *    distinct incoming partition values (collected from the small
  *    change batch, not the big table);
  *  - commit offsets are written after data (write-ahead by data,
  *    like the reference commits the log AFTER a successful flush),
  *    and re-merging an already-committed batch is a no-op upsert —
  *    idempotent recovery;
  *  - undecodable records are appended to a dead-letter directory
  *    (`IngestOptions.dlq_table_uri`).
  */
object CdcSink {

  val CommitFile = "_graft_commit_offset.json"

  /** DLQ path for a table — a SIBLING directory, deliberately outside
    * the table dir so snapshot overwrites/compaction can never clear
    * captured records.
    */
  def dlqDir(tableDir: String): String = tableDir.stripSuffix("/") + "_dlq"

  /** Canonical changelog columns every sink input must carry. */
  val requiredCols: Seq[String] = Seq("key", "op", "offset")

  /** Full rewrite: materialize the snapshot of `changelog` under
    * `tableDir`, partitioned by `partitionCol` when given.
    */
  def writeSnapshot(
      changelog: DataFrame,
      tableDir: String,
      partitionCol: Option[String] = None): Unit = {
    val snap = CdcApply.snapshot(changelog)
    val writer = snap.write.mode(SaveMode.Overwrite)
    partitionCol match {
      case Some(p) => writer.partitionBy(p).parquet(tableDir)
      case None => writer.parquet(tableDir)
    }
    commitOffsets(changelog, tableDir)
  }

  /** Incremental upsert merge: apply `changes` (a changelog batch)
    * to the existing snapshot, rewriting only touched partitions.
    */
  def merge(
      spark: SparkSession,
      changes: DataFrame,
      tableDir: String,
      partitionCol: Option[String] = None): Unit = {
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tablePath = new Path(tableDir)
    val hasData = fs.exists(tablePath) &&
      fs.listStatus(tablePath).exists(s => !s.getPath.getName.startsWith("_"))
    if (!hasData) {
      writeSnapshot(changes, tableDir, partitionCol)
      return
    }
    partitionCol match {
      case None =>
        // unpartitioned: full merge. allowMissingColumns both ways →
        // schema EVOLVES when the changelog gains columns (reference
        // DDL propagation: ALTER TABLE ADD COLUMN flows into the
        // table; dropped columns stay, null-filled)
        val existing = spark.read.option("mergeSchema", "true").parquet(tableDir)
          .withColumn("op", lit(Op.Update))
        val merged = CdcApply.snapshot(
          existing.unionByName(changes, allowMissingColumns = true)
            .localCheckpoint())
        // static overwrite clears the dir — keep commit/counter files
        preservingSidecars(fs, tableDir) {
          merged.write.mode(SaveMode.Overwrite).parquet(tableDir)
        }
      case Some(p) =>
        // collect touched partition values from the SMALL change batch
        val touched = changes.select(p).distinct().collect().map(_.get(0))
        if (touched.nonEmpty) {
          // isin never matches null — a null partition value would be
          // silently dropped (and its offset still committed: data
          // loss), so null-touch needs an explicit isNull disjunct
          val nonNull = touched.filter(_ != null)
          def touchedPred = {
            val base = if (nonNull.isEmpty) lit(false) else col(p).isin(nonNull: _*)
            if (touched.contains(null)) base || col(p).isNull else base
          }
          // mergeSchema: after a partial (touched-partition) schema
          // evolution, untouched files still carry the old footer — a
          // plain read could resolve to it and drop evolved columns
          val existing = spark.read.option("mergeSchema", "true").parquet(tableDir)
            .filter(touchedPred) // partition-pruned read
            .withColumn("op", lit(Op.Update))
          val merged = CdcApply.snapshot(
            existing.unionByName(changes.filter(touchedPred),
                allowMissingColumns = true)
              .localCheckpoint()) // sever lineage: source files are being overwritten
          val mergedStable = merged.localCheckpoint()
          mergedStable.write.mode(SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(p).parquet(tableDir)
          // dynamic overwrite never touches partitions with zero
          // surviving rows — drop emptied partitions explicitly,
          // using Hive's on-disk partition-path encoding
          val survivors = mergedStable.select(p).distinct().collect().map(_.get(0)).toSet
          touched.filterNot(survivors.contains).foreach { v =>
            fs.delete(new Path(tableDir, s"$p=${hivePartName(v)}"), true)
          }
        }
    }
    commitOffsets(changes, tableDir)
    maybeCompact(spark, tableDir, partitionCol)
  }

  /** Hive partition-directory encoding for a partition value (null →
    * default-partition marker; special characters percent-escaped the
    * way Spark writes them).
    */
  private def hivePartName(v: Any): String =
    if (v == null) "__HIVE_DEFAULT_PARTITION__"
    else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(v.toString)

  /** Checkpoint-style compaction every N merges — the reference
    * creates a delta checkpoint every 10 commits
    * (`src/delta/mod.rs:262-285` try_create_checkpoint); the parquet
    * analog is rewriting accumulated small files into one per
    * partition. At 100 TB merge cadence this is what keeps scan task
    * counts (and NameNode/listing pressure) bounded.
    */
  val CompactEvery = 10

  private def maybeCompact(
      spark: SparkSession,
      tableDir: String,
      partitionCol: Option[String]): Unit = {
    val mergeCount = bumpMergeCounter(spark, tableDir)
    if (mergeCount % CompactEvery == 0) compact(spark, tableDir, partitionCol)
  }

  /** Rewrite the table to one file per partition. The static
    * overwrite clears the directory, so sidecar metadata (commit
    * offsets, merge counter) is captured first and restored after.
    */
  def compact(
      spark: SparkSession,
      tableDir: String,
      partitionCol: Option[String]): Unit = {
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = spark.read.option("mergeSchema", "true").parquet(tableDir)
      .localCheckpoint()
    preservingSidecars(fs, tableDir) {
      partitionCol match {
        case Some(p) =>
          // hash-distribute on the partition column → one file per value
          snap.repartition(col(p))
            .write.mode(SaveMode.Overwrite).partitionBy(p).parquet(tableDir)
        case None =>
          snap.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tableDir)
      }
    }
  }

  /** Static overwrites clear the table dir; capture the sidecar
    * metadata files first and restore them after `body`.
    */
  private def preservingSidecars(fs: org.apache.hadoop.fs.FileSystem, tableDir: String)(
      body: => Unit): Unit = {
    val sidecars = Seq(CommitFile, "_graft_merge_count").flatMap { name =>
      val p = new Path(tableDir, name)
      if (fs.exists(p)) {
        val in = fs.open(p)
        val content = try scala.io.Source.fromInputStream(in).mkString finally in.close()
        Some(name -> content)
      } else None
    }
    try body
    finally sidecars.foreach { case (name, content) =>
      val out = fs.create(new Path(tableDir, name), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
  }

  private def bumpMergeCounter(spark: SparkSession, tableDir: String): Long = {
    val p = new Path(tableDir, "_graft_merge_count")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current =
      if (!fs.exists(p)) 0L
      else {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in).mkString.trim.toLong
        finally in.close()
      }
    val next = current + 1
    val out = fs.create(p, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    next
  }

  /** End-to-end DDL propagation: apply a parsed [[Ddl.Stmt]] to the
    * snapshot table on disk — the reference's handle_* fns
    * (rust-cdc `src/delta/mod.rs` DDL branch) re-expressed over the
    * parquet snapshot store.
    *
    *  - AddColumn: no rewrite — the table schema evolves lazily on
    *    the next [[merge]] (`unionByName(allowMissingColumns)` +
    *    `mergeSchema` read). Rewriting 100 TB to add a null column
    *    would be the anti-pattern.
    *  - DropColumn / RenameColumn: projection rewrite (these change
    *    existing bytes, so a rewrite is unavoidable — still one
    *    straight-through column-pruned scan, no shuffle).
    *  - RenameTable: filesystem rename (metadata-only, O(1)).
    *  - DropTable: recursive delete.
    *  - TruncateTable: clear data, KEEP commit offsets — the
    *    reference truncates data but the replication position must
    *    survive (a resumed stream must not re-ingest history).
    *
    * Returns the table dir after the statement (differs on rename).
    */
  def applyDdl(
      spark: SparkSession,
      stmt: Ddl.Stmt,
      tableDir: String,
      partitionCol: Option[String] = None): String = {
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def rewrite(project: DataFrame => DataFrame): Unit = {
      val snap = spark.read.option("mergeSchema", "true").parquet(tableDir)
      val out = project(snap).localCheckpoint() // sever lineage: overwriting source
      preservingSidecars(fs, tableDir) {
        val w = out.write.mode(SaveMode.Overwrite)
        partitionCol match {
          case Some(p) => w.partitionBy(p).parquet(tableDir)
          case None => w.parquet(tableDir)
        }
      }
    }
    stmt match {
      case Ddl.AddColumn(_, _) => tableDir // lazy evolution on next merge
      case Ddl.DropColumn(_, c) =>
        rewrite(df => if (df.columns.contains(c)) df.drop(c) else df)
        tableDir
      case Ddl.RenameColumn(_, from, to) =>
        rewrite(df => if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df)
        tableDir
      case Ddl.RenameTable(_, to) =>
        // sibling dir named after the (unquoted) new table name
        val dest = new Path(new Path(tableDir).getParent, to.stripPrefix("`").stripSuffix("`"))
        fs.rename(new Path(tableDir), dest)
        dest.toString
      case Ddl.DropTable(_) =>
        fs.delete(new Path(tableDir), true); tableDir
      case Ddl.TruncateTable(_) =>
        val keep = Set(CommitFile, "_graft_merge_count")
        fs.listStatus(new Path(tableDir))
          .filterNot(s => keep.contains(s.getPath.getName))
          .foreach(s => fs.delete(s.getPath, true))
        tableDir
      case Ddl.Other(_) => tableDir
    }
  }

  /** Merge a changelog batch that may carry interleaved DDL events —
    * the reference ingest loop's QUERY branch: data rows flush in
    * offset order around each DDL, and each DDL applies to the table
    * via [[applyDdl]] before later data lands. DDL rows have
    * `op == Op.Query` and the statement text in `stmtCol`; they are
    * rare, so collecting them to the driver (where schema decisions
    * happen, as in the reference) is O(few), while data rows stay
    * distributed throughout. Returns the table dir after the batch
    * (it changes on RENAME TABLE).
    */
  def mergeWithDdl(
      spark: SparkSession,
      changes: DataFrame,
      tableDir: String,
      partitionCol: Option[String] = None,
      stmtCol: String = "stmt"): String = {
    val ddls: Array[(Long, String)] =
      if (!changes.columns.contains(stmtCol)) Array.empty
      else changes.filter(col("op") === Op.Query && col(stmtCol).isNotNull)
        .select(col("offset"), col(stmtCol))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val data = changes.filter(col("op") =!= Op.Query)
    var dir = tableDir
    var lower = Long.MinValue
    ddls.foreach { case (off, stmt) =>
      val segment = data.filter(col("offset") > lower && col("offset") < off)
      if (!segment.isEmpty) merge(spark, segment, dir, partitionCol)
      dir = applyDdl(spark, Ddl.parse(stmt), dir, partitionCol)
      lower = off
    }
    val rest = data.filter(col("offset") > lower)
    if (!rest.isEmpty) merge(spark, rest, dir, partitionCol)
    dir
  }

  /** Route undecodable records to the dead-letter area. Returns the
    * clean subset. `isBad` marks rows the decoder rejected.
    */
  def deadLetter(
      changes: DataFrame,
      tableDir: String,
      isBad: org.apache.spark.sql.Column): DataFrame = {
    val bad = changes.filter(isBad)
    if (!bad.isEmpty) {
      bad.withColumn("_dlq_ts", current_timestamp())
        .write.mode(SaveMode.Append).parquet(dlqDir(tableDir))
    }
    changes.filter(!isBad)
  }

  /** Committed max offset per source, written after a successful
    * flush (reference LogCommitter.commit: same-offset re-commit is
    * a no-op).
    */
  private def commitOffsets(changes: DataFrame, tableDir: String): Unit = {
    val spark = changes.sparkSession
    val sourceCol =
      if (changes.columns.contains("source_file")) col("source_file")
      else lit("default")
    val batchOffsets = changes
      .groupBy(sourceCol.as("source"))
      .agg(max(col("offset")).as("committed_offset"))
      .collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1))
      .toMap
    // merge with previously committed sources — a batch from source B
    // must not erase source A's resume point (monotone per source)
    val previous = committedOffsets(spark, tableDir)
    val merged = previous ++ batchOffsets.map { case (src, off) =>
      src -> math.max(off, previous.getOrElse(src, Long.MinValue))
    }
    val json = merged
      .map { case (src, off) => s""""$src": $off""" }
      .mkString("{", ", ", "}")
    val fs = new Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(tableDir, CommitFile), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Read back committed offsets (resume point after restart). */
  def committedOffsets(spark: SparkSession, tableDir: String): Map[String, Long] = {
    val p = new Path(tableDir, CommitFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      // minimal {"k": v, ...} parse — keys are file names, values longs
      "\"([^\"]+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toLong).toMap
    }
  }
}
