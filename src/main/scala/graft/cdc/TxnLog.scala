package graft.cdc

import java.util.UUID
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Versioned transaction log for the [[CdcSink]] snapshot store — the
  * reference's Delta commit semantics (rust-cdc `src/delta/mod.rs:
  * 262-285`: transactional add/remove actions, checkpoint every 10
  * commits) re-expressed over plain parquet + a manifest directory.
  *
  * Protocol (single writer, any number of readers):
  *  1. a commit writes its data into a FRESH commit directory
  *     (`c-<version>-<uuid>/`) under the table dir — existing files
  *     are never modified or overwritten;
  *  2. the commit is PUBLISHED by renaming a temp manifest into
  *     `_graft_log/<version>.json` (atomic on posix/HDFS; rename onto
  *     an existing version fails → concurrent-writer detection);
  *  3. readers resolve the highest manifest and read exactly the
  *     files it lists — a reader racing a merge sees either the old
  *     or the new version, never a half-written directory;
  *  4. a crash between (1) and (2) leaves an orphan commit dir that
  *     the current manifest never references; [[vacuum]] (run at the
  *     checkpoint/compaction cadence) removes orphans and superseded
  *     versions.
  *
  * The manifest lists each live file with its (Hive-escaped)
  * partition value, so a partition-pruned merge selects files without
  * listing directories. File counts stay bounded by compaction, so
  * the manifest itself stays small (one JSON line per live file).
  */
object TxnLog {

  val LogDirName = "_graft_log"

  /** Partition-directory column used inside commit dirs. The user's
    * partition column is DUPLICATED into it before `partitionBy`, so
    * data files keep the original column and manifest-listed files
    * can be read directly (no partition-discovery basePath games).
    */
  val PartDirCol = "__gp"

  /** One live data file. `partition` is the Hive-ESCAPED directory
    * fragment (`p%202`, `__HIVE_DEFAULT_PARTITION__`), matching
    * [[CdcSink.hivePartName]] output; None for unpartitioned tables.
    * `min`/`max` are the file's key-column range (the typed min/max,
    * canonically stringified — Delta-style per-file stats): a merge
    * prunes files whose range no batch key can hit. None when the
    * table has no stats-able key column, the file's keys are all
    * null, or the manifest predates stats — all read as "cannot
    * prune, always rewrite" (conservative, never wrong).
    */
  final case class Entry(
      path: String,
      partition: Option[String],
      min: Option[String] = None,
      max: Option[String] = None,
      rows: Option[Long] = None)

  final case class Manifest(version: Long, schemaJson: String, entries: Seq[Entry]) {
    def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  }

  /** Test-only failpoint: simulate a crash after data files are
    * written but before the manifest publish — the window the
    * protocol must make safe.
    */
  private[graft] var crashBeforeCommit: Boolean = false

  def logDir(tableDir: String): Path = new Path(tableDir, LogDirName)

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getName
    if (n.endsWith(".json")) n.stripSuffix(".json").toLongOption else None
  }

  /** Highest committed manifest, if the table has a log. */
  def current(fs: FileSystem, tableDir: String): Option[Manifest] = {
    val d = logDir(tableDir)
    if (!fs.exists(d)) None
    else {
      val versions = fs.listStatus(d).map(_.getPath)
        .flatMap(p => versionOf(p).map(_ -> p))
      if (versions.isEmpty) None
      else {
        val (v, p) = versions.maxBy(_._1)
        Some(readManifestFile(fs, p, v))
      }
    }
  }

  private def readManifestFile(fs: FileSystem, p: Path, v: Long): Manifest = {
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    parseManifest(v, txt)
  }

  /** All committed versions, ascending. */
  def versions(fs: FileSystem, tableDir: String): Seq[Long] = {
    val d = logDir(tableDir)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).map(_.getPath).flatMap(versionOf).sorted.toSeq
  }

  /** Manifest at a specific historical version (time travel), if it
    * is still retained. [[vacuum]] reclaims superseded manifests at
    * the compaction cadence, so the travel horizon = commits since
    * the last compaction — the same horizon the reference's
    * checkpoint-every-10-commits delta log keeps cheap to reach.
    */
  def manifestAt(fs: FileSystem, tableDir: String, version: Long): Option[Manifest] = {
    val p = new Path(logDir(tableDir), f"$version%020d.json")
    if (!fs.exists(p)) None else Some(readManifestFile(fs, p, version))
  }

  /** Read the table AS OF `version`. Throws if the version was never
    * committed or has been vacuumed — time travel must not silently
    * fall back to a different state of the data.
    */
  def readVersion(spark: SparkSession, tableDir: String, version: Long): DataFrame = {
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    manifestAt(fs, tableDir, version) match {
      case None =>
        throw new IllegalArgumentException(
          s"txnlog: version $version of $tableDir is not readable " +
            s"(never committed, or vacuumed; retained: ${versions(fs, tableDir).mkString(",")})")
      case Some(m) if m.entries.isEmpty =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], m.schema)
      case Some(m) =>
        readEntries(spark, tableDir, m.entries)
    }
  }

  private def parseManifest(version: Long, txt: String): Manifest = {
    val j = JsonMethods.parse(txt)
    implicit val fmt: Formats = DefaultFormats
    val schema = (j \ "schema").extract[String]
    val entries = (j \ "files") match {
      case JArray(items) => items.map { it =>
        Entry((it \ "path").extract[String], (it \ "part").extractOpt[String],
          (it \ "min").extractOpt[String], (it \ "max").extractOpt[String],
          (it \ "rows").extractOpt[Long])
      }
      case _ => Nil
    }
    Manifest(version, schema, entries)
  }

  /** Atomically publish `entries` as `version`. Throws if that
    * version already exists (concurrent writer lost the race).
    */
  def commit(
      fs: FileSystem,
      tableDir: String,
      version: Long,
      schema: StructType,
      entries: Seq[Entry]): Unit = {
    if (crashBeforeCommit)
      throw new RuntimeException("txnlog: injected crash before manifest publish")
    val prev = current(fs, tableDir)
    val d = logDir(tableDir)
    fs.mkdirs(d)
    val json = JObject(
      "version" -> JInt(BigInt(version)),
      "schema" -> JString(schema.json),
      "files" -> JArray(entries.toList.map { e =>
        val base = List(
          "path" -> JString(e.path),
          "part" -> e.partition.map(JString.apply).getOrElse(JNull))
        val stats =
          e.min.map(v => "min" -> JString(v)).toList :::
          e.max.map(v => "max" -> JString(v)).toList :::
          e.rows.map(n => "rows" -> JInt(BigInt(n))).toList
        JObject(base ::: stats)
      }))
    val tmp = new Path(d, s".tmp-${UUID.randomUUID().toString.take(12)}")
    val out = fs.create(tmp, false)
    try out.write(JsonMethods.compact(JsonMethods.render(json)).getBytes("UTF-8"))
    finally out.close()
    val target = new Path(d, f"$version%020d.json")
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"txnlog: version $version already committed under $d")
    }
    // mirror the published commit into a public-spec Delta log so
    // the table doubles as a real Delta table (see [[DeltaLog]]).
    // The graft manifest above IS durable at this point: a mirror
    // failure must not report the commit as failed — warn instead;
    // the next commit's mirror backfills the gap (self-healing).
    try DeltaLog.mirrorCommit(fs, tableDir, version, schema, entries, prev)
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[graft] WARN delta mirror for version $version failed " +
            s"(${e.getMessage}); the next commit backfills the gap")
    }
  }

  /** Size target for commit/compaction output files, in records.
    * Bounds BOTH file size and write-task runtime: a partition value
    * holding n records writes through ceil(n/target) tasks/files, so
    * a skew-hot value at 100 TB parallelizes instead of serializing
    * into one giant single-task file.
    */
  val TargetRecordsPerFile: Long = 2L * 1000 * 1000

  /** Write `df` into a fresh commit directory for `version`; returns
    * the manifest entries (paths relative to the table dir). Nothing
    * is visible to readers until [[commit]] publishes them.
    */
  def writeCommitDir(
      df: DataFrame,
      tableDir: String,
      partitionCol: Option[String],
      version: Long,
      targetRecordsPerFile: Long = TargetRecordsPerFile,
      subSplitHotPartitions: Boolean = false,
      computeStats: Boolean = true): Seq[Entry] = {
    val spark = df.sparkSession
    val dirName = s"c-$version-${UUID.randomUUID().toString.take(8)}"
    val dest = new Path(tableDir, dirName)
    partitionCol match {
      case Some(p) if !subSplitHotPartitions =>
        // cluster rows by their target partition before the write:
        // otherwise every upstream task emits a file into every
        // partition dir it holds rows for (shuffle-width × partitions
        // small files per commit). One task per value is the right
        // cost for increment-sized merge commits; file SIZE is still
        // bounded (maxRecordsPerFile), and the periodic compaction
        // rewrite (subSplitHotPartitions=true) restores write
        // parallelism for any value that grew hot in the meantime.
        df.withColumn(PartDirCol, col(p))
          .repartition(col(PartDirCol))
          .write.option("maxRecordsPerFile", targetRecordsPerFile)
          .partitionBy(PartDirCol).parquet(dest.toString)
      case Some(p) =>
        // full-rewrite path (compaction): clustering by value ALONE
        // would serialize a skew-hot value into one write task, so
        // the rewrite runs at ceil(n/targetRecordsPerFile)-per-value
        // total width from an exact pre-count. When the key column is
        // orderable, the sub-split is a RANGE partition on
        // (partition value, key) + in-task sort: a hot value spreads
        // across tasks proportionally AND its files come out
        // key-disjoint, so merges prune files within the partition.
        // Unorderable/absent keys fall back to deterministic
        // hash-salt buckets. The input is persisted across the
        // count+write double pass.
        import org.apache.spark.sql.functions.{
          broadcast, ceil, coalesce, count, greatest, hash, lit, pmod, sum}
        val base = df.withColumn(PartDirCol, col(p)).persist()
        var splits: DataFrame = null
        try {
          splits = base.groupBy(col(PartDirCol).as("_pv"))
            .agg(count(lit(1)).as("_n"))
            .select(col("_pv"),
              greatest(lit(1L), ceil(col("_n") / lit(targetRecordsPerFile)))
                .cast("int").as("_nsplit"))
            .persist()
          val totalSplits = math.max(1L, splits
            .agg(coalesce(sum(col("_nsplit")), lit(0L))).head.getLong(0)).toInt
          val rangeKey = df.schema.fields
            .find(f => f.name == StatsKeyCol && statsSupported(f.dataType))
          val clustered = rangeKey match {
            case Some(_) =>
              base.repartitionByRange(
                  totalSplits, col(PartDirCol), col(StatsKeyCol))
                .sortWithinPartitions(PartDirCol, StatsKeyCol)
            case None =>
              // salt from the hashable columns only — Spark's hash()
              // rejects MapType; a row set that is ALL maps still
              // splits (monotonically_increasing_id is
              // partition-local, no shuffle, and determinism of file
              // ASSIGNMENT is not a correctness property)
              def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean =
                dt match {
                  case _: org.apache.spark.sql.types.MapType => true
                  case a: org.apache.spark.sql.types.ArrayType =>
                    hasMap(a.elementType)
                  case s: StructType => s.fields.exists(f => hasMap(f.dataType))
                  case _ => false
                }
              val hashable = df.schema.fields
                .filterNot(f => hasMap(f.dataType)).map(f => col(f.name))
              val saltSrc =
                if (hashable.nonEmpty) hash(hashable: _*)
                else org.apache.spark.sql.functions
                  .monotonically_increasing_id()
              base.join(broadcast(splits), base(PartDirCol) <=> col("_pv"), "left")
                .withColumn("_salt",
                  pmod(saltSrc, coalesce(col("_nsplit"), lit(1))))
                .repartition(totalSplits, col(PartDirCol), col("_salt"))
                .drop("_pv", "_nsplit", "_salt")
          }
          clustered.write
            // belt for range-sampling imbalance / hash-bucket
            // collisions into one task: the file itself still splits
            // at the record target
            .option("maxRecordsPerFile", targetRecordsPerFile)
            .partitionBy(PartDirCol).parquet(dest.toString)
        } finally {
          // both caches release on the failure path too — a persisted
          // broadcast frame leaked past a failed write lingers for
          // the session
          if (splits != null) splits.unpersist()
          base.unpersist()
        }
      case None =>
        df.write.option("maxRecordsPerFile", targetRecordsPerFile)
          .parquet(dest.toString)
    }
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = listParquet(fs, dest)
    // Per-file key-range stats (partitioned tables prune first on the
    // partition value, then on these within touched partitions). One
    // extra single-column scan of the just-written, page-cache-hot
    // commit dir — O(new data), never O(table). Callers writing
    // increment-sized commits pass computeStats=false: the files
    // worth protecting from rewrites are the BIG ones (bootstrap
    // loads, compaction output); an increment file is cheap to
    // rewrite and gets stats at the next compaction anyway, so a
    // merge doesn't pay a stats job per micro-batch.
    val keyType = df.schema.fields
      .find(f => f.name == StatsKeyCol && statsSupported(f.dataType))
      .map(_.dataType)
    val stats: Map[(Option[String], String), (Option[String], Option[String], Long)] =
      if (computeStats && files.nonEmpty && keyType.isDefined) {
        // fast path: read the just-written parquet FOOTERS on the
        // driver (no Spark job; ~ms per file) for the common key
        // types whose footer statistics decode to the exact canonical
        // string form; a big commit (many files) or another key type
        // takes the distributed single-column scan instead
        if (files.length <= FooterStatsMaxFiles &&
            footerStatsDecodable(keyType.get))
          fileKeyStatsFromFooters(spark, tableDir, files, keyType.get)
        else fileKeyStats(spark, dest, keyType.get)
      } else Map.empty
    files.map { f =>
      val rel = relativize(new Path(tableDir), f)
      val part = rel.split('/')
        .find(_.startsWith(PartDirCol + "="))
        .map(_.substring(PartDirCol.length + 1))
      stats.get((part, f.getName)) match {
        case Some((lo, hi, n)) => Entry(rel, part, lo, hi, Some(n))
        case None => Entry(rel, part)
      }
    }
  }

  /** Key column per-file range stats are computed over — the same
    * column [[CdcApply.snapshot]] folds last-writer-wins by.
    */
  val StatsKeyCol = "key"

  /** Types whose typed min/max survive the canonical stat encoding
    * ([[statExpr]]) round trip, so a stored stat compares correctly
    * after decoding back to the key type at prune time.
    * Unorderable/lossy types get no stats (their files are simply
    * never pruned).
    */
  private[cdc] def statsSupported(dt: DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.StringType => true
    case _: org.apache.spark.sql.types.ByteType => true
    case _: org.apache.spark.sql.types.ShortType => true
    case _: org.apache.spark.sql.types.IntegerType => true
    case _: org.apache.spark.sql.types.LongType => true
    case _: org.apache.spark.sql.types.FloatType => true
    case _: org.apache.spark.sql.types.DoubleType => true
    case _: org.apache.spark.sql.types.DecimalType => true
    case _: org.apache.spark.sql.types.DateType => true
    case _: org.apache.spark.sql.types.TimestampType => true
    case _: org.apache.spark.sql.types.BooleanType => true
    case _ => false
  }

  /** Canonical stat encoding of a key value as a string — the form
    * [[Entry.min]]/[[Entry.max]] store and [[compareStat]] orders.
    * Timestamps and dates encode as UTC epoch micros/days (plain
    * decimal integers): timezone-independent and order-preserving,
    * where a session-timezone rendering misorders across a DST
    * fall-back transition and breaks when stats written under one
    * session timezone are compared against bounds rendered under
    * another. Every other supported type keeps Spark's
    * cast-to-string. Producers ([[fileKeyStats]], the merge's batch
    * bounds agg) and decoders ([[statDecode]]) must stay in lockstep
    * with this — CompareStatSpec pins encode→compare agreement with
    * Spark's own ordering per type.
    */
  private[cdc] def statExpr(dt: DataType, c: Column): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampType =>
        org.apache.spark.sql.functions.unix_micros(c).cast("string")
      case DateType =>
        org.apache.spark.sql.functions.unix_date(c).cast("string")
      case _ => c.cast("string")
    }
  }

  /** Inverse of [[statExpr]]: decode a canonical stat string column
    * back to the key's type for typed row-level comparison (refine
    * joins, [[graft.cdc.CdcSink.readRange]] filters).
    */
  private[cdc] def statDecode(dt: DataType, c: Column): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampType =>
        org.apache.spark.sql.functions.timestamp_micros(c.cast("long"))
      case DateType =>
        org.apache.spark.sql.functions.date_from_unix_date(c.cast("int"))
      case _ => c.cast(dt)
    }
  }

  /** Driver-side typed comparison of two stored stat strings under
    * the key's data type — negative/zero/positive like compareTo;
    * None when the pair can't be ordered safely (NaN/Infinity floats,
    * parse failure), which callers must treat as "don't prune".
    * Exists so a merge's range pre-check costs ZERO Spark jobs.
    * Date/timestamp stats are epoch numbers ([[statExpr]]) and
    * compare numerically; a LEGACY manifest's ISO-rendered stat fails
    * the numeric parse → None → the file stays un-pruned (sound).
    */
  private[cdc] def compareStat(dt: DataType, a: String, b: String): Option[Int] = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | _: DecimalType |
           DateType | TimestampType =>
        try Some(BigDecimal(a).compare(BigDecimal(b)))
        catch { case _: NumberFormatException => None }
      case StringType =>
        // Spark orders strings by UTF-8 bytes (code-point order); a
        // java compareTo (UTF-16 code units) would misorder
        // supplementary characters and prune wrongly
        val (ba, bb) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
        val n = math.min(ba.length, bb.length)
        var i = 0
        while (i < n) {
          val d = (ba(i) & 0xff) - (bb(i) & 0xff)
          if (d != 0) return Some(d)
          i += 1
        }
        Some(ba.length - bb.length)
      case BooleanType =>
        // "false" < "true" matches boolean ordering
        Some(a.compareTo(b))
      case _ => None
    }
  }

  /** Above this many files a commit's stats come from the distributed
    * scan — driver-serial footer reads would add latency instead of
    * removing a job.
    */
  private val FooterStatsMaxFiles = 512

  /** Key types whose parquet footer statistics decode to EXACTLY the
    * canonical string form the scan path produces (UTF-8 binary →
    * String; int32/int64 → toString). Other supported types (double,
    * decimal, date, timestamp) have representational gaps between
    * footer values and Spark's cast-to-string, so they keep the scan.
    */
  private def footerStatsDecodable(dt: DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.StringType => true
    case _: org.apache.spark.sql.types.IntegerType => true
    case _: org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** Per-file stats straight from the parquet footers, driver-side —
    * zero Spark jobs. Statistics missing or unreliable for a file
    * (huge values dropped by the writer, no non-null values) degrade
    * to a row-count-only entry, exactly like the scan path's all-null
    * files. Footer min/max are whole-value (column chunk statistics
    * are not truncated by parquet-mr; only column INDEXES truncate),
    * so the decoded strings match the scan path byte-for-byte —
    * CdcPruneSpec's "footer-derived stats equal an independent scan"
    * test pins the equivalence.
    */
  private def fileKeyStatsFromFooters(
      spark: SparkSession,
      tableDir: String,
      files: Seq[Path],
      keyType: DataType): Map[(Option[String], String), (Option[String], Option[String], Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    // footer opens are independent ms-scale IO: batch them through a
    // bounded pool instead of one-at-a-time (a 512-file commit's
    // stats pass drops from ~0.5 s serial to the slowest stripe)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, files.length)))
    val futs =
      try files.map(f => pool.submit(
        new java.util.concurrent.Callable[((Option[String], String), (Option[String], Option[String], Long))] {
          def call() = footerStatOne(tableDir, f, conf, keyType)
        }))
      finally pool.shutdown()
    futs.map { f =>
      try f.get()
      catch { // surface the worker's own failure, not the pool wrapper
        case e: java.util.concurrent.ExecutionException => throw e.getCause
      }
    }.toMap
  }

  private def footerStatOne(
      tableDir: String,
      f: Path,
      conf: org.apache.hadoop.conf.Configuration,
      keyType: DataType): ((Option[String], String), (Option[String], Option[String], Long)) = {
    import scala.jdk.CollectionConverters._
    {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      val (rows, range) =
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          val rows = blocks.map(_.getRowCount).sum
          val perBlock = blocks.flatMap { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == StatsKeyCol)
              .map(_.getStatistics)
          }
          val usable = perBlock.size == blocks.size &&
            perBlock.forall(s => s != null && !s.isEmpty && s.hasNonNullValue)
          def decode(v: Any): String = v match {
            case b: org.apache.parquet.io.api.Binary =>
              new String(b.getBytes, java.nio.charset.StandardCharsets.UTF_8)
            case other => String.valueOf(other)
          }
          val range =
            if (!usable || perBlock.isEmpty) None
            else {
              val mins = perBlock.map(s => decode(s.genericGetMin))
              val maxs = perBlock.map(s => decode(s.genericGetMax))
              // reduce across blocks with the TYPED comparator — a
              // string min-reduce would misorder numeric blocks
              def pick(vs: Seq[String], wantMin: Boolean): Option[String] =
                vs.map(Option(_)).reduceLeft { (ao, bo) =>
                  for { a <- ao; b <- bo; c <- compareStat(keyType, a, b) }
                    yield if ((c <= 0) == wantMin) a else b
                  // an uncomparable pair dissolves to None → no stats
                }
              for { lo <- pick(mins, wantMin = true)
                    hi <- pick(maxs, wantMin = false) } yield (lo, hi)
            }
          (rows, range)
        } finally reader.close()
      val rel = relativize(new Path(tableDir), f)
      val part = rel.split('/')
        .find(_.startsWith(PartDirCol + "="))
        .map(_.substring(PartDirCol.length + 1))
      (part, f.getName) -> (range.map(_._1), range.map(_._2), rows)
    }
  }

  /** Typed per-file min/max of [[StatsKeyCol]] plus the row count
    * under a commit dir, keyed by (partition dir fragment, file name)
    * — unique within one commit: a task reuses its part-NNNNN name
    * across partition subdirs but never within one. The scan-side
    * path is URI-decoded back to the ON-DISK (Hive-escaped) fragment
    * so it joins against what [[writeCommitDir]]'s listing saw; a
    * fragment that fails to decode just loses its stats (never
    * pruned). Files whose keys are all null keep the row count but no
    * range.
    */
  private def fileKeyStats(
      spark: SparkSession,
      dest: Path,
      keyType: DataType): Map[(Option[String], String), (Option[String], Option[String], Long)] = {
    import org.apache.spark.sql.functions.{
      count, input_file_name, lit, max => fmax, min => fmin}
    spark.read.parquet(dest.toString)
      .groupBy(input_file_name().as("_f"))
      .agg(statExpr(keyType, fmin(col(StatsKeyCol))).as("_min"),
        statExpr(keyType, fmax(col(StatsKeyCol))).as("_max"),
        count(lit(1L)).as("_n"))
      .collect()
      .map { r =>
        val raw = r.getString(0)
        val path =
          try new java.net.URI(raw).getPath
          catch { case _: java.net.URISyntaxException => raw }
        val segs = path.split('/')
        val part = segs.takeRight(2).headOption
          .filter(_.startsWith(PartDirCol + "="))
          .map(_.substring(PartDirCol.length + 1))
        (part, segs.last) -> (
          if (r.isNullAt(1)) None else Some(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getString(2)),
          r.getLong(3))
      }
      .toMap
  }

  private def listParquet(fs: FileSystem, dir: Path): Seq[Path] = {
    val out = Seq.newBuilder[Path]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) out += f.getPath
    }
    out.result()
  }

  private def relativize(base: Path, p: Path): String = {
    val b = base.toUri.getPath.stripSuffix("/")
    val s = p.toUri.getPath
    require(s.startsWith(b + "/"), s"$p not under $base")
    s.substring(b.length + 1)
  }

  /** Read the table at its current version. Falls back to a plain
    * (mergeSchema) directory read for pre-log directories; an empty
    * manifest yields an empty frame with the committed schema.
    */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    current(fs, tableDir) match {
      case None =>
        spark.read.option("mergeSchema", "true").parquet(tableDir)
      case Some(m) if m.entries.isEmpty =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], m.schema)
      case Some(m) =>
        readEntries(spark, tableDir, m.entries)
    }
  }

  /** Read a subset of manifest entries (partition-pruned merges). */
  def readEntries(spark: SparkSession, tableDir: String, entries: Seq[Entry]): DataFrame = {
    val paths = entries.map(e => new Path(tableDir, e.path).toString)
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
      .drop(PartDirCol) // defensive: never surface the dir column
  }

  /** Remove commit directories the current manifest does not
    * reference (crashed commits, superseded versions) and manifests
    * older than current. Run at the compaction cadence — deferring
    * it keeps just-superseded files alive for in-flight readers.
    */
  def vacuum(fs: FileSystem, tableDir: String): Unit =
    current(fs, tableDir).foreach { m =>
      val live: Set[String] = m.entries.map(_.path.split('/').head).toSet
      fs.listStatus(new Path(tableDir)).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("c-") && !live.contains(n))
          fs.delete(st.getPath, true)
      }
      fs.listStatus(logDir(tableDir)).map(_.getPath).foreach { p =>
        if (versionOf(p).exists(_ < m.version) || p.getName.startsWith(".tmp-"))
          fs.delete(p, false)
      }
    }
}
