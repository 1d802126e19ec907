package graft.cdc

import java.util.UUID
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Delta-protocol mirror of the [[TxnLog]] manifest stream: every
  * graft commit also appends a `_delta_log/<version>.json` of
  * public-spec Delta actions (protocol / metaData / add / remove /
  * commitInfo), with a full-state `<version>.checkpoint.parquet` +
  * `_last_checkpoint` every 10 commits — the reference sink's
  * checkpoint cadence (rust-cdc `src/delta/writer.rs:56-220`,
  * `src/delta/mod.rs:262-285`). The snapshot store thereby IS a
  * Delta table any delta reader can open: version 0 carries
  * protocol(1,2) + metaData, data files are plain parquet holding
  * every user column (partitionColumns=[] — graft's physical layout
  * duplicates the partition column INTO the files, so foreign
  * readers need no partition decoding), and the live-file set at
  * each version replays exactly to the graft manifest.
  *
  * The DuckDB delta extension is not installable in this offline
  * sandbox, so cross-engine reads are validated structurally
  * instead: DeltaLogSpec replays the action log with an independent
  * reader implementing the public protocol (JSON actions +
  * checkpoint parquet + _last_checkpoint discovery) and asserts the
  * reconstruction matches [[TxnLog.read]] at every version.
  */
object DeltaLog {

  val LogDirName = "_delta_log"
  val CheckpointEvery = 10

  /** Partitioned reads union one scan per distinct partition-value
    * combination up to this many (simple plan, per-branch pruning);
    * beyond it they switch to ONE scan joined against a broadcast
    * file→partition-values map, keeping the plan O(1) in partition
    * count. Callers that need the other plan (DeltaLogSpec forces
    * the join path on a small fixture) pass their own threshold to
    * [[read]]/[[readVersion]] — no mutable global.
    */
  val UnionComboMax = 64

  // Delta action paths are RFC 2396 percent-encoded URIs relative to
  // the table root (the protocol's `path` spec): encode when WRITING
  // actions, decode only when RESOLVING to the filesystem — the
  // log-space strings stay encoded so add/remove set operations match
  // exactly. Simple names (alnum, '=', '-') are fixpoints of both.
  private[graft] def encodePath(p: String): String =
    new java.net.URI(null, null, p, null).toASCIIString

  /** A log path is ABSOLUTE (externally-located file, spec-allowed:
    * s3://…, hdfs://…, file:/…) only when it is a scheme-qualified
    * URI whose scheme-specific part starts with '/'. Scheme presence
    * alone is NOT enough: a relative filename whose first segment
    * contains a colon ('a:b.parquet' — legal on posix filesystems,
    * and exactly what Java's URI constructor emits un-guarded, so a
    * foreign writer can log it raw) parses as an opaque URI with
    * scheme 'a' and must stay relative.
    */
  private[graft] def isAbsoluteUri(p: String): Boolean =
    try {
      val u = new java.net.URI(p)
      u.getScheme != null && {
        val ssp = u.getRawSchemeSpecificPart
        ssp != null && ssp.startsWith("/")
      }
    } catch { case _: java.net.URISyntaxException => false }

  private[graft] def decodePath(p: String): String =
    if (isAbsoluteUri(p))
      try Option(new java.net.URI(p).getPath).getOrElse(p)
      catch { case _: java.net.URISyntaxException => p }
    else
      // './' guard makes a colon-bearing first segment parse as a
      // PATH rather than a scheme; strip any './' prefixes after so
      // 'a:b.parquet', './a:b.parquet' and 'a%3Ab.parquet' all
      // normalize to the same key
      try {
        var r = new java.net.URI("./" + p).getPath
        while (r.startsWith("./")) r = r.substring(2)
        r
      } catch { case _: java.net.URISyntaxException => p }

  /** Canonical live-set key for an action path: absolute-URI paths
    * keep their full form; relative paths are percent-DECODED so the
    * raw paths a pre-encoding writer logged and the encoded form the
    * current writer logs collide onto the same key — a remove always
    * cancels its add regardless of which era wrote which.
    */
  private[graft] def normPath(p: String): String =
    if (isAbsoluteUri(p)) p else decodePath(p)

  /** Filesystem location of a normalized live-set key. Relative keys
    * join through the scheme/authority/path constructor, NOT
    * Path(parent, child) — Hadoop's child parse would re-introduce
    * the colon-as-scheme ambiguity isAbsoluteUri just resolved.
    */
  private def resolvePath(tableDir: String, key: String): Path =
    if (isAbsoluteUri(key)) new Path(new java.net.URI(key))
    else {
      val u = new Path(tableDir).toUri
      val base = if (u.getPath.endsWith("/")) u.getPath else u.getPath + "/"
      new Path(u.getScheme, u.getAuthority, base + key)
    }

  def logDir(tableDir: String): Path = new Path(tableDir, LogDirName)

  /** Stable table id: derived from the table path so re-opens of the
    * same table agree without any side-channel state.
    */
  private def tableId(tableDir: String): String =
    UUID.nameUUIDFromBytes(
      ("graft:" + new Path(tableDir).toUri.getPath).getBytes("UTF-8")).toString

  private def protocolJson: JObject =
    JObject("protocol" -> JObject(
      "minReaderVersion" -> JInt(1), "minWriterVersion" -> JInt(2)))

  private def metaDataJson(tableDir: String, schema: StructType): JObject =
    JObject("metaData" -> JObject(
      "id" -> JString(tableId(tableDir)),
      "format" -> JObject(
        "provider" -> JString("parquet"),
        "options" -> JObject()),
      "schemaString" -> JString(schema.json),
      "partitionColumns" -> JArray(Nil),
      "configuration" -> JObject(),
      "createdTime" -> JInt(BigInt(0))))

  private def writeAtomic(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(target.getParent,
      s".tmp-${UUID.randomUUID().toString.take(12)}")
    val out = fs.create(tmp, false)
    try out.write(bytes) finally out.close()
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      // the graft manifest publish already serialized writers; a
      // pre-existing delta json for this version means a previous
      // crashed attempt got as far as the mirror — it is identical
      // in content, so losing the rename race is benign
    }
  }

  /** Mirror one published graft commit into the delta log.
    * `prev` is the superseded manifest (None for the first commit).
    *
    * Self-healing: the mirror write happens AFTER the graft manifest
    * publish, so a crash in between leaves the delta log one (or
    * more) versions behind — a gap that would make every contiguous
    * replay throw forever. When this call finds missing versions
    * below `version` it backfills each as an empty (commitInfo-only)
    * commit and computes this version's add/remove diff against the
    * delta log's own replayed live set instead of the graft `prev`
    * manifest, so the mirrored state re-converges exactly at
    * `version` (backfilled versions read as the pre-gap state — the
    * honest answer for commits whose mirror was lost).
    */
  def mirrorCommit(
      fs: FileSystem,
      tableDir: String,
      version: Long,
      schema: StructType,
      entries: Seq[TxnLog.Entry],
      prev: Option[TxnLog.Manifest]): Unit = {
    val d = logDir(tableDir)
    fs.mkdirs(d)
    // delta needs a version-0 protocol+metaData commit; graft
    // versions start at 1, so the first mirror lays down 0 first
    val v0Path = new Path(d, f"${0L}%020d.json")
    if (!fs.exists(v0Path)) {
      val v0 = Seq(protocolJson, metaDataJson(tableDir, schema))
        .map(j => JsonMethods.compact(JsonMethods.render(j)))
        .mkString("", "\n", "\n")
      writeAtomic(fs, v0Path, v0.getBytes("UTF-8"))
    }
    // fast no-gap probe keeps the hot commit path O(1): a full
    // directory listing only happens when version-1's json is absent
    val holes: Seq[Long] =
      if (version == 1 || fs.exists(new Path(d, f"${version - 1}%020d.json"))) Nil
      else {
        val existing = jsonVersions(fs, tableDir)
        val mirroredMax = if (existing.isEmpty) 0L else existing.max
        (mirroredMax + 1) until version
      }
    val (prevPaths: Seq[String], schemaChanged: Boolean) =
      if (holes.isEmpty)
        (prev.map(_.entries.map(_.path)).getOrElse(Nil),
          prev.exists(_.schemaJson != schema.json))
      else {
        // crash window: backfill, then diff against what the delta
        // log actually replays to (normalized back to manifest
        // space) — INCLUDING the schema: a metaData action lost in
        // the gap must be re-emitted even when the graft prev
        // manifest already carries the new schema, or every later
        // read applies the stale schemaString forever
        holes.foreach { u =>
          val body = JsonMethods.compact(JsonMethods.render(JObject(
            "commitInfo" -> JObject(
              "operation" -> JString("WRITE"),
              "engineInfo" -> JString("graft-txnlog"),
              "backfill" -> JBool(true))))) + "\n"
          writeAtomic(fs, new Path(d, f"$u%020d.json"), body.getBytes("UTF-8"))
        }
        // after the backfill every version below `version` exists
        val replayed = (0L until version).foldLeft(LogState.empty) { (s, v) =>
          applyActions(s, parseActions(fs, new Path(d, f"$v%020d.json")))
        }
        (replayed.live.keys.toSeq, replayed.schemaJson != schema.json)
      }
    val newPaths = entries.map(_.path)
    val removed = prevPaths.filterNot(newPaths.toSet)
    val prevSet = prevPaths.toSet
    val added = entries.filterNot(e => prevSet(e.path))
    val actions = Seq.newBuilder[JObject]
    actions += JObject("commitInfo" -> JObject(
      "operation" -> JString("WRITE"),
      "engineInfo" -> JString("graft-txnlog")))
    if (schemaChanged) actions += metaDataJson(tableDir, schema)
    removed.foreach { p =>
      actions += JObject("remove" -> JObject(
        "path" -> JString(encodePath(p)),
        "deletionTimestamp" -> JInt(BigInt(System.currentTimeMillis())),
        "dataChange" -> JBool(true)))
    }
    added.foreach { e =>
      val st = fs.getFileStatus(new Path(tableDir, e.path))
      val base = List(
        "path" -> JString(encodePath(e.path)),
        "partitionValues" -> JObject(),
        "size" -> JInt(BigInt(st.getLen)),
        "modificationTime" -> JInt(BigInt(st.getModificationTime)),
        "dataChange" -> JBool(true))
      // per-file stats in the public format (a JSON string on the add
      // action): foreign engines' data skipping works on graft tables
      val stats = statsJson(e, schema).map(s => "stats" -> JString(s)).toList
      actions += JObject("add" -> JObject(base ::: stats))
    }
    val body = actions.result()
      .map(j => JsonMethods.compact(JsonMethods.render(j)))
      .mkString("", "\n", "\n")
    writeAtomic(fs, new Path(d, f"$version%020d.json"), body.getBytes("UTF-8"))
    if (version % CheckpointEvery == 0)
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
        .foreach(writeCheckpoint(_, fs, tableDir, version, schema, entries))
  }

  /** The Delta `stats` string for a manifest entry: numRecords plus
    * the key column's min/max rendered at its schema type (numbers as
    * JSON numbers, booleans as booleans, everything else — string,
    * date, timestamp, decimal — as strings, matching how Delta
    * writers serialize those types in stats). Graft's internal
    * canonical stat form stores timestamps/dates as UTC epoch
    * micros/days; those decode back to the ISO-8601 strings the Delta
    * spec expects (a legacy ISO-rendered stat passes through as-is).
    * NaN/Infinity float stats are OMITTED — json4s would render the
    * bare token `NaN`, invalid JSON that breaks foreign readers, and
    * Spark's max() ordering treats NaN as largest so the value is
    * useless for skipping anyway. None when the entry predates stats
    * or the table has no key-range stats.
    */
  private def statsJson(e: TxnLog.Entry, schema: StructType): Option[String] =
    e.rows.map { n =>
      import org.apache.spark.sql.types._
      def typed(v: String): Option[JValue] =
        schema.fields.find(_.name == TxnLog.StatsKeyCol).map(_.dataType) match {
          case Some(ByteType | ShortType | IntegerType | LongType) =>
            Some(JInt(BigInt(v)))
          case Some(FloatType | DoubleType) =>
            val d = v.toDouble
            if (java.lang.Double.isFinite(d)) Some(JDouble(d)) else None
          case Some(BooleanType) => Some(JBool(v.toBoolean))
          case Some(TimestampType) => Some(JString(
            try java.time.Instant.EPOCH
              .plus(v.toLong, java.time.temporal.ChronoUnit.MICROS).toString
            catch { case _: NumberFormatException => v }))
          case Some(DateType) => Some(JString(
            try java.time.LocalDate.ofEpochDay(v.toLong).toString
            catch { case _: NumberFormatException => v }))
          case _ => Some(JString(v))
        }
      val fields = List("numRecords" -> (JInt(BigInt(n)): JValue)) :::
        e.min.flatMap(typed).map(tv => "minValues" ->
          (JObject(TxnLog.StatsKeyCol -> tv): JValue)).toList :::
        e.max.flatMap(typed).map(tv => "maxValues" ->
          (JObject(TxnLog.StatsKeyCol -> tv): JValue)).toList
      JsonMethods.compact(JsonMethods.render(JObject(fields)))
    }

  // ---- reader: open a Delta table via the public protocol ----------

  /** Per-file partition values: column → Some(string value) | None
    * (a JSON-null / absent value means a NULL partition value per the
    * spec). graft-written tables always carry an empty map — their
    * files hold every column physically.
    */
  private final case class LogState(
      schemaJson: String,
      partitionCols: Seq[String],
      live: Map[String, Map[String, Option[String]]])

  private object LogState {
    val empty: LogState = LogState("", Nil, Map.empty)
  }

  private def parseActions(fs: FileSystem, p: Path): Seq[JValue] = {
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.split('\n').filter(_.nonEmpty).toSeq.map(JsonMethods.parse(_))
  }

  private def partValues(jv: JValue): Map[String, Option[String]] = jv match {
    case JObject(fields) => fields.map {
      case (k, JString(v)) => k -> Some(v)
      case (k, _) => k -> None
    }.toMap
    case _ => Map.empty
  }

  private def applyActions(st: LogState, actions: Seq[JValue]): LogState = {
    implicit val fmt: Formats = DefaultFormats
    actions.foldLeft(st) { (s, a) =>
      (a \ "metaData") match {
        case JNothing => (a \ "add") match {
          case JNothing => (a \ "remove") match {
            case JNothing => s
            case r => s.copy(live = s.live - normPath((r \ "path").extract[String]))
          }
          case ad => s.copy(live = s.live +
            (normPath((ad \ "path").extract[String]) ->
              partValues(ad \ "partitionValues")))
        }
        case md =>
          val parts = (md \ "partitionColumns") match {
            case JArray(items) => items.collect { case JString(c) => c }
            case _ => Nil
          }
          s.copy(schemaJson = (md \ "schemaString").extract[String],
            partitionCols = parts)
      }
    }
  }

  private def jsonVersions(fs: FileSystem, tableDir: String): Seq[Long] = {
    val d = logDir(tableDir)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .flatMap(_.stripSuffix(".json").toLongOption).sorted.toSeq
  }

  /** Protocol-standard discovery state at the latest version:
    * `_last_checkpoint` hint → checkpoint parquet → trailing JSON
    * commits. Falls back to a full JSON replay when no checkpoint
    * exists. Works on any parquet-backed Delta table, graft-written
    * or foreign, including foreign PARTITIONED tables (partition
    * columns materialized from each add action's partitionValues).
    */
  private def currentState(
      spark: SparkSession, fs: FileSystem, tableDir: String): (Long, LogState) = {
    val d = logDir(tableDir)
    val versions = jsonVersions(fs, tableDir)
    require(versions.nonEmpty, s"delta read: no _delta_log under $tableDir")
    val latest = versions.max
    implicit val fmt: Formats = DefaultFormats
    val lastCkpt = new Path(d, "_last_checkpoint")
    // the hint is best-effort by spec: a torn/concurrently-rewritten
    // file, or a checkpoint format we do not read (v2/sidecar), must
    // degrade to the JSON replay, never fail the read
    val hint: Option[(Long, Option[Int])] =
      if (!fs.exists(lastCkpt)) None
      else try {
        val in = fs.open(lastCkpt)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val j = JsonMethods.parse(txt)
        Some(((j \ "version").extract[Long], (j \ "parts").extractOpt[Int]))
      } catch { case scala.util.control.NonFatal(_) => None }
    val ckFiles: Option[(Long, Seq[Path])] = hint.flatMap { case (v, parts) =>
      // classic single-file or multi-part checkpoint names (public
      // spec); a missing file → stale hint → fall back
      val files = parts match {
        case Some(n) => (1 to n).map(i =>
          new Path(d, f"$v%020d.checkpoint.$i%010d.$n%010d.parquet"))
        case None => Seq(new Path(d, f"$v%020d.checkpoint.parquet"))
      }
      if (files.forall(fs.exists)) Some(v -> files) else None
    }
    val (startV, startState): (Long, LogState) = ckFiles match {
      case None =>
        require(versions.min == 0L,
          s"delta read: log starts at version ${versions.min} with no " +
            "readable checkpoint — a log-cleaned table needs its checkpoint")
        (-1L, LogState.empty)
      case Some((v, files)) =>
        val ck = spark.read.parquet(files.map(_.toString): _*)
        val md = ck.filter(org.apache.spark.sql.functions.col("metaData").isNotNull)
          .select("metaData.schemaString", "metaData.partitionColumns").head
        val adds = ck.filter(org.apache.spark.sql.functions.col("add").isNotNull)
          .select("add.path", "add.partitionValues").collect()
          .map { r =>
            val pv = Option(r.getMap[String, String](1))
              .map(_.toMap.map { case (k, v2) => k -> Option(v2) })
              .getOrElse(Map.empty[String, Option[String]])
            normPath(r.getString(0)) -> pv
          }.toMap
        (v, LogState(md.getString(0), md.getSeq[String](1), adds))
    }
    val st = ((startV + 1) to latest).foldLeft(startState) { (s, v) =>
      applyActions(s, parseActions(fs, new Path(d, f"$v%020d.json")))
    }
    (latest, st)
  }

  /** Read a Delta table at its latest version through the PUBLIC
    * protocol (checkpoint + JSON actions), independent of graft's
    * own `_graft_log` manifests — the cross-engine read path.
    */
  def read(spark: SparkSession, tableDir: String,
      unionComboMax: Int = UnionComboMax): org.apache.spark.sql.DataFrame = {
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, st) = currentState(spark, fs, tableDir)
    stateFrame(spark, tableDir, st, unionComboMax)
  }

  /** Read AS OF `version` by replaying the JSON action log from 0 —
    * delta time travel over graft-written history.
    */
  def readVersion(spark: SparkSession, tableDir: String,
      version: Long,
      unionComboMax: Int = UnionComboMax): org.apache.spark.sql.DataFrame = {
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val d = logDir(tableDir)
    val st = (0L to version).foldLeft(LogState.empty) { (s, v) =>
      val p = new Path(d, f"$v%020d.json")
      require(fs.exists(p), s"delta read: version $v missing under $tableDir")
      applyActions(s, parseActions(fs, p))
    }
    stateFrame(spark, tableDir, st, unionComboMax)
  }

  private def stateFrame(spark: SparkSession, tableDir: String,
      st: LogState, unionComboMax: Int): org.apache.spark.sql.DataFrame = {
    require(st.schemaJson.nonEmpty, "delta read: no metaData action found")
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    def resolve(p: String): Path = resolvePath(tableDir, p)
    if (st.live.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else if (st.partitionCols.isEmpty)
      spark.read.schema(schema).parquet(
        st.live.keys.map(resolve(_).toString).toSeq: _*)
    else {
      // Foreign PARTITIONED table: data files physically hold the
      // schema minus the partition columns; each file's partition
      // values come from its add action.
      import org.apache.spark.sql.functions.{broadcast, col, input_file_name, lit}
      val physical = StructType(
        schema.fields.filterNot(f => st.partitionCols.contains(f.name)))
      val byCombo = st.live.toSeq
        .groupBy { case (_, pv) => st.partitionCols.map(pv.get(_).flatten) }
      if (byCombo.size <= unionComboMax) {
        // one scan per DISTINCT value tuple, partition columns
        // re-attached as typed literals — downstream filters on them
        // constant-fold per branch and unselected branches prune away
        val frames = byCombo.toSeq.map { case (combo, files) =>
          val base = spark.read.schema(physical).parquet(
            files.map { case (p, _) => resolve(p).toString }: _*)
          st.partitionCols.zip(combo).foldLeft(base) { case (df, (c, v)) =>
            val t = schema(c).dataType
            df.withColumn(c, v.map(lit(_).cast(t)).getOrElse(lit(null).cast(t)))
          }.select(schema.fieldNames.map(col): _*)
        }
        frames.reduce(_.unionByName(_))
      } else {
        // high-cardinality partitioning: a union-per-combo plan would
        // carry one parquet relation per partition — O(partitions)
        // analysis cost. Instead: ONE scan of every live file joined
        // against a broadcast (file → partition values) map, keyed by
        // the exact url-encoded path string input_file_name() reports
        // (SparkPath.fromPath of the qualified path — same encoding
        // Spark's scan sets per file).
        val fs = new Path(tableDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val mapRows = st.live.toSeq.map { case (p, pv) =>
          Row.fromSeq(
            org.apache.spark.paths.SparkPath
              .fromPath(fs.makeQualified(resolve(p))).urlEncoded +:
            st.partitionCols.map(c => pv.get(c).flatten.orNull))
        }
        val mapSchema = StructType(
          StructField("__file", StringType) +:
          st.partitionCols.map(c => StructField(s"__pv_$c", StringType)))
        val mapDf = spark.createDataFrame(
          spark.sparkContext.parallelize(mapRows, 1), mapSchema)
        // LEFT join + raise_error guard: a key mismatch between the
        // scan's reported file string and the precomputed SparkPath
        // form must fail loudly, not silently drop the file's rows
        val base = spark.read.schema(physical)
          .parquet(st.live.keys.map(resolve(_).toString).toSeq: _*)
          .withColumn("__file", input_file_name())
          .join(broadcast(mapDf.withColumn("__matched", lit(true))),
            Seq("__file"), "left")
          .filter(org.apache.spark.sql.functions.when(
            col("__matched").isNull,
            org.apache.spark.sql.functions.expr(
              "raise_error(concat('delta read: no partition mapping for ', __file))"))
            .otherwise(lit(true)))
        st.partitionCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(s"__pv_$c").cast(schema(c).dataType))
        }.select(schema.fieldNames.map(col): _*)
      }
    }
  }

  /** Checkpoint-file schema (public spec; txn carried as an always-
    * null column so readers that project it find it).
    */
  private val checkpointSchema: StructType = StructType(Seq(
    StructField("txn", StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType)))),
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType)))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType))))))

  private def writeCheckpoint(
      spark: SparkSession,
      fs: FileSystem,
      tableDir: String,
      version: Long,
      schema: StructType,
      entries: Seq[TxnLog.Entry]): Unit = {
    val emptyMap = Map.empty[String, String]
    val rows = Seq(
      Row(null, Row(1, 2), null, null, null),
      Row(null, null,
        Row(tableId(tableDir), Row("parquet", emptyMap), schema.json,
          Seq.empty[String], emptyMap, 0L),
        null, null)) ++
      entries.map { e =>
        val st = fs.getFileStatus(new Path(tableDir, e.path))
        Row(null, null, null,
          Row(encodePath(e.path), emptyMap, st.getLen, st.getModificationTime, false),
          null)
      }
    val d = logDir(tableDir)
    val tmpDir = new Path(d, s".ckpt-tmp-${UUID.randomUUID().toString.take(8)}")
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), checkpointSchema)
      .coalesce(1).write.parquet(tmpDir.toString)
    val part = fs.listStatus(tmpDir).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
    val target = new Path(d, f"$version%020d.checkpoint.parquet")
    part.foreach { p =>
      if (!fs.exists(target)) fs.rename(p, target)
    }
    fs.delete(tmpDir, true)
    val last = JsonMethods.compact(JsonMethods.render(JObject(
      "version" -> JInt(BigInt(version)),
      "size" -> JInt(BigInt(rows.size)))))
    // replace the hint via tmp + delete + rename: a reader in the
    // window sees either the old hint, no hint (→ full replay), or
    // the new hint — never a torn half-write (the hint parse also
    // tolerates garbage and falls back, belt and braces)
    val hintTmp = new Path(d, s".lc-tmp-${UUID.randomUUID().toString.take(8)}")
    val out = fs.create(hintTmp, false)
    try out.write(last.getBytes("UTF-8")) finally out.close()
    val hintTarget = new Path(d, "_last_checkpoint")
    fs.delete(hintTarget, false)
    if (!fs.rename(hintTmp, hintTarget)) fs.delete(hintTmp, false)
  }
}
