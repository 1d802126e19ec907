package graft.cdc

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming upsert — the live half of the reference's
  * ingest loop (rust-cdc `src/delta/mod.rs:124-155`
  * `IngestProcessor::process_record`: Add → buffer add, Update →
  * remove(before)+add(after), Delete → remove; flushed by
  * latency/batch triggers).
  *
  * Spark-first: `groupByKey(key).flatMapGroupsWithState` holds the
  * latest surviving row per key in the state store (the role of
  * `ValueBuffers`), emitting the post-batch value of every key the
  * batch touched — an upsert changelog a sink can merge. Spark's
  * checkpoint/state store replaces the reference's FILE/ROCKSDB
  * `LogCommitter` (src/snapshot/mod.rs): offsets and state are
  * persisted transactionally per micro-batch.
  *
  * At scale: state is partitioned by key hash across executors;
  * watermark-based timeout bounds state for keys that go quiet.
  */
object CdcStream {

  /** The events changelog as a file stream, handling BOTH testdata
    * layouts: the driver writes `<dir>/events.parquet` as a single
    * FILE (stream the parent dir with a leaf-name glob — a file path
    * cannot be a stream basePath), while scale-up dirs (GenScale)
    * write it as a DIRECTORY of part files — the production shape —
    * which streams directly. The old glob-only form silently read
    * ZERO rows from the directory layout (pathGlobFilter matches
    * leaf names, and the leaves there are part-*.parquet).
    */
  private[cdc] def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val rs = s.readStream.schema(Tables0.eventsStreamSchema(s, dir))
    // A not-yet-existing events.parquet (watching a landing dir before
    // the first producer write) falls through to the glob form, which
    // starts an empty stream that picks files up as they land —
    // probing with exists() rather than getFileStatus() (throws).
    if (fs.exists(p) && fs.getFileStatus(p).isDirectory) rs.parquet(p.toString)
    else rs.option("pathGlobFilter", "events.parquet").parquet(dir)
  }

  /** Drop memory-sink tables left by PREVIOUS invocations of the
    * same query (names are `<base>_<nanos>`). The memory sink
    * registers a temp view holding its full output on the driver
    * heap, and it is never dropped implicitly — a session running
    * repeated availableNow queries (a bench pass, a notebook, a
    * backfill loop) otherwise accumulates every prior run's sink
    * rows until GC pressure degrades unrelated work (measured: the
    * 95-query bench's steady passes ran 2.7× slower than cold before
    * this cleanup). Only views matching `<base>_<digits>` are
    * touched, and never one backing a still-ACTIVE query — two
    * concurrent runs with nanoTime-suffixed names must not drop each
    * other's live sink mid-stream.
    */
  private[graft] def dropStaleSinks(s: SparkSession, queryName: String): Unit = {
    val base = queryName.replaceAll("_\\d+$", "")
    val live = s.streams.active.flatMap(q => Option(q.name)).toSet
    s.catalog.listTables().collect()
      .filter(t => t.isTemporary && t.name != queryName && !live(t.name) &&
        t.name.matches(java.util.regex.Pattern.quote(base) + "_\\d+"))
      .foreach(t => s.catalog.dropTempView(t.name))
  }

  /** One canonical changelog row, typed for the state function. */
  final case class Change(
      key: String,
      op: String,
      offset: Long,
      ts: Timestamp,
      event_type: String,
      value: Double)

  /** Post-batch snapshot row emitted for every touched key.
    * `deleted = true` is a TOMBSTONE: without it, a sink that saw an
    * earlier upsert for the key (previous micro-batch) would keep the
    * stale row forever. The tombstone also stays in state so a
    * redelivered pre-delete change cannot resurrect the key; in a
    * long-running stream pair this with a watermark timeout to
    * eventually reap tombstone state.
    */
  final case class Upsert(
      key: String,
      last_offset: Long,
      event_type: String,
      value: Double,
      deleted: Boolean = false)

  /** Fold a micro-batch of changes for one key into the stored
    * latest-row state. Mirrors ValueBuffers' last-writer-wins.
    */
  def applyGroup(
      key: String,
      changes: Iterator[Change],
      state: GroupState[Upsert]): Iterator[Upsert] = {
    var current: Option[Upsert] = state.getOption
    changes.toSeq.sortBy(_.offset).foreach { c =>
      if (current.forall(_.last_offset < c.offset)) {
        current =
          if (c.op == Op.Delete) Some(Upsert(key, c.offset, c.event_type, 0.0, deleted = true))
          else Some(Upsert(key, c.offset, c.event_type, c.value))
      }
    }
    current match {
      case Some(u) => state.update(u); Iterator.single(u)
      case None    => Iterator.empty
    }
  }

  /** Timeout-aware variant: same fold, but every state update arms
    * an event-time timeout `ttlMs` past the current watermark; when
    * the group times out the state (typically a tombstone that
    * outlived any possible redelivery) is reaped. This is what
    * bounds state at 100 TB key cardinality — pair with
    * `withWatermark` on the changelog.
    */
  def applyGroupTtl(ttlMs: Long)(
      key: String,
      changes: Iterator[Change],
      state: GroupState[Upsert]): Iterator[Upsert] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val out = applyGroup(key, changes, state)
      if (state.exists)
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttlMs)
      out
    }
  }

  /** Run the streaming upsert over a parquet-backed changelog to
    * completion (availableNow) and return the resulting snapshot.
    * The same code path serves a real unbounded source — only the
    * trigger differs.
    */
  def applyAvailableNow(
      s: SparkSession,
      dir: String,
      queryName: String = "cdc_stream_apply",
      statePartitions: Option[Int] = None): DataFrame = {
    import s.implicits._
    dropStaleSinks(s, queryName)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // RocksDB state store: ~2× faster than the default HDFS-backed
    // store for upsert state, and the only provider whose memory is
    // bounded at 100 TB key cardinality (off-heap, spillable).
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = eventsStream(s, dir)
    val changes: Dataset[Change] = Changelog.canonicalize(stream)
      .select(col("key"), col("op"), col("offset"), col("ts"),
        col("event_type"), col("value"))
      .as[Change]
    val upserts = changes
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(applyGroup)
    // Update-mode emissions land in a parquet file sink via
    // foreachBatch — snapshot state is |keys|-sized, which grows with
    // the corpus, so a memory sink here would be a driver collect
    val emissions = runToParquetForeachBatch(
      s, queryName, upserts.toDF(), OutputMode.Update, statePartitions)
    // multiple micro-batches may re-emit a key; keep the last
    // emission (max last_offset per key — append-order-independent),
    // then drop tombstoned keys
    CdcApply.snapshot(
      emissions
        .withColumn("op", when(col("deleted"), Op.Delete).otherwise(Op.Update)),
      keyCols = Seq("key"), offsetCol = "last_offset")
      .drop("op", "deleted")
  }

  /** At-least-once → exactly-once: streaming duplicate suppression
    * via the stateful dropDuplicates operator. The source simulates
    * redelivery (every event arrives twice, via two source instances
    * of the same changelog); state keyed on event_id drops the
    * second delivery ACROSS micro-batches. Bounded replay keeps
    * exact state; an unbounded deployment adds
    * `withWatermark(ts, horizon)` so ids older than the redelivery
    * horizon age out of the store (state ∝ horizon, not history —
    * the 100 TB requirement). RocksDB store as in
    * [[applyAvailableNow]].
    */
  def streamingDedup(
      s: SparkSession,
      dir: String,
      queryName: String = "cdc_stream_dedup",
      statePartitions: Option[Int] = None): DataFrame = {
    dropStaleSinks(s, queryName)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def src() = eventsStream(s, dir)
    val deduped = src().unionAll(src()).dropDuplicates("event_id")
    // deduped output is corpus-sized — file sink, never driver memory
    runToParquetSink(s, queryName, deduped, statePartitions)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Run `body` (start a stream + await it) with
    * `spark.sql.shuffle.partitions` temporarily overridden. The
    * override pins the stateful operator's state-store partition
    * count, which is locked into the checkpoint at first start: a
    * bounded local replay with small state wants a handful of RocksDB
    * instances, not one per core; a long-lived cluster deployment
    * should size it to total executor cores and leave this None. The
    * conf must stay overridden until the query terminates because
    * micro-batches plan asynchronously after `start()`.
    */
  private def withStatePartitions[T](
      s: SparkSession, n: Option[Int])(body: => T): T = n match {
    case None => body
    case Some(parts) =>
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try body
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Release the resources a finished availableNow run pins in a
    * long-lived session. Two leaks otherwise accumulate per run:
    * terminated StreamingQuery objects are retained by the
    * StreamingQueryManager (for awaitAnyTermination) and each pins
    * its memory sink's rows until `resetTerminated()`; and
    * state-store providers stay in the executor provider cache keyed
    * by checkpoint dir — with a fresh checkpoint per run nothing ever
    * reclaims them, so RocksDB native memory grows without bound
    * (the stream-stream join's two-sided state is the big one).
    * `StateStore.stop()` unloads all providers; the next stateful
    * query lazily restarts the maintenance machinery.
    *
    * Both calls are JVM-global, so they only run when NO streaming
    * query is active in ANY session this JVM has streamed from:
    * `StateStore.stop()` would unload a concurrently running query's
    * providers mid-batch (forcing reload/retries) even if that query
    * belongs to a DIFFERENT SparkSession (parallel test suites share
    * the JVM), and `resetTerminated()` would clear another thread's
    * awaitAnyTermination bookkeeping. Sessions are tracked in a weak
    * set on every release call — every graft streaming path calls
    * release right after its query terminates, so any session that
    * ever streamed is registered before it could race; the weak ref
    * lets stopped sessions be collected. A session with a long-lived
    * [[ingestInto]] running alongside batch-style runs simply skips
    * the cleanup until the whole JVM goes stream-quiet.
    */
  private val streamedSessions: java.util.Set[SparkSession] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]))

  /** Serializes runToParquetSink's wipe-and-run per base query name. */
  private val ssjBaseLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  /** Run a streaming frame to completion (AvailableNow) through a
    * PARQUET file sink and return a batch frame over the sink — the
    * scale-safe alternative to a `memory` sink, whose output is
    * driver-resident and grows with traffic (the anti-pattern this
    * repo removed twice: cdc_stream_join in r5, dedup_stream_probe in
    * r9). Results land on storage; the driver only holds the path.
    *
    * Per-BASE-query scratch root, pruned on entry: invocations carry
    * nanoTime-suffixed names (fresh checkpoint by design), so temp
    * sink + checkpoint dirs would otherwise accumulate a full output
    * per bench pass. The prune-and-run is serialized per base under a
    * JVM lock — without it a concurrent same-base invocation
    * (parallel suites share the JVM) could delete an ACTIVE run's
    * sink and checkpoint mid-stream. The prune RETAINS the newest
    * previous generation rather than wiping the root: the lock can't
    * stop a parallel thread from still holding the PREVIOUS
    * invocation's lazy frame over its out_ dir, and consuming it
    * after a same-base re-run would hit FileNotFound against a wiped
    * root. One generation of grace closes that race (disk stays
    * bounded at 2 generations per base); a reader two generations
    * stale is outside any plausible interleaving of the suites that
    * share this JVM.
    */
  private def runInPrunedScratch(
      s: SparkSession,
      queryName: String)(run: (String, String) => Unit): String = {
    val base = queryName.replaceAll("_\\d+$", "")
    val scratchRoot = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_ssj", base)
    val sinkDir = ssjBaseLocks.computeIfAbsent(base, _ => new Object)
      .synchronized {
        java.nio.file.Files.createDirectories(scratchRoot)
        val kids = Option(scratchRoot.toFile.listFiles()).getOrElse(Array.empty)
        Seq("out_", "ckpt_").foreach { prefix =>
          kids.filter(_.getName.startsWith(prefix))
            .sortBy(-_.lastModified())
            .drop(1) // keep the newest previous generation
            .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
        }
        val dir = java.nio.file.Files
          .createTempDirectory(scratchRoot, "out_").toString
        run(dir, java.nio.file.Files
          .createTempDirectory(scratchRoot, "ckpt_").toString)
        dir
      }
    releaseStreamResources(s)
    sinkDir
  }

  private[graft] def runToParquetSink(
      s: SparkSession,
      queryName: String,
      out: DataFrame,
      statePartitions: Option[Int] = None): DataFrame = {
    val sinkDir = runInPrunedScratch(s, queryName) { (dir, ckpt) =>
      withStatePartitions(s, statePartitions) {
        registerStreamingSession(s)
        val q = out.writeStream
          .outputMode(OutputMode.Append)
          .format("parquet")
          .queryName(queryName)
          .option("path", dir)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    // Explicit schema: an empty stream commits ZERO data files and
    // schema inference would throw; with the stream's own schema the
    // read yields an empty frame instead.
    s.read.schema(out.schema).parquet(sinkDir)
  }

  /** [[runToParquetSink]] for the output modes the file sink cannot
    * take — Update from stateful operators, Complete from
    * aggregations — via foreachBatch, the production shape for both
    * (a real deployment merges each batch into a sink table, as
    * cdc_ingest does; here each batch lands as parquet). Update
    * emissions land in batchId-named subdirectories via
    * [[writeBatchSubdir]] (the reader still folds re-emissions —
    * e.g. last-offset-wins per key, order-independent); Complete
    * batches overwrite the whole dir (each batch is the entire
    * state, the last one is the answer). Results live on storage
    * either way — the driver never holds output rows.
    */
  private[graft] def runToParquetForeachBatch(
      s: SparkSession,
      queryName: String,
      out: DataFrame,
      mode: OutputMode,
      statePartitions: Option[Int] = None): DataFrame = {
    val sinkDir = runInPrunedScratch(s, queryName) { (dir, ckpt) =>
      withStatePartitions(s, statePartitions) {
        registerStreamingSession(s)
        val writeBatch: (DataFrame, Long) => Unit = (batch, batchId) =>
          if (mode == OutputMode.Complete())
            // the whole state every batch — idempotent by definition
            batch.write.mode("overwrite").parquet(dir)
          else writeBatchSubdir(dir)(batch, batchId)
        val q = out.writeStream
          .outputMode(mode)
          .foreachBatch(writeBatch)
          .queryName(queryName)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    readBatchSubdirs(s, out.schema, sinkDir)
  }

  /** One micro-batch into its batchId-named subdirectory with
    * OVERWRITE — the batch-level idempotency convention both
    * foreachBatch sinks share: a batch delivered again (a restarted
    * query on the same checkpoint, in a deployment that keeps one)
    * replaces its own subdirectory instead of re-appending rows. In
    * THIS harness each run gets a fresh checkpoint and availableNow
    * failures propagate (no batch is ever re-delivered), so the
    * layout is a convention the reader depends on
    * ([[readBatchSubdirs]]) rather than a correctness requirement —
    * keep them in sync through these two helpers.
    */
  private def writeBatchSubdir(dir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(f"$dir/b$batchId%08d")

  /** Read-back for the batchId-subdir layout. The explicit schema
    * covers the empty-stream case (zero committed files);
    * recursiveFileLookup descends the subdirs and disables partition
    * inference, so bNNNNNNNN can never be misread as a partition. */
  private def readBatchSubdirs(
      s: SparkSession, schema: org.apache.spark.sql.types.StructType,
      dir: String): DataFrame =
    s.read.schema(schema)
      .option("recursiveFileLookup", "true").parquet(dir)

  /** Streaming admission gate via foreachBatch: `score` maps the
    * raw landing batch to a PERSISTED scored frame (the persist is
    * the point — it pins one parallel evaluation of the heavy
    * per-row scoring; a plain stream plan lets predicate pushdown
    * drag the admission filters, and the whole scoring expression
    * tree with them, below the landing repartition onto the
    * unsplittable single-file scan), `admit` filters/projects the
    * scored columns; admitted rows append to a parquet sink read
    * back for the caller. The per-batch persist is released after
    * the batch's write.
    */
  private[graft] def runGateForeachBatch(
      s: SparkSession,
      queryName: String,
      source: DataFrame)
      (score: DataFrame => DataFrame)
      (admit: DataFrame => DataFrame): DataFrame = {
    val sinkDir = runInPrunedScratch(s, queryName) { (dir, ckpt) =>
      registerStreamingSession(s)
      val writeBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
        val scored = score(batch)
        try writeBatchSubdir(dir)(admit(scored), batchId)
        finally scored.unpersist()
      }
      val q = source.writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch(writeBatch)
        .queryName(queryName)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // Output schema from the transforms applied to an empty batch —
    // an empty stream commits zero data files (runToParquetSink
    // precedent), so the read must carry its own schema.
    val empty = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), source.schema)
    val scoredEmpty = score(empty)
    val outSchema = try admit(scoredEmpty).schema finally scoredEmpty.unpersist()
    readBatchSubdirs(s, outSchema, sinkDir)
  }

  /** Must be called BEFORE a streaming query starts (every graft
    * start path does): registration at release time only would leave
    * a session's FIRST in-flight query invisible to the guard below,
    * re-opening the race the set exists to close. */
  private[graft] def registerStreamingSession(s: SparkSession): Unit =
    streamedSessions.add(s)

  private[graft] def releaseStreamResources(s: SparkSession): Unit = {
    streamedSessions.add(s)
    (SparkSession.getActiveSession ++ SparkSession.getDefaultSession)
      .foreach(streamedSessions.add)
    val sessions = streamedSessions.toArray(Array.empty[SparkSession])
    val blockers = sessions.toSeq.flatMap(_.streams.active.toSeq)
    if (blockers.isEmpty) {
      s.streams.resetTerminated()
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    } else {
      // a skip here means terminated-query + state-store cleanup is
      // deferred JVM-wide — make that visible, a silent skip turns
      // into unbounded native growth over a long bench run
      System.err.println(
        s"[graft] releaseStreamResources deferred: active=${blockers.map(_.name).mkString(",")}")
    }
  }

  /** Continuous ingest into a [[CdcSink]] snapshot table — the full
    * reference loop (binlog → buffer → flush to table) as a
    * Structured Streaming query. The trigger plays the role of
    * `IngestOptions.allowed_latency` / `max_messages_per_batch`:
    * each micro-batch is one flush, merged transactionally per
    * partition, with offsets committed after data.
    */
  def ingestInto(
      s: SparkSession,
      dir: String,
      tableDir: String,
      partitionCol: Option[String] = None,
      queryName: String = "cdc_ingest"): Unit = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = Changelog.canonicalize(
      eventsStream(s, dir))
    registerStreamingSession(s)
    val q = stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc_ingest_ckpt_").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        CdcSink.merge(batch.sparkSession, batch, tableDir, partitionCol)
      }
      .start()
    q.awaitTermination()
    releaseStreamResources(s)
  }

  /** Stream-stream interval join: each 'click' joined to the same
    * user's 'purchase' events landing within [click, click+30min] —
    * the streaming enrichment/attribution shape (two live changelogs
    * correlated on key + event-time range). Both sides carry
    * watermarks, and the join condition is time-BOUNDED in both
    * directions, so Spark can size the join state to the watermark
    * delay + interval and evict — state ∝ traffic inside the horizon,
    * not history, which is what keeps this runnable against unbounded
    * 100 TB streams. Matched pairs land in a PARQUET sink — pair
    * volume scales with traffic, so collecting it to the driver (the
    * memory sink) is the wrong shape; the per-day aggregation runs in
    * batch over the sunk files (the oracle is the identical batch
    * self-join).
    *
    * Oracle caveat: "lands exactly on the batch self-join" holds when
    * the availableNow replay is a single micro-batch (the default —
    * no maxFilesPerTrigger). A multi-batch replay over files unsorted
    * in event time advances the watermark between batches and can
    * evict join state a later batch's older rows would have matched —
    * correct streaming semantics, but a superset-minus-late-rows of
    * the batch join. Size the watermark to the source's out-of-order
    * horizon in a live deployment.
    */
  def streamStreamJoin(
      s: SparkSession,
      dir: String,
      queryName: String = "cdc_stream_join",
      statePartitions: Option[Int] = None): DataFrame = {
    import graft.QueryDef._
    dropStaleSinks(s, queryName)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def src() = Changelog.canonicalize(
      eventsStream(s, dir))
    val clicks = src().filter(col("event_type") === "click")
      .select(col("key"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = src().filter(col("event_type") === "purchase")
      .select(col("key").as("p_key"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "1 hour")
    val pairs = clicks.join(purchases,
      col("key") === col("p_key") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
    runToParquetSink(s, queryName, pairs, statePartitions)
      .groupBy(date_trunc("day", col("click_ts")).as("day"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("key")).as("n_users"),
        dsum(col("purchase_value")).as("attributed_value"))
      .orderBy("day")
  }

  /** Watermarked event-time windowed aggregation over the changelog —
    * the streaming-analytics face of the engine (counts/values per
    * day per event type).
    */
  def windowedAgg(
      s: SparkSession,
      dir: String,
      queryName: String = "cdc_stream_window",
      statePartitions: Option[Int] = None): DataFrame = {
    import graft.QueryDef._
    dropStaleSinks(s, queryName)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = Changelog.canonicalize(
      eventsStream(s, dir))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("w.start").as("day"), col("event_type"), col("n"), col("total_value"))
    // Complete-mode state via foreachBatch overwrite: each batch is
    // the whole aggregate, the last overwrite is the answer — window
    // cardinality is bounded but still not the driver's to hold
    runToParquetForeachBatch(
      s, queryName, agg, OutputMode.Complete, statePartitions)
  }
}

/** Static schema for the events table (streaming sources must declare
  * schemas up front — no inference mid-pipeline at scale).
  *
  * The `ts` column's declared type is dispatched on the ACTUAL
  * parquet annotation of one probed footer, because the two testdata
  * generations differ: TIMESTAMP(NANOS) (and plain-INT64 nanos
  * written back by old GenScale runs) must be read as LongType
  * (Spark 4 rejects ns timestamps without the nanosAsLong legacy
  * flag) and converted `div 1000` downstream, while TIMESTAMP(MICROS)
  * reads natively as TimestampType with NO conversion. Declaring
  * LongType for a µs file silently re-divides micros by 1000 and
  * collapses every timestamp onto 1970-01-20 — the reference decodes
  * each temporal type with its explicit unit (rust-cdc
  * `src/mysql/event/mod.rs:370-640`, timestamp2/datetime2 paths);
  * match that discipline. `Changelog.canonicalize` dispatches the
  * conversion on the dtype this schema declares, plus a loud
  * year-range guard so a future unit drift fails at the source.
  */
private[cdc] object Tables0 {
  import org.apache.spark.sql.types._

  private def schemaWithTs(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** `ts` as raw int64 nanos (legacy testdata / old GenScale output). */
  val eventsSchema: StructType = schemaWithTs(LongType)

  /** `ts` as native µs TimestampType (current testdata). */
  val eventsSchemaMicros: StructType = schemaWithTs(TimestampType)

  /** Probe the parquet footers and return the schema whose `ts` type
    * matches the files' actual timestamp unit. Driver-side, footers
    * only, O(KB) each, and setup-time-only — the same layout-dispatch
    * precedent as [[CdcStream.eventsStream]]'s dir-vs-file probe. A
    * missing path (landing dir before the first write) defaults to
    * the µs schema: that is what every current producer (driver +
    * GenScale on current Spark) writes.
    *
    * ALL leaf footers are probed, because one schema governs every
    * file the stream will read: a landing dir mixing old
    * nanos-as-long parts with new micros parts has NO single correct
    * schema (whichever unit the schema declares silently corrupts the
    * other files' timestamps 1000×), so a mixed dir fails fast HERE
    * with a clear error instead of mid-scan via the canonicalize
    * year-range guard. Files landing after setup are still covered by
    * that guard.
    */
  def eventsStreamSchema(s: SparkSession, dir: String): StructType =
    if (tsReadsAsLong(s, dir)) eventsSchema else eventsSchemaMicros

  /** True when `<dir>/events.parquet`'s `ts` column must be read as a
    * raw long: annotated TIMESTAMP(NANOS), or a plain INT64 carrying
    * nanos (old GenScale wrote the nanos-as-long column back without
    * a logical annotation). Annotated µs/ms timestamps → false
    * (Spark reads them natively as TimestampType). Throws on a dir
    * whose part files disagree — see [[eventsStreamSchema]].
    */
  private def tsReadsAsLong(s: SparkSession, dir: String): Boolean = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return false
    val leaves =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).toSeq
      else Seq(p)
    val units = leaves.map(leafTsIsLong(_, conf)).distinct
    if (units.size > 1)
      throw new IllegalStateException(
        s"$p mixes timestamp units across part files (nanos-as-long and " +
          "micros) — no single stream schema reads both without corrupting " +
          "one set 1000x; rewrite the old-unit parts or split the landing dir")
    units.headOption.getOrElse(false)
  }

  private def leafTsIsLong(
      leaf: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): Boolean = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(leaf, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      if (!schema.containsField("ts")) return false
      val prim = schema.getType(schema.getFieldIndex("ts")).asPrimitiveType()
      prim.getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
        case null =>
          // plain INT64: old GenScale nanos-as-long write-back. INT96
          // (Spark's legacy timestamp encoding, also unannotated) is
          // NOT a long — only the INT64 form carries raw nanos.
          prim.getPrimitiveTypeName ==
            org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
        case _ => false
      }
    } finally reader.close()
  }
}
