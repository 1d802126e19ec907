package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka-shaped changelog ingest — the reference's second record
  * variant, `Record::Kafka(partition, offset, body)` (rust-cdc
  * `src/delta/mod.rs:49`, consumed at `:147-165`, configured via
  * `additional_kafka_settings` at `:207`). Most real CDC deployments
  * tail Debezium topics rather than the binlog directly; this module
  * gives the sink that shape:
  *
  *  - records are keyed by `(topic, partition, offset)`; offsets are
  *    monotone and dense WITHIN a partition only, but a change key
  *    always lands in exactly one partition (Kafka hash-partitions by
  *    key), so per-key last-writer-wins can order by the partition's
  *    offset directly;
  *  - each `topic/partition` is one source in the sink's committed-
  *    offset map ([[CdcSink.committedOffsets]]) — per-partition
  *    monotone commits, exactly the reference's per-partition
  *    bookkeeping;
  *  - a delivery may overlap already-committed offsets (consumer
  *    rebalance, at-least-once redelivery): [[fresh]] drops records
  *    at or below the committed offset of their partition BEFORE the
  *    merge, so redelivery is suppressed without relying on upsert
  *    idempotence.
  *
  * At scale the resume filter is a map-side predicate against a
  * literal map of ≤ #partitions entries — no shuffle, no driver loop.
  */
object KafkaIngest {

  /** Offset-map source id for a record's partition. */
  def sourceId(topic: Column, partition: Column): Column =
    concat(topic, lit("/"), partition.cast("string"))

  /** Attach the per-partition source id the sink commits against. */
  def withSource(
      records: DataFrame,
      topicCol: String = "topic",
      partitionCol: String = "partition"): DataFrame =
    records.withColumn("source_file", sourceId(col(topicCol), col(partitionCol)))

  /** Drop records at or below their partition's committed offset.
    * Records from partitions never seen before pass through.
    */
  def fresh(records: DataFrame, committed: Map[String, Long]): DataFrame =
    if (committed.isEmpty) records
    else {
      val entries = committed.toSeq.flatMap { case (s, o) => Seq(lit(s), lit(o)) }
      val committedMap = map(entries: _*)
      records.filter(col("offset") >
        coalesce(element_at(committedMap, col("source_file")), lit(Long.MinValue)))
    }

  /** Ingest one delivery (possibly overlapping previously committed
    * offsets) into the sink table. Returns the number of fresh rows
    * actually merged — redelivered rows are filtered out first and
    * never reach the table write.
    */
  def ingest(
      spark: SparkSession,
      records: DataFrame,
      tableDir: String,
      partitionCol: Option[String] = None): Long = {
    val withSrc =
      if (records.columns.contains("source_file")) records else withSource(records)
    // persist the filtered delivery: both the count and the merge are
    // actions, and without the cache each would re-run the fresh
    // filter AND the upstream decode — the whole delivery would be
    // evaluated twice per batch
    val f = fresh(withSrc, CdcSink.committedOffsets(spark, tableDir)).persist()
    try {
      val n = f.count()
      if (n > 0) CdcSink.merge(spark, f, tableDir, partitionCol)
      n
    } finally f.unpersist()
  }

  /** Continuous ingest: every micro-batch is one delivery through
    * [[ingest]] — the streaming face of the reference's Kafka
    * consumer loop. Works with any (topic, partition, offset, key,
    * op, ...) streaming source, e.g. `spark.readStream.format(
    * "kafka")` after payload decode, or a MemoryStream in tests.
    */
  def ingestStream(
      records: DataFrame,
      tableDir: String,
      queryName: String,
      partitionCol: Option[String] = None): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    records.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingest(batch.sparkSession, batch, tableDir, partitionCol); ()
      }
}
