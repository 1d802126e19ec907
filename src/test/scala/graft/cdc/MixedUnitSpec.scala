package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the setup-time guard for landing dirs that mix timestamp
  * units across part files (advisor, r8): no single stream schema
  * can read nanos-as-long and micros parts together — whichever unit
  * it declares silently corrupts the other files 1000× — so
  * eventsStreamSchema must fail fast with a clear error instead of
  * dispatching on one arbitrary footer.
  */
class MixedUnitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeOnePart(src: java.io.File, dest: java.io.File): Unit = {
    val part = src.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(dest, part.getName).toPath)
  }

  test("a landing dir mixing nanos-as-long and micros parts fails fast at setup") {
    val root = java.nio.file.Files.createTempDirectory("mixed_unit_").toFile
    val eventsDir = new java.io.File(root, "events.parquet")
    eventsDir.mkdirs()
    import spark.implicits._
    val scratch = java.nio.file.Files.createTempDirectory("mixed_scratch_")
    // micros part: a real annotated TIMESTAMP(MICROS) column (the
    // testdata generator's format — Spark's own default is legacy
    // INT96, which is neither unit)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val micros = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val mDir = scratch.resolve("m").toString
    micros.coalesce(1).write.parquet(mDir)
    // nanos-as-long part: plain INT64 ts (the old GenScale write-back)
    val nanos = Seq((2L, 1704067200000000000L, 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val nDir = scratch.resolve("n").toString
    nanos.coalesce(1).write.parquet(nDir)
    writeOnePart(new java.io.File(mDir), eventsDir)
    writeOnePart(new java.io.File(nDir), eventsDir)
    val e = intercept[IllegalStateException](
      Tables0.eventsStreamSchema(spark, root.toString))
    assert(e.getMessage.contains("mixes timestamp units"), e.getMessage)
    // homogeneous dirs still dispatch cleanly
    val onlyMicros = java.nio.file.Files.createTempDirectory("only_micros_").toFile
    val omDir = new java.io.File(onlyMicros, "events.parquet"); omDir.mkdirs()
    writeOnePart(new java.io.File(mDir), omDir)
    assert(Tables0.eventsStreamSchema(spark, onlyMicros.toString) ==
      Tables0.eventsSchemaMicros)
    val onlyNanos = java.nio.file.Files.createTempDirectory("only_nanos_").toFile
    val onDir = new java.io.File(onlyNanos, "events.parquet"); onDir.mkdirs()
    writeOnePart(new java.io.File(nDir), onDir)
    assert(Tables0.eventsStreamSchema(spark, onlyNanos.toString) ==
      Tables0.eventsSchema)
  }
}
