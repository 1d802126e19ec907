package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — images/audio/video as opaque binary
  * columns with typed metadata.
  *
  * The container has no codec libraries, so the decode step is a
  * clearly-marked deterministic STUB (see [[StubCodec]]); everything
  * around it — the binary column representation, the typed metadata
  * schema, partition-sized batch iteration via mapPartitions, and
  * the downstream feature aggregation — is the real Spark plumbing a
  * production decoder (e.g. a Pandas UDF over mapInArrow batches, or
  * a JNI codec) would drop into.
  *
  * Scale notes: decode runs per-partition with no shuffle; the only
  * shuffle is the final small agg. Binary payloads never shuffle —
  * features are extracted before any exchange.
  */
object Multimodal {

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("mm_decode", decodePipeline, None),
    QueryDef("mm_frames", framePipeline, None)
  )

  /** Typed metadata for a decoded asset. */
  final case class MediaMeta(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature_mean: Double)

  /** STUB codec ————————————————————————————————————————————————
    * A real implementation would parse the container header and
    * decode pixels/samples. Here: deterministic pseudo-metadata from
    * the payload bytes so the pipeline is testable end-to-end.
    */
  object StubCodec {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      val fmt = (docId % 3) match {
        case 0 => "png"
        case 1 => "wav"
        case _ => "mp4"
      }
      // "feature": mean byte value — stands in for a pooled embedding
      val mean = if (n == 0) 0.0 else payload.map(_ & 0xff).sum.toDouble / n
      MediaMeta(docId, fmt, 64 + (n % 64), 64 + (n % 48), 1 + (n % 16), mean)
    }
  }

  /** One sampled frame with a fixed-size "resized" feature patch. */
  final case class Frame(
      doc_id: Long,
      frame_index: Int,
      patch: Array[Float]) // RESIZE_DIM pooled features

  val ResizeDim = 16
  val SampleEvery = 4 // keep every 4th frame

  /** Frame-sample + resize: explode each asset into its sampled
    * frames and pool the payload into a fixed ResizeDim feature
    * patch per frame. The frame explosion happens INSIDE the
    * partition (iterator flatMap) so frame rows never materialize on
    * the driver and the downstream shuffle carries only
    * (doc_id, frame_index, 16 floats) — never the source bytes.
    * A real decoder would emit pixel tensors here; the STUB pools
    * byte windows (deterministic, testable batch shape).
    */
  def sampleFrames(assets: Dataset[(Long, Array[Byte])]): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val meta = StubCodec.decode(id, bytes)
        (0 until meta.n_frames by SampleEvery).iterator.map { f =>
          // stub "resize": pool bytes into ResizeDim buckets, offset per frame
          val patch = Array.tabulate(ResizeDim) { d =>
            if (bytes.isEmpty) 0f
            else {
              val start = (f + d * bytes.length / ResizeDim) % bytes.length
              (bytes(start) & 0xff).toFloat / 255f
            }
          }
          Frame(id, f, patch)
        }
      }
    }
  }

  /** mm_frames: asset → sampled frames → per-format frame stats. */
  private def framePipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    sampleFrames(assets).toDF()
      .withColumn("patch_mean",
        graft.functions.dot_product(col("patch"),
          array_repeat(lit(1.0f / ResizeDim), ResizeDim)))
      .groupBy((col("doc_id") % 3).cast("int").as("format_id"))
      .agg(
        count(lit(1)).as("n_frames_sampled"),
        countDistinct(col("doc_id")).as("n_assets"),
        round(avg(col("patch_mean")), 5).as("avg_patch_mean"))
      .orderBy("format_id")
  }

  /** Binary-column pipeline: text → utf8 payload (standing in for
    * image bytes) → per-partition decode → typed metadata → agg.
    */
  private def decodePipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets: Dataset[(Long, Array[Byte])] = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    val decoded: Dataset[MediaMeta] = assets.mapPartitions { it =>
      // partition-local batch loop — where a real codec would work
      it.map { case (id, bytes) => StubCodec.decode(id, bytes) }
    }
    decoded.toDF()
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_assets"),
        max(col("width")).as("max_width"),
        max(col("n_frames")).as("max_frames"),
        round(avg(col("feature_mean")), 4).as("avg_feature"))
      .orderBy("format")
  }
}
