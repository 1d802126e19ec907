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
    QueryDef("mm_decode", decodePipeline, None)
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
