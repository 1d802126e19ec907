package graft.operators

import graft.{QueryDef, Tables}
import graft.mm.{Jpeg, MediaGen, Png, Wav}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns — images/audio/video as opaque binary columns
  * with typed metadata, decoded by REAL clean-room codecs
  * (graft.mm): PNG/APNG with all five scanline filters via
  * java.util.zip, RIFF/WAVE PCM16, and JFIF header parsing. No
  * external media libraries — and no stub: the pixels, samples, and
  * container structure are genuinely encoded and decoded, so the
  * features below (luminance, RMS, zero-crossing rate, frame
  * patches) are computed from real decoded content.
  *
  * Scale notes: payloads are generated and decoded inside
  * mapPartitions — binary blobs NEVER cross an exchange; only the
  * small typed metadata / 16-float patches shuffle into the final
  * aggregations. That is the shape a 100 TB media pipeline needs:
  * decode where the bytes already live, ship features only.
  */
object Multimodal {

  lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("mm_decode", decodePipeline, None),
    QueryDef("mm_frames", framePipeline, None),
    QueryDef("mm_resize", resizePipeline, None),
    QueryDef("mm_resample", resamplePipeline, None),
    QueryDef("mm_phash", phashPipeline, None),
    QueryDef("mm_scene_cut", sceneCutPipeline, None),
    QueryDef("mm_audio_vad", audioVadPipeline, None),
    QueryDef("mm_phash_cluster", phashClusterPipeline, None)
  )

  /** Typed metadata for one decoded asset. */
  final case class MediaMeta(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int,
      feature: Double)

  /** Container sniff + decode: dispatches on real magic bytes. */
  def decodeMeta(docId: Long, payload: Array[Byte]): MediaMeta = {
    if (payload.length >= 8 && (payload(0) & 0xff) == 0x89 && payload(1) == 'P') {
      val d = Png.decode(payload)
      val fmt = if (d.frames.length > 1) "apng" else "png"
      val lum = d.frames.map(_.meanLuminance).sum / d.frames.length
      MediaMeta(docId, fmt, d.width, d.height, d.frames.length, 0, lum)
    } else if (payload.length >= 2 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) {
      val d = Jpeg.decode(payload) // full baseline-DCT pixel decode
      MediaMeta(docId, "jpeg", d.width, d.height, 1, 0, d.meanLuminance)
    } else if (payload.length >= 4 && payload(0) == 'R' && payload(1) == 'I') {
      val a = Wav.decode(payload)
      MediaMeta(docId, "wav", 0, 0, a.nFrames, a.sampleRate, a.rms)
    } else throw new IllegalArgumentException(s"unknown container for doc $docId")
  }

  /** The binary asset column: in production this is a parquet/object
    * -store binary column; here each payload is generated
    * deterministically (REAL encoded bytes — see MediaGen) from the
    * documents keys, partition-locally. */
  private def assets(s: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    Tables.parallelized(Tables.documents(s, dir).select(col("doc_id"))).as[Long]
      .mapPartitions(_.map(id => (id, MediaGen.payload(id))))
  }

  /** mm_decode: binary column → per-partition codec dispatch →
    * typed metadata → per-format stats. */
  private def decodePipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val decoded: Dataset[MediaMeta] =
      assets(s, dir).mapPartitions(_.map { case (id, bytes) => decodeMeta(id, bytes) })
    decoded.toDF()
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_assets"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"),
        max(col("n_frames")).as("max_frames"),
        round(avg(col("feature")), 4).as("avg_feature"))
      .orderBy("format")
  }

  /** One sampled frame (video) or window (audio) with a fixed-size
    * pooled feature patch from the decoded content. */
  final case class Frame(
      doc_id: Long,
      kind: String, // "video" | "audio"
      frame_index: Int,
      patch: Array[Float])

  val ResizeDim = 16
  val SampleEvery = 2 // keep every 2nd frame/window
  val AudioWindow = 512 // samples per audio "frame"

  /** Pool a luminance/amplitude series into ResizeDim equal-range
    * bucket means — the stand-in for a learned resize that keeps the
    * patch shape fixed regardless of source geometry. */
  private def pool(values: Array[Float]): Array[Float] = {
    val out = new Array[Float](ResizeDim)
    if (values.isEmpty) return out
    var d = 0
    while (d < ResizeDim) {
      val from = d * values.length / ResizeDim
      val to = math.max(from + 1, (d + 1) * values.length / ResizeDim)
      var s = 0f; var i = from
      while (i < to) { s += values(i); i += 1 }
      out(d) = s / (to - from)
      d += 1
    }
    out
  }

  /** Frame/window sampling, partition-local: APNG assets explode
    * into their decoded video frames, WAV assets into fixed sample
    * windows; every frame row carries only (id, kind, index,
    * ResizeDim floats) downstream — never the source bytes. */
  def sampleFrames(assets: Dataset[(Long, Array[Byte])]): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') {
          val d = Png.decode(bytes)
          d.frames.indices.by(SampleEvery).iterator.map { f =>
            val img = d.frames(f)
            val lum = new Array[Float](img.width * img.height)
            var p = 0
            while (p < lum.length) {
              val o = p * img.channels
              var s = 0; var c = 0
              while (c < img.channels) { s += img.pixels(o + c) & 0xff; c += 1 }
              lum(p) = s.toFloat / img.channels / 255f
              p += 1
            }
            Frame(id, "video", f, pool(lum))
          }
        } else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I') {
          val a = Wav.decode(bytes)
          val nWin = a.samples.length / AudioWindow
          (0 until nWin by SampleEvery).iterator.map { w =>
            val amp = new Array[Float](AudioWindow)
            var i = 0
            while (i < AudioWindow) {
              amp(i) = math.abs(a.samples(w * AudioWindow + i) / 32768f)
              i += 1
            }
            Frame(id, "audio", w, pool(amp))
          }
        } else Iterator.empty
      }
    }
  }

  /** One resized thumbnail's stats: the decode → RESIZE →
    * feature-extract stage of a media ingest pipeline. */
  final case class Thumb(
      doc_id: Long,
      format: String,
      thumb_lum: Double, // mean luminance of the 8×8 thumbnail
      lum_drift: Double) // |thumb mean − full-res mean| (resample error)

  val ThumbDim = 8

  /** mm_resize: image assets → bilinear 8×8 thumbnail (real resample
    * of real decoded pixels, partition-local) → per-format stats.
    * `lum_drift` doubles as a built-in correctness signal: bilinear
    * resampling approximately preserves mean luminance, so a large
    * average drift means the resampler (not the corpus) changed.
    */
  private def resizePipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val thumbs: Dataset[Thumb] = assets(s, dir).mapPartitions(_.flatMap {
      case (id, bytes) =>
        if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') {
          val d = graft.mm.Png.decode(bytes)
          val full = d.frames.head
          val small = graft.mm.Resize.bilinear(full, ThumbDim, ThumbDim)
          val fmt = if (d.frames.length > 1) "apng" else "png"
          Iterator.single(Thumb(id, fmt, small.meanLuminance,
            math.abs(small.meanLuminance - full.meanLuminance)))
        } else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
            (bytes(1) & 0xff) == 0xd8) {
          val full = graft.mm.Jpeg.decode(bytes) // real DCT pixels
          val small = graft.mm.Resize.bilinear(full, ThumbDim, ThumbDim)
          Iterator.single(Thumb(id, "jpeg", small.meanLuminance,
            math.abs(small.meanLuminance - full.meanLuminance)))
        } else Iterator.empty // audio assets have no pixels to resize
    })
    thumbs.toDF()
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_assets"),
        round(avg(col("thumb_lum")), 4).as("avg_thumb_lum"),
        round(avg(col("lum_drift")), 4).as("avg_lum_drift"),
        round(max(col("lum_drift")), 4).as("max_lum_drift"))
      .orderBy("format")
  }

  /** One resampled clip's stats: the decode → RATE-CONVERT →
    * feature-extract stage of an audio ingest pipeline. */
  final case class Clip(
      doc_id: Long,
      orig_rate: Int,
      out_frames: Long,
      out_rms: Double,
      rms_drift: Double) // |rms(out) − rms(in)| (resample error signal)

  // 11025 Hz: a NON-INTEGER ratio from the corpus's 8 kHz sources, so
  // the conversion exercises true fractional interpolation (an
  // integer ratio would reduce to sample picking).
  val TargetRate = 11025

  /** mm_resample: audio assets → linear rate conversion to a uniform
    * 11.025 kHz (real interpolation of real decoded PCM16,
    * partition-local) → per-source-rate stats. `rms_drift` is the
    * built-in correctness signal: linear resampling approximately
    * preserves RMS energy on band-limited signals, so a jump in the
    * average drift means the resampler changed, not the corpus.
    */
  private def resamplePipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val clips: Dataset[Clip] = assets(s, dir).mapPartitions(_.flatMap {
      case (id, bytes) =>
        if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == 'F') {
          val a = graft.mm.Wav.decode(bytes)
          val out = graft.mm.Resample.linear(a, TargetRate)
          Iterator.single(Clip(id, a.sampleRate, out.nFrames.toLong,
            out.rms, math.abs(out.rms - a.rms)))
        } else Iterator.empty // image assets carry no PCM to resample
    })
    clips.toDF()
      .groupBy("orig_rate")
      .agg(
        count(lit(1)).as("n_clips"),
        sum(col("out_frames")).as("sum_out_frames"),
        round(avg(col("out_rms")), 2).as("avg_out_rms"),
        round(avg(col("rms_drift")), 2).as("avg_rms_drift"),
        round(max(col("rms_drift")), 2).as("max_rms_drift"))
      .orderBy("orig_rate")
  }

  // ---------------------------------------------------------------
  // mm_phash: perceptual near-duplicate detection for images — the
  // multimodal counterpart of dedup_minhash. dHash (difference
  // hash): bilinear-resize to 9×8 grayscale, one bit per horizontal
  // luminance gradient sign → a 64-bit signature that survives
  // re-encoding and brightness scaling (gradient SIGNS are invariant
  // to any monotone per-pixel transform; only the resampler's
  // rounding can flip near-tie cells).
  //
  // Scale shape, same discipline as the other mm_* and dedup_*:
  // decode + hash run partition-local (payloads never shuffle; 8
  // bytes per image do), candidate pairs come from a 4×16-bit BAND
  // bucket join (pigeonhole: hamming ≤ 3 guarantees a shared band)
  // with the same over-populated-bucket cap as minhashPairs, and the
  // exact hamming ≤ threshold check runs only on bucket collisions —
  // never all-pairs. Rows-only in the gate (binary input); the spec
  // plants re-encoded (hamming 0) and brightness-scaled variants and
  // asserts recall + band-guard behavior.
  // ---------------------------------------------------------------
  val PhashDupBase = 3000000L
  val PhashBands = 4
  /** Must stay ≤ PhashBands − 1: the band join only GUARANTEES a
    * shared band for hamming ≤ bands−1 (pigeonhole). A threshold
    * above that silently under-recalls — pairs at hamming 4-6 with
    * their differing bits spread across all four bands never meet in
    * the join yet would pass the post-filter, so the operator would
    * report a filter it doesn't implement. (Flagged by review; the
    * planted variants measure hamming ≤ 1, comfortably inside.) */
  val PhashMaxHamming = PhashBands - 1
  val PhashMaxBucket = 10000

  /** 64-bit dHash of an image: 8 rows × 8 horizontal gradient signs
    * over a 9×8 bilinear thumbnail's channel-mean luminance. */
  def dHash(img: Png.Image): Long = {
    val t = graft.mm.Resize.bilinear(img, 9, 8)
    def lum(x: Int, y: Int): Float = {
      val o = (y * t.width + x) * t.channels
      var s = 0; var c = 0
      while (c < t.channels) { s += t.pixels(o + c) & 0xff; c += 1 }
      s.toFloat / t.channels
    }
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(x + 1, y) > lum(x, y)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Image corpus for phash: every PNG/APNG/JPEG asset, plus a
    * planted variant per id%8∈{0,4} PNG image — id%8==0 gets a
    * RE-ENCODE (identical pixels, different bytes → hamming 0),
    * id%8==4 a brightness-scale ×0.9 (monotone → hamming ≈ 0,
    * bounded by rounding ties) — and per id%8==1 JPEG a lossy
    * RE-ENCODE at a different quality (decode → q98 encode →
    * decode: generational loss shifts a few near-tie gradient
    * bits → hamming ≤ 3 measured across the corpus id range,
    * inside the banding guarantee). Variants
    * carry doc_id + PhashDupBase. JPEG hashes come from the REAL
    * baseline-DCT decode of the payload, not the source pixels.
    */
  private def phashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.parallelized(Tables.documents(s, dir).select(col("doc_id"))).as[Long]
      .mapPartitions(_.flatMap { id =>
        val m = MediaGen.modality(id)
        if (m == 0 || m == 3) {
          val img = MediaGen.image(id)
          val base = Iterator.single(id -> dHash(img))
          val variant =
            if (id % 8 == 0) {
              // re-encode round-trip: decode(encode(img)) pixels equal
              Iterator.single((id + PhashDupBase) ->
                dHash(Png.decode(Png.encode(img)).frames.head))
            } else if (id % 8 == 4) {
              val px = img.pixels.clone()
              var i = 0
              while (i < px.length) { px(i) = (((px(i) & 0xff) * 9) / 10).toByte; i += 1 }
              Iterator.single((id + PhashDupBase) -> dHash(img.copy(pixels = px)))
            } else Iterator.empty
          base ++ variant
        } else if (m == 1) {
          val decoded = Jpeg.decode(MediaGen.payload(id))
          val base = Iterator.single(id -> dHash(decoded))
          val variant =
            if (id % 8 == 1) {
              // lossy re-encode generation: the near-dup a crawler
              // actually produces when it transcodes a JPEG
              Iterator.single((id + PhashDupBase) ->
                dHash(Jpeg.decode(Jpeg.encode(decoded, quality = 98))))
            } else Iterator.empty
          base ++ variant
        } else Iterator.empty
      }).toDF("doc_id", "phash")
  }

  private def phashPipeline(s: SparkSession, dir: String): DataFrame =
    dHashPairs(phashes(s, dir), "doc_id", "phash")
      .orderBy("doc_a", "doc_b")

  /** Parametric library form: near-dup (doc_a, doc_b, hamming) pairs
    * from any (id, 64-bit perceptual hash) frame — compute the hash
    * partition-locally for your format ([[dHash]] for decoded
    * images), then band-join here. `maxHamming` must stay ≤ bands−1
    * (pigeonhole guarantee; enforced). Unsorted for library use.
    */
  def dHashPairs(
      hashes: DataFrame, idCol: String, hashCol: String,
      bands: Int = PhashBands, maxHamming: Int = PhashMaxHamming,
      maxBucket: Int = PhashMaxBucket): DataFrame = {
    require(maxHamming <= bands - 1,
      s"maxHamming=$maxHamming exceeds the hamming<=${bands - 1} recall guarantee of $bands bands")
    val bits = 64 / bands
    val mask = (1L << bits) - 1
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col(hashCol), b * bits).bitwiseAND(lit(mask)).as("bkey"))
    }
    val allBands = hashes.select(col(idCol), col(hashCol),
      explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col(hashCol),
        col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    CandidatePairs.cappedBandSelfJoin(
      allBands, idCol, Seq("band", "bkey"), maxBucket,
      pinShuffleHash = true)
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        bit_count(col(s"a.$hashCol").bitwiseXOR(col(s"b.$hashCol"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** mm_frames: multi-frame assets → sampled frames/windows →
    * per-modality patch stats. */
  private def framePipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val multiFrame = assets(s, dir)
      .filter(t => { val m = MediaGen.modality(t._1); m == 2 || m == 3 })
    sampleFrames(multiFrame).toDF()
      .withColumn("patch_mean",
        graft.functions.dot_product(col("patch"),
          array_repeat(lit(1.0f / ResizeDim), ResizeDim)))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_frames_sampled"),
        countDistinct(col("doc_id")).as("n_assets"),
        round(avg(col("patch_mean")), 5).as("avg_patch_mean"))
      .orderBy("kind")
  }
  // --- mm_phash_cluster: image duplicate CLUSTERS ------------------
  // mm_phash proposes pairwise near-dups; a curation pass needs the
  // transitive closure (one canonical per image cluster, exactly as
  // cur_semdedup does for embeddings): min-label connected
  // components over the phash pairs — the SAME |pairs|-bounded
  // propagation the text/embedding dedup families use, reused as-is
  // on multimodal fingerprints. Per image: (doc_id, component,
  // is_canonical). Payload bytes never shuffle (the pairs carry
  // 8-byte hashes); cluster state is |pairs|-bounded. The planted
  // variants (re-encode, brightness-scale) must land in their
  // original's cluster — spec-asserted; unpaired images form no
  // row here (their cluster is themselves), matching
  // connectedComponents' contract.
  private def phashClusterPipeline(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.connectedComponents(
        dHashPairs(phashes(s, dir), "doc_id", "phash")
          .select(col("doc_a"), col("doc_b")))
      .select(col("v").as("doc_id"), col("label").as("component"),
        (col("v") === col("label")).as("is_canonical"))
      .orderBy("component", "doc_id")

  // --- mm_scene_cut: shot-boundary detection -----------------------
  // The classic video-curation primitive (a training pipeline keeps
  // one keyframe per shot, not every frame): consecutive-frame mean
  // absolute pixel difference, a cut wherever it clears a threshold.
  // Runs on scene-STRUCTURED synthetic videos ([[graft.mm.MediaGen
  // .sceneFrame]] — shot-seeded content with one jitter row per
  // frame), because payload()'s noise frames would make every
  // transition a cut. Entirely partition-local: one task decodes a
  // video's frames and folds the pairwise diffs; only the per-doc
  // summary row (6 scalars) ever shuffles — at 100 TB of video the
  // payload bytes never leave their input split, the same contract
  // as every other mm_* stage. The generator's shot arithmetic is
  // the planted ground truth: n_shots must equal
  // ceil(frames/shotLen) exactly (spec), intra-shot jitter must
  // stay under the threshold, cross-shot jumps over it.
  final case class SceneDoc(
      doc_id: Long,
      n_frames: Int,
      n_cuts: Int,
      n_shots: Int,
      max_cut_milli: Long,   // strongest shot transition
      max_intra_milli: Long) // strongest within-shot motion

  val CutThresholdMilli = 100L

  private def sceneCutPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.parallelized(Tables.documents(s, dir).select(col("doc_id"))).as[Long]
      .filter((id: Long) => MediaGen.modality(id) == 3) // the video slice
      .mapPartitions(_.map { id =>
        val d = graft.mm.Png.decode(MediaGen.scenePayload(id))
        var cuts = 0; var maxCut = 0L; var maxIntra = 0L
        var i = 1
        while (i < d.frames.length) {
          val a = d.frames(i - 1).pixels
          val b = d.frames(i).pixels
          var sum = 0L; var j = 0
          while (j < a.length) {
            sum += math.abs((a(j) & 0xff) - (b(j) & 0xff)); j += 1
          }
          val diffMilli = sum * 1000L / (a.length.toLong * 255L)
          if (diffMilli >= CutThresholdMilli) {
            cuts += 1; if (diffMilli > maxCut) maxCut = diffMilli
          } else if (diffMilli > maxIntra) maxIntra = diffMilli
          i += 1
        }
        SceneDoc(id, d.frames.length, cuts, cuts + 1, maxCut, maxIntra)
      }).toDF()
      .orderBy("doc_id")
  }
  // --- mm_audio_vad: voice-activity segmentation -------------------
  // The audio twin of mm_scene_cut (speech curation keeps voiced
  // segments, drops silence): per-window RMS over the decoded PCM,
  // a window is voiced when its RMS clears the gate, consecutive
  // voiced windows merge into segments. Speech-STRUCTURED synthetic
  // clips ([[graft.mm.MediaGen.vadPayload]] — planted alternating
  // silence/speech runs; audio()'s continuous wave is always-voiced
  // and untouched, so the other mm pins hold). Partition-local: one
  // task decodes a clip and folds its windows; 7 scalars per doc
  // shuffle. Ground truth is the generator's run arithmetic:
  // n_segments == vadSegCount exactly (spec), with two orders of
  // RMS margin on each side of the gate.
  final case class VadDoc(
      doc_id: Long,
      n_windows: Int,
      n_voiced: Int,
      n_segments: Int,
      longest_segment: Int,
      max_silence_rms_milli: Long, // loudest rejected window
      min_voiced_rms_milli: Long)  // faintest admitted window

  val VadGateMilli = 50L

  private def audioVadPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.parallelized(Tables.documents(s, dir).select(col("doc_id"))).as[Long]
      .filter((id: Long) => MediaGen.modality(id) == 2) // the audio slice
      .mapPartitions(_.map { id =>
        val a = graft.mm.Wav.decode(MediaGen.vadPayload(id))
        val W = MediaGen.VadWindow
        val nWin = a.samples.length / W
        var voiced = 0; var segs = 0; var run = 0; var longest = 0
        var maxSil = 0L; var minVoi = Long.MaxValue
        var w = 0
        while (w < nWin) {
          var sq = 0.0; var i = 0
          while (i < W) {
            val v = a.samples(w * W + i).toDouble; sq += v * v; i += 1
          }
          val rmsMilli = (math.sqrt(sq / W) * 1000L / 32768L).toLong
          if (rmsMilli >= VadGateMilli) {
            voiced += 1
            if (run == 0) segs += 1
            run += 1; if (run > longest) longest = run
            if (rmsMilli < minVoi) minVoi = rmsMilli
          } else {
            run = 0
            if (rmsMilli > maxSil) maxSil = rmsMilli
          }
          w += 1
        }
        VadDoc(id, nWin, voiced, segs, longest,
          maxSil, if (minVoi == Long.MaxValue) 0L else minVoi)
      }).toDF()
      .orderBy("doc_id")
  }
}
