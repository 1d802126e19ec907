package graft.mm

/** Deterministic synthetic media, keyed on a doc id. The container
  * has no media fixtures, so each doc's payload is generated
  * procedurally — REAL encoded bytes (valid PNG/APNG/WAV/JFIF
  * streams the codecs in this package round-trip), with content
  * derived from a splitmix-style hash of (id, position) so every
  * run and every engine produces identical payloads.
  */
object MediaGen {

  /** modality assignment: 0=png, 1=jpeg, 2=wav, 3=apng */
  def modality(id: Long): Int = (id % 4).toInt

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def image(id: Long, frame: Int = 0): Png.Image = {
    val w = 24 + (id % 17).toInt
    val h = 16 + (id % 13).toInt
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = mix(id * 1000003L + frame * 7919L + y * 131L + x)
        val o = (y * w + x) * 3
        px(o) = (v & 0xff).toByte
        px(o + 1) = ((v >>> 8) & 0xff).toByte
        px(o + 2) = ((v >>> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Png.Image(w, h, 3, px)
  }

  def animationFrameCount(id: Long): Int = 2 + (id % 6).toInt

  def audio(id: Long): Wav.Audio = {
    val n = 1600 + (id % 800).toInt
    val period = 20 + (id % 50).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      // integer triangle wave + hash dither: deterministic, has sign
      // structure (for ZCR) and bounded amplitude (for RMS)
      val phase = i % period
      val tri = if (phase < period / 2) phase else period - phase
      val dither = (mix(id * 31 + i) % 997).toInt
      samples(i) = ((tri * 20000 / math.max(1, period / 2)) - 10000 + dither).toShort
      i += 1
    }
    Wav.Audio(8000, 1, samples)
  }

  // --- scene-structured video (mm_scene_cut's input) --------------
  // payload()'s APNG frames are per-frame noise — every transition
  // would be a "cut". Shot-boundary detection needs SHOTS: runs of
  // near-identical frames with hard content jumps between them. A
  // separate generator path keeps payload() (and every mm_* content
  // pin built on it) byte-stable.
  def sceneShotLen(id: Long): Int = 2 + (id % 3).toInt
  def sceneFrameCount(id: Long): Int = 6 + (id % 6).toInt

  /** Frame f of id's scene video: content seeded by the SHOT index
    * (frames within a shot share pixels), plus one per-frame
    * regenerated row — small nonzero intra-shot motion (~2% mean
    * abs diff) well under the cross-shot jump (~33%). */
  def sceneFrame(id: Long, f: Int): Png.Image = {
    val w = 24 + (id % 17).toInt
    val h = 16 + (id % 13).toInt
    val shot = f / sceneShotLen(id)
    val jitterRow = (f * 5 + shot) % h
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v =
          if (y == jitterRow) mix(id * 95279L + f * 337L + x)
          else mix(id * 95279L + shot * 7919L + y * 131L + x)
        val o = (y * w + x) * 3
        px(o) = (v & 0xff).toByte
        px(o + 1) = ((v >>> 8) & 0xff).toByte
        px(o + 2) = ((v >>> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Png.Image(w, h, 3, px)
  }

  def scenePayload(id: Long): Array[Byte] =
    Png.encodeFrames((0 until sceneFrameCount(id)).map(f => sceneFrame(id, f)))

  // --- speech-structured audio (mm_audio_vad's input) -------------
  // audio()'s continuous triangle wave is "always voiced" — VAD
  // needs alternating silence/speech runs. Separate path, same
  // byte-stability contract as scenePayload.
  val VadWindow = 256 // samples per VAD analysis window

  // NOTE: the audio modality slice is ids ≡ 2 (mod 4), so the run
  // arithmetic keys on id/4 — a plain id%k would collapse to one
  // value across every audio doc.
  def vadSegCount(id: Long): Int = 2 + ((id / 4) % 4).toInt

  /** Silence run (windows) BEFORE voiced segment k, and the voiced
    * run's own length — both ≥1 window so runs never merge. */
  def vadSilenceLen(id: Long, k: Int): Int = 2 + ((id / 4 + k) % 2).toInt
  def vadVoicedLen(id: Long, k: Int): Int = 1 + ((id / 4 + k) % 3).toInt

  /** Speech-shaped clip: vadSegCount voiced segments (triangle wave,
    * ±10000 ≈ 176‰ RMS) separated by dither-only silence (±300 ≈ 9‰
    * RMS) — two orders of margin around a 50‰ gate. */
  def vadPayload(id: Long): Array[Byte] = {
    val segs = vadSegCount(id)
    val out = scala.collection.mutable.ArrayBuffer.empty[Short]
    def silence(windows: Int, salt: Int): Unit = {
      var i = 0
      while (i < windows * VadWindow) {
        out += ((mix(id * 131 + salt * 17 + i) % 601) - 300).toShort
        i += 1
      }
    }
    var k = 0
    while (k < segs) {
      silence(vadSilenceLen(id, k), k)
      val period = 20 + ((id / 4 + k) % 50).toInt
      var i = 0
      while (i < vadVoicedLen(id, k) * VadWindow) {
        val phase = i % period
        val tri = if (phase < period / 2) phase else period - phase
        out += ((tri * 20000 / math.max(1, period / 2)) - 10000).toShort
        i += 1
      }
      k += 1
    }
    silence(2, segs) // trailing silence closes the last segment
    Wav.encode(Wav.Audio(8000, 1, out.toArray))
  }

  /** The encoded payload for a doc id — what a real pipeline would
    * read from an object-store column. */
  def payload(id: Long): Array[Byte] = modality(id) match {
    case 0 => Png.encode(image(id))
    case 1 => Jpeg.encode(image(id), quality = 90) // real baseline DCT
    case 2 => Wav.encode(audio(id))
    case _ =>
      val frames = (0 until animationFrameCount(id)).map(f => image(id, f))
      Png.encodeFrames(frames)
  }
}
