package graft

import graft.mm.{Jpeg, MediaGen, Png, Wav}
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip specs for the clean-room media codecs backing
  * mm_decode/mm_frames. These run no Spark — they pin down the byte
  * formats so the operator tests can trust decode output.
  */
class MmCodecSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, ch: Int, seed: Int): Png.Image = {
    val px = Array.tabulate(w * h * ch)(i => ((i * 31 + seed * 7) % 251).toByte)
    Png.Image(w, h, ch, px)
  }

  test("PNG round-trips RGB pixels exactly (all five filters exercised)") {
    // height ≥ 5 guarantees every filter type appears (row % 5)
    val src = img(21, 9, 3, 1)
    val decoded = Png.decode(Png.encode(src))
    assert(decoded.width == 21 && decoded.height == 9 && decoded.channels == 3)
    assert(decoded.frames.head.pixels.sameElements(src.pixels))
  }

  test("PNG round-trips greyscale and RGBA") {
    for (ch <- Seq(1, 4)) {
      val src = img(13, 7, ch, ch)
      val d = Png.decode(Png.encode(src))
      assert(d.channels == ch)
      assert(d.frames.head.pixels.sameElements(src.pixels))
    }
  }

  test("PNG decode rejects corrupted bytes (CRC check)") {
    val bytes = Png.encode(img(8, 8, 3, 2))
    bytes(40) = (bytes(40) ^ 0x55).toByte // flip a byte inside IHDR/IDAT
    intercept[Exception](Png.decode(bytes))
  }

  test("APNG round-trips every frame") {
    val frames = (0 until 4).map(f => img(10, 6, 3, f))
    val d = Png.decode(Png.encodeFrames(frames))
    assert(d.frames.length == 4)
    frames.zip(d.frames).foreach { case (a, b) =>
      assert(a.pixels.sameElements(b.pixels))
    }
  }

  test("WAV round-trips PCM16 samples and rates") {
    val audio = Wav.Audio(16000, 2, Array.tabulate(2048)(i => ((i * 37) % 30000 - 15000).toShort))
    val d = Wav.decode(Wav.encode(audio))
    assert(d.sampleRate == 16000 && d.channels == 2)
    assert(d.samples.sameElements(audio.samples))
  }

  test("WAV features: silence has zero RMS, alternating wave crosses every step") {
    assert(Wav.Audio(8000, 1, Array.fill(100)(0.toShort)).rms == 0.0)
    val alt = Wav.Audio(8000, 1, Array.tabulate(100)(i => (if (i % 2 == 0) 1000 else -1000).toShort))
    assert(alt.zeroCrossingRate == 1.0)
  }

  test("JPEG header parse recovers dimensions from generated JFIF") {
    val bytes = Jpeg.encodeHeaderOnly(640, 480, 3, seed = 42L)
    val m = Jpeg.parseHeader(bytes)
    assert(m.width == 640 && m.height == 480 && m.components == 3)
  }

  test("JPEG parser tolerates fill bytes before markers") {
    val bytes = Jpeg.encodeHeaderOnly(320, 200, 3, seed = 7L)
    // legal padding: inject 0xff fill bytes before the APP0 marker
    val padded = bytes.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++ bytes.drop(2)
    val m = Jpeg.parseHeader(padded)
    assert(m.width == 320 && m.height == 200)
  }

  test("JPEG parser rejects non-JPEG input") {
    intercept[Exception](Jpeg.parseHeader(Array[Byte](1, 2, 3, 4)))
    intercept[Exception](Jpeg.parseHeader(Png.encode(img(4, 4, 3, 0))))
  }

  test("JPEG baseline DCT round-trip: RGB pixels within quantization error") {
    // smooth gradient: the signal JPEG is designed for — q90 must
    // reconstruct it closely (noise images bound looser, below)
    val w = 37; val h = 23
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      px(o) = (x * 6 % 256).toByte
      px(o + 1) = (y * 9 % 256).toByte
      px(o + 2) = ((x + y) * 4 % 256).toByte
    }
    val src = Png.Image(w, h, 3, px)
    val dec = Jpeg.decode(Jpeg.encode(src, quality = 90))
    assert(dec.width == w && dec.height == h && dec.channels == 3)
    val maxDiff = src.pixels.zip(dec.pixels)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxDiff <= 16, s"gradient maxDiff=$maxDiff")
    // noise image (MediaGen corpus shape): bounded mean error
    val nz = MediaGen.image(5L)
    val nd = Jpeg.decode(Jpeg.encode(nz, quality = 90))
    val diffs = nz.pixels.zip(nd.pixels)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
    assert(diffs.sum.toDouble / diffs.length < 10.0)
    // header probe agrees with the full decode
    assert(Jpeg.parseHeader(Jpeg.encode(nz, 90)) ==
      Jpeg.JpegMeta(nz.width, nz.height, 3))
  }

  test("JPEG grayscale round-trip + near-lossless at q100") {
    val g = Png.Image(20, 14, 1,
      Array.tabulate(280)(i => ((i % 20) * 12).toByte))
    val gd = Jpeg.decode(Jpeg.encode(g, quality = 95))
    assert(gd.channels == 1 && gd.width == 20 && gd.height == 14)
    val maxG = g.pixels.zip(gd.pixels)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxG <= 6, s"gray maxDiff=$maxG")
    // q100 quant tables are all ~1: DCT round-off only
    val q100 = Jpeg.decode(Jpeg.encode(g, quality = 100))
    val max100 = g.pixels.zip(q100.pixels)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(max100 <= 2, s"q100 maxDiff=$max100")
  }

  test("JPEG round-trip content is pinned (deterministic both ways)") {
    // byte determinism of the encoder AND pixel determinism of the
    // decoder, pinned — codec drift fails here before it silently
    // shifts mm_decode/mm_phash hashes
    val enc = Jpeg.encode(MediaGen.image(13L), quality = 90)
    assert(enc.length == 1797, s"enc bytes ${enc.length}")
    assert(java.util.Arrays.equals(enc, Jpeg.encode(MediaGen.image(13L), 90)))
    val encHash = java.util.Arrays.hashCode(enc)
    val pixHash = java.util.Arrays.hashCode(Jpeg.decode(enc).pixels)
    assert(encHash == 1928531695, s"encoded bytes drifted: $encHash")
    assert(pixHash == -789727150, s"decoded pixels drifted: $pixHash")
  }

  test("JPEG 4:2:0 round-trip: MCU-interleaved subsampled chroma upsamples back") {
    // the layout virtually every camera/web encoder emits: 2x2 luma
    // blocks + box-averaged half-res chroma per MCU — drives the
    // decoder's general sampling-factor/upsampling path
    val w = 37; val h = 23 // non-multiples of 16: edge MCUs exercised
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      px(o) = (x * 6 % 256).toByte
      px(o + 1) = (y * 9 % 256).toByte
      px(o + 2) = ((x + y) * 4 % 256).toByte
    }
    val src = Png.Image(w, h, 3, px)
    val e420 = Jpeg.encode(src, 90, subsample = true)
    assert(Jpeg.parseHeader(e420) == Jpeg.JpegMeta(w, h, 3))
    val d = Jpeg.decode(e420)
    assert(d.width == w && d.height == h && d.channels == 3)
    val diffs = src.pixels.zip(d.pixels)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
    assert(diffs.max <= 20, s"4:2:0 gradient maxDiff=${diffs.max}")
    // and 4:2:0 genuinely pays off in bytes on chroma-smooth content
    assert(e420.length < Jpeg.encode(src, 90).length)
  }

  test("MediaGen payloads decode under container sniffing for all modalities") {
    (0L until 32L).foreach { id =>
      val meta = operators.Multimodal.decodeMeta(id, MediaGen.payload(id))
      MediaGen.modality(id) match {
        case 0 => assert(meta.format == "png" && meta.n_frames == 1 && meta.width > 0)
        case 1 => assert(meta.format == "jpeg" && meta.width > 0)
        case 2 => assert(meta.format == "wav" && meta.sample_rate == 8000 && meta.feature > 0)
        case _ => assert(meta.format == "apng" && meta.n_frames == MediaGen.animationFrameCount(id))
      }
    }
  }

  test("property: PNG round-trips arbitrary images (all sizes, channels, bytes)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 24)
      ch <- Gen.oneOf(1, 3, 4)
      seed <- Gen.choose(Int.MinValue, Int.MaxValue)
    } yield (w, h, ch, seed)
    val prop = forAll(gen) { case (w, h, ch, seed) =>
      val rnd = new scala.util.Random(seed)
      val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val d = Png.decode(Png.encode(Png.Image(w, h, ch, px)))
      d.width == w && d.height == h && d.channels == ch &&
        d.frames.head.pixels.sameElements(px)
    }
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: WAV round-trips arbitrary PCM16 streams") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val gen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      ch <- Gen.oneOf(1, 2)
      n <- Gen.choose(0, 4096)
      seed <- Gen.choose(Int.MinValue, Int.MaxValue)
    } yield (rate, ch, n - n % ch, seed)
    val prop = forAll(gen) { case (rate, ch, n, seed) =>
      val rnd = new scala.util.Random(seed)
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val d = Wav.decode(Wav.encode(Wav.Audio(rate, ch, samples)))
      d.sampleRate == rate && d.channels == ch && d.samples.sameElements(samples)
    }
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("MediaGen is deterministic") {
    (0L until 8L).foreach { id =>
      assert(MediaGen.payload(id).sameElements(MediaGen.payload(id)))
    }
  }

  test("resize: same-geometry resample is the identity") {
    val src = img(17, 11, 3, 5)
    val out = graft.mm.Resize.bilinear(src, 17, 11)
    assert(out.pixels.sameElements(src.pixels))
  }

  test("resize: constant images stay constant at any geometry") {
    for ((w, h) <- Seq((1, 1), (3, 9), (40, 7), (64, 64))) {
      val const = Png.Image(23, 13, 1, Array.fill(23 * 13)(137.toByte))
      val out = graft.mm.Resize.bilinear(const, w, h)
      assert(out.width == w && out.height == h)
      assert(out.pixels.forall(p => (p & 0xff) == 137))
    }
  }

  test("resize: 2x downsample of a 2x2 block grid averages each block") {
    // 4×2 image of two 2×2-ish column pairs: [0,0,200,200] per row →
    // 2×1 output = the two column-pair means (half-pixel centers land
    // exactly between the paired columns)
    val px = Array[Byte](0, 0, 200.toByte, 200.toByte, 0, 0, 200.toByte, 200.toByte)
    val out = graft.mm.Resize.bilinear(Png.Image(4, 2, 1, px), 2, 1)
    assert(out.pixels.map(_ & 0xff).toSeq == Seq(0, 200))
  }

  test("resample: same-rate conversion is the identity") {
    val a = Wav.Audio(16000, 2, Array.tabulate(3200)(i => (i * 7 % 2000 - 1000).toShort))
    val out = graft.mm.Resample.linear(a, 16000)
    assert(out.sampleRate == 16000 && out.samples.sameElements(a.samples))
  }

  test("resample: constant signals stay constant at any rate") {
    for (rate <- Seq(4000, 8000, 11025, 44100)) {
      val a = Wav.Audio(16000, 1, Array.fill(1600)(777.toShort))
      val out = graft.mm.Resample.linear(a, rate)
      assert(out.sampleRate == rate)
      assert(math.abs(out.nFrames - 1600.0 * rate / 16000) <= 1)
      assert(out.samples.forall(_ == 777))
    }
  }

  test("resample: linear ramps land on the same ramp (interp is exact on affine signals)") {
    // in: ramp s[i] = 4i at 16 kHz; out at 8 kHz must be s'[j] = 8j
    val a = Wav.Audio(16000, 1, Array.tabulate(1000)(i => (4 * i).toShort))
    val out = graft.mm.Resample.linear(a, 8000)
    out.samples.zipWithIndex.foreach { case (s, j) =>
      assert(math.abs(s - 8 * j) <= 1, s"frame $j: $s vs ${8 * j}")
    }
    // and upsampled 2×: s'[j] = 2j, interpolated midpoints exact
    val up = graft.mm.Resample.linear(a, 32000)
    up.samples.zipWithIndex.take(1990).foreach { case (s, j) =>
      assert(math.abs(s - 2 * j) <= 1, s"frame $j: $s vs ${2 * j}")
    }
  }

  test("property: resample is convex-bounded and channel-independent") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val gen = for {
      n <- Gen.choose(1, 400); inRate <- Gen.choose(1000, 48000)
      outRate <- Gen.choose(1000, 48000); seed <- Gen.choose(Int.MinValue, Int.MaxValue)
    } yield (n, inRate, outRate, seed)
    val prop = forAll(gen) { case (n, inRate, outRate, seed) =>
      val rnd = new scala.util.Random(seed)
      val st = Wav.Audio(inRate, 2,
        Array.fill(n * 2)((rnd.nextInt(65536) - 32768).toShort))
      val out = graft.mm.Resample.linear(st, outRate)
      val bounded = (0 until 2).forall { c =>
        val inC = st.samples.indices.collect { case i if i % 2 == c => st.samples(i).toInt }
        val outC = out.samples.indices.collect { case i if i % 2 == c => out.samples(i).toInt }
        outC.forall(v => v >= inC.min - 1 && v <= inC.max + 1) // ±1 rounding
      }
      val independent = (0 until 2).forall { c =>
        val mono = Wav.Audio(inRate, 1,
          Array.tabulate(n)(i => st.samples(i * 2 + c)))
        val monoOut = graft.mm.Resample.linear(mono, outRate)
        monoOut.samples.indices.forall(i => monoOut.samples(i) == out.samples(i * 2 + c))
      }
      bounded && independent
    }
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: resize output is convex-bounded and channel-independent") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val gen = for {
      w <- Gen.choose(1, 48); h <- Gen.choose(1, 32)
      ow <- Gen.choose(1, 16); oh <- Gen.choose(1, 16)
      seed <- Gen.choose(Int.MinValue, Int.MaxValue)
    } yield (w, h, ow, oh, seed)
    val prop = forAll(gen) { case (w, h, ow, oh, seed) =>
      val rnd = new scala.util.Random(seed)
      val rgb = Png.Image(w, h, 3, Array.fill(w * h * 3)(rnd.nextInt(256).toByte))
      val out = graft.mm.Resize.bilinear(rgb, ow, oh)
      // every interpolated value is a convex combination of source
      // pixels → bounded by the per-channel source min/max (catches
      // shifted/out-of-range index math)
      val bounded = (0 until 3).forall { c =>
        val srcC = rgb.pixels.indices.collect { case i if i % 3 == c => rgb.pixels(i) & 0xff }
        val outC = out.pixels.indices.collect { case i if i % 3 == c => out.pixels(i) & 0xff }
        outC.forall(v => v >= srcC.min && v <= srcC.max)
      }
      // channels never mix: resizing the interleaved image equals
      // resizing each channel plane separately
      val independent = (0 until 3).forall { c =>
        val plane = Png.Image(w, h, 1,
          Array.tabulate(w * h)(i => rgb.pixels(i * 3 + c)))
        val planeOut = graft.mm.Resize.bilinear(plane, ow, oh)
        planeOut.pixels.indices.forall(i => planeOut.pixels(i) == out.pixels(i * 3 + c))
      }
      bounded && independent
    }
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  // ---- mm_phash: dHash invariance properties ----------------------

  test("dHash is invariant under re-encoding (identical pixels, fresh bytes)") {
    (0L until 40L).foreach { id =>
      val img = MediaGen.image(id)
      val redecoded = Png.decode(Png.encode(img)).frames.head
      assert(graft.operators.Multimodal.dHash(img) ==
        graft.operators.Multimodal.dHash(redecoded), s"id=$id")
    }
  }

  test("dHash survives brightness scaling within the pair threshold") {
    (0L until 40L).foreach { id =>
      val img = MediaGen.image(id)
      val px = img.pixels.clone()
      px.indices.foreach(i => px(i) = (((px(i) & 0xff) * 9) / 10).toByte)
      val h = java.lang.Long.bitCount(
        graft.operators.Multimodal.dHash(img) ^
          graft.operators.Multimodal.dHash(img.copy(pixels = px)))
      assert(h <= graft.operators.Multimodal.PhashMaxHamming,
        s"id=$id hamming=$h")
    }
  }

  // ---- adversarial/foreign inputs fail LOUDLY, never silently ------

  /** Replace the chunk at byte offset `at` after patching its data
    * with `patch`, recomputing the CRC the decoder checks. */
  private def patchChunk(png: Array[Byte], at: Int)(patch: Array[Byte] => Unit): Array[Byte] = {
    val out = png.clone()
    val len = java.nio.ByteBuffer.wrap(out, at, 4).getInt
    val data = java.util.Arrays.copyOfRange(out, at + 8, at + 8 + len)
    patch(data)
    System.arraycopy(data, 0, out, at + 8, len)
    val crc = new java.util.zip.CRC32
    crc.update(out, at + 4, 4 + len)
    java.nio.ByteBuffer.wrap(out, at + 8 + len, 4).putInt(crc.getValue.toInt)
    out
  }

  test("interlaced (Adam7) PNG is rejected, not silently garbled") {
    val png = Png.encode(img(8, 8, 3, 1))
    val interlaced = patchChunk(png, 8)(d => d(12) = 1) // IHDR interlace byte
    val e = intercept[IllegalArgumentException](Png.decode(interlaced))
    assert(e.getMessage.contains("Adam7"), e.getMessage)
  }

  test("APNG with the default image excluded from the animation decodes") {
    // spec-valid form: acTL declares only the fdAT frames; no fcTL
    // before IDAT. Build it by chunk surgery: drop the first fcTL and
    // decrement the acTL count.
    val apng = Png.encodeFrames((0 until 3).map(f => img(6, 4, 3, f)))
    // locate chunks
    def chunks(b: Array[Byte]): Seq[(String, Int)] = {
      var pos = 8; val out = Seq.newBuilder[(String, Int)]
      while (pos + 8 <= b.length) {
        val len = java.nio.ByteBuffer.wrap(b, pos, 4).getInt
        out += ((new String(b, pos + 4, 4, "US-ASCII"), pos))
        pos += 12 + len
      }
      out.result()
    }
    val firstFctl = chunks(apng).find(_._1 == "fcTL").get._2
    val fctlLen = java.nio.ByteBuffer.wrap(apng, firstFctl, 4).getInt
    val without = apng.take(firstFctl) ++ apng.drop(firstFctl + 12 + fctlLen)
    val actlAt = chunks(without).find(_._1 == "acTL").get._2
    val fixed = patchChunk(without, actlAt)(d =>
      java.nio.ByteBuffer.wrap(d).putInt(2)) // 2 animation frames now
    val d = Png.decode(fixed)
    assert(d.frames.length == 3) // default image + 2 animation frames
  }

  test("sub-frame APNG (optimizer output) is rejected with a clear error") {
    val apng = Png.encodeFrames((0 until 2).map(f => img(8, 8, 3, f)))
    // shrink the SECOND frame's fcTL geometry to a 4x4 sub-rectangle
    var pos = 8; var count = 0; var secondFctl = -1
    while (pos + 8 <= apng.length && secondFctl < 0) {
      val len = java.nio.ByteBuffer.wrap(apng, pos, 4).getInt
      if (new String(apng, pos + 4, 4, "US-ASCII") == "fcTL") {
        count += 1; if (count == 2) secondFctl = pos
      }
      pos += 12 + len
    }
    val sub = patchChunk(apng, secondFctl) { d =>
      java.nio.ByteBuffer.wrap(d, 4, 8).putInt(4).putInt(4) // frame w/h
    }
    val e = intercept[IllegalArgumentException](Png.decode(sub))
    assert(e.getMessage.contains("sub-frame"), e.getMessage)
  }

  test("truncated JPEG entropy stream is rejected, not decoded to garbage") {
    val enc = Jpeg.encode(img(64, 64, 3, 9), quality = 90)
    val e = intercept[IllegalArgumentException](
      Jpeg.decode(enc.dropRight(200)))
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("4-component (CMYK-style) JPEG is rejected with a named reason") {
    val cmyk = Jpeg.encodeHeaderOnly(8, 8, components = 4, seed = 1)
    val e = intercept[IllegalArgumentException](Jpeg.decode(cmyk))
    assert(e.getMessage.contains("component"), e.getMessage)
  }

  test("oversized JPEG encode is rejected at the u16 SOF limit") {
    intercept[IllegalArgumentException](
      Jpeg.encodeHeaderOnly(70000, 8, components = 1, seed = 1))
  }

  test("WAV with a zero channel count is rejected") {
    val wav = Wav.encode(Wav.Audio(8000, 1, Array.tabulate(64)(_.toShort)))
    wav(22) = 0; wav(23) = 0 // fmt channels u16 LE
    val e = intercept[IllegalArgumentException](Wav.decode(wav))
    assert(e.getMessage.contains("channel"), e.getMessage)
  }

  test("dHash separates unrelated images (no band-join false positives)") {
    val hs = (0L until 80L).map(id => graft.operators.Multimodal.dHash(MediaGen.image(id)))
    val pairs = for {
      i <- hs.indices; j <- (i + 1) until hs.size
    } yield java.lang.Long.bitCount(hs(i) ^ hs(j))
    // unrelated hash-noise images should sit near hamming 32; none
    // may cross the near-dup threshold
    assert(pairs.min > graft.operators.Multimodal.PhashMaxHamming)
  }
}
