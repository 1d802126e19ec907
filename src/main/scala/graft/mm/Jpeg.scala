package graft.mm

/** Baseline JPEG (ITU-T T.81 sequential DCT) codec — a pure
  * clean-room byte/bit walk over the public interchange format, no
  * imaging libraries. Covers the dominant web image format end to
  * end so mm_decode / mm_resize / mm_phash operate on real JPEG
  * pixels, not just header metadata:
  *
  *  - [[encode]]: RGB (or gray) → JFIF stream. 8-bit baseline,
  *    4:4:4 (no subsampling), Annex K quantization tables scaled by
  *    the common 1..100 quality mapping, Annex K.3 Huffman tables.
  *  - [[decode]]: JFIF/EXIF stream → pixels. General sampling
  *    factors (4:4:4 / 4:2:2 / 4:2:0 via replication upsampling),
  *    multiple DQT/DHT segments, restart markers, 0xFF00 stuffing.
  *  - [[parseHeader]]: cheap dimensions/components probe (no
  *    entropy decode) for metadata-only paths.
  *
  * Everything is integer/double arithmetic on deterministic inputs,
  * so encoded bytes AND decoded pixels are exactly reproducible —
  * which is what lets MmCodecSpec pin round-trips by content hash.
  */
object Jpeg {

  final case class JpegMeta(width: Int, height: Int, components: Int)

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  def parseHeader(jpeg: Array[Byte]): JpegMeta = {
    require(jpeg.length >= 4 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG (missing SOI)")
    var pos = 2
    while (pos + 4 <= jpeg.length) {
      require((jpeg(pos) & 0xff) == 0xff, f"bad marker alignment at $pos")
      // fill bytes: any number of 0xff may pad before the marker id
      while (pos + 4 <= jpeg.length && (jpeg(pos + 1) & 0xff) == 0xff) pos += 1
      val marker = jpeg(pos + 1) & 0xff
      if (marker == 0xd9) throw new IllegalArgumentException("EOI before SOF")
      val len = u16(jpeg, pos + 2)
      // SOF0 (baseline) .. SOF2 (progressive) carry the frame header
      if (marker >= 0xc0 && marker <= 0xc2) {
        val height = u16(jpeg, pos + 5)
        val width = u16(jpeg, pos + 7)
        val comps = jpeg(pos + 9) & 0xff
        return JpegMeta(width, height, comps)
      }
      if (marker == 0xda) throw new IllegalArgumentException("SOS before SOF")
      pos += 2 + len
    }
    throw new IllegalArgumentException("no SOF marker found")
  }

  // ---- shared constant tables (public spec values) -----------------

  /** Zig-zag index order (T.81 Figure 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance / K.2 chrominance quantization tables. */
  private val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)
  private val QChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  /** Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL). */
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChromBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).toArray
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  private def scaleQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  // ---- encoder -----------------------------------------------------

  /** Canonical Huffman encode table: value → (code, length). */
  private def buildEncTable(bits: Array[Int], vals: Array[Int]): Array[Int] = {
    // packed as (len << 24) | code, indexed by value byte
    val table = new Array[Int](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        table(vals(k)) = (len << 24) | code
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = ((acc >>> (nbits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // stuffing
        nbits -= 8
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1-bits (spec)
      val pad = 8 - nbits
      put((1 << pad) - 1, pad)
    }
  }

  /** Bit category + amplitude bits of v (T.81 F.1.2.1). */
  private def category(v: Int): (Int, Int) = {
    val a = math.abs(v)
    var n = 0
    while ((a >> n) != 0) n += 1
    val bitsVal = if (v >= 0) v else v + (1 << n) - 1
    (n, bitsVal)
  }

  // Precomputed StrictMath cosine table: cos((2i+1)·k·π/16) for the
  // 64 (i, k) pairs both DCT directions use. StrictMath (fdlibm) is
  // bit-identical on every JVM/arch, where Math.cos is only 1-ulp
  // bounded and may use platform intrinsics — a single ulp at a
  // quantization tie would flip encoded bytes and break the pinned
  // content hashes cross-platform. Also removes 2048 transcendental
  // calls per block from the decode/encode hot path.
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    var i = 0
    while (i < 8) {
      var k = 0
      while (k < 8) {
        t(i * 8 + k) = StrictMath.cos((2 * i + 1) * k * StrictMath.PI / 16)
        k += 1
      }
      i += 1
    }
    t
  }
  private val InvSqrt2 = StrictMath.sqrt(0.5)

  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    val tmp = new Array[Double](64)
    // rows
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          s += block(y * 8 + x) * Cos(x * 8 + u)
          x += 1
        }
        tmp(y * 8 + u) = s * (if (u == 0) InvSqrt2 else 1.0) / 2
        u += 1
      }
      y += 1
    }
    // cols
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) {
          s += tmp(yy * 8 + u) * Cos(yy * 8 + v)
          yy += 1
        }
        out(v * 8 + u) = s * (if (v == 0) InvSqrt2 else 1.0) / 2
        v += 1
      }
      u += 1
    }
    out
  }

  private def idct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          s += (if (u == 0) InvSqrt2 else 1.0) * block(y * 8 + u) * Cos(x * 8 + u)
          u += 1
        }
        tmp(y * 8 + x) = s / 2
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          s += (if (v == 0) InvSqrt2 else 1.0) * tmp(v * 8 + x) * Cos(yy * 8 + v)
          v += 1
        }
        out(yy * 8 + x) = s / 2
        yy += 1
      }
      x += 1
    }
    out
  }

  /** Encode an image (channels 1 = grayscale, 3 = RGB) as baseline
    * JFIF at `quality` (1..100), 4:4:4.
    */
  def encode(img: Png.Image, quality: Int = 90): Array[Byte] =
    encode(img, quality, subsample = false)

  /** `subsample = true` emits 4:2:0 (chroma box-averaged to half
    * resolution, 2x2 luma blocks per MCU) — the layout virtually
    * every camera/web encoder produces, so the decoder's
    * sampling-factor/upsampling path is testable against our own
    * writer. */
  def encode(img: Png.Image, quality: Int, subsample: Boolean): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"jpeg encode: ${img.channels} channels unsupported")
    // the SOF frame header carries u16 dimensions: larger images
    // would silently truncate to the low 16 bits while the entropy
    // data encodes the real MCU grid — a corrupt stream
    require(img.width <= 65535 && img.height <= 65535,
      s"jpeg encode: ${img.width}x${img.height} exceeds the u16 SOF limit")
    val w = img.width; val h = img.height
    val nComp = img.channels
    val sub = subsample && nComp == 3
    val compHs = if (sub) Array(2, 1, 1) else Array.fill(nComp)(1)
    val compVs = if (sub) Array(2, 1, 1) else Array.fill(nComp)(1)
    val maxH = compHs.max; val maxV = compVs.max
    // color transform to full-res component values (JFIF YCbCr)
    val full = Array.fill(nComp)(new Array[Double](w * h))
    var i = 0
    while (i < w * h) {
      if (nComp == 1) full(0)(i) = (img.pixels(i) & 0xff).toDouble
      else {
        val r = (img.pixels(i * 3) & 0xff).toDouble
        val g = (img.pixels(i * 3 + 1) & 0xff).toDouble
        val b = (img.pixels(i * 3 + 2) & 0xff).toDouble
        full(0)(i) = 0.299 * r + 0.587 * g + 0.114 * b
        full(1)(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        full(2)(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
      }
      i += 1
    }
    // per-component planes at sampling resolution (box average)
    val compW = Array.tabulate(nComp)(c => (w * compHs(c) + maxH - 1) / maxH)
    val compHh = Array.tabulate(nComp)(c => (h * compVs(c) + maxV - 1) / maxV)
    val planes = Array.tabulate(nComp) { c =>
      if (compHs(c) == maxH && compVs(c) == maxV) full(c)
      else {
        val fx = maxH / compHs(c); val fy = maxV / compVs(c)
        val p = new Array[Double](compW(c) * compHh(c))
        var y = 0
        while (y < compHh(c)) {
          var x = 0
          while (x < compW(c)) {
            var s = 0.0; var n = 0
            var dy = 0
            while (dy < fy) {
              val sy = y * fy + dy
              var dx = 0
              while (dx < fx) {
                val sx = x * fx + dx
                if (sy < h && sx < w) { s += full(c)(sy * w + sx); n += 1 }
                dx += 1
              }
              dy += 1
            }
            p(y * compW(c) + x) = if (n == 0) 128.0 else s / n
            x += 1
          }
          y += 1
        }
        p
      }
    }
    val qLum = scaleQuant(QLum, quality)
    val qChrom = scaleQuant(QChrom, quality)
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, data: Array[Byte]): Unit = {
      out.write(0xff); out.write(marker)
      out.write((data.length + 2) >> 8); out.write((data.length + 2) & 0xff)
      out.write(data)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0 (lum) + table 1 (chrom, if color), zigzag order
    val dqt = new java.io.ByteArrayOutputStream()
    dqt.write(0x00); Zigzag.foreach(z => dqt.write(qLum(z)))
    if (nComp == 3) { dqt.write(0x01); Zigzag.foreach(z => dqt.write(qChrom(z))) }
    seg(0xdb, dqt.toByteArray)
    // SOF0
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8); sof.write(h >> 8); sof.write(h & 0xff)
    sof.write(w >> 8); sof.write(w & 0xff); sof.write(nComp)
    (0 until nComp).foreach { c =>
      sof.write(c + 1); sof.write((compHs(c) << 4) | compVs(c))
      sof.write(if (c == 0) 0 else 1)
    }
    seg(0xc0, sof.toByteArray)
    // DHT: DC0, AC0 (+ DC1, AC1 for color)
    def dhtPayload(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write((cls << 4) | id)
      (1 to 16).foreach(l => b.write(bits(l)))
      vals.foreach(b.write)
      b.toByteArray
    }
    val dht = new java.io.ByteArrayOutputStream()
    dht.write(dhtPayload(0, 0, DcLumBits, DcLumVals))
    dht.write(dhtPayload(1, 0, AcLumBits, AcLumVals))
    if (nComp == 3) {
      dht.write(dhtPayload(0, 1, DcChromBits, DcChromVals))
      dht.write(dhtPayload(1, 1, AcChromBits, AcChromVals))
    }
    seg(0xc4, dht.toByteArray)
    // SOS
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(nComp)
    (0 until nComp).foreach { c =>
      sos.write(c + 1); sos.write(if (c == 0) 0x00 else 0x11)
    }
    sos.write(0); sos.write(63); sos.write(0)
    seg(0xda, sos.toByteArray)
    // entropy-coded data
    val dcEnc = Array(buildEncTable(DcLumBits, DcLumVals),
      buildEncTable(DcChromBits, DcChromVals))
    val acEnc = Array(buildEncTable(AcLumBits, AcLumVals),
      buildEncTable(AcChromBits, AcChromVals))
    val bw = new BitWriter(out)
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    val dcPred = new Array[Int](nComp)
    def encodeBlock(c: Int, bx: Int, by: Int): Unit = {
      val tIdx = if (c == 0) 0 else 1
      val q = if (c == 0) qLum else qChrom
      // gather 8x8 with edge replication, level shift
      val blk = new Array[Double](64)
      var yy = 0
      while (yy < 8) {
        val sy = math.min(by * 8 + yy, compHh(c) - 1)
        var xx = 0
        while (xx < 8) {
          val sx = math.min(bx * 8 + xx, compW(c) - 1)
          blk(yy * 8 + xx) = planes(c)(sy * compW(c) + sx) - 128.0
          xx += 1
        }
        yy += 1
      }
      val coef = fdct(blk)
      val zz = new Array[Int](64)
      var k = 0
      while (k < 64) {
        val v = coef(Zigzag(k)) / q(Zigzag(k))
        zz(k) = math.round(v).toInt
        k += 1
      }
      // DC
      val diff = zz(0) - dcPred(c); dcPred(c) = zz(0)
      val (dcCat, dcBits) = category(diff)
      val dcCode = dcEnc(tIdx)(dcCat)
      bw.put(dcCode & 0xffffff, dcCode >>> 24)
      if (dcCat > 0) bw.put(dcBits, dcCat)
      // AC with run-lengths
      var run = 0
      k = 1
      while (k < 64) {
        if (zz(k) == 0) run += 1
        else {
          while (run > 15) {
            val zrl = acEnc(tIdx)(0xf0)
            bw.put(zrl & 0xffffff, zrl >>> 24)
            run -= 16
          }
          val (cat, bitsV) = category(zz(k))
          val code = acEnc(tIdx)((run << 4) | cat)
          bw.put(code & 0xffffff, code >>> 24)
          bw.put(bitsV, cat)
          run = 0
        }
        k += 1
      }
      if (run > 0) { // EOB
        val eob = acEnc(tIdx)(0x00)
        bw.put(eob & 0xffffff, eob >>> 24)
      }
    }
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var c = 0
        while (c < nComp) {
          var v0 = 0
          while (v0 < compVs(c)) {
            var h0 = 0
            while (h0 < compHs(c)) {
              encodeBlock(c, mx * compHs(c) + h0, my * compVs(c) + v0)
              h0 += 1
            }
            v0 += 1
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder -----------------------------------------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // T.81 F.2.2.3 canonical decode tables
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(idx: Int): Int = vals(idx)
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var markerHit = false
    def nextBit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) { markerHit = true; return 0 }
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val b2 = if (pos < data.length) data(pos) & 0xff else 0xd9
          if (b2 == 0x00) pos += 1 // stuffed
          else { markerHit = true; pos -= 1; return 0 }
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def align(): Unit = nbits = 0
    /** Consume an RSTn marker at the current byte position. */
    def consumeRst(): Boolean = {
      align()
      if (pos + 1 < data.length && (data(pos) & 0xff) == 0xff) {
        val m = data(pos + 1) & 0xff
        if (m >= 0xd0 && m <= 0xd7) { pos += 2; markerHit = false; return true }
      }
      false
    }
  }

  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    var code = br.nextBit()
    var l = 1
    while (l <= 16) {
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
        return t.value(t.valPtr(l) + code - t.minCode(l))
      code = (code << 1) | br.nextBit()
      l += 1
    }
    throw new IllegalArgumentException("jpeg: bad huffman code")
  }

  /** Decode a baseline JPEG into pixels (3 channels for color, 1 for
    * grayscale). Throws on progressive (SOF2) or arithmetic streams.
    */
  def decode(jpeg: Array[Byte]): Png.Image = {
    require(jpeg.length >= 4 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG (missing SOI)")
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var w = 0; var h = 0; var nComp = 0
    // per component: id, hSamp, vSamp, quantId, dcTabId, acTabId
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var compDc: Array[Int] = null; var compAc: Array[Int] = null
    var compIds: Array[Int] = null
    var restartInterval = 0
    var pos = 2
    var sosAt = -1
    while (sosAt < 0 && pos + 4 <= jpeg.length) {
      require((jpeg(pos) & 0xff) == 0xff, f"bad marker alignment at $pos")
      while (pos + 4 <= jpeg.length && (jpeg(pos + 1) & 0xff) == 0xff) pos += 1
      val marker = jpeg(pos + 1) & 0xff
      val len = u16(jpeg, pos + 2)
      val body = pos + 4
      marker match {
        case 0xdb => // DQT (possibly several tables)
          var p = body
          while (p < body + len - 2) {
            val pq = (jpeg(p) & 0xff) >> 4
            val tq = jpeg(p) & 0x0f
            require(pq == 0, "jpeg: 16-bit quant tables are not baseline")
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = jpeg(p + 1 + k) & 0xff; k += 1 }
            quant(tq) = t
            p += 65
          }
        case 0xc4 => // DHT (possibly several tables)
          var p = body
          while (p < body + len - 2) {
            val cls = (jpeg(p) & 0xff) >> 4
            val id = jpeg(p) & 0x0f
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = jpeg(p + l) & 0xff; total += bits(l); l += 1 }
            val vals = new Array[Int](total)
            var k = 0
            while (k < total) { vals(k) = jpeg(p + 17 + k) & 0xff; k += 1 }
            val tab = new HuffTable(bits, vals)
            if (cls == 0) dcTabs(id) = tab else acTabs(id) = tab
            p += 17 + total
          }
        case 0xc0 | 0xc1 => // SOF0/1 (baseline + extended sequential)
          h = u16(jpeg, body + 1); w = u16(jpeg, body + 3)
          nComp = jpeg(body + 5) & 0xff
          compIds = new Array[Int](nComp)
          compH = new Array[Int](nComp); compV = new Array[Int](nComp)
          compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compIds(c) = jpeg(body + 6 + 3 * c) & 0xff
            val hv = jpeg(body + 7 + 3 * c) & 0xff
            compH(c) = hv >> 4; compV(c) = hv & 0x0f
            compQ(c) = jpeg(body + 8 + 3 * c) & 0xff
            c += 1
          }
        case 0xc2 =>
          throw new IllegalArgumentException("jpeg: progressive not supported")
        case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOF3 lossless, SOF5-7 differential, SOF9-11 arithmetic,
          // SOF13-15 differential arithmetic — name the real reason
          // instead of failing later with a misleading SOS error
          throw new IllegalArgumentException(
            f"jpeg: SOF marker 0xff$m%02x (non-baseline coding) not supported")
        case 0xda => // SOS
          val ns = jpeg(body) & 0xff
          require(ns == nComp, "jpeg: partial-scan SOS unsupported")
          compDc = new Array[Int](nComp); compAc = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val cid = jpeg(body + 1 + 2 * c) & 0xff
            val idx = compIds.indexOf(cid)
            val tt = jpeg(body + 2 + 2 * c) & 0xff
            compDc(idx) = tt >> 4; compAc(idx) = tt & 0x0f
            c += 1
          }
          sosAt = body + len - 2
        case 0xdd => restartInterval = u16(jpeg, body)
        case _ => () // APPn/COM/etc: skip
      }
      if (sosAt < 0) pos += 2 + len
    }
    require(sosAt > 0 && w > 0 && h > 0, "jpeg: no scan found")
    // 4-component (Adobe CMYK/YCCK) and 2-component streams would
    // entropy-decode fine and then run the YCbCr transform on the
    // wrong planes — reject loudly instead of returning garbage color
    require(nComp == 1 || nComp == 3,
      s"jpeg: $nComp-component color space not supported (grayscale/YCbCr only)")
    val maxH = compH.max; val maxV = compV.max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    // component planes at sampling resolution
    val planeW = Array.tabulate(nComp)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nComp)(c => mcusY * compV(c) * 8)
    val planes = Array.tabulate(nComp)(c => new Array[Double](planeW(c) * planeH(c)))
    val br = new BitReader(jpeg, sosAt)
    val dcPred = new Array[Int](nComp)
    val blk = new Array[Double](64)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.consumeRst()
          java.util.Arrays.fill(dcPred, 0)
        }
        var c = 0
        while (c < nComp) {
          val q = quant(compQ(c))
          var v0 = 0
          while (v0 < compV(c)) {
            var h0 = 0
            while (h0 < compH(c)) {
              // entropy-decode one block
              val dcCat = decodeHuff(br, dcTabs(compDc(c)))
              val diff = extend(br.receive(dcCat), dcCat)
              dcPred(c) += diff
              java.util.Arrays.fill(blk, 0.0)
              blk(0) = dcPred(c).toDouble * q(0)
              var k = 1
              while (k < 64) {
                val rs = decodeHuff(br, acTabs(compAc(c)))
                val run = rs >> 4; val cat = rs & 0x0f
                if (cat == 0) {
                  if (run == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += run
                  require(k < 64, "jpeg: AC index overflow")
                  blk(Zigzag(k)) = extend(br.receive(cat), cat).toDouble * q(Zigzag(k))
                  k += 1
                }
              }
              val px = idct(blk)
              val ox = (mx * compH(c) + h0) * 8
              val oy = (my * compV(c) + v0) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(c)((oy + yy) * planeW(c) + ox + xx) = px(yy * 8 + xx) + 128.0
                  xx += 1
                }
                yy += 1
              }
              h0 += 1
            }
            v0 += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // a marker or EOF hit INSIDE the scan means nextBit() synthesized
    // zero bits — zeros are valid Huffman codes, so the MCU loops
    // complete and the lower region decodes to deterministic garbage;
    // refuse instead (restart markers clear the flag via consumeRst)
    require(!br.markerHit,
      "jpeg: entropy stream truncated (marker or EOF inside scan)")
    // assemble output pixels with replication upsampling
    def clamp(v: Double): Byte =
      math.max(0, math.min(255, math.round(v))).toByte
    val outCh = if (nComp >= 3) 3 else 1
    val outPx = new Array[Byte](w * h * outCh)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (outCh == 1) {
          outPx(y * w + x) = clamp(planes(0)(y * planeW(0) + x))
        } else {
          def samp(c: Int): Double = {
            val sx = x * compH(c) / maxH
            val sy = y * compV(c) / maxV
            planes(c)(sy * planeW(c) + sx)
          }
          val yv = samp(0); val cb = samp(1) - 128.0; val cr = samp(2) - 128.0
          val o = (y * w + x) * 3
          outPx(o) = clamp(yv + 1.402 * cr)
          outPx(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          outPx(o + 2) = clamp(yv + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    Png.Image(w, h, outCh, outPx)
  }

  /** Structurally valid JFIF stream with the given dimensions (the
    * entropy payload is deterministic filler — parseable framing,
    * not decodable pixels). Retained for header-only test vectors;
    * real payloads come from [[encode]]. */
  def encodeHeaderOnly(width: Int, height: Int, components: Int, seed: Long): Array[Byte] = {
    require(width <= 65535 && height <= 65535,
      s"jpeg encode: ${width}x$height exceeds the u16 SOF limit")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int, data: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      out.write((data.length + 2) >> 8); out.write((data.length + 2) & 0xff)
      out.write(data)
    }
    out.write(0xff); out.write(0xd8) // SOI
    // identifier is NUL-terminated ("JFIF\0") — the 0 byte is explicit
    // so this source file stays plain text (a raw NUL made git treat
    // it as binary)
    marker(0xe0, "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val sof = new Array[Byte](6 + 3 * components)
    sof(0) = 8 // precision
    sof(1) = (height >> 8).toByte; sof(2) = height.toByte
    sof(3) = (width >> 8).toByte; sof(4) = width.toByte
    sof(5) = components.toByte
    (0 until components).foreach { c =>
      sof(6 + 3 * c) = (c + 1).toByte; sof(7 + 3 * c) = 0x11; sof(8 + 3 * c) = 0
    }
    marker(0xc0, sof)
    // SOS header then deterministic filler "entropy" bytes + EOI
    val sos = Array[Byte](components.toByte) ++
      (0 until components).flatMap(c => Seq((c + 1).toByte, 0.toByte)) ++
      Array[Byte](0, 63, 0)
    marker(0xda, sos)
    var x = seed | 1
    (0 until 64).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      val b = (x >>> 56).toInt
      out.write(if (b == 0xff) 0xfe else b) // avoid accidental markers
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
