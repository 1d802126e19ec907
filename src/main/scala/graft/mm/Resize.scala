package graft.mm

/** Bilinear image resampling over the clean-room [[Png.Image]]
  * representation — the "resize" stage of a multimodal ingest
  * pipeline (decode → resize → feature-extract), implemented on the
  * REAL decoded pixels, no external media libraries.
  *
  * Uses the half-pixel-center convention (src = (dst + 0.5) * scale
  * - 0.5, clamped): resizing to the same geometry is the identity,
  * and constant images stay constant at any geometry — both
  * property-tested in MmCodecSpec.
  */
object Resize {

  def bilinear(img: Png.Image, outW: Int, outH: Int): Png.Image = {
    require(outW > 0 && outH > 0, s"bad target geometry ${outW}x$outH")
    val Png.Image(w, h, ch, px) = img
    val out = new Array[Byte](outW * outH * ch)
    val sx = w.toDouble / outW
    val sy = h.toDouble / outH
    var oy = 0
    while (oy < outH) {
      val fy = math.min(math.max((oy + 0.5) * sy - 0.5, 0.0), h - 1.0)
      val y0 = fy.toInt
      val y1 = math.min(y0 + 1, h - 1)
      val wy = fy - y0
      var ox = 0
      while (ox < outW) {
        val fx = math.min(math.max((ox + 0.5) * sx - 0.5, 0.0), w - 1.0)
        val x0 = fx.toInt
        val x1 = math.min(x0 + 1, w - 1)
        val wx = fx - x0
        var c = 0
        while (c < ch) {
          val p00 = px((y0 * w + x0) * ch + c) & 0xff
          val p01 = px((y0 * w + x1) * ch + c) & 0xff
          val p10 = px((y1 * w + x0) * ch + c) & 0xff
          val p11 = px((y1 * w + x1) * ch + c) & 0xff
          val top = p00 + (p01 - p00) * wx
          val bot = p10 + (p11 - p10) * wx
          out((oy * outW + ox) * ch + c) =
            math.round(top + (bot - top) * wy).toInt.min(255).max(0).toByte
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    Png.Image(outW, outH, ch, out)
  }
}
