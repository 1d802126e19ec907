package graft.mm

/** Linear audio resampling over the clean-room [[Wav.Audio]]
  * representation — the rate-conversion stage of an audio ingest
  * pipeline (decode → resample → feature-extract), on the REAL
  * decoded PCM16 samples, no external media libraries.
  *
  * Frame mapping is phase-aligned at zero (src = dst · inRate/outRate,
  * clamped at the tail): resampling to the same rate is the identity,
  * constant signals stay constant, and a linear ramp resamples onto
  * the same ramp (linear interpolation is exact on affine signals) —
  * all property-tested in MmCodecSpec. Channels interleave and never
  * mix.
  */
object Resample {

  def linear(a: Wav.Audio, outRate: Int): Wav.Audio = {
    require(outRate > 0, s"bad target rate $outRate")
    val in = a.nFrames
    if (outRate == a.sampleRate || in == 0)
      return Wav.Audio(outRate, a.channels, a.samples)
    val ch = a.channels
    val out = math.max(1, math.round(in.toLong * outRate.toDouble / a.sampleRate).toInt)
    val res = new Array[Short](out * ch)
    val scale = a.sampleRate.toDouble / outRate
    var of = 0
    while (of < out) {
      val fx = of * scale
      val x0 = math.min(fx.toInt, in - 1)
      val x1 = math.min(x0 + 1, in - 1)
      val w = fx - x0
      var c = 0
      while (c < ch) {
        val s0 = a.samples(x0 * ch + c)
        val s1 = a.samples(x1 * ch + c)
        res(of * ch + c) = math.round(s0 + (s1 - s0) * w).toShort
        c += 1
      }
      of += 1
    }
    Wav.Audio(outRate, ch, res)
  }
}
