package graft.mm

import java.nio.{ByteBuffer, ByteOrder}

/** Clean-room RIFF/WAVE PCM16 codec — pure JVM byte work, no
  * libraries. Backs the audio modality of mm_decode/mm_frames:
  * real container parse (RIFF -> fmt -> data chunk walk), real
  * sample decode, and real signal features (RMS, zero-crossing
  * rate) computed from the PCM stream.
  */
object Wav {

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
    /** root-mean-square amplitude, normalized to [0,1] */
    def rms: Double = {
      if (samples.isEmpty) return 0.0
      var s = 0.0; var i = 0
      while (i < samples.length) { val v = samples(i) / 32768.0; s += v * v; i += 1 }
      math.sqrt(s / samples.length)
    }
    /** fraction of adjacent same-channel sample pairs crossing zero */
    def zeroCrossingRate: Double = {
      if (nFrames < 2) return 0.0
      var crossings = 0; var ch = 0
      while (ch < channels) {
        var i = 1
        while (i < nFrames) {
          val a = samples((i - 1) * channels + ch)
          val b = samples(i * channels + ch)
          if ((a >= 0) != (b >= 0)) crossings += 1
          i += 1
        }
        ch += 1
      }
      crossings.toDouble / (channels * (nFrames - 1))
    }
  }

  def encode(audio: Audio): Array[Byte] = {
    val dataLen = audio.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(audio.channels.toShort)
      .putInt(audio.sampleRate)
      .putInt(audio.sampleRate * audio.channels * 2) // byte rate
      .putShort((audio.channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    audio.samples.foreach(buf.putShort)
    buf.array()
  }

  def decode(wav: Array[Byte]): Audio = {
    val buf = ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
    require(tag() == "RIFF", "not a RIFF container")
    buf.getInt // riff size
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = 0; var channels = 0; var bits = 0
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = tag(); val len = buf.getInt
      id match {
        case "fmt " =>
          val fmt = buf.getShort
          require(fmt == 1, s"unsupported codec $fmt (PCM only)")
          channels = buf.getShort
          // signed read: 0 or a negative count would divide-by-zero /
          // nonsense downstream (nFrames = samples / channels)
          require(channels >= 1, s"invalid channel count $channels")
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort
          require(bits == 16, s"unsupported bit depth $bits")
          buf.position(buf.position() + (len - 16))
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt")
          val n = len / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort; i += 1 }
          samples = out
        case _ => // skip unknown chunk (word-aligned)
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(samples != null, "missing data chunk")
    Audio(sampleRate, channels, samples)
  }
}
