package graft.multimodal

import java.io.ByteArrayOutputStream

/** Minimal WAV codec (public spec: RIFF/WAVE, Microsoft/IBM 1991;
  * format 1 = integer PCM) — the audio twin of the PNG codec: pure
  * JVM, fail-fast outside the supported envelope.
  *
  * Encoder: 16-bit PCM mono, canonical 44-byte header, one `data`
  * chunk. Decoder: any integer-PCM (format 1) stream at 8 or 16 bits,
  * mono or stereo, arbitrary chunk order with ancillary chunks
  * (LIST/fact/cue) skipped; stereo downmixes by averaging (the usual
  * feature-front-end convention), 8-bit (unsigned by spec) recenters
  * to signed. Interop is spec'd against `javax.sound.sampled`'s
  * independently-written files both ways. */
object Wav {

  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Encode 16-bit PCM mono. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"wav: sample rate $sampleRate")
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    ascii("RIFF"); u32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); u32(16)
    u16(1) // PCM
    u16(1) // mono
    u32(sampleRate)
    u32(sampleRate * 2) // byte rate
    u16(2) // block align
    u16(16) // bits per sample
    ascii("data"); u32(dataLen)
    samples.foreach(s => u16(s & 0xffff))
    out.toByteArray
  }

  /** Decode integer PCM; see the object doc for the envelope. */
  def decode(wav: Array[Byte]): Audio = {
    require(wav.length >= 44, "wav: truncated stream")
    def ascii(off: Int, n: Int): String = new String(wav, off, n, "US-ASCII")
    def u32(off: Int): Long =
      ((wav(off) & 0xffL)) | ((wav(off + 1) & 0xffL) << 8) |
        ((wav(off + 2) & 0xffL) << 16) | ((wav(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int = (wav(off) & 0xff) | ((wav(off + 1) & 0xff) << 8)
    require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE",
      "wav: bad RIFF/WAVE signature")
    var pos = 12
    var fmtSeen = false
    var channels = 0; var rate = 0; var bits = 0
    var audio: Audio = null
    while (pos + 8 <= wav.length && audio == null) {
      val tag = ascii(pos, 4)
      val len = u32(pos + 4)
      require(len >= 0 && pos + 8 + len <= wav.length,
        s"wav: chunk $tag length $len overruns the stream")
      tag match {
        case "fmt " =>
          require(len >= 16, "wav: short fmt chunk")
          val format = u16(pos + 8)
          require(format == 1,
            s"wav: unsupported format $format (only integer PCM)")
          channels = u16(pos + 10)
          rate = u32(pos + 12).toInt
          bits = u16(pos + 22)
          require(channels == 1 || channels == 2,
            s"wav: unsupported channel count $channels")
          require(bits == 8 || bits == 16,
            s"wav: unsupported bit depth $bits")
          require(rate > 0, s"wav: bad sample rate $rate")
          fmtSeen = true
        case "data" =>
          require(fmtSeen, "wav: data chunk before fmt")
          val bytesPerFrame = channels * bits / 8
          val nFrames = (len / bytesPerFrame).toInt
          val outArr = new Array[Short](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0
            var c = 0
            while (c < channels) {
              val off = pos + 8 + f * bytesPerFrame + c * bits / 8
              val s =
                if (bits == 16) u16(off).toShort.toInt
                else ((wav(off) & 0xff) - 128) << 8 // 8-bit is unsigned
              acc += s
              c += 1
            }
            outArr(f) = (acc / channels).toShort
            f += 1
          }
          audio = Audio(rate, outArr)
        case _ => () // ancillary (LIST, fact, cue, ...) — skip
      }
      pos += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    require(audio != null, "wav: missing data chunk")
    audio
  }
}
