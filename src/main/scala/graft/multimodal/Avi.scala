package graft.multimodal

import java.io.ByteArrayOutputStream

/** Minimal AVI codec (public spec: Microsoft RIFF 'AVI ' container,
  * Video for Windows) for UNCOMPRESSED 24-bit DIB frames — the video
  * twin of the PNG/WAV codecs: pure JVM, fail-fast outside the
  * envelope. With this, every media family (image/audio/video)
  * decodes an actual container format.
  *
  * Writer: canonical single-video-stream layout — RIFF('AVI ') →
  * LIST(hdrl){avih, LIST(strl){strh('vids'/'DIB '), strf(BITMAPINFO
  * HEADER)}} → LIST(movi){F × '00db' frames} — frames stored the DIB
  * way (bottom-up rows, BGR byte order, rows padded to 4 bytes).
  * Reader: walks the chunk tree (ancillary chunks and idx1 skipped),
  * validates 'vids' + BI_RGB 24-bit, returns header timing and the
  * per-frame DATA offsets inside the container plus top-down gray
  * frames (r=g=b by construction in the lake; general BGR is read and
  * the gray is the blue channel).
  */
object Avi {

  /** A decoded video: `frameOffsets(k)` is the absolute byte offset
    * of frame k's pixel DATA within the container (the thing a
    * frame-sampling pipeline seeks to); `frames(k)` is the top-down
    * row-major gray stream of frame k. */
  final case class Video(width: Int, height: Int, usPerFrame: Long,
                         frameOffsets: Array[Long],
                         frames: Array[Array[Int]])

  private def u32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
    out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
  }
  private def u16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }
  private def ascii(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  private def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Encode top-down row-major gray frames as an uncompressed-DIB AVI
    * at `rate` frames per second (scale 1). */
  def encode(width: Int, height: Int, rate: Int,
             frames: Seq[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0 && rate > 0 && frames.nonEmpty,
      s"avi: bad dims/rate/frames ${width}x$height@$rate×${frames.length}")
    frames.foreach(f => require(f.length == width * height,
      s"avi: frame length ${f.length} != $width×$height"))
    val stride = rowStride(width)
    val frameBytes = stride * height
    val out = new ByteArrayOutputStream()
    // sizes, inner-out: strh 56, strf 40; LIST sizes count the
    // 4-byte list type + children
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + frames.length * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    ascii(out, "RIFF"); u32(out, riffSize); ascii(out, "AVI ")
    ascii(out, "LIST"); u32(out, hdrlSize); ascii(out, "hdrl")
    ascii(out, "avih"); u32(out, 56)
    u32(out, 1000000L / rate) // dwMicroSecPerFrame
    u32(out, frameBytes.toLong * rate) // dwMaxBytesPerSec
    u32(out, 0) // dwPaddingGranularity
    u32(out, 0) // dwFlags
    u32(out, frames.length) // dwTotalFrames
    u32(out, 0) // dwInitialFrames
    u32(out, 1) // dwStreams
    u32(out, frameBytes) // dwSuggestedBufferSize
    u32(out, width); u32(out, height)
    u32(out, 0); u32(out, 0); u32(out, 0); u32(out, 0) // dwReserved
    ascii(out, "LIST"); u32(out, strlSize); ascii(out, "strl")
    ascii(out, "strh"); u32(out, 56)
    ascii(out, "vids"); ascii(out, "DIB ")
    u32(out, 0) // dwFlags
    u16(out, 0); u16(out, 0) // wPriority, wLanguage
    u32(out, 0) // dwInitialFrames
    u32(out, 1) // dwScale
    u32(out, rate) // dwRate
    u32(out, 0) // dwStart
    u32(out, frames.length) // dwLength
    u32(out, frameBytes) // dwSuggestedBufferSize
    u32(out, 0xffffffffL) // dwQuality (-1 default)
    u32(out, 0) // dwSampleSize
    u16(out, 0); u16(out, 0); u16(out, width); u16(out, height) // rcFrame
    ascii(out, "strf"); u32(out, 40)
    u32(out, 40) // biSize
    u32(out, width); u32(out, height) // biHeight > 0: bottom-up
    u16(out, 1); u16(out, 24) // biPlanes, biBitCount
    u32(out, 0) // biCompression = BI_RGB
    u32(out, frameBytes) // biSizeImage
    u32(out, 0); u32(out, 0); u32(out, 0); u32(out, 0)
    ascii(out, "LIST"); u32(out, moviSize); ascii(out, "movi")
    frames.foreach { f =>
      ascii(out, "00db"); u32(out, frameBytes)
      var y = height - 1 // DIB rows bottom-up
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val g = f(y * width + x) & 0xff
          out.write(g); out.write(g); out.write(g) // B, G, R
          x += 1
        }
        var pad = stride - width * 3
        while (pad > 0) { out.write(0); pad -= 1 }
        y -= 1
      }
    }
    out.toByteArray
  }

  /** Decode; see the object doc for the envelope. */
  def decode(avi: Array[Byte]): Video = {
    require(avi.length >= 12, "avi: truncated stream")
    def asciiAt(off: Int): String = new String(avi, off, 4, "US-ASCII")
    def u32At(off: Int): Long =
      (avi(off) & 0xffL) | ((avi(off + 1) & 0xffL) << 8) |
        ((avi(off + 2) & 0xffL) << 16) | ((avi(off + 3) & 0xffL) << 24)
    def u16At(off: Int): Int = (avi(off) & 0xff) | ((avi(off + 1) & 0xff) << 8)
    require(asciiAt(0) == "RIFF" && asciiAt(8) == "AVI ",
      "avi: bad RIFF/AVI signature")
    var width = 0; var height = 0; var usPerFrame = 0L
    var fmtOk = false
    val offsets = Array.newBuilder[Long]
    val frames = Array.newBuilder[Array[Int]]

    def walk(pos0: Int, end: Int): Unit = {
      var pos = pos0
      while (pos + 8 <= end) {
        val tag = asciiAt(pos)
        val len = u32At(pos + 4)
        require(len >= 0 && pos + 8 + len <= avi.length,
          s"avi: chunk $tag length $len overruns the stream")
        tag match {
          case "LIST" =>
            require(len >= 4, s"avi: LIST chunk too short ($len)")
            val listType = asciiAt(pos + 8)
            if (listType == "hdrl" || listType == "strl" || listType == "movi")
              walk(pos + 12, pos + 8 + len.toInt)
          case "avih" =>
            require(len >= 56, "avi: short avih")
            usPerFrame = u32At(pos + 8)
            width = u32At(pos + 8 + 32).toInt
            height = u32At(pos + 8 + 36).toInt
            require(width > 0 && height > 0, s"avi: bad dims ${width}x$height")
          case "strh" =>
            require(len >= 4, s"avi: strh chunk too short ($len)")
            require(asciiAt(pos + 8) == "vids",
              s"avi: unsupported stream type ${asciiAt(pos + 8)} (only vids)")
          case "strf" =>
            require(len >= 40, "avi: short strf")
            // the stream format's own geometry must AGREE with avih:
            // a mismatched biWidth changes the row stride and a
            // NEGATIVE biHeight flips to top-down rows — decoding
            // with avih's dims would silently produce garbage, so
            // both reject instead
            val biW = u32At(pos + 8 + 4).toInt
            val biH = u32At(pos + 8 + 8).toInt
            require(biW == width && biH == height,
              s"avi: strf geometry ${biW}x$biH disagrees with avih " +
                s"${width}x$height (top-down negative heights unsupported)")
            val bits = u16At(pos + 8 + 14)
            val compression = u32At(pos + 8 + 16)
            require(compression == 0,
              s"avi: unsupported biCompression $compression (only BI_RGB)")
            require(bits == 24, s"avi: unsupported biBitCount $bits (only 24)")
            fmtOk = true
          case t if t.length == 4 && (t.endsWith("db") || t.endsWith("dc")) =>
            require(fmtOk && width > 0, "avi: frame chunk before headers")
            val stride = rowStride(width)
            require(len >= stride.toLong * height,
              s"avi: frame chunk $len bytes < ${stride.toLong * height}")
            offsets += (pos + 8).toLong
            val f = new Array[Int](width * height)
            var y = 0
            while (y < height) {
              val srcRow = pos + 8 + (height - 1 - y) * stride // bottom-up
              var x = 0
              while (x < width) {
                f(y * width + x) = avi(srcRow + x * 3) & 0xff // blue = gray
                x += 1
              }
              y += 1
            }
            frames += f
          case _ => () // idx1, JUNK, ancillary — skip
        }
        pos += 8 + len.toInt + (len.toInt & 1) // word alignment
      }
    }
    walk(12, avi.length)
    val offs = offsets.result()
    require(fmtOk && offs.nonEmpty, "avi: missing headers or frames")
    Video(width, height, usPerFrame, offs, frames.result())
  }
}
