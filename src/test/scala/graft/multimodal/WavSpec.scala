package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

/** The WAV codec: byte-exact round-trip and interop against
  * `javax.sound.sampled`'s INDEPENDENT reader/writer. */
class WavSpec extends AnyFunSuite {

  private def det(i: Int): Short = ((i * 313 + (i * i) % 97) % 20001 - 10000).toShort

  test("encode -> decode round-trips samples exactly") {
    for (n <- Seq(0, 1, 63, 64, 500)) {
      val samples = Array.tabulate(n)(det)
      val a = Wav.decode(Wav.encode(8000, samples))
      assert(a.sampleRate == 8000 && a.samples.toSeq == samples.toSeq, s"n=$n")
    }
  }

  test("our output reads in javax.sound; javax.sound output reads here") {
    val samples = Array.tabulate(200)(det)
    // ours -> javax.sound
    val ours = Wav.encode(16000, samples)
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(ours))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 16000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    val raw = ais.readAllBytes()
    assert(raw.length == 400)
    // first sample, little-endian signed 16-bit
    val s0 = ((raw(0) & 0xff) | (raw(1) << 8)).toShort
    assert(s0 == samples(0))

    // javax.sound -> ours (independent writer, own header layout)
    val jfmt = new AudioFormat(11025f, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(i * 2) = (s & 0xff).toByte; pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), jfmt, samples.length),
      AudioFileFormat.Type.WAVE, out)
    val back = Wav.decode(out.toByteArray)
    assert(back.sampleRate == 11025 && back.samples.toSeq == samples.toSeq)
  }

  test("stereo downmixes by average; 8-bit recenters; bad formats fail fast") {
    // hand-build a 2-channel 16-bit file via javax.sound
    val jfmt = new AudioFormat(8000f, 16, 2, true, false)
    val frames = Array[Short](100, 200, -100, 300, 0, -50)
    val pcm = new Array[Byte](frames.length * 2)
    frames.zipWithIndex.foreach { case (s, i) =>
      pcm(i * 2) = (s & 0xff).toByte; pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), jfmt, frames.length / 2),
      AudioFileFormat.Type.WAVE, out)
    val st = Wav.decode(out.toByteArray)
    assert(st.samples.toSeq == Seq[Short](150, 100, -25), st.samples.toSeq)

    // 8-bit unsigned mono: 128 is silence (0), 129 is +256 after recenter
    val j8 = new AudioFormat(8000f, 8, 1, false, false)
    val out8 = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(
        Array[Byte](128.toByte, 129.toByte, 127.toByte)), j8, 3),
      AudioFileFormat.Type.WAVE, out8)
    val a8 = Wav.decode(out8.toByteArray)
    assert(a8.samples.toSeq == Seq[Short](0, 256, -256), a8.samples.toSeq)

    val e1 = intercept[IllegalArgumentException](
      Wav.decode("RIFFxxxxWAVEnot a real chunk layout at all........".getBytes))
    assert(e1.getMessage.contains("wav"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Wav.decode("definitely not riff data, way too short".getBytes ++ new Array[Byte](20)))
    assert(e2.getMessage.contains("signature"), e2.getMessage)
  }
}
