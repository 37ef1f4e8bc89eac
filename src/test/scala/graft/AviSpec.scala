package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Avi, G711}

/** AVI container + DIB/MJPEG frame decode and G.711 µ-law expansion:
  * goldens, lossy-JPEG tolerance, and the reject-don't-guess contract
  * on truncated/corrupt containers.
  */
class AviSpec extends AnyFunSuite {

  test("AVI DIB round-trip: meta and exact frame brightness") {
    val frames = (0 until 5).map(f => Avi.solidDib(20, 12, 40 + f * 7))
    val avi = Avi.write(frames, 20, 12, fpsNum = 30, fpsDen = 1,
      handler = "DIB ", dib = true)
    val (m, fs) = Avi.parse(avi).get
    assert(m.width == 20 && m.height == 12 && m.nFrames == 5
      && m.fpsNum == 30 && m.fpsDen == 1 && m.handler == "DIB ")
    for ((f, i) <- fs.zipWithIndex)
      assert(Avi.dibBrightness(f, 20, 12).get == (40 + i * 7).toDouble)
  }

  test("truncated AVI rejects at any cut point") {
    val avi = Avi.write(Seq(Avi.solidDib(16, 12, 99)), 16, 12, 30, 1,
      "DIB ", dib = true)
    for (cut <- Seq(avi.length - 1, avi.length - 9, avi.length / 2,
        40, 13))
      assert(Avi.parse(avi.take(cut)).isEmpty, s"cut=$cut parsed")
  }

  test("header/stream frame-count mismatch rejects") {
    val avi = Avi.write(Seq(Avi.solidDib(16, 12, 1),
      Avi.solidDib(16, 12, 2)), 16, 12, 30, 1, "DIB ", dib = true)
    // chop the LAST frame chunk out of movi: sizes no longer match the
    // avih count → the parse must reject, not return a short video
    val frameChunk = 8 + Avi.solidDib(16, 12, 2).length
    val riffSz = avi.length - 8 - frameChunk
    val mut = avi.take(avi.length - frameChunk)
    // RIFF size + movi LIST size need patching for a well-formed cut
    def put32(a: Array[Byte], at: Int, v: Int): Unit = {
      a(at) = (v & 0xff).toByte; a(at + 1) = ((v >> 8) & 0xff).toByte
      a(at + 2) = ((v >> 16) & 0xff).toByte
      a(at + 3) = ((v >> 24) & 0xff).toByte
    }
    put32(mut, 4, riffSz)
    // find the movi LIST header and shrink it
    val s = new String(mut.map(b => (b & 0xff).toChar))
    val moviAt = s.indexOf("movi") - 8
    val oldSz = (mut(moviAt + 4) & 0xff) | ((mut(moviAt + 5) & 0xff) << 8) |
      ((mut(moviAt + 6) & 0xff) << 16) | ((mut(moviAt + 7) & 0xff) << 24)
    put32(mut, moviAt + 4, oldSz - frameChunk)
    assert(Avi.parse(mut).isEmpty, "count mismatch must reject")
  }

  test("MJPEG frames decode through ImageIO with exact geometry and " +
      "near-exact solid brightness") {
    val avi = Avi.write((0 until 3).map(f => Avi.solidJpeg(24, 16,
      60 + f * 50)), 24, 16, 24, 1, "MJPG", dib = false)
    val (m, fs) = Avi.parse(avi).get
    assert(m.handler == "MJPG" && m.nFrames == 3)
    for ((f, i) <- fs.zipWithIndex) {
      val (w, h, b) = Avi.mjpegFrame(f).get
      assert(w == 24 && h == 16)
      // JPEG is lossy; a solid fill must still come back within a
      // couple of code values
      assert(math.abs(b - (60 + i * 50)) < 2.5, s"frame $i: $b")
    }
  }

  test("µ-law closed form matches the JDK's own ULAW converter on " +
      "all 256 code points") {
    val fmtU = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1,
      8000f, false)
    val bytes = Array.tabulate[Byte](256)(i => i.toByte)
    val src = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmtU, 256L)
    val pcmFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
      true, false)
    val conv = javax.sound.sampled.AudioSystem
      .getAudioInputStream(pcmFmt, src)
    val out = conv.readAllBytes()
    assert(out.length == 512)
    for (i <- 0 until 256) {
      val jdk = ((out(2 * i + 1) << 8) | (out(2 * i) & 0xff))
      assert(jdk == G711.ulawToLinear(i),
        s"code $i: jdk $jdk vs ${G711.ulawToLinear(i)}")
    }
  }

  test("µ-law rejects PCM WAVs, truncation, and non-RIFF") {
    val pcm = graft.operators.Flac.fixtureWaveform(1L, 50)
    val pcmWav = {
      val d = new Array[Byte](100)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
        true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(d), fmt, 50L)
      val o = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, o)
      o.toByteArray
    }
    assert(G711.decodeUlawWav(pcmWav).isEmpty, "PCM must not expand")
    val u = G711.syntheticUlawWav(5L, 100, 8000)
    assert(G711.decodeUlawWav(u).isDefined)
    for (cut <- Seq(u.length - 1, u.length / 2, 20, 11))
      assert(G711.decodeUlawWav(u.take(cut)).isEmpty, s"cut=$cut")
    assert(G711.decodeUlawWav("hello".getBytes).isEmpty)
    val _ = pcm
  }

  test("µ-law known vectors: 0xFF -> 0, 0x00 -> -32124, 0x80 -> +32124") {
    assert(G711.ulawToLinear(0xff) == 0)
    assert(G711.ulawToLinear(0x00) == -32124)
    assert(G711.ulawToLinear(0x80) == 32124)
  }
}
