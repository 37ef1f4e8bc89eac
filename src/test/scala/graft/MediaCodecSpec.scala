package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Flac, G711, MsAdpcm}

/** Round-10 codec lane: G.711 A-law (pinned against the JDK's own ALAW
  * converter on every code point) and Microsoft ADPCM (WAV tag 0x02),
  * plus the trailing-garbage rejection added to the FLAC container
  * contract.
  */
class MediaCodecSpec extends AnyFunSuite {

  test("A-law closed form matches the JDK's own ALAW converter on " +
      "all 256 code points") {
    val fmtA = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1,
      8000f, false)
    val bytes = Array.tabulate[Byte](256)(i => i.toByte)
    val src = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmtA, 256L)
    val pcmFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
      true, false)
    val conv = javax.sound.sampled.AudioSystem
      .getAudioInputStream(pcmFmt, src)
    val out = conv.readAllBytes()
    assert(out.length == 512)
    for (i <- 0 until 256) {
      val jdk = ((out(2 * i + 1) << 8) | (out(2 * i) & 0xff))
      assert(jdk == G711.alawToLinear(i),
        s"code $i: jdk $jdk vs ${G711.alawToLinear(i)}")
    }
  }

  test("A-law known vectors: 0x55 -> -8, 0xD5 -> +8 (no true zero; " +
      "sign convention inverted vs mu-law)") {
    assert(G711.alawToLinear(0x55) == -8)
    assert(G711.alawToLinear(0xd5) == 8)
    assert(G711.alawToLinear(0x2a) == -32256)
    assert(G711.alawToLinear(0xaa) == 32256)
  }

  test("A-law decode rejects mu-law payloads, truncation, non-RIFF " +
      "— and vice versa") {
    val a = G711.syntheticAlawWav(5L, 100, 8000)
    val u = G711.syntheticUlawWav(5L, 100, 8000)
    assert(G711.decodeAlawWav(a).isDefined)
    assert(G711.decodeAlawWav(u).isEmpty, "tag 7 must not A-law-expand")
    assert(G711.decodeUlawWav(a).isEmpty, "tag 6 must not mu-law-expand")
    for (cut <- Seq(a.length - 1, a.length / 2, 20, 11))
      assert(G711.decodeAlawWav(a.take(cut)).isEmpty, s"cut=$cut")
    assert(G711.decodeAlawWav("hello".getBytes).isEmpty)
  }

  test("MS-ADPCM round trip: header samples exact, frame count exact, " +
      "every reconstructed sample within one delta-step of the input") {
    val x = Flac.fixtureWaveform(7L, 300)
    val wav = MsAdpcm.encode(x, 8000, blockAlign = 70, coefIdx = 3)
    val st = MsAdpcm.decode(wav).get
    assert(st.nFrames == 300 && st.sampleRate == 8000)
    assert(st.pcm(0) == x(0) && st.pcm(1) == x(1),
      "block header carries the two raw samples")
    // block starts re-seed exactly too (blocks of 128 samples)
    assert(st.pcm(128) == x(128) && st.pcm(129) == x(129))
    // the quantizer tracks a smooth ramp closely; huge drift = a
    // state-machine bug even though the codec is lossy
    val maxErr = x.indices.map(i => math.abs(st.pcm(i) - x(i))).max
    assert(maxErr < 2048, s"max reconstruction error $maxErr")
  }

  test("MS-ADPCM decode is deterministic and exact across block " +
      "geometries (spb derived from blockAlign)") {
    val x = Flac.fixtureWaveform(11L, 150)
    for (align <- Seq(16, 32, 70, 256)) {
      val st = MsAdpcm.decode(MsAdpcm.encode(x, 8000, align)).get
      assert(st.nFrames == 150, s"align=$align")
      assert(st.pcm(0) == x(0) && st.pcm(1) == x(1))
    }
  }

  test("MS-ADPCM rejects truncation, wrong tag, bad predictor index, " +
      "sub-16 delta, and ragged data size") {
    val x = Flac.fixtureWaveform(3L, 200)
    val wav = MsAdpcm.encode(x, 8000, blockAlign = 70)
    assert(MsAdpcm.decode(wav).isDefined)
    for (cut <- Seq(wav.length - 1, wav.length / 2, 30, 11))
      assert(MsAdpcm.decode(wav.take(cut)).isEmpty, s"cut=$cut")
    // IMA payloads (tag 0x11) must not MS-decode and vice versa
    val ima = graft.operators.ImaAdpcm.encode(x, 8000)
    assert(MsAdpcm.decode(ima).isEmpty)
    assert(graft.operators.ImaAdpcm.decode(wav).isEmpty)
    // corrupt the first block's predictor index (data chunk body)
    def dataOff(p: Array[Byte]): Int = {
      var pos = 12
      while (!(p(pos) == 'd' && p(pos + 1) == 'a' && p(pos + 2) == 't' &&
        p(pos + 3) == 'a')) pos += 1
      pos + 8
    }
    val badCoef = wav.clone(); badCoef(dataOff(badCoef)) = 9
    assert(MsAdpcm.decode(badCoef).isEmpty, "coef index 9 must reject")
    val badDelta = wav.clone()
    badDelta(dataOff(badDelta) + 1) = 3; badDelta(dataOff(badDelta) + 2) = 0
    assert(MsAdpcm.decode(badDelta).isEmpty, "delta 3 (< 16) must reject")
  }

  test("FLAC rejects trailing garbage after the last frame (the " +
      "round-9 ADVICE contract gap)") {
    val x = Flac.fixtureWaveform(9L, 400)
    val flac = Flac.encode(x, 8000)
    assert(Flac.decode(flac).isDefined)
    assert(Flac.decode(flac ++ Array[Byte](0, 1, 2)).isEmpty,
      "appended garbage must reject like truncation does")
  }
}
