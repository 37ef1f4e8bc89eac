package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, MpegAudio}

/** MPEG-1 Layer I decode: requantization pinned against an independent
  * two's-complement formulation over EVERY code of every width, the
  * bit walk pinned against a hand-placed golden frame, CRC/truncation/
  * forbidden-field rejection, stereo layout, and router wiring. */
class MpegAudioSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("scalefactor table is 2·2^(-i/3) with exact halving structure") {
    assert(MpegAudio.ScaleFactors.length == 63)
    assert(MpegAudio.ScaleFactors(0) == 2.0)
    assert(MpegAudio.ScaleFactors(3) == 1.0)
    assert(MpegAudio.ScaleFactors(6) == 0.5)
    for (i <- 0 until 60)
      assert(MpegAudio.ScaleFactors(i + 3) == MpegAudio.ScaleFactors(i) / 2,
        s"halving at $i")
    for (i <- 0 until 63)
      assert(math.abs(MpegAudio.ScaleFactors(i) -
        2.0 * math.pow(2.0, -i / 3.0)) < 1e-12, s"closed form at $i")
  }

  test("dequant matches the independent two's-complement formulation " +
      "on every code of every width nb=2..15") {
    for (nb <- 2 to 15; code <- 0 until (1 << nb)) {
      val sf = MpegAudio.ScaleFactors((code + nb) % 63)
      // independent formulation: invert the MSB, read as a signed
      // nb-bit two's-complement integer v, s''' = v / 2^(nb-1)
      val v = ((code ^ (1 << (nb - 1))) << (32 - nb)) >> (32 - nb)
      val half = (1L << (nb - 1)).toDouble
      val s3 = v.toDouble / half
      val c = (1L << nb).toDouble / ((1L << nb) - 1).toDouble
      val expect = sf * ((s3 + 1.0 / half) * c)
      assert(MpegAudio.dequant(code, nb, sf) == expect,
        s"nb=$nb code=$code")
    }
    // mid-tread anchors: the 011…1 pattern is exactly zero; the legal
    // extremes are symmetric and inside (−1, 1) before scaling
    for (nb <- 2 to 15) {
      assert(MpegAudio.dequant((1 << (nb - 1)) - 1, nb, 1.0) == 0.0)
      val lo = MpegAudio.dequant(0, nb, 1.0)
      val hi = MpegAudio.dequant((1 << nb) - 2, nb, 1.0)
      assert(lo == -hi && hi > 0 && hi < 1, s"nb=$nb lo=$lo hi=$hi")
    }
  }

  // hand-placed golden frame: 224 kbps / 32 kHz mono, ONLY subband 0
  // allocated (alloc nibble 5 ⇒ nb = 6), scalefactor index 3 (= 1.0),
  // the 12 codes are s+20 — every bit position written out by hand
  private def goldenFrame: Array[Byte] = {
    val f = new Array[Byte](336)
    f(0) = 0xff.toByte; f(1) = 0xff.toByte // MPEG-1, Layer I, no CRC
    f(2) = ((7 << 4) | (2 << 2)).toByte    // 224 kbps, 32 kHz
    f(3) = 0xc0.toByte                     // mono
    // allocation: sb0 = 0101, sb1..31 = 0000 → bytes 0x50, 0x00 ×15
    f(4) = 0x50.toByte
    // scalefactor for sb0: 000011 — then 12 six-bit codes back to back
    // starting at bit offset 4*8+128+6 = 166. Pack bits explicitly:
    var bitPos = 32 + 128 // after header + allocation
    def putBits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        val bit = (v >> k) & 1
        val idx = 4 + (bitPos - 32) / 8 // bytes after the header
        val sh = 7 - (bitPos - 32) % 8
        if (bit == 1) f(idx) = (f(idx) | (1 << sh)).toByte
        bitPos += 1; k -= 1
      }
    }
    // re-place the allocation via putBits to keep ONE writer… no:
    // allocation was placed by hand above (f(4) = 0x50); putBits
    // starts after it, which is the point of the golden test.
    putBits(3, 6)
    for (s <- 0 until 12) putBits(s + 20, 6)
    f
  }

  test("golden frame: hand-placed bits decode to the closed-form " +
      "dequantized samples") {
    val payload = goldenFrame ++ goldenFrame
    val d = MpegAudio.decodeMp1(payload)
    assert(d.isDefined, "golden stream must decode")
    val dec = d.get
    assert(dec.sampleRate == 32000 && dec.channels == 1 &&
      dec.frames.size == 2)
    for (fr <- dec.frames) {
      assert(fr.alloc(0)(0) == 5)
      assert((1 until 32).forall(fr.alloc(0)(_) == 0))
      assert(fr.sfIdx(0)(0) == 3)
      for (s <- 0 until 12)
        assert(fr.samples(0)(0)(s) ==
          MpegAudio.dequant(s + 20, 6, MpegAudio.ScaleFactors(3)),
          s"sample $s")
      assert((1 until 32).forall(fr.samples(0)(_).isEmpty))
    }
  }

  test("synthetic fixture decodes; CRC-protected variant decodes to " +
      "identical samples; a flipped allocation bit breaks the CRC") {
    val plain = MpegAudio.decodeMp1(MpegAudio.syntheticMp1(42L, 4))
    val crcd = MpegAudio.decodeMp1(
      MpegAudio.syntheticMp1(42L, 4, withCrc = true))
    assert(plain.isDefined && crcd.isDefined)
    val (a, b) = (plain.get, crcd.get)
    assert(a.frames.size == 4 && b.frames.size == 4)
    for (fr <- 0 until 4; sb <- 0 until 32) {
      assert(a.frames(fr).alloc(0)(sb) == b.frames(fr).alloc(0)(sb))
      assert(a.frames(fr).samples(0)(sb).toSeq ==
        b.frames(fr).samples(0)(sb).toSeq)
    }
    val corrupt = MpegAudio.syntheticMp1(42L, 4, withCrc = true)
    corrupt(6) = (corrupt(6) ^ 0x10).toByte // an allocation bit
    assert(MpegAudio.decodeMp1(corrupt).isEmpty,
      "CRC must catch the allocation bit-flip")
  }

  test("rejection: truncation, trailing garbage, forbidden fields, " +
      "joint stereo, Layer III payloads, single frame") {
    val ok = MpegAudio.syntheticMp1(7L, 3)
    assert(MpegAudio.decodeMp1(ok).isDefined)
    assert(MpegAudio.decodeMp1(ok.dropRight(1)).isEmpty, "truncated")
    assert(MpegAudio.decodeMp1(ok :+ 0x00.toByte).isEmpty, "trailing")
    val badAlloc = ok.clone()
    badAlloc(4) = 0xff.toByte // alloc nibble 15 (forbidden)
    assert(MpegAudio.decodeMp1(badAlloc).isEmpty, "alloc=15")
    val joint = ok.clone()
    joint(3) = 0x40.toByte // mode 01 = joint stereo
    assert(MpegAudio.decodeMp1(joint).isEmpty, "joint stereo")
    assert(MpegAudio.decodeMp1(
      Multimodal.syntheticMp3(5, 2, 9)).isEmpty, "Layer III")
    assert(MpegAudio.decodeMp1(ok.take(336)).isEmpty, "single frame")
  }

  test("stereo frame: sb-major/channel-minor layout, per-channel " +
      "allocation and samples") {
    // hand-build one stereo (mode 00) frame at 448 kbps / 32 kHz
    // (= 672 bytes): ch0 sb0 alloc 5 (nb 6), ch1 sb0 alloc 2 (nb 3),
    // everything else silent
    val f = new Array[Byte](672)
    f(0) = 0xff.toByte; f(1) = 0xff.toByte
    f(2) = ((14 << 4) | (2 << 2)).toByte // 448 kbps, 32 kHz
    f(3) = 0x00.toByte                   // stereo
    var bitPos = 0
    def putBits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        val idx = 4 + bitPos / 8; val sh = 7 - bitPos % 8
        if (((v >> k) & 1) == 1) f(idx) = (f(idx) | (1 << sh)).toByte
        bitPos += 1; k -= 1
      }
    }
    putBits(5, 4); putBits(2, 4)          // sb0: ch0, ch1
    for (_ <- 1 until 32) { putBits(0, 4); putBits(0, 4) }
    putBits(0, 6); putBits(6, 6)          // scalefactors ch0, ch1
    for (s <- 0 until 12) {
      putBits(s + 1, 6)                   // ch0 code (nb 6)
      putBits(s % 3, 3)                   // ch1 code (nb 3, legal 0..6)
    }
    val d = MpegAudio.decodeMp1(f ++ f)
    assert(d.isDefined, "stereo stream must decode")
    val dec = d.get
    assert(dec.channels == 2)
    val fr = dec.frames.head
    assert(fr.alloc(0)(0) == 5 && fr.alloc(1)(0) == 2)
    for (s <- 0 until 12) {
      assert(fr.samples(0)(0)(s) ==
        MpegAudio.dequant(s + 1, 6, MpegAudio.ScaleFactors(0)))
      assert(fr.samples(1)(0)(s) ==
        MpegAudio.dequant(s % 3, 3, MpegAudio.ScaleFactors(6)))
    }
  }

  test("router: a Layer I payload gets REAL spectral features, not the " +
      "stub; Layer III still routes to the header walk") {
    val mp1 = Multimodal.MediaRow(1L, "audio", MpegAudio.syntheticMp1(1L, 3))
    val feat = Multimodal.decode(mp1)
    assert(feat.width == 32000 && feat.height == 1)
    assert(feat.n_frames == 3 * 384)
    // brightness = subband RMS — recompute from the decoded samples
    val d = MpegAudio.decodeMp1(mp1.payload).get
    var n = 0L; var ss = 0.0
    d.frames.foreach(_.samples.foreach(_.foreach { xs =>
      xs.foreach { x => ss += x * x; n += 1 }
    }))
    assert(feat.brightness == math.sqrt(ss / n))
    val mp3 = Multimodal.MediaRow(2L, "audio",
      Multimodal.syntheticMp3(5, 2, 9))
    val f3 = Multimodal.decode(mp3)
    assert(f3.n_frames == 5 && f3.width == 32000, "Layer III metadata lane")
  }
}
