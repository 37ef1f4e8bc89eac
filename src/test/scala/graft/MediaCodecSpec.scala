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

  test("G.711 encoders invert their decoders on every code level " +
      "(A-law exactly; mu-law modulo the 0x7F/0xFF zero alias)") {
    for (b <- 0 until 256) {
      val xa = G711.alawToLinear(b)
      assert(G711.linearToAlaw(xa) == b, s"alaw code $b (level $xa)")
      val xu = G711.ulawToLinear(b)
      val back = G711.linearToUlaw(xu)
      if (b == 0x7f) assert(back == 0xff, "the -0 alias folds to +0")
      else assert(back == b, s"ulaw code $b (level $xu)")
    }
  }

  test("G.711 encoders match the JDK's own PCM->ULAW/ALAW converters " +
      "across a full-range sample sweep") {
    def jdkEncode(samples: Array[Int],
        enc: javax.sound.sampled.AudioFormat.Encoding): Array[Int] = {
      val bytes = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val pcmFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
        true, false)
      val src = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), pcmFmt,
        samples.length.toLong)
      val gFmt = new javax.sound.sampled.AudioFormat(enc, 8000f, 8, 1,
        1, 8000f, false)
      javax.sound.sampled.AudioSystem.getAudioInputStream(gFmt, src)
        .readAllBytes().map(_ & 0xff)
    }
    // the JDK's mu-law encoder biases in SHORT arithmetic, so
    // BIAS - sample overflows for sample < -32635 and emits a wrapped
    // code (a known JDK edge); the CCITT clip is the correct behavior
    // there, pinned separately below. The JDK's A-LAW encoder deviates
    // from the ITU reference C on NEGATIVES (it biases -x-8 in 16-bit
    // arithmetic instead of g711.c's 13-bit one's complement), so the
    // A-law pin covers the positive half, where the two agree.
    val sweep = ((-32635 to 32635 by 97) ++ Seq(-32635, -1, 0, 1, 32635))
      .toArray
    assert(G711.linearToUlaw(-32768) == 0x00, "CCITT clip at -32768")
    assert(G711.linearToUlaw(32767) == 0x80, "CCITT clip at +32767")
    assert(G711.linearToAlaw(-32768) == 0x2a,
      "A-law clip at -32768 (decodes -32256)")
    assert(G711.linearToAlaw(32767) == 0xaa,
      "A-law clip at +32767 (decodes +32256)")
    val jdkU = jdkEncode(sweep,
      javax.sound.sampled.AudioFormat.Encoding.ULAW)
    val posSweep = sweep.filter(_ >= 0)
    val jdkA = jdkEncode(posSweep,
      javax.sound.sampled.AudioFormat.Encoding.ALAW)
    for (i <- sweep.indices)
      assert(jdkU(i) == G711.linearToUlaw(sweep(i)),
        s"ulaw(${sweep(i)}): jdk ${jdkU(i)} vs ${G711.linearToUlaw(sweep(i))}")
    for (i <- posSweep.indices)
      assert(jdkA(i) == G711.linearToAlaw(posSweep(i)),
        s"alaw(${posSweep(i)}): jdk ${jdkA(i)} vs " +
          s"${G711.linearToAlaw(posSweep(i))}")
    // g711.c hand vectors for the negative half (the ITU convention:
    // -16 joins the LOWER cell via one's complement)
    assert(G711.linearToAlaw(-1) == 0x55)   // smallest negative level -8
    assert(G711.linearToAlaw(-8) == 0x55)
    assert(G711.linearToAlaw(-16) == 0x55)  // boundary: lower cell
    assert(G711.linearToAlaw(-17) == 0x54)  // next cell, level -24
    assert(G711.linearToAlaw(-11780) == 50) // seg 6 mant 7, level -12032
  }

  test("multi-depth PCM decode: native-depth sums exact at 8/16/24 " +
      "bits; truncation and non-PCM reject") {
    import graft.operators.Multimodal
    for (bits <- Seq(8, 16, 24)) {
      val wav = Multimodal.syntheticPcmWav(9L, 120, bits, 16000)
      val (nf, rate, gotBits, ssq) = Multimodal.decodePcmWav(wav).get
      assert(nf == 120 && rate == 16000 && gotBits == bits)
      val expect = (0 until 120).map { i =>
        val s: Long = bits match {
          case 8 => (9L * 7 + i * 3) % 256 - 128
          case 16 => Flac.fixtureSample(9L, i.toLong).toLong
          case _ => (9L * 131 + i * 977) % 1000000L - 500000L
        }
        s * s
      }.sum
      assert(ssq == expect, s"bits=$bits")
      for (cut <- Seq(wav.length - 1, wav.length / 2, 11))
        assert(Multimodal.decodePcmWav(wav.take(cut)).isEmpty,
          s"bits=$bits cut=$cut")
    }
    // mu-law (tag 7) payloads must not PCM-decode
    assert(Multimodal.decodePcmWav(
      G711.syntheticUlawWav(3L, 50, 8000)).isEmpty)
  }

  test("legacy-image lane: GIF/TIFF/BMP decode through ImageIO with " +
      "exact solid brightness (lossless formats)") {
    import graft.operators.Multimodal
    for (fmt <- Seq("gif", "tiff", "bmp")) {
      val png = Multimodal.solidImageBytes(24, 16, 137, fmt)
      val (w, h, b) = Multimodal.decodeImage(png).get
      assert(w == 24 && h == 16, s"$fmt geometry")
      assert(b == 137.0, s"$fmt brightness $b")
    }
    // TIFF big-endian magic also sniffs (MM\0*)
    val tif = Multimodal.solidImageBytes(8, 8, 20, "tiff")
    assert(tif(0) == 'I' || tif(0) == 'M') // JDK writes one of the two
  }

  test("gzip member walk: multi-member round trip, CRC/ISIZE verify, " +
      "truncation + bit-flip + garbage rejection, FNAME header") {
    import graft.operators.Gzip
    val text = ("the quick brown fox " * 40).getBytes("UTF-8")
    val one = Gzip.gzipConcat(Seq(text))
    val two = Gzip.gzipConcat(
      Seq(text.take(text.length / 2), text.drop(text.length / 2)))
    assert(Gzip.decode(one).get.nMembers == 1)
    val st = Gzip.decode(two).get
    assert(st.nMembers == 2 && st.data.toSeq == text.toSeq)
    // empty member is valid
    assert(Gzip.decode(Gzip.gzipConcat(
      Seq(Array.emptyByteArray))).get.totalBytes == 0L)
    // truncation anywhere STRICTLY INSIDE a member rejects (a cut at
    // an exact member boundary is a valid shorter file by design)
    val m1len = Gzip.gzipMember(text.take(text.length / 2)).length
    for (cut <- Seq(two.length - 1, two.length - 9, m1len + 5, 17))
      assert(Gzip.decode(two.take(cut)).isEmpty, s"cut=$cut")
    // trailer CRC bit flip rejects (member 1's trailer sits at the
    // end; flip a bit in its CRC32 word)
    val flipped = two.clone()
    flipped(two.length - 8) = (flipped(two.length - 8) ^ 1).toByte
    assert(Gzip.decode(flipped).isEmpty, "flipped CRC must reject")
    // garbage between members rejects
    val glued = one ++ Array[Byte](1, 2, 3) ++ one
    assert(Gzip.decode(glued).isEmpty)
    assert(Gzip.decode("not gzip".getBytes).isEmpty)
    // FNAME-flagged member: splice FLG bit 3 + a zero-terminated name
    val named = {
      val m = Gzip.gzipMember(text)
      val b = Array.newBuilder[Byte]
      b ++= m.take(3); b += (m(3) | 0x08).toByte
      b ++= m.slice(4, 10); b ++= "shard-0.txt".getBytes; b += 0
      b ++= m.drop(10)
      b.result()
    }
    assert(Gzip.decode(named).get.data.toSeq == text.toSeq)
  }

  test("tar walk: round trip, checksum gate, truncation + trailing-" +
      "garbage + missing-terminator rejection") {
    import graft.operators.Archives
    val members = Seq("a.txt" -> "hello world".getBytes,
      "b/c.json" -> """{"k":1}""".getBytes)
    val tar = Archives.tarWrite(members)
    val got = Archives.tarRead(tar).get
    assert(got.map(_._1) == Seq("a.txt", "b/c.json"))
    assert(got.map(_._2.toSeq) == members.map(_._2.toSeq))
    // header checksum gate: flip one name byte
    val bad = tar.clone(); bad(0) = 'X'
    assert(Archives.tarRead(bad).isEmpty, "bad checksum must reject")
    // truncation (drop the second zero block) rejects
    assert(Archives.tarRead(tar.dropRight(512)).isEmpty)
    assert(Archives.tarRead(tar.dropRight(1)).isEmpty) // ragged length
    // trailing garbage after the terminator rejects
    assert(Archives.tarRead(tar ++ new Array[Byte](512)).isEmpty)
    assert(Archives.tarRead("not a tar".getBytes).isEmpty)
  }

  test("zip central-directory walk: round trip via the JDK's streaming " +
      "writer (data-descriptor layout), CRC32 gate, EOCD/truncation " +
      "rejection, STORED + DEFLATE") {
    import graft.operators.Archives
    val members = Seq("x.txt" -> ("abc " * 100).getBytes,
      "y.bin" -> Array.tabulate[Byte](300)(i => (i * 7).toByte))
    val zip = Archives.zipWrite(members)
    val got = Archives.zipRead(zip).get
    assert(got.map(_._1) == Seq("x.txt", "y.bin"))
    assert(got.map(_._2.toSeq) == members.map(_._2.toSeq))
    // CRC gate: flip a bit inside the first member's compressed data
    // (locate it through the local header — setTime(0) makes the JDK
    // emit an extended-timestamp extra field, so the offset is dynamic)
    def u16(i: Int) = (zip(i) & 0xff) | ((zip(i + 1) & 0xff) << 8)
    val dataOff = 30 + u16(26) + u16(28)
    val bad = zip.clone(); bad(dataOff + 2) = (bad(dataOff + 2) ^ 0x10).toByte
    assert(Archives.zipRead(bad).isEmpty, "corrupt data must fail CRC")
    // truncation kills the EOCD
    for (cut <- Seq(zip.length - 1, zip.length - 22, zip.length / 2))
      assert(Archives.zipRead(zip.take(cut)).isEmpty, s"cut=$cut")
    assert(Archives.zipRead("PK but not a zip".getBytes).isEmpty)
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
