package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Flac, ImaAdpcm}

/** IMA/DVI ADPCM: hand-computed step vectors, clamping, block-header
  * reseeding, and the reject-don't-guess container contract.
  */
class AdpcmSpec extends AnyFunSuite {

  test("hand-computed first step: quantize(100 | pred 0, idx 0) = 7, " +
      "reconstruction 11, index walks to 8") {
    // step[0] = 7: 100 >= 7 (b4, rem 93), 93 >= 3 (b2, rem 90),
    // 90 >= 1 (b1) → nibble 0b0111; diff = 0 + 7 + 3 + 1 = 11
    assert(ImaAdpcm.quantize(100, 0, 0) == 7)
    assert(ImaAdpcm.step(0, 0, 7) == ((11, 8)))
    // negative twin: nibble gains the sign bit, same magnitude
    assert(ImaAdpcm.quantize(-100, 0, 0) == 15)
    assert(ImaAdpcm.step(0, 0, 15) == ((-11, 8)))
  }

  test("predictor clamps at int16 and index clamps at [0, 88]") {
    // idx 88 (step 32767), nibble 7 from pred 32000 → would be 89440
    val (p, i) = ImaAdpcm.step(32000, 88, 7)
    assert(p == 32767 && i == 88) // +8 clamps to 88
    val (pn, in) = ImaAdpcm.step(-32000, 88, 15)
    assert(pn == -32768 && in == 88)
    // nibble 0 walks the index down and clamps at 0
    assert(ImaAdpcm.step(0, 0, 0)._2 == 0)
  }

  test("round-trip: block-start samples are EXACT, everything else " +
      "within the current quantizer step") {
    for (id <- Seq(1L, 9L, 77L)) {
      val n = 300
      val x = Flac.fixtureWaveform(id, n)
      val dec = ImaAdpcm.decode(ImaAdpcm.encode(x, 8000,
        blockAlign = 68)).get
      assert(dec.nFrames == n && dec.sampleRate == 8000)
      val spb = (68 - 4) * 2 + 1
      for (j <- 0 until n) {
        if (j % spb == 0)
          assert(dec.pcm(j) == x(j), s"block-start $j must be exact")
        // triangle slope is 13/sample → the quantizer tracks closely
        assert(math.abs(dec.pcm(j) - x(j)) <= 64,
          s"sample $j: ${dec.pcm(j)} vs ${x(j)}")
      }
    }
  }

  test("decode == the oracle state machine (differential replay)") {
    // replay the recursive-CTE rule in Scala and compare to the real
    // container decode — the same trajectory the SQL oracle walks
    val id = 123L
    val n = 260
    val x = Flac.fixtureWaveform(id, n)
    val dec = ImaAdpcm.decode(ImaAdpcm.encode(x, 8000, 68)).get
    var pred = x(0)
    var idx = 0
    val expect = Array.newBuilder[Int]
    expect += pred
    for (j <- 1 until n) {
      if (j % 129 == 0) { pred = x(j) } // header reseeds, idx carried
      else {
        val nib = ImaAdpcm.quantize(x(j), pred, idx)
        val (p2, i2) = ImaAdpcm.step(pred, idx, nib)
        pred = p2; idx = i2
      }
      expect += pred
    }
    assert(dec.pcm.toSeq == expect.result().toSeq)
  }

  test("rejects truncation, PCM WAVs, bad block geometry, and a " +
      "fact-count mismatch") {
    val u = ImaAdpcm.encode(Flac.fixtureWaveform(3L, 200), 8000, 68)
    assert(ImaAdpcm.decode(u).isDefined)
    for (cut <- Seq(u.length - 1, u.length / 2, 30, 11))
      assert(ImaAdpcm.decode(u.take(cut)).isEmpty, s"cut=$cut")
    assert(ImaAdpcm.decode("RIFFxxxxWAVE".getBytes).isEmpty)
    // a fact count BEYOND the blocks' nibble capacity cannot be
    // satisfied → reject (a small bump stays inside the pad nibbles
    // and is a legitimately decodable stream by the format's rules)
    val mut = u.clone()
    val factAt = {
      val s = new String(mut.map(b => (b & 0xff).toChar))
      s.indexOf("fact")
    }
    mut(factAt + 9) = (mut(factAt + 9) + 1).toByte // +256 samples
    assert(ImaAdpcm.decode(mut).isEmpty,
      "fact beyond capacity must reject")
  }
}
