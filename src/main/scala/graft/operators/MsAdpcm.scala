package graft.operators

/** REAL lossy-audio codec #3: Microsoft ADPCM (WAV format tag 0x02 —
  * the published algorithm from the Windows multimedia standards
  * update; 7-entry predictor-coefficient table + 16-entry delta
  * adaptation table). Like IMA ([[ImaAdpcm]]) it is a SEQUENTIAL
  * predictive quantizer over pure integer arithmetic, so a DuckDB
  * recursive CTE replays the entire encoder/decoder state trajectory
  * and the oracle stays EXACT.
  *
  * Per published spec, mono block layout (`blockAlign` bytes):
  * 1-byte predictor index (0–6) + int16 initial delta + int16 sample1
  * (the LATER header sample) + int16 sample2 (the EARLIER one — output
  * first), then 2 nibbles/byte, HIGH nibble first (the opposite order
  * of IMA). Decode per nibble (signed, [−8, 7]):
  *
  *   pred  = (s1·coef1 + s2·coef2) >> 8          (arithmetic shift)
  *   out   = clamp16(pred + nib·delta)
  *   s2←s1; s1←out
  *   delta = max(16, (AdaptationTable[nib & 15]·delta) >> 8)
  *
  * Truncated, non-tag-2, bad-geometry, or out-of-range-predictor
  * payloads reject (the container discipline of [[G711]]/[[ImaAdpcm]]).
  */
object MsAdpcm {

  /** Published MS-ADPCM coefficient pairs (ADPCMCOEFSET ×7). */
  val Coef1: Array[Int] = Array(256, 512, 0, 192, 240, 460, 392)
  val Coef2: Array[Int] = Array(0, -256, 0, 64, 0, -208, -232)

  /** Published delta-adaptation table, indexed by the UNSIGNED nibble. */
  val AdaptationTable: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  private def clamp16(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v

  /** One decode step: (s1, s2, delta, signed nibble) →
    * (out = new s1, new delta); caller shifts s2 ← s1. */
  def step(s1: Int, s2: Int, delta: Int, nib: Int, coefIdx: Int)
      : (Int, Int) = {
    val pred = (s1 * Coef1(coefIdx) + s2 * Coef2(coefIdx)) >> 8
    val out = clamp16(pred + nib * delta)
    val d2 = (AdaptationTable(nib & 0xf) * delta) >> 8
    (out, if (d2 < 16) 16 else d2)
  }

  /** One encode step: quantize `x` against the predictor →
    * signed nibble in [−8, 7] (truncating division — the decoder
    * replays the reconstruction, so encoder choice only fixes the
    * trajectory; this form is SQL-replayable). */
  def quantize(x: Int, s1: Int, s2: Int, delta: Int, coefIdx: Int): Int = {
    val pred = (s1 * Coef1(coefIdx) + s2 * Coef2(coefIdx)) >> 8
    val q = (x - pred) / delta // Scala Int division truncates toward 0
    if (q > 7) 7 else if (q < -8) -8 else q
  }

  /** Encode 16-bit mono PCM into MS-ADPCM blocks (coefficient set
    * `coefIdx`, per-block initial delta 16). Header samples are the
    * two RAW samples at the block start. */
  def encode(samples: Array[Int], sampleRateHz: Int,
      blockAlign: Int = 70, coefIdx: Int = 3): Array[Byte] = {
    require(blockAlign >= 8, s"align $blockAlign")
    require(coefIdx >= 0 && coefIdx < 7, s"coef $coefIdx")
    require(samples.nonEmpty, "empty input")
    samples.foreach(s => require(s >= -32768 && s <= 32767, s"$s"))
    val spb = (blockAlign - 7) * 2 + 2
    val nBlocks = (samples.length + spb - 1) / spb
    val data = new java.io.ByteArrayOutputStream()
    var si = 0
    var b = 0
    while (b < nBlocks) {
      val s2 = samples(si)
      val s1 = if (si + 1 < samples.length) samples(si + 1) else 0
      si += 2
      data.write(coefIdx)
      data.write(16 & 0xff); data.write((16 >> 8) & 0xff)
      data.write(s1 & 0xff); data.write((s1 >> 8) & 0xff)
      data.write(s2 & 0xff); data.write((s2 >> 8) & 0xff)
      var cs1 = s1; var cs2 = s2; var delta = 16
      var k = 0
      val nNib = (blockAlign - 7) * 2
      var byte = 0
      while (k < nNib) {
        val nib =
          if (si < samples.length) {
            val n0 = quantize(samples(si), cs1, cs2, delta, coefIdx)
            val (out, d2) = step(cs1, cs2, delta, n0, coefIdx)
            cs2 = cs1; cs1 = out; delta = d2; si += 1
            n0
          } else 0 // pad past end of input
        if (k % 2 == 0) byte = (nib & 0xf) << 4 // HIGH nibble first
        else { byte |= nib & 0xf; data.write(byte) }
        k += 1
      }
      b += 1
    }
    val adata = data.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 24) & 0xff).toInt)
    }
    def w16(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    w32(4 + 8 + 50 + 8 + 4 + 8 + adata.length + (adata.length & 1))
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write('f'); out.write('m'); out.write('t'); out.write(' ')
    w32(50)                // 18 + cbSize 32 (2 spb + 2 numcoef + 7×4)
    w16(0x02)              // WAVE_FORMAT_ADPCM
    w16(1)                 // mono
    w32(sampleRateHz.toLong)
    w32(sampleRateHz.toLong * blockAlign / spb)
    w16(blockAlign)
    w16(4)                 // bits per sample
    w16(32)                // cbSize
    w16(spb)               // samplesPerBlock
    w16(7)                 // wNumCoef — the published table
    var c = 0
    while (c < 7) { w16(Coef1(c) & 0xffff); w16(Coef2(c) & 0xffff); c += 1 }
    out.write('f'); out.write('a'); out.write('c'); out.write('t')
    w32(4)
    w32(samples.length.toLong)
    out.write('d'); out.write('a'); out.write('t'); out.write('a')
    w32(adata.length.toLong)
    out.write(adata, 0, adata.length)
    if ((adata.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  final case class MsAdpcmStream(nFrames: Long, sampleRate: Int,
      sumSq: Long, pcm: Array[Int])

  /** Decode an MS-ADPCM WAV (tag 0x02, mono). The `fact` count trims
    * trailing pad nibbles. None on anything else. */
  def decode(payload: Array[Byte]): Option[MsAdpcmStream] = {
    if (payload == null || payload.length < 12) return None
    def u8(i: Int) = payload(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def s16(i: Int) = u16(i).toShort.toInt
    def u32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (!(u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
        u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E'))
      return None
    var pos = 12
    var ok = false
    var rate = 0
    var blockAlign = 0
    var spb = 0
    var total = -1L
    val pcmB = Array.newBuilder[Int]
    var emitted = 0L
    var sawData = false
    while (pos + 8 <= payload.length) {
      val id = new String(payload, pos, 4, "ISO-8859-1")
      val sz = u32(pos + 4)
      if (sz < 0 || pos + 8 + sz > payload.length) return None
      val body = pos + 8
      id match {
        case "fmt " =>
          if (sz < 22) return None
          ok = u16(body) == 0x02 && u16(body + 2) == 1 &&
            u16(body + 14) == 4
          rate = u32(body + 4).toInt
          blockAlign = u16(body + 12)
          spb = u16(body + 18)
          if (ok && (blockAlign < 8 ||
              spb != (blockAlign - 7) * 2 + 2)) return None
        case "fact" =>
          if (sz < 4) return None
          total = u32(body)
        case "data" =>
          if (!ok || blockAlign == 0) return None
          if (sz % blockAlign != 0) return None
          sawData = true
          var bp = body
          val end = body + sz.toInt
          while (bp < end) {
            val coefIdx = u8(bp)
            if (coefIdx > 6) return None
            var delta = s16(bp + 1)
            if (delta < 16) return None
            var s1 = s16(bp + 3)
            var s2 = s16(bp + 5)
            if (total < 0 || emitted < total) { pcmB += s2; emitted += 1 }
            if (total < 0 || emitted < total) { pcmB += s1; emitted += 1 }
            var k = 0
            val nNib = (blockAlign - 7) * 2
            while (k < nNib) {
              val byte = u8(bp + 7 + k / 2)
              val un = if (k % 2 == 0) (byte >> 4) & 0xf else byte & 0xf
              val nib = if (un >= 8) un - 16 else un
              val (out, d2) = step(s1, s2, delta, nib, coefIdx)
              s2 = s1; s1 = out; delta = d2
              if (total < 0 || emitted < total) {
                pcmB += out; emitted += 1
              }
              k += 1
            }
            bp += blockAlign
          }
        case _ => ()
      }
      pos = body + sz.toInt + (sz.toInt & 1)
    }
    if (!ok || !sawData || rate <= 0) return None
    val pcm = pcmB.result()
    if (total >= 0 && pcm.length.toLong != total) return None
    var ss = 0L
    pcm.foreach(v => ss += v.toLong * v)
    Some(MsAdpcmStream(pcm.length.toLong, rate, ss, pcm))
  }
}
