package graft.operators

/** REAL lossy-audio decode: ITU-T G.711 µ-law (the PSTN/telephony
  * codec; public spec, a pure integer expansion) — unlike the DCT
  * codecs the JDK lacks, µ-law's decode is a closed-form per-byte
  * formula, so a SQL oracle replays the EXPANDED waveform exactly:
  *
  *   x = ~b & 0xff;  e = (x >> 4) & 7;  m = x & 15
  *   mag = ((m·8 + 132) << e) − 132;   sample = sign(x) ? −mag : mag
  *
  * Payloads travel as real RIFF/WAVE containers with wFormatTag = 7
  * (WAVE_FORMAT_MULAW, 8 bits/sample) and are parsed by a bounds-
  * checked chunk walk (the fMP4 discipline: untrusted sizes verify
  * against the enclosing container BEFORE any allocation; truncated
  * or non-µ-law payloads reject).
  */
object G711 {

  /** µ-law byte (0–255) → 16-bit linear sample. */
  def ulawToLinear(b: Int): Int = {
    val x = ~b & 0xff
    val e = (x >> 4) & 7
    val m = x & 15
    val mag = (((m << 3) + 0x84) << e) - 0x84
    if ((x & 0x80) != 0) -mag else mag
  }

  /** Parsed µ-law stream: frame count, rate, channels, exact integer
    * Σ expanded-sample² (the SQL-replayable energy term). */
  final case class UlawStream(nFrames: Long, sampleRate: Int,
      channels: Int, sumSq: Long)

  /** Decode a RIFF/WAVE µ-law (format tag 7, 8-bit) payload. None on
    * anything else — truncation, non-RIFF, PCM/other codecs. */
  def decodeUlawWav(payload: Array[Byte]): Option[UlawStream] = {
    if (payload == null || payload.length < 12) return None
    def u8(i: Int) = payload(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (!(u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
        u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E'))
      return None
    var pos = 12
    var rate = 0
    var channels = 0
    var ok = false
    var sumSq = 0L
    var n = 0L
    var sawData = false
    while (pos + 8 <= payload.length) {
      val id = new String(payload, pos, 4, "ISO-8859-1")
      val sz = u32(pos + 4)
      // untrusted size: bounds-check against the container BEFORE use
      if (sz < 0 || pos + 8 + sz > payload.length) return None
      val body = pos + 8
      id match {
        case "fmt " =>
          if (sz < 16) return None
          val tag = u16(body)
          channels = u16(body + 2)
          rate = u32(body + 4).toInt
          val bits = u16(body + 14)
          ok = tag == 7 && bits == 8 && channels >= 1
        case "data" =>
          if (!ok) return None // fmt must precede data and be µ-law
          sawData = true
          var i = 0
          while (i < sz) {
            val s = ulawToLinear(u8(body + i))
            sumSq += s.toLong * s
            i += 1
          }
          n += sz
        case _ => () // skip LIST/fact/etc.
      }
      pos = body + sz.toInt + (sz.toInt & 1) // chunks pad to even
    }
    if (ok && sawData && rate > 0) Some(UlawStream(n / channels, rate,
      channels, sumSq))
    else None
  }

  /** Decoded µ-law PCM samples (interleaved) — the waveform-consumer
    * lane ([[decodeUlawWav]] keeps only the Σs² census). Same
    * container contract: None on truncation/non-µ-law. */
  def decodeUlawPcm(payload: Array[Byte]): Option[(Array[Int], Int, Int)] = {
    decodeUlawWav(payload).map { meta =>
      // second pass extracts samples; container already validated
      def u8(i: Int) = payload(i) & 0xff
      def u32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      val out = Array.newBuilder[Int]
      var pos = 12
      while (pos + 8 <= payload.length) {
        val id = new String(payload, pos, 4, "ISO-8859-1")
        val sz = u32(pos + 4)
        val body = pos + 8
        if (id == "data") {
          var i = 0
          while (i < sz) { out += ulawToLinear(u8(body + i)); i += 1 }
        }
        pos = body + sz.toInt + (sz.toInt & 1)
      }
      (out.result(), meta.sampleRate, meta.channels)
    }
  }

  // ---- A-law (the µ-law sibling: ITU-T G.711 §3, WAVE_FORMAT_ALAW
  // tag 6) — same per-byte closed form family, sign convention
  // INVERTED vs µ-law (a set sign bit is POSITIVE) and a 0x55 toggle
  // instead of full complement:
  //
  //   x = b ^ 0x55;  e = (x >> 4) & 7;  m = x & 15
  //   mag = e == 0 ? m·16 + 8 : (m·16 + 264) << (e − 1)
  //   sample = (x & 0x80) ? mag : −mag
  // --------------------------------------------------------------------

  /** A-law byte (0–255) → 13-bit-magnitude linear sample. */
  def alawToLinear(b: Int): Int = {
    val x = b ^ 0x55
    val e = (x >> 4) & 7
    val m = x & 15
    val mag =
      if (e == 0) (m << 4) + 8
      else ((m << 4) + 0x108) << (e - 1)
    if ((x & 0x80) != 0) mag else -mag
  }

  /** Decode a RIFF/WAVE A-law (format tag 6, 8-bit) payload — the
    * [[decodeUlawWav]] walk with the tag-6 expansion. None on
    * truncation, non-RIFF, or any other codec. */
  def decodeAlawWav(payload: Array[Byte]): Option[UlawStream] = {
    if (payload == null || payload.length < 12) return None
    def u8(i: Int) = payload(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (!(u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
        u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E'))
      return None
    var pos = 12
    var rate = 0
    var channels = 0
    var ok = false
    var sumSq = 0L
    var n = 0L
    var sawData = false
    while (pos + 8 <= payload.length) {
      val id = new String(payload, pos, 4, "ISO-8859-1")
      val sz = u32(pos + 4)
      if (sz < 0 || pos + 8 + sz > payload.length) return None
      val body = pos + 8
      id match {
        case "fmt " =>
          if (sz < 16) return None
          val tag = u16(body)
          channels = u16(body + 2)
          rate = u32(body + 4).toInt
          val bits = u16(body + 14)
          ok = tag == 6 && bits == 8 && channels >= 1
        case "data" =>
          if (!ok) return None // fmt must precede data and be A-law
          sawData = true
          var i = 0
          while (i < sz) {
            val s = alawToLinear(u8(body + i))
            sumSq += s.toLong * s
            i += 1
          }
          n += sz
        case _ => ()
      }
      pos = body + sz.toInt + (sz.toInt & 1)
    }
    if (ok && sawData && rate > 0) Some(UlawStream(n / channels, rate,
      channels, sumSq))
    else None
  }

  // ---- the ENCODE direction (16-bit linear → G.711 byte): the
  // telephony-export surface. Both are the published CCITT quantizers
  // on 16-bit input (the 13/14-bit reference forms ×8/×4); each is the
  // exact inverse of its decoder on code levels — encode(decode(b))
  // == b for every byte (µ-law modulo the two-zeros 0x7F/0xFF alias),
  // spec-pinned. --------------------------------------------------------

  /** 16-bit linear → µ-law byte (CCITT G.711 §2 encoder; BIAS 0x84,
    * CLIP 32635). */
  def linearToUlaw(x0: Int): Int = {
    var x = x0
    val sign = if (x < 0) { x = -x; 0x80 } else 0
    if (x > 32635) x = 32635
    x += 0x84
    var e = 7
    var mask = 0x4000
    while (e > 0 && (x & mask) == 0) { e -= 1; mask >>= 1 }
    val mant = (x >> (e + 3)) & 0x0f
    ~(sign | (e << 4) | mant) & 0xff
  }

  /** 16-bit linear → A-law byte — EXACTLY the ITU reference C
    * (Sun/CCITT g711.c `linear2alaw`): reduce to 13-bit uniform
    * (x >> 3), negatives via one's complement (−p − 1, so −16 joins
    * the LOWER cell — the G.711 sign-magnitude convention), 13-bit
    * segment table, mantissa shift max(1, seg). Inverts
    * [[alawToLinear]] on ALL 256 code levels (spec-pinned). NOTE the
    * JDK's AlawCodec deviates on negatives (it biases −x−8 in 16-bit
    * arithmetic), so the JDK pin covers positives only. */
  def linearToAlaw(x0: Int): Int = {
    var p = x0 >> 3
    val mask = if (p >= 0) 0xd5 else { p = -p - 1; 0x55 }
    val seg =
      if (p <= 0x1f) 0 else if (p <= 0x3f) 1 else if (p <= 0x7f) 2
      else if (p <= 0xff) 3 else if (p <= 0x1ff) 4
      else if (p <= 0x3ff) 5 else if (p <= 0x7ff) 6 else 7
    val mant = (p >> (if (seg < 2) 1 else seg)) & 0x0f
    ((seg << 4) | mant) ^ mask
  }

  /** Fixture: a real A-law WAV, byte stream `(id·17 + i·11) mod 256`. */
  def syntheticAlawWav(id: Long, nFrames: Int,
      sampleRateHz: Int): Array[Byte] = {
    val data = new Array[Byte](nFrames)
    var i = 0
    while (i < nFrames) {
      data(i) = ((id * 17 + i.toLong * 11) % 256).toByte
      i += 1
    }
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
    val dataSz = nFrames + (nFrames & 1)
    w32(4 + 8 + 18 + 8 + dataSz)
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write('f'); out.write('m'); out.write('t'); out.write(' ')
    w32(18)
    w16(6)          // WAVE_FORMAT_ALAW
    w16(1)          // mono
    w32(sampleRateHz.toLong)
    w32(sampleRateHz.toLong)
    w16(1)
    w16(8)
    w16(0)
    out.write('d'); out.write('a'); out.write('t'); out.write('a')
    w32(nFrames.toLong)
    out.write(data, 0, nFrames)
    if ((nFrames & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Fixture: a real µ-law WAV whose byte stream is the closed form
    * `(id·13 + i·7) mod 256` — every expanded sample replays in SQL
    * through the µ-law formula. */
  def syntheticUlawWav(id: Long, nFrames: Int,
      sampleRateHz: Int): Array[Byte] = {
    val data = new Array[Byte](nFrames)
    var i = 0
    while (i < nFrames) {
      data(i) = ((id * 13 + i.toLong * 7) % 256).toByte
      i += 1
    }
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
    val dataSz = nFrames + (nFrames & 1)
    w32(4 + 8 + 18 + 8 + dataSz)
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write('f'); out.write('m'); out.write('t'); out.write(' ')
    w32(18)         // µ-law fmt chunks carry cbSize (= 0)
    w16(7)          // WAVE_FORMAT_MULAW
    w16(1)          // mono
    w32(sampleRateHz.toLong)
    w32(sampleRateHz.toLong) // byte rate (1 byte/sample)
    w16(1)          // block align
    w16(8)          // bits per sample
    w16(0)          // cbSize
    out.write('d'); out.write('a'); out.write('t'); out.write('a')
    w32(nFrames.toLong)
    out.write(data, 0, nFrames)
    if ((nFrames & 1) == 1) out.write(0) // even padding
    out.toByteArray
  }
}
