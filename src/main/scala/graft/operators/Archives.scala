package graft.operators

/** Archive-container surface — the other half of the `.gz` story
  * ([[Gzip]]): corpus shards travel as `.tar` (WebDataset-style) and
  * `.zip` bundles. Both parsers are bounds-checked walks with
  * reject-don't-guess verification:
  *
  *  - TAR (POSIX ustar): 512-byte headers, octal size fields, the
  *    header CHECKSUM verified (sum of header bytes with the chksum
  *    field blanked to spaces), two-zero-block terminator required,
  *    trailing garbage rejected.
  *  - ZIP: the RANDOM-ACCESS read path a shard store actually uses —
  *    locate the End-Of-Central-Directory record from the tail, walk
  *    the central directory, slice each member's DEFLATE (or STORED)
  *    data via its local header, and VERIFY the central directory's
  *    CRC32 against the inflated bytes. Works with streaming writers
  *    that defer sizes to data descriptors (bit 3), because sizes come
  *    from the central directory, not the local header.
  */
object Archives {

  // ---- TAR ------------------------------------------------------------

  /** One ustar member (name ≤ 100 bytes, regular file). */
  private def tarHeader(name: String, size: Int): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("UTF-8")
    require(nb.length <= 100, s"tar name too long: $name")
    System.arraycopy(nb, 0, h, 0, nb.length)
    def octal(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val pad = "0" * (len - 1 - s.length) + s
      System.arraycopy(pad.getBytes("UTF-8"), 0, h, off, len - 1)
      h(off + len - 1) = 0
    }
    octal(420, 100, 8) // mode 0644
    octal(0, 108, 8); octal(0, 116, 8) // uid gid
    octal(size.toLong, 124, 12)
    octal(0, 136, 12) // mtime (deterministic fixture)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum blanked
    h(156) = '0' // typeflag: regular file
    System.arraycopy("ustar".getBytes, 0, h, 257, 5)
    h(263) = '0'; h(264) = '0'
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    val csPad = "0" * (6 - cs.length) + cs
    System.arraycopy(csPad.getBytes, 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    h
  }

  /** Write a ustar archive of (name, content) members. */
  def tarWrite(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, data) =>
      out.write(tarHeader(name, data.length))
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // two zero blocks
    out.toByteArray
  }

  /** Parsed member list; None on checksum/size/terminator defects. */
  def tarRead(payload: Array[Byte]): Option[Seq[(String, Array[Byte])]] = {
    if (payload == null || payload.length < 1024 ||
      payload.length % 512 != 0) return None
    val out = Seq.newBuilder[(String, Array[Byte])]
    var pos = 0
    while (pos + 512 <= payload.length) {
      val block = java.util.Arrays.copyOfRange(payload, pos, pos + 512)
      if (block.forall(_ == 0)) {
        // terminator: require the SECOND zero block and nothing after
        if (pos + 1024 != payload.length) return None
        val second =
          java.util.Arrays.copyOfRange(payload, pos + 512, pos + 1024)
        if (!second.forall(_ == 0)) return None
        return Some(out.result())
      }
      // checksum: header bytes with chksum field as spaces
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) ' '.toInt
                else block(i) & 0xff)
        i += 1
      }
      def octalAt(off: Int, len: Int): Long = {
        val s = new String(block, off, len, "UTF-8")
          .takeWhile(c => c >= '0' && c <= '7')
        if (s.isEmpty) -1L else java.lang.Long.parseLong(s, 8)
      }
      val storedCs = {
        val raw = new String(block, 148, 8, "UTF-8")
        val digits = raw.dropWhile(_ == ' ').takeWhile(c =>
          c >= '0' && c <= '7')
        if (digits.isEmpty) -1L else java.lang.Long.parseLong(digits, 8)
      }
      if (storedCs != sum) return None
      val size = octalAt(124, 12)
      if (size < 0) return None
      val name = new String(block, 0, 100, "UTF-8").takeWhile(_ != 0)
      val dataEnd = pos + 512 + size
      if (dataEnd > payload.length) return None // truncated content
      out += ((name,
        java.util.Arrays.copyOfRange(payload, pos + 512, dataEnd.toInt)))
      pos = (pos + 512 + ((size + 511) / 512 * 512)).toInt
    }
    None // ran off the end without the terminator
  }

  // ---- ZIP ------------------------------------------------------------

  /** Write a zip of (name, content) via the JDK's real DEFLATE
    * writer (streaming mode — sizes land in data descriptors and the
    * central directory, the layout the reader must handle). */
  def zipWrite(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    members.foreach { case (name, data) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(0L) // deterministic fixture
      z.putNextEntry(e)
      z.write(data)
      z.closeEntry()
    }
    z.close()
    out.toByteArray
  }

  /** Random-access read: EOCD → central directory → per-member local
    * header + data slice + inflate + CRC32 verify. None on any
    * structural defect or CRC mismatch. */
  def zipRead(payload: Array[Byte]): Option[Seq[(String, Array[Byte])]] = {
    if (payload == null || payload.length < 22) return None
    def u16(i: Int) = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
    def u32(i: Int) = (payload(i) & 0xff).toLong |
      ((payload(i + 1) & 0xff).toLong << 8) |
      ((payload(i + 2) & 0xff).toLong << 16) |
      ((payload(i + 3) & 0xff).toLong << 24)
    // EOCD: scan back over a possible comment (≤ 64 KB)
    var eocd = -1
    var i = payload.length - 22
    val floor = math.max(0, payload.length - 22 - 65535)
    while (eocd < 0 && i >= floor) {
      if (u32(i) == 0x06054b50L &&
        i + 22 + u16(i + 20) == payload.length) eocd = i
      i -= 1
    }
    if (eocd < 0) return None
    val n = u16(eocd + 10)
    val cdOff = u32(eocd + 16)
    if (cdOff < 0 || cdOff > eocd) return None
    val out = Seq.newBuilder[(String, Array[Byte])]
    var p = cdOff.toInt
    var k = 0
    while (k < n) {
      if (p + 46 > eocd || u32(p) != 0x02014b50L) return None
      val method = u16(p + 10)
      val crc = u32(p + 16)
      val csize = u32(p + 20)
      val usize = u32(p + 24)
      val nameLen = u16(p + 28)
      val extraLen = u16(p + 30)
      val commentLen = u16(p + 32)
      val lho = u32(p + 42)
      if (p + 46 + nameLen > eocd) return None
      val name = new String(payload, p + 46, nameLen, "UTF-8")
      // local header: sizes may be 0 there (data-descriptor layout);
      // trust the central directory, verify the CRC ourselves
      if (lho + 30 > payload.length || u32(lho.toInt) != 0x04034b50L)
        return None
      val lNameLen = u16(lho.toInt + 26)
      val lExtraLen = u16(lho.toInt + 28)
      val dataOff = lho + 30 + lNameLen + lExtraLen
      if (dataOff + csize > payload.length) return None
      val data =
        if (method == 0) { // STORED
          if (csize != usize) return None
          java.util.Arrays.copyOfRange(payload, dataOff.toInt,
            (dataOff + csize).toInt)
        } else if (method == 8) { // DEFLATE
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(payload, dataOff.toInt, csize.toInt)
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          try {
            while (!inf.finished()) {
              val m =
                try inf.inflate(tmp)
                catch {
                  case _: java.util.zip.DataFormatException => return None
                }
              if (m == 0 && !inf.finished()) return None
              buf.write(tmp, 0, m)
            }
          } finally inf.end()
          buf.toByteArray
        } else return None // other methods unsupported
      if (data.length.toLong != usize) return None
      val c = new java.util.zip.CRC32()
      c.update(data)
      if (c.getValue != crc) return None
      out += ((name, data))
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    Some(out.result())
  }
}
