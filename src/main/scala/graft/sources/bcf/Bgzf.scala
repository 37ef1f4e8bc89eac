package graft.sources.bcf

import java.io.OutputStream
import java.util.zip.{CRC32, Deflater}

/** BGZF block writer (the blocked-gzip framing BCF requires — public
  * htslib/SAM spec §4.1): each ≤64 KiB payload becomes an independent
  * gzip member whose extra field carries the compressed block size
  * (`BC` subfield), closed by the fixed 28-byte EOF member. Reading
  * needs no special code — BGZF is valid multi-member gzip, which
  * `java.util.zip.GZIPInputStream` streams natively. */
object Bgzf {

  private val MaxBlock = 0xff00 // htslib's default payload bound

  val EofBlock: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00).map(_.toByte)

  final class Writer(out: OutputStream) extends OutputStream {
    private val buf = new Array[Byte](MaxBlock)
    private var n = 0

    override def write(b: Int): Unit = {
      buf(n) = b.toByte
      n += 1
      if (n == MaxBlock) flushBlock()
    }

    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      var o = off
      var rem = len
      while (rem > 0) {
        val take = math.min(rem, MaxBlock - n)
        System.arraycopy(b, o, buf, n, take)
        n += take; o += take; rem -= take
        if (n == MaxBlock) flushBlock()
      }
    }

    private def flushBlock(): Unit = {
      if (n == 0) return
      val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
      deflater.setInput(buf, 0, n)
      deflater.finish()
      val cmp = new Array[Byte](MaxBlock + 1024)
      var clen = 0
      while (!deflater.finished())
        clen += deflater.deflate(cmp, clen, cmp.length - clen)
      deflater.end()
      val crc = new CRC32()
      crc.update(buf, 0, n)
      val bsize = clen + 25 // total member size - 1
      val hdr = Array[Int](
        0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 6, 0,
        'B', 'C', 2, 0, bsize & 0xff, (bsize >> 8) & 0xff).map(_.toByte)
      out.write(hdr)
      out.write(cmp, 0, clen)
      val tail = new Array[Byte](8)
      writeU32(tail, 0, crc.getValue.toInt)
      writeU32(tail, 4, n)
      out.write(tail)
      n = 0
    }

    override def flush(): Unit = { flushBlock(); out.flush() }
    override def close(): Unit = {
      flushBlock()
      out.write(EofBlock)
      out.close()
    }
  }

  private def writeU32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte
    b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte
    b(o + 3) = ((v >> 24) & 0xff).toByte
  }
}
