package graft.sources.bcf

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPInputStream

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** CSI (coordinate-sorted index) reader/writer — the public htslib
  * index format (hts-specs CSIv1; the reference ships one next to its
  * own bgzipped VCF fixture). BCF records are length-prefixed binary
  * with no mid-stream resync marker, so byte-range splitting a .bcf
  * NEEDS record-aligned virtual offsets from an index; every chunk
  * begin in a CSI is such an offset. The engine writes a CSI alongside
  * its own BCF exports and splits any .bcf that has one (its own or
  * htslib's).
  *
  * Layout (all little-endian, whole payload BGZF-compressed):
  * `magic "CSI\1", min_shift i32, depth i32, l_aux i32, aux[l_aux],
  * n_ref i32` then per ref `n_bin i32` and per bin
  * `bin u32, loff u64, n_chunk i32, (cmp_beg u64, cmp_end u64)*`. */
object Csi {

  /** Standard CSI binning function (hts-specs reg2bin). */
  def reg2bin(begIn: Long, endIn: Long, minShift: Int, depth: Int): Int = {
    val end = endIn - 1
    var l = depth
    var s = minShift
    var t = ((1 << (depth * 3)) - 1) / 7
    while (l > 0) {
      if ((begIn >> s) == (end >> s)) return t + (begIn >> s).toInt
      l -= 1
      s += 3
      t -= 1 << (l * 3)
    }
    0
  }

  /** Accumulates (ref, interval, virtual-offset span) per record in file
    * order and writes the index. Adjacent records in the same bin merge
    * into one chunk when contiguous. */
  final class Builder(minShift: Int = 14, depth: Int = 5) {
    private val refs =
      ArrayBuffer.empty[mutable.LinkedHashMap[Int, (Long, ArrayBuffer[Array[Long]])]]

    def add(ref: Int, beg: Long, end: Long, vbeg: Long, vend: Long): Unit = {
      while (refs.length <= ref)
        refs += mutable.LinkedHashMap.empty
      val bin = reg2bin(beg, math.max(end, beg + 1), minShift, depth)
      val m = refs(ref)
      m.get(bin) match {
        case Some((loff, chunks)) =>
          val last = chunks.last
          if (last(1) == vbeg) last(1) = vend
          else chunks += Array(vbeg, vend)
          if (vbeg < loff) m.update(bin, (vbeg, chunks))
        case None =>
          m.update(bin, (vbeg, ArrayBuffer(Array(vbeg, vend))))
      }
    }

    def write(path: String): Unit = {
      val payload = new ByteArrayOutputStream()
      def i32(v: Int): Unit = {
        payload.write(v & 0xff); payload.write((v >> 8) & 0xff)
        payload.write((v >> 16) & 0xff); payload.write((v >>> 24) & 0xff)
      }
      def i64(v: Long): Unit = { i32(v.toInt); i32((v >>> 32).toInt) }
      payload.write('C'); payload.write('S'); payload.write('I')
      payload.write(1)
      i32(minShift); i32(depth); i32(0) // no aux
      i32(refs.length)
      refs.foreach { m =>
        i32(m.size)
        m.foreach { case (bin, (loff, chunks)) =>
          i32(bin); i64(loff); i32(chunks.length)
          chunks.foreach { c => i64(c(0)); i64(c(1)) }
        }
      }
      val out = new Bgzf.Writer(java.nio.file.Files.newOutputStream(
        java.nio.file.Paths.get(path)))
      out.write(payload.toByteArray)
      out.close()
    }
  }

  final case class Index(minShift: Int, depth: Int,
      refs: Seq[Map[Int, Seq[(Long, Long)]]])

  def read(path: String): Index = {
    val in = new GZIPInputStream(java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(path)), 64 * 1024)
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    val b = out.toByteArray
    var p = 0
    def i32(): Int = {
      val v = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
      p += 4; v
    }
    def i64(): Long = {
      val lo = i32().toLong & 0xffffffffL
      lo | (i32().toLong << 32)
    }
    require(b(0) == 'C' && b(1) == 'S' && b(2) == 'I' && b(3) == 1,
      s"$path is not a CSIv1 index")
    p = 4
    val minShift = i32()
    val depth = i32()
    val lAux = i32()
    p += lAux
    val nRef = i32()
    val refs = (0 until nRef).map { _ =>
      val nBin = i32()
      (0 until nBin).map { _ =>
        val bin = i32()
        i64() // loffset (unused for split planning)
        val nChunk = i32()
        bin -> (0 until nChunk).map(_ => { val s = i64(); (s, i64()) })
      }.toMap
    }
    Index(minShift, depth, refs)
  }

  /** Sorted distinct record-aligned virtual offsets harvested from every
    * chunk begin — the safe split points for a byte-range BCF scan.
    * htslib appends a PSEUDO-bin (number beyond the last real bin of the
    * scheme) per ref whose "chunks" carry record counts, not offsets —
    * those must be excluded. */
  def recordStarts(path: String): Array[Long] = {
    val idx = read(path)
    val maxRealBin = ((1L << (3 * (idx.depth + 1))) - 1) / 7 - 1
    idx.refs.iterator
      .flatMap(_.iterator.collect {
        case (bin, chunks) if bin <= maxRealBin => chunks.map(_._1)
      }.flatten)
      .toArray.distinct.sorted
  }
}
