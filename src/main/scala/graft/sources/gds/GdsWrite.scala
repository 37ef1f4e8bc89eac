package graft.sources.gds

import java.io.ByteArrayOutputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

/** CoreArray GDS container WRITER — the export half of the north star's
  * "GDS read/write via custom data source" (`seqVCF2GDS`'s on-disk
  * product; container layout as documented on [[GdsCore]], recovered
  * from the public fixtures and emitted here with the same block /
  * CdSerial-record / data-stream structure the reader parses, incl. the
  * SeqArray node tree of ReadByVariant.cpp:231-295: genotype/data dBit2
  * bit-planes with an `@data` planes-per-variant vector, missing = the
  * all-ones code).
  *
  * Scope: the canonical core tree (sample.id, variant.id, position,
  * chromosome, allele, annotation/{id,qual,filter}, genotype, phase),
  * uncompressed data streams (the *_ra xz chunking is a read-side
  * feature; parquet is this engine's scale store, .gds export is
  * interop). A GDS container is one file, so rows stream through the
  * driver like every single-file exporter here (Bed.write, Vcf export).
  */
object GdsWrite {

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ---- little-endian primitives ---------------------------------------
  private def u16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def u32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }
  private def u48(o: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 6) { o.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }
  private def u64(o: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { o.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** Inverse of GdsCore.unpack7: 7-bit LSB-first packed ASCII. */
  private def pack7(s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var acc = 0L
    var bits = 0
    s.foreach { c =>
      acc |= (c.toLong & 0x7f) << bits
      bits += 7
      while (bits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; bits -= 8 }
    }
    if (bits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  // ---- attribute blobs -------------------------------------------------
  final class Attrs {
    private val o = new ByteArrayOutputStream()
    var count = 0
    private def name(n: String): Unit = {
      val b = n.getBytes("UTF-8"); o.write(b.length); o.write(b)
    }
    def str(n: String, v: String): Attrs = {
      name(n); o.write(0x0e)
      val b = v.getBytes("UTF-8"); o.write(b.length); o.write(b)
      count += 1; this
    }
    def nul(n: String): Attrs = { name(n); o.write(0x00); count += 1; this }
    def bytes: Array[Byte] = o.toByteArray
  }

  // ---- CdSerial record emission ---------------------------------------
  // Property tokens exactly as the reader's signatures (GdsCore):
  private val TokClass = hx("0001")
  private val TokSizes = hx("02c9466d50e051250410")
  private val TokSkipA = hx("05ca466d507041217401")
  private val TokSkipB = hx("0205cb466d50d0581e5542") :+ 0x04.toByte
  private val TokNdim = hx("07c4e3641f")
  private val TokDims = hx("02c34361")
  private val TokDataId = hx("09c4c37c0c")
  private val TokNAttr = hx("0807f37d9d937d")
  private val TokAttrs = hx("0108f37ddd45791f")
  private val TokNChild = hx("08c643754ef601")
  private val TokChildren = hx("01c7437517e57d")
  private val TokEntry = hx("03000902f500")
  private val TokEntryFlags = hx("0944743112")
  private val TokEntryName = hx("44c66010")

  private def finishRecord(nProps: Int, body: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val len = body.length + 8 // second u48 + u16 + body
    u48(o, len); u48(o, len)
    u16(o, nProps)
    o.write(body)
    o.toByteArray
  }

  private def attrProps(o: ByteArrayOutputStream, attrs: Attrs): Int = {
    o.write(TokNAttr); u32(o, attrs.count)
    if (attrs.count == 0) 1
    else {
      val b = attrs.bytes
      o.write(TokAttrs); u48(o, b.length)
      o.write(b)
      2
    }
  }

  private val TokCoder = hx("15c4466d10")
  // scale/offset tokens of the packed-real classes: sig + f64le (layout
  // recovered from the Imputed_dosages fixture's dPackedReal8U node,
  // which stores OFFSET=0.0 immediately before SCALE=1/127; the 0x13
  // tag's second byte is 0x80|nameLen — 0x85 "SCALE", 0x86 "OFFSET")
  private val TokScale = hx("1385e7301704")
  private val TokOffset = hx("138616451ef401")

  /** Data-node record: class [+ coder] + sizes + dims + data-stream id +
    * attrs — the 9-prop shape of the fixtures' LZMA_ra nodes (8 props
    * when uncompressed, coder omitted). `packedScale` adds the
    * packed-real OFFSET+SCALE properties (dPackedReal16 & co; the
    * reference writes both, offset normally 0). */
  def dataRecord(cls: String, rawSize: Long, cmpSize: Long, dims: Seq[Int],
      dataId: Int, attrs: Attrs, coder: Option[String],
      packedScale: Option[Double] = None,
      packedOffset: Double = 0.0): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(TokClass)
    o.write(cls.length)
    o.write(pack7(cls))
    packedScale.foreach { s =>
      // fixture order: OFFSET first, then SCALE
      o.write(TokOffset)
      u64(o, java.lang.Double.doubleToLongBits(packedOffset))
      o.write(TokScale)
      u64(o, java.lang.Double.doubleToLongBits(s))
    }
    coder.foreach { cd =>
      o.write(TokCoder)
      val b = cd.getBytes("ASCII")
      o.write(b.length); o.write(b)
    }
    o.write(TokSizes); u64(o, rawSize); u64(o, cmpSize)
    o.write(TokSkipA)
    o.write(TokSkipB)
    o.write(TokNdim); o.write(dims.length); o.write(0)
    o.write(TokDims); o.write(4 * dims.length)
    dims.foreach(u32(o, _))
    o.write(TokDataId); u32(o, dataId)
    val nAttrProps = attrProps(o, attrs)
    finishRecord(6 + coder.size + 2 * packedScale.size + nAttrProps,
      o.toByteArray)
  }

  /** Folder record: child table + attrs (root/genotype/annotation shape). */
  def folderRecord(children: Seq[(Int, String, Int)], attrs: Attrs)
      : Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(TokNChild); u32(o, children.length)
    val tbl = new ByteArrayOutputStream()
    children.foreach { case (cid, name, flags) =>
      val nb = name.getBytes("UTF-8")
      u48(tbl, 31L + nb.length)
      tbl.write(TokEntry); u32(tbl, cid)
      tbl.write(TokEntryFlags); u32(tbl, flags)
      tbl.write(0x15); tbl.write(TokEntryName)
      tbl.write(nb.length); tbl.write(nb)
    }
    o.write(TokChildren); u48(o, tbl.size())
    o.write(tbl.toByteArray)
    val nAttrProps = attrProps(o, attrs)
    finishRecord(2 + nAttrProps, o.toByteArray)
  }

  // ---- typed payload builders ------------------------------------------
  def strPayload(vs: Iterable[String]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    vs.foreach { s0 =>
      val s = if (s0 == null) "" else s0
      val b = s.getBytes("UTF-8")
      var l = b.length
      while (l >= 0x80) { o.write((l & 0x7f) | 0x80); l >>= 7 }
      o.write(l)
      o.write(b)
    }
    o.toByteArray
  }
  def intPayload(vs: Iterable[Int]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    vs.foreach(u32(o, _))
    o.toByteArray
  }
  def int16Payload(vs: Iterable[Int]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    vs.foreach(v => u16(o, v & 0xffff))
    o.toByteArray
  }
  def floatPayload(vs: Iterable[Float]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    vs.foreach(v => u32(o, java.lang.Float.floatToIntBits(v)))
    o.toByteArray
  }
  /** dPackedReal16 payload: value/scale rounded to int16 LE, NaN → the
    * min-int16 missing sentinel, finite values clamped to the packable
    * range (the reference's packedreal16 dosage storage,
    * ConvVCF2GDS.R:577-583). */
  def packedReal16Payload(vs: Iterable[Float], scale: Double): Array[Byte] =
    packedRealPayload(vs, scale, width = 2, unsigned = false)

  /** Generic packed-real payload (dPackedReal{8,16,24,32}[U]):
    * value/scale rounded to a `width`-byte LE code, NaN → the missing
    * sentinel (minimum signed / maximum unsigned code), finite values
    * clamped to the packable range. */
  def packedRealPayload(vs: Iterable[Float], scale: Double, width: Int,
      unsigned: Boolean): Array[Byte] = {
    val bits = 8 * width
    val (lo, hi, missing) =
      if (unsigned) (0L, (1L << bits) - 2, (1L << bits) - 1)
      else (-(1L << (bits - 1)) + 1, (1L << (bits - 1)) - 1,
        -(1L << (bits - 1)))
    val o = new ByteArrayOutputStream()
    vs.foreach { v =>
      val code =
        if (v != v) missing
        else math.max(lo, math.min(hi, math.round(v / scale)))
      var k = 0
      while (k < width) { o.write(((code >> (8 * k)) & 0xff).toInt); k += 1 }
    }
    o.toByteArray
  }

  /** Fixed-width little-endian integer payload (dInt{8,16,32,64} and the
    * unsigned variants; `width` in bytes). */
  def intPayloadW(vs: Iterable[Long], width: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    vs.foreach { v =>
      var k = 0
      while (k < width) { o.write(((v >> (8 * k)) & 0xff).toInt); k += 1 }
    }
    o.toByteArray
  }

  /** LSB-first bit packer matching GdsCore.bit1/bit2. */
  final class BitPacker(bitsPer: Int) {
    private val buf = ArrayBuffer.empty[Byte]
    private var idx = 0L
    def count: Int = idx.toInt
    def add(v: Int): Unit = {
      val bitPos = idx * bitsPer
      val byteAt = (bitPos >> 3).toInt
      while (buf.length <= byteAt) buf += 0
      buf(byteAt) = (buf(byteAt) | ((v & ((1 << bitsPer) - 1)) <<
        (bitPos & 7).toInt)).toByte
      idx += 1
    }
    def bytes: Array[Byte] = buf.toArray
  }

  // ---- container assembly ----------------------------------------------
  /** `coder` picks the `*_ra` chunk codec for large nodes: "LZMA_ra"
    * (xz — the reference import default), "ZIP_ra" (`seqStorageOption`'s
    * own default, `R/Utilities.R:250-252`), or "LZ4_ra". */
  final class Container(coder: String = "LZMA_ra") {
    private val codec: GdsCore.RaCodec = GdsCore.codecForCoder(coder)
      .getOrElse(throw new IllegalArgumentException(
        s"gds write: unknown storage coder $coder"))
    private val streams = ArrayBuffer.empty[(Int, Array[Byte])]
    private var next = 1
    def allocId(): Int = { val id = next; next += 1; id }
    def record(id: Int, rec: Array[Byte]): Unit = streams += id -> rec
    /** Data stream: [u48 payloadLen][payload]. */
    def data(payload: Array[Byte]): Int = {
      val id = allocId()
      val o = new ByteArrayOutputStream()
      u48(o, payload.length)
      o.write(payload)
      streams += id -> o.toByteArray
      id
    }
    /** Data node in one call: payload stream + record stream. Payloads
      * past `CompressAt` get the fixtures' LZMA_ra coding — XZ_RA
      * framing with independently-decompressible 128 KiB chunks (the
      * random-access property the reference's variant-range reads rely
      * on); small nodes stay raw. */
    def node(cls: String, dims: Seq[Int], payload: Array[Byte],
        attrs: Attrs = new Attrs, packedScale: Option[Double] = None,
        packedOffset: Double = 0.0): Int = {
      val compress = payload.length >= Container.CompressAt
      val stored = if (compress) raFrame(payload, codec) else payload
      val did = data(stored)
      val rid = allocId()
      record(rid, dataRecord(cls, payload.length, stored.length, dims, did,
        attrs, if (compress) Some(codec.coderName) else None, packedScale,
        packedOffset))
      rid
    }
    def folder(children: Seq[(Int, String, Int)],
        attrs: Attrs = new Attrs): Int = {
      val rid = allocId()
      record(rid, folderRecord(children, attrs))
      rid
    }
    def folderAt(rid: Int, children: Seq[(Int, String, Int)],
        attrs: Attrs = new Attrs): Unit =
      record(rid, folderRecord(children, attrs))

    def save(path: String, entryId: Int): Unit = {
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(path), 1 << 20)
      try {
        out.write("COREARRAYx0A".getBytes("ASCII"))
        out.write(Array(0x00, 0x01).map(_.toByte)) // container version
        val eid = new ByteArrayOutputStream()
        u32(eid, entryId)
        out.write(eid.toByteArray)
        streams.foreach { case (id, content) =>
          val h = new ByteArrayOutputStream()
          u48(h, (content.length + 16L) | (1L << 47)) // head fragment
          u48(h, 0L) // next
          u32(h, id)
          out.write(h.toByteArray)
          out.write(content)
        }
      } finally out.close()
    }
  }

  object Container {
    /** Below this, xz headers cost more than they save. */
    val CompressAt: Int = 4096
  }

  /** `*_ra` chunked framing (read-side decode in GdsCore.nodeBytes):
    * `[magic] 10 11 ff [u32 nChunks]` then per chunk `[u48 cmpSize][one
    * independent compressed stream of ≤128 KiB raw]`. Chunks are
    * independent streams BY DESIGN (that is the random-access
    * property), so they compress concurrently on every available core —
    * compression dominates single-file export cost, and the output
    * bytes are identical to a serial pass. */
  private def raFrame(payload: Array[Byte], codec: GdsCore.RaCodec)
      : Array[Byte] = {
    val ChunkRaw = 128 * 1024
    val o = new ByteArrayOutputStream()
    o.write(codec.magic.getBytes("ASCII"))
    o.write(0x10); o.write(0x11); o.write(0xff)
    val nChunks = math.max(1, (payload.length + ChunkRaw - 1) / ChunkRaw)
    u32(o, nChunks)
    val parts = new Array[Array[Byte]](nChunks)
    java.util.stream.IntStream.range(0, nChunks).parallel().forEach { c =>
      val off = c * ChunkRaw
      val len = math.min(ChunkRaw, payload.length - off)
      val cmp = new ByteArrayOutputStream()
      val z = codec.encode(cmp)
      z.write(payload, off, len)
      z.close()
      parts(c) = cmp.toByteArray
    }
    parts.foreach { p =>
      u48(o, p.length)
      o.write(p)
    }
    o.toByteArray
  }

  private val FolderFlag = 2
  private val HiddenFlag = 16

  // ---- info/fmt column accumulators (annotation/info, annotation/format)
  // Null encodings mirror the read-side valueReader sentinels:
  // Int.MinValue, NaN, "" — and ragged fields carry an `@name` length
  // vector where len<=0 means a null row.
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private sealed trait ColAcc {
    def add(r: Row, i: Int): Unit
    /** Emits nodes; returns the child entries to hang on the folder. */
    def emit(c: Container, name: String): Seq[(Int, String, Int)]
  }

  private def scalarCls(dt: DataType): (String, Any => Array[Byte], String) =
    dt match {
      case IntegerType => ("dInt32",
        vs => intPayload(vs.asInstanceOf[Seq[Int]]), "Integer")
      case LongType => ("dInt64", // VCF has no 64-bit type; Type stays
        vs => intPayloadW(vs.asInstanceOf[Seq[Long]], 8), "Integer")
      case _: DecimalType => ("dUInt64", // the read surface of dUInt64:
        // write back the raw unsigned bit pattern (BigInteger.longValue
        // wraps 2^63..2^64-1 to the negative bits the container stores)
        vs => intPayloadW(vs.asInstanceOf[Seq[Any]].map {
          case null => 0L
          case d: java.math.BigDecimal => d.toBigInteger.longValue
          case d: BigDecimal => d.toBigInt.longValue
        }, 8), "Integer")
      case FloatType => ("dFloat32",
        vs => floatPayload(vs.asInstanceOf[Seq[Float]]), "Float")
      case StringType => ("dStr8",
        vs => strPayload(vs.asInstanceOf[Seq[String]]), "String")
      case t => throw new UnsupportedOperationException(
        s"gds write: unsupported scalar $t")
    }

  private def attrsFor(number: String, vtype: String): Attrs =
    new Attrs().str("Number", number).str("Type", vtype)

  /** INFO Flag → dBit1. */
  private final class FlagAcc extends ColAcc {
    private val bits = new BitPacker(1)
    def add(r: Row, i: Int): Unit =
      bits.add(if (!r.isNullAt(i) && r.getBoolean(i)) 1 else 0)
    def emit(c: Container, name: String): Seq[(Int, String, Int)] = {
      val n = c.node("dBit1", Seq(bits.count), bits.bytes,
        attrsFor("0", "Flag"))
      Seq((n, name, 0))
    }
  }

  /** INFO scalar (Number=1). */
  private final class ScalarAcc(dt: DataType) extends ColAcc {
    private val buf = ArrayBuffer.empty[Any]
    def add(r: Row, i: Int): Unit = buf += (dt match {
      case IntegerType => if (r.isNullAt(i)) Int.MinValue else r.getInt(i)
      case LongType => if (r.isNullAt(i)) Long.MinValue else r.getLong(i)
      case FloatType => if (r.isNullAt(i)) Float.NaN else r.getFloat(i)
      // dUInt64 has no reserved NA code (see the reader) — null stores 0
      case _: DecimalType =>
        if (r.isNullAt(i)) java.math.BigDecimal.ZERO else r.getDecimal(i)
      case _ => if (r.isNullAt(i)) "" else r.getString(i)
    })
    def emit(c: Container, name: String): Seq[(Int, String, Int)] = {
      val (cls, pay, vt) = scalarCls(dt)
      Seq((c.node(cls, Seq(buf.length), pay(buf.toSeq), attrsFor("1", vt)),
        name, 0))
    }
  }

  /** INFO array (Number=.) → ragged values + @name lens. */
  private final class ArrAcc(elem: DataType) extends ColAcc {
    private val values = ArrayBuffer.empty[Any]
    private val lens = ArrayBuffer.empty[Int]
    def add(r: Row, i: Int): Unit =
      if (r.isNullAt(i)) lens += 0
      else {
        val s = r.getSeq[Any](i)
        lens += s.length
        s.foreach(v => values += (elem match {
          case IntegerType => if (v == null) Int.MinValue else v
          case LongType => if (v == null) Long.MinValue else v
          case FloatType => if (v == null) Float.NaN else v
          case _ => if (v == null) "" else v
        }))
      }
    def emit(c: Container, name: String): Seq[(Int, String, Int)] = {
      val (cls, pay, vt) = scalarCls(elem)
      val vNode = c.node(cls, Seq(values.length), pay(values.toSeq),
        attrsFor(".", vt))
      val lNode = c.node("dInt32", Seq(lens.length),
        intPayload(lens.toSeq.asInstanceOf[Seq[Int]]),
        new Attrs().nul("R.invisible"))
      Seq((vNode, name, 0), (lNode, "@" + name, HiddenFlag))
    }
  }

  /** FORMAT scalar-per-sample (Number=1) → data [nVar, nS]. With
    * `pack16` (the reference's `ds.type="packedreal16"` import default
    * for DS/GP, ConvVCF2GDS.R:577-583) a float matrix stores as
    * dPackedReal16 int16 codes at scale [[PackedReal16Scale]]. */
  private final class FmtAcc(elem: DataType, nS: Int,
      pack16: Boolean = false) extends ColAcc {
    private val values = ArrayBuffer.empty[Any]
    private var rows = 0
    def add(r: Row, i: Int): Unit = {
      rows += 1
      val s = if (r.isNullAt(i)) Seq.fill[Any](nS)(null) else r.getSeq[Any](i)
      require(s.length == nS, s"fmt width ${s.length} != $nS")
      s.foreach(v => values += (elem match {
        case IntegerType => if (v == null) Int.MinValue else v
        case LongType => if (v == null) Long.MinValue else v
        case FloatType => if (v == null) Float.NaN else v
        case _ => if (v == null) "" else v
      }))
    }
    def emit(c: Container, name: String): Seq[(Int, String, Int)] = {
      val dNode =
        if (pack16 && elem == FloatType)
          c.node("dPackedReal16", Seq(rows, nS),
            packedReal16Payload(values.map(_.asInstanceOf[Float]).toSeq,
              PackedReal16Scale),
            new Attrs(), packedScale = Some(PackedReal16Scale))
        else {
          val (cls, pay, _) = scalarCls(elem)
          c.node(cls, Seq(rows, nS), pay(values.toSeq), new Attrs())
        }
      val vt = scalarCls(elem)._3
      Seq((c.folder(Seq((dNode, "data", 0)), attrsFor("1", vt)),
        name, FolderFlag))
    }
  }

  /** FORMAT ragged (Number=.) → data [rows, nS] + @data rows-per-variant
    * (the reference's layout: one row count per VARIANT; a null sample
    * cell pads its column with sentinels). `pack16` stores a float
    * matrix as dPackedReal16 (the reference packs ragged GP the same
    * way as DS, ConvVCF2GDS.R:581). */
  private final class FmtNestedAcc(elem: DataType, nS: Int,
      pack16: Boolean = false) extends ColAcc {
    private val values = ArrayBuffer.empty[Any]
    private val lens = ArrayBuffer.empty[Int]
    def add(r: Row, i: Int): Unit = {
      val samples: Seq[Seq[Any]] =
        if (r.isNullAt(i)) Seq.fill(nS)(null)
        else r.getSeq[scala.collection.Seq[Any]](i).map(s =>
          if (s == null) null else s.toSeq)
      require(samples.length == nS, s"fmt width ${samples.length} != $nS")
      val l = samples.map(s => if (s == null) 0 else s.length).max
      lens += l
      var row = 0
      while (row < l) {
        samples.foreach { s =>
          val v = if (s == null || row >= s.length) null else s(row)
          values += (elem match {
            case IntegerType => if (v == null) Int.MinValue else v
            case LongType => if (v == null) Long.MinValue else v
            case FloatType => if (v == null) Float.NaN else v
            case _ => if (v == null) "" else v
          })
        }
        row += 1
      }
    }
    def emit(c: Container, name: String): Seq[(Int, String, Int)] = {
      val dNode =
        if (pack16 && elem == FloatType)
          c.node("dPackedReal16", Seq(lens.sum, nS),
            packedReal16Payload(values.map(_.asInstanceOf[Float]).toSeq,
              PackedReal16Scale),
            new Attrs(), packedScale = Some(PackedReal16Scale))
        else {
          val (cls, pay, _) = scalarCls(elem)
          c.node(cls, Seq(lens.sum, nS), pay(values.toSeq), new Attrs())
        }
      val vt = scalarCls(elem)._3
      val lNode = c.node("dInt32", Seq(lens.length),
        intPayload(lens.toSeq), new Attrs().nul("R.invisible"))
      Seq((c.folder(Seq((dNode, "data", 0), (lNode, "@data", HiddenFlag)),
        attrsFor(".", vt)), name, FolderFlag))
    }
  }

  /** The reference's packedreal16 quantization step
    * ("packedreal16:offset=0,scale=0.0001", ConvVCF2GDS.R:580). */
  val PackedReal16Scale: Double = 0.0001

  private def accFor(field: StructField, nS: Int,
      dsType: String = "float"): ColAcc = {
    val isFmt = field.name.startsWith("fmt_")
    // ds.type="packedreal16" applies to the dosage/probability matrices
    // the reference packs (annotation/format/{DS,GP}, ConvVCF2GDS.R:577)
    val pack16 = dsType == "packedreal16" &&
      (field.name == "fmt_DS" || field.name == "fmt_GP")
    field.dataType match {
      case BooleanType => new FlagAcc
      case ArrayType(e: ArrayType, _) if isFmt =>
        new FmtNestedAcc(e.elementType, nS, pack16)
      case ArrayType(e, _) if isFmt => new FmtAcc(e, nS, pack16)
      case ArrayType(e, _) => new ArrAcc(e)
      case dt => new ScalarAcc(dt)
    }
  }

  /** Canonical column selection + name→ordinal index for the writers. */
  private def shape(df: DataFrame): (DataFrame, Map[String, Int],
      Seq[StructField], Seq[StructField]) = {
    import org.apache.spark.sql.functions.col
    val fields = df.schema.fieldNames.toSet
    val infoFields = df.schema.fields
      .filter(_.name.startsWith("info_")).toSeq
    val fmtFields = df.schema.fields
      .filter(_.name.startsWith("fmt_")).toSeq
    val optNames = Seq("id", "qual", "filter", "geno", "phased")
      .filter(fields.contains) ++
      (infoFields ++ fmtFields).map(_.name)
    val names = Seq("variant_id", "chrom", "pos", "allele") ++ optNames
    (df.select(names.map(col): _*), names.zipWithIndex.toMap,
      infoFields, fmtFields)
  }

  /** Writes `df` (canonical columns `variant_id, chrom, pos, id, allele,
    * qual, filter, geno, phased`, plus `info_*` columns — scalar, array
    * and Flag — and `fmt_*` scalar-per-sample columns; other columns
    * ignored) plus the sample axis to a `.gds` container in the frame's
    * row order. `storage` is the `seqStorageOption` compression name:
    * LZMA_ra (default), ZIP_ra, or LZ4_ra. One file ⇒ rows stream
    * through the driver; use [[writeSharded]] for the executor-side
    * scale path. */
  def write(df: DataFrame, sampleIds: Seq[String], path: String,
      storage: String = "LZMA_ra", dsType: String = "float"): Unit = {
    val (sel, index, infoFields, fmtFields) = shape(df)
    import scala.jdk.CollectionConverters._
    writeRows(sel.toLocalIterator().asScala, index, infoFields, fmtFields,
      sampleIds, path, storage, dsType)
  }

  /** Executor-side sharded export — the 100 TB path: rows shuffle once
    * into contiguous (chrom, pos) ranges, each shard builds its own
    * container ON ITS EXECUTOR in `variant_id` order, and a
    * `_manifest.json` lists the shards. No row ever passes through the
    * driver. `dir` must be a path every executor can write (posix/NFS
    * here; the pattern carries to any shared FS). Read back with
    * `Gds.read(spark, dir)` — the gds source expands a directory to its
    * shard files. Returns (shard file, variant count) pairs. */
  def writeSharded(df: DataFrame, sampleIds: Seq[String], dir: String,
      storage: String = "LZMA_ra", numShards: Int = 0,
      dsType: String = "float"): Seq[(String, Long)] = {
    val (sel, index, infoFields, fmtFields) = shape(df)
    graft.sources.Sharded.export(sel, dir, ".gds",
      (it, f) => writeRows(it, index, infoFields, fmtFields, sampleIds, f,
        storage, dsType),
      numShards = numShards)
  }

  /** Container build from a row iterator — runs on the driver for
    * [[write]] and on executors for [[writeSharded]]. Returns the
    * variant count. */
  private def writeRows(it: Iterator[Row], index: Map[String, Int],
      infoFields: Seq[StructField], fmtFields: Seq[StructField],
      sampleIds: Seq[String], path: String, storage: String,
      dsType: String = "float"): Long = {
    def at(n: String): Int = index.getOrElse(n, -1)
    val hasGeno = index.contains("geno")
    val hasPhase = index.contains("phased")

    val vids = ArrayBuffer.empty[Int]
    val chroms = ArrayBuffer.empty[String]
    val poss = ArrayBuffer.empty[Int]
    val ids = ArrayBuffer.empty[String]
    val alleles = ArrayBuffer.empty[String]
    val quals = ArrayBuffer.empty[Float]
    val filters = ArrayBuffer.empty[String]
    val planes = ArrayBuffer.empty[Int]
    val genoBits = new BitPacker(2)
    val phaseBits = new BitPacker(1)
    // ploidy-overflow (triploid+ calls): (sample 1-based, variant
    // 1-based, count) index rows + the overflow allele codes / phase
    // separator bits (Tutorial.Rmd:149-150 layout)
    val extraIdx = ArrayBuffer.empty[Int]
    val extraVals = ArrayBuffer.empty[Int]
    val phaseExtraIdx = ArrayBuffer.empty[Int]
    val phaseExtraBits = new BitPacker(1)
    var phaseExtraCount = 0
    var nS = sampleIds.length
    var ploidy = 2
    var ploidySet = false
    val infoAccs = infoFields.map(f => f.name -> accFor(f, nS))
    val fmtAccs = fmtFields.map(f => f.name -> accFor(f, nS, dsType))

    while (it.hasNext) {
      val r = it.next()
      (infoAccs ++ fmtAccs).foreach { case (n, acc) => acc.add(r, at(n)) }
      val vid = r.getLong(at("variant_id"))
      require(vid <= Int.MaxValue, s"variant_id $vid exceeds dInt32")
      vids += vid.toInt
      chroms += r.getString(at("chrom"))
      poss += r.getInt(at("pos"))
      alleles += r.getString(at("allele"))
      if (at("id") >= 0) ids += (if (r.isNullAt(at("id"))) "."
        else r.getString(at("id")))
      if (at("qual") >= 0) quals += (if (r.isNullAt(at("qual"))) Float.NaN
        else r.getFloat(at("qual")))
      if (at("filter") >= 0) filters += (if (r.isNullAt(at("filter"))) ""
        else r.getString(at("filter")))
      if (hasGeno) {
        val g = r.getSeq[scala.collection.Seq[Any]](at("geno"))
        require(g.length == nS, s"geno width ${g.length} != ${sampleIds.length}")
        if (!ploidySet) {
          // container ploidy freezes on the first row's most common call
          // length (reference VCF import fixes ploidy up front); shorter
          // calls pad missing, longer calls overflow into genotype/extra
          ploidy =
            if (g.isEmpty) 2
            else g.groupBy(_.length).maxBy(p => (p._2.size, -p._1))._1
          ploidySet = true
        }
        // planes: enough 2-bit planes that the all-ones missing code is
        // distinct from every in-plane allele code (reference Index.h
        // NA pattern); overflow codes live in extra (dInt16), not planes
        var maxCode = 0
        g.foreach(_.take(ploidy).foreach {
          case null =>
          case v: Long => maxCode = math.max(maxCode, v.toInt)
          case v: java.lang.Long => maxCode = math.max(maxCode, v.intValue())
        })
        var np = 1
        while ((1 << (2 * np)) - 1 <= maxCode) np += 1
        val miss = (1 << (2 * np)) - 1
        planes += np
        var k = 0
        while (k < np) {
          g.foreach { sa =>
            var a = 0
            while (a < ploidy) {
              val code = if (a >= sa.length || sa(a) == null) miss
                else sa(a).asInstanceOf[Long].toInt
              genoBits.add((code >> (2 * k)) & 3)
              a += 1
            }
          }
          k += 1
        }
        var s = 0
        g.foreach { sa =>
          if (sa.length > ploidy) {
            val cnt = sa.length - ploidy
            extraIdx += (s + 1); extraIdx += vids.length; extraIdx += cnt
            var a = ploidy
            while (a < sa.length) {
              extraVals += (sa(a) match {
                case null => -1 // int16 missing sentinel
                case v: Long => v.toInt
                case v: java.lang.Long => v.intValue()
              })
              a += 1
            }
          }
          s += 1
        }
      }
      if (hasPhase) {
        val ph = r.getSeq[Boolean](at("phased"))
        ph.foreach(b => phaseBits.add(if (b) 1 else 0))
        if (hasGeno) {
          // a call with L alleles has L-1 separators; the first lives in
          // phase/data, the rest in phase/extra (the engine's one-bool
          // model repeats the call's phasing for the extra separators)
          val g = r.getSeq[scala.collection.Seq[Any]](at("geno"))
          var s = 0
          g.foreach { sa =>
            if (sa.length > ploidy) {
              val cnt = sa.length - ploidy
              phaseExtraIdx += (s + 1); phaseExtraIdx += vids.length
              phaseExtraIdx += cnt
              var k = 0
              while (k < cnt) {
                phaseExtraBits.add(if (ph(s)) 1 else 0)
                phaseExtraCount += 1
                k += 1
              }
            }
            s += 1
          }
        }
      }
    }
    val nVar = vids.length

    val c = new Container(storage)
    val rootId = c.allocId() // stream 1 = entry
    val desc = c.folder(Nil, new Attrs().str("vcf.fileformat", "VCFv4.2"))
    val sampleId = c.node("dStr8", Seq(nS), strPayload(sampleIds))
    val variantId = c.node("dInt32", Seq(nVar), intPayload(vids))
    val position = c.node("dInt32", Seq(nVar), intPayload(poss))
    val chromosome = c.node("dStr8", Seq(nVar), strPayload(chroms))
    // run-length chromosome twin (the reference writes the same pair):
    // planning-time chrom pruning reads a handful of runs instead of
    // one string per variant
    val rleVals = ArrayBuffer.empty[String]
    val rleLens = ArrayBuffer.empty[Int]
    chroms.foreach { ch =>
      if (rleVals.nonEmpty && rleVals.last == ch)
        rleLens(rleLens.length - 1) += 1
      else { rleVals += ch; rleLens += 1 }
    }
    val chromRleVal = c.node("dStr8", Seq(rleVals.length),
      strPayload(rleVals))
    val chromRleLen = c.node("dInt32", Seq(rleLens.length),
      intPayload(rleLens))
    val allele = c.node("dStr8", Seq(nVar), strPayload(alleles))

    val genoFolder = if (!hasGeno) None else {
      val data = c.node("dBit2", Seq(nVar, nS, ploidy), genoBits.bytes)
      val atData = c.node("dUInt8", Seq(nVar),
        planes.map(_.toByte).toArray,
        new Attrs().nul("R.invisible"))
      // ploidy-overflow companions — written even when empty, matching
      // the reference's node tree (both fixtures carry [0,3]/[0] nodes)
      val exIdx = c.node("dInt32", Seq(extraIdx.length / 3, 3),
        intPayload(extraIdx))
      val ex = c.node("dInt16", Seq(extraVals.length),
        int16Payload(extraVals))
      Some(c.folder(Seq((data, "data", 0), (atData, "@data", HiddenFlag),
        (exIdx, "extra.index", 0), (ex, "extra", 0)),
        new Attrs().str("VariableName", "GT")
          .str("Description", "Genotype")))
    }
    val phaseFolder = if (!hasPhase) None else {
      val data = c.node("dBit1", Seq(nVar, nS), phaseBits.bytes)
      val exIdx = c.node("dInt32", Seq(phaseExtraIdx.length / 3, 3),
        intPayload(phaseExtraIdx))
      val ex = c.node("dBit1", Seq(phaseExtraCount), phaseExtraBits.bytes)
      Some(c.folder(Seq((data, "data", 0),
        (exIdx, "extra.index", 0), (ex, "extra", 0))))
    }

    val annChildren = ArrayBuffer.empty[(Int, String, Int)]
    if (ids.nonEmpty)
      annChildren += ((c.node("dStr8", Seq(nVar), strPayload(ids)), "id", 0))
    if (quals.nonEmpty)
      annChildren += ((c.node("dFloat32", Seq(nVar), floatPayload(quals)),
        "qual", 0))
    if (filters.nonEmpty)
      annChildren += ((c.node("dStr8", Seq(nVar), strPayload(filters)),
        "filter", 0))
    if (infoAccs.nonEmpty) {
      val kids = infoAccs.flatMap { case (n, acc) =>
        acc.emit(c, n.stripPrefix("info_"))
      }
      annChildren += ((c.folder(kids), "info", FolderFlag))
    }
    if (fmtAccs.nonEmpty) {
      val kids = fmtAccs.flatMap { case (n, acc) =>
        acc.emit(c, n.stripPrefix("fmt_"))
      }
      annChildren += ((c.folder(kids), "format", FolderFlag))
    }
    val annotation = c.folder(annChildren.toSeq)

    c.folderAt(rootId,
      Seq((desc, "description", FolderFlag),
        (sampleId, "sample.id", 0),
        (variantId, "variant.id", 0),
        (position, "position", 0),
        (chromosome, "chromosome", 0),
        (chromRleVal, "@chrom_rle_val", HiddenFlag),
        (chromRleLen, "@chrom_rle_len", HiddenFlag),
        (allele, "allele", 0)) ++
        genoFolder.map(g => (g, "genotype", FolderFlag)) ++
        phaseFolder.map(p => (p, "phase", FolderFlag)) :+
        ((annotation, "annotation", FolderFlag)),
      new Attrs().str("FileFormat", "SEQ_ARRAY").str("FileVersion", "v1.0"))

    c.save(path, rootId)
    nVar.toLong
  }
}
