package graft.sources.v2

import java.util.zip.GZIPInputStream

import scala.io.Source
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Vcf

/** DataSource V2 for VCF: `spark.read.format("vcf").load(path)` (SURVEY.md
  * §2.1 `seqOpen`/`seqVCF2GDS` as a first-class Spark source; north-star
  * "custom data source").
  *
  * Split of work mirrors the reference's import (§3.3): the `##` header is
  * read once on the driver and fixes the schema; each data file is one
  * input partition whose reader projects raw lines through the SAME
  * Catalyst expressions as [[graft.sources.Vcf.parseLines]] — analyzed
  * once on the driver, shipped to executors as an UnsafeProjection recipe.
  * One source of truth for parse semantics; `.gz` (incl. bgzf) streams are
  * supported per-file. Column pruning happens in Spark's Project above the
  * scan; pushdown into the scan is future work (each file is already the
  * parallelism unit, as in the reference's per-range worker import).
  */
class VcfDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "vcf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VcfDataSource.planFor(VcfDataSource.paths(options)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new VcfTable(VcfDataSource.paths(
      new CaseInsensitiveStringMap(properties)))
}

object VcfDataSource {

  final case class ParsePlan(schema: StructType, exprs: Seq[Expression],
      input: Seq[Attribute]) extends Serializable

  /** Spark's DataFrameReader encodes multiple `load(a, b, …)` paths as a
    * JSON array string in the `paths` option (as the built-in
    * FileDataSourceV2 does); parse it as JSON first, with a comma-split
    * fallback only for hand-written non-JSON values. */
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq.flatMap { raw =>
      val t = raw.trim
      if (t.startsWith("[")) {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(t)
        (0 until node.size()).map(node.get(_).asText())
      } else t.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }
    val all = single ++ multi
    require(all.nonEmpty, "vcf source requires a path")
    all
  }

  def headerLines(path: String): Seq[String] = {
    val src = Source.fromInputStream(open(path), "UTF-8")
    try src.getLines().takeWhile(_.startsWith("#")).toList
    finally src.close()
  }

  def open(path: String): java.io.InputStream = open(path, 0L)

  def open(path: String, start: Long): java.io.InputStream = {
    val clean = path.stripPrefix("file:")
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(clean))
    if (clean.endsWith(".gz")) {
      require(start == 0, "gz vcf is not byte-addressable")
      new GZIPInputStream(in)
    } else {
      var toSkip = start
      while (toSkip > 0) {
        val s = in.skip(toSkip)
        if (s <= 0) toSkip = 0 else toSkip -= s
      }
      in
    }
  }

  /** Analyze the parse projection once on the driver: header → specs →
    * Vcf.parseLines over a dummy single-column relation → resolved,
    * type-coerced expressions + input attribute, both serializable. */
  def planFor(paths: Seq[String]): ParsePlan = {
    val spark = SparkSession.active
    val (info, fmt, samples) = Vcf.headerSpecs(headerLines(paths.head))
    // One parse plan serves every partition, so every file must declare
    // the same INFO/FORMAT fields and sample columns — fail fast instead
    // of silently misparsing later files under the first file's specs.
    paths.tail.foreach { p =>
      val other = Vcf.headerSpecs(headerLines(p))
      require(other == ((info, fmt, samples)),
        s"vcf header mismatch: $p declares different INFO/FORMAT/samples " +
          s"than ${paths.head}")
    }
    import spark.implicits._
    val dummy = spark.createDataset(Seq.empty[String]).toDF("value")
    val parsed = Vcf.parseLines(dummy, info, fmt, samples.length)
    val analyzed = parsed.queryExecution.analyzed
    ParsePlan(parsed.schema, analyzed.asInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.Project].projectList,
      analyzed.children.head.output)
  }
}

class VcfTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"vcf(${paths.mkString(",")})"
  override def schema(): StructType = VcfDataSource.planFor(paths).schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      private val splitSize =
        Option(options.get("splitSize")).map(_.toLong)
          .getOrElse(VcfScan.DefaultSplitBytes)
      private var required: Option[StructType] = None
      // REAL column pruning: the parse projection is one independent
      // expression per output column, so a pruned schema drops the
      // un-needed expressions entirely — a chrom/pos query never runs
      // the genotype tokenizer or INFO regexes
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = Some(requiredSchema)
      override def build(): Scan = new VcfScan(paths, splitSize, required)
    }
}

object VcfScan {
  /** Matches Spark's files.maxPartitionBytes default. */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024
}

/** Splittable scan (mirrors the reference's per-line-range workers,
  * R/ConvVCF2GDS.R:841-856): plain-text files split into byte ranges
  * aligned to line boundaries Hadoop-style — a partition owns every line
  * that STARTS inside (start, start+length], so one large VCF parses
  * across many cores with no coordination. BGZF-compressed files (what
  * bgzip/htslib emit — every `.vcf.gz` the reference ships) split the
  * same way in COMPRESSED coordinates: ranges align to the next BGZF
  * member boundary and lines are owned by the htslib virtual offset of
  * their first byte. Only plain single-member gzip stays one partition
  * per file. */
class VcfScan(paths: Seq[String], splitBytes: Long,
    required: Option[StructType] = None) extends Scan with Batch {
  private lazy val plan = {
    val full = VcfDataSource.planFor(paths)
    required match {
      case Some(req) if req.fieldNames.nonEmpty &&
          req.fieldNames.length < full.schema.fieldNames.length =>
        val byName = full.schema.fieldNames.zip(full.exprs).toMap
        VcfDataSource.ParsePlan(req,
          req.fieldNames.toSeq.map(byName), full.input)
      case Some(req) if req.fieldNames.isEmpty =>
        // count(*)-style: keep one cheap column so rows still flow
        VcfDataSource.ParsePlan(StructType(full.schema.fields.take(1)),
          full.exprs.take(1), full.input)
      case _ => full
    }
  }
  override def readSchema(): StructType = plan.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.flatMap { p =>
      val clean = p.stripPrefix("file:")
      val gz = clean.endsWith(".gz")
      lazy val len = java.nio.file.Files.size(java.nio.file.Paths.get(clean))
      val splittable = !gz || graft.sources.bcf.Bgzf.isBgzfFile(clean)
      if (!splittable || len <= splitBytes)
        Seq(VcfInputPartition(p, 0L, Long.MaxValue, bgzf = false))
      else
        (0L until len by splitBytes).map(off =>
          VcfInputPartition(p, off, math.min(splitBytes, len - off), gz))
    }.map(identity[InputPartition]).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new VcfReaderFactory(plan)
}

final case class VcfInputPartition(path: String, start: Long, length: Long,
    bgzf: Boolean) extends InputPartition

class VcfReaderFactory(plan: VcfDataSource.ParsePlan)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val vp = p.asInstanceOf[VcfInputPartition]
    new VcfPartitionReader(vp.path, vp.start, vp.length, vp.bgzf, plan)
  }
}

/** Line iterator that reports each line paired with the POSITION of its
  * first byte (plain files: bytes consumed since stream start; bgzf:
  * htslib virtual offset). Ownership of boundary lines needs the start
  * position, not the end, so positions are sampled before the first byte
  * of every line is read. */
private[v2] final class PositionedLines(in: java.io.InputStream,
    posOfNextByte: () => Long) extends Iterator[(String, Long)] {
  private var nextLine: String = null
  private var nextPos = 0L
  private var eof = false

  private def advance(): Unit = {
    if (eof) { nextLine = null; return }
    nextPos = posOfNextByte()
    var b = in.read()
    if (b < 0) { eof = true; nextLine = null; return }
    val sb = new java.io.ByteArrayOutputStream(256)
    while (b >= 0 && b != '\n') { sb.write(b); b = in.read() }
    if (b < 0) eof = true
    val bytes = sb.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
      bytes.length - 1 else bytes.length
    nextLine = new String(bytes, 0, n, "UTF-8")
  }

  override def hasNext: Boolean = {
    if (nextLine == null && !eof) advance()
    nextLine != null
  }
  override def next(): (String, Long) = {
    if (!hasNext) throw new NoSuchElementException
    val r = (nextLine, nextPos); nextLine = null; r
  }
}

/** Counting wrapper so `PositionedLines` can see through
  * BufferedInputStream's read-ahead: `count` is bytes RETURNED, not bytes
  * fetched from the underlying stream. */
private[v2] final class CountingStream(in: java.io.InputStream)
    extends java.io.InputStream {
  private val buf = new java.io.BufferedInputStream(in, 256 * 1024)
  var count = 0L
  override def read(): Int = {
    val b = buf.read(); if (b >= 0) count += 1; b
  }
  override def close(): Unit = buf.close()
}

/** Hadoop line-split ownership, generalized over a position coordinate:
  * a split (start, end] owns every line whose first byte's position `p`
  * satisfies `p <= end`, reading PAST end to finish its last line; every
  * split with `start > 0` discards its first (possibly complete) line,
  * which the previous split owns. The `<=`/discard pair is what makes a
  * line starting exactly on a boundary land in exactly one split. */
class VcfPartitionReader(path: String, start: Long, length: Long,
    bgzf: Boolean, plan: VcfDataSource.ParsePlan)
    extends PartitionReader[InternalRow] {

  private val clean = path.stripPrefix("file:")
  private val (raw, posFn, endPos) =
    if (bgzf) {
      val aligned =
        if (start == 0) 0L else graft.sources.bcf.Bgzf.findBlock(clean, start)
      val bs = new graft.sources.bcf.Bgzf.BlockStream(clean, aligned)
      // the end boundary must be the block boundary the NEXT split will
      // align its start to — aligning both sides to the same position is
      // what makes the drop-first/own-`<=` pair exhaustive and disjoint
      val end = if (length == Long.MaxValue) Long.MaxValue
        else graft.sources.bcf.Bgzf.findBlock(clean, start + length) << 16
      (bs: java.io.InputStream, () => bs.virtualPos, end)
    } else {
      val cs = new CountingStream(VcfDataSource.open(path, start))
      (cs: java.io.InputStream, () => cs.count, length)
    }

  private val positioned = new PositionedLines(raw, posFn)
  // drop the first (possibly partial) line when starting mid-file
  if (start > 0 && positioned.hasNext) positioned.next()

  private val lines: Iterator[String] = new Iterator[String] {
    private var cur: String = null
    private var done = false
    override def hasNext: Boolean = {
      while (cur == null && !done) {
        if (!positioned.hasNext) done = true
        else {
          val (l, p) = positioned.next()
          if (p > endPos) done = true
          else if (!l.startsWith("#") && l.nonEmpty) cur = l
        }
      }
      cur != null
    }
    override def next(): String = {
      if (!hasNext) throw new NoSuchElementException
      val l = cur; cur = null; l
    }
  }

  private val project = UnsafeProjection.create(plan.exprs, plan.input)
  private val inputRow = new GenericInternalRow(1)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!lines.hasNext) false
    else {
      inputRow.update(0, UTF8String.fromString(lines.next()))
      current = project(inputRow)
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = raw.close()
}
