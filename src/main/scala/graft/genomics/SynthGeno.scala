package graft.genomics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deterministic synthetic variants table derived from `lineitem`, used to
  * validate the genetics kernels against the DuckDB oracle: both engines
  * build the identical genotype cube from pure integer arithmetic, so every
  * downstream aggregate is exactly comparable.
  *
  * Shape mirrors SURVEY.md §1.5: one row per variant with
  * `geno ARRAY<ARRAY<LONG>>` (8 samples × ploidy 2; null allele = missing)
  * and a per-sample `phased ARRAY<BOOLEAN>`.
  */
object SynthGeno {

  val nSamples = 8
  val ploidy = 2

  private def h1(s: Int): Column =
    (col("l_partkey") * 31 + col("l_suppkey") * 7 + lit(s * 13)) % 29
  private def h2(s: Int): Column =
    (col("l_partkey") * 17 + col("l_suppkey") * 11 + lit(s * 19)) % 29
  private def allele(h: Column): Column =
    when(h < 2, lit(null)).otherwise(h % col("nall"))

  /** variants(vid, chrom, pos, nall, geno, phased) from `dir`/lineitem.
    * The cube is built from statically-unrolled `array(...)` expressions
    * (not `transform(sequence(...))`) so construction stays inside
    * whole-stage codegen — HOF lambdas are interpreted and dominated every
    * genomics bench query before the unroll.
    *
    * The testdata tables are single-file single-row-group parquet, so the
    * scan is ONE task no matter what maxPartitionBytes says — the
    * round-robin repartition fans the (tiny) key columns out so the
    * compute-heavy construction pipeline uses every core. A real
    * multi-file/multi-row-group dataset would not need it. */
  def variants(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .withColumn("nall", lit(2) + col("l_partkey") % 3)
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("vid"),
        concat(lit("c"), (col("l_partkey") % 5).cast("string")).as("chrom"),
        (col("l_orderkey") % 100000).as("pos"),
        col("nall"),
        array((0 until nSamples).map(s =>
          array(allele(h1(s)), allele(h2(s)))): _*).as("geno"),
        array((0 until nSamples).map(s =>
          (h1(s) + h2(s)) % 2 === 0): _*).as("phased"))

  /** [[variants]] projected to the collapsed ALT-dosage table
    * (vid, chrom, pos, d) and hash-repartitioned by vid, so the
    * expression-generated cube + dosage chain is evaluated ONCE into
    * real shuffle rows. A query whose plan consumes `d` from several
    * operators below its first exchange (multi-level projections, a
    * window sort) otherwise re-evaluates the whole cube chain per
    * consuming operator — measured 3-5× the single-pass cost at sf0.1
    * (q197: 4.8 s → 2.2 s with this barrier). The extra exchange is
    * narrow (~9 longs/row) and keyed, so it also seeds even downstream
    * distribution; every consumer is key-based, so the row-order change
    * cannot affect results. Single-pass aggregate queries should keep
    * riding [[variants]] directly — for them the barrier is pure cost. */
  def dosageRows(spark: SparkSession, dir: String): DataFrame =
    variants(spark, dir)
      .select(col("vid"), col("chrom"), col("pos"),
        graft.functions.genetics.dosageAlt(col("geno")).as("d"))
      .repartition(col("vid"))

  private def h1b(s: Int): Column =
    (col("l_partkey") * 37 + col("l_suppkey") * 5 + lit(s * 23)) % 29
  private def h2b(s: Int): Column =
    (col("l_partkey") * 23 + col("l_suppkey") * 13 + lit(s * 17)) % 29

  /** [[variants]] plus a second, independently-hashed callset `geno2`
    * over the SAME variants — the "re-called twin" for duplicate-sample
    * concordance QC. Both cubes come from ONE lineitem scan so no join
    * or vid matching is ever needed (vids need not be unique). */
  def variantsDup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .withColumn("nall", lit(2) + col("l_partkey") % 3)
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("vid"),
        concat(lit("c"), (col("l_partkey") % 5).cast("string")).as("chrom"),
        (col("l_orderkey") % 100000).as("pos"),
        col("nall"),
        array((0 until nSamples).map(s =>
          array(allele(h1(s)), allele(h2(s)))): _*).as("geno"),
        array((0 until nSamples).map(s =>
          array(allele(h1b(s)), allele(h2b(s)))): _*).as("geno2"))

  /** DuckDB twin of [[variantsDup]]. */
  val sqlCteDup: String =
    """SELECT l_orderkey * 10 + l_linenumber AS vid,
      'c' || CAST(l_partkey % 5 AS VARCHAR) AS chrom,
      l_orderkey % 100000 AS pos,
      2 + l_partkey % 3 AS nall,
      list_transform(range(0, 8), s -> [
        CASE WHEN (l_partkey*31 + l_suppkey*7 + s*13) % 29 < 2 THEN NULL
             ELSE ((l_partkey*31 + l_suppkey*7 + s*13) % 29)
                  % (2 + l_partkey % 3) END,
        CASE WHEN (l_partkey*17 + l_suppkey*11 + s*19) % 29 < 2 THEN NULL
             ELSE ((l_partkey*17 + l_suppkey*11 + s*19) % 29)
                  % (2 + l_partkey % 3) END]) AS geno,
      list_transform(range(0, 8), s -> [
        CASE WHEN (l_partkey*37 + l_suppkey*5 + s*23) % 29 < 2 THEN NULL
             ELSE ((l_partkey*37 + l_suppkey*5 + s*23) % 29)
                  % (2 + l_partkey % 3) END,
        CASE WHEN (l_partkey*23 + l_suppkey*13 + s*17) % 29 < 2 THEN NULL
             ELSE ((l_partkey*23 + l_suppkey*13 + s*17) % 29)
                  % (2 + l_partkey % 3) END]) AS geno2
    FROM lineitem"""

  /** DuckDB CTE producing the identical table from `lineitem` — prepend to
    * oracle SQL as `WITH variants AS (<sqlCte>) SELECT ...`. */
  val sqlCte: String =
    """SELECT l_orderkey * 10 + l_linenumber AS vid,
      'c' || CAST(l_partkey % 5 AS VARCHAR) AS chrom,
      l_orderkey % 100000 AS pos,
      2 + l_partkey % 3 AS nall,
      list_transform(range(0, 8), s -> [
        CASE WHEN (l_partkey*31 + l_suppkey*7 + s*13) % 29 < 2 THEN NULL
             ELSE ((l_partkey*31 + l_suppkey*7 + s*13) % 29)
                  % (2 + l_partkey % 3) END,
        CASE WHEN (l_partkey*17 + l_suppkey*11 + s*19) % 29 < 2 THEN NULL
             ELSE ((l_partkey*17 + l_suppkey*11 + s*19) % 29)
                  % (2 + l_partkey % 3) END]) AS geno,
      list_transform(range(0, 8), s ->
        ((l_partkey*31 + l_suppkey*7 + s*13) % 29
         + (l_partkey*17 + l_suppkey*11 + s*19) % 29) % 2 = 0) AS phased
    FROM lineitem"""
}
