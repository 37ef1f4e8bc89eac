package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Vcf

/** Metamorphic round trip: `parseLines ∘ formatLines == identity` on
  * RANDOM ragged variants — mixed ploidy, missing alleles, null/partial
  * FORMAT cells, multiallelic sites, null qual/id/filter. The CEU
  * fixture pins real-world shapes; this pins the corners a fixture
  * never hits (the reference fuzzes its readers the same way,
  * inst/unitTests/test_func.R:92-283). */
class VcfRoundTripPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def draw[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val N_SAMPLES = 4
  import VcfRoundTripPropertySpec.V

  private val vGen: Gen[Int => V] = for {
    chrom <- Gen.oneOf("c1", "c2", "cX")
    id <- Gen.option(Gen.choose(1, 999).map(n => s"rs$n"))
    alts <- Gen.choose(1, 3).flatMap(n =>
      Gen.pick(n, Seq("C", "T", "G", "TA")).map(_.toSeq))
    qual <- Gen.option(Gen.oneOf(0.0f, 10.5f, 3.25f, 99.0f))
    filter <- Gen.option(Gen.oneOf("PASS", "q10"))
    ploidies <- Gen.listOfN(N_SAMPLES, Gen.choose(1, 3))
    geno <- Gen.sequence[Seq[Seq[java.lang.Long]], Seq[java.lang.Long]](
      ploidies.map(p => Gen.listOfN(p, Gen.frequency(
        (5, Gen.choose(0L, 3L).map(java.lang.Long.valueOf)),
        (2, Gen.const(null.asInstanceOf[java.lang.Long])))).map(_.toSeq)))
    phasedRaw <- Gen.listOfN(N_SAMPLES, Gen.oneOf(true, false))
    dp <- Gen.listOfN(N_SAMPLES, Gen.frequency(
      (4, Gen.choose(0, 500).map(Integer.valueOf)),
      (1, Gen.const(null.asInstanceOf[Integer]))))
    adRaw <- Gen.listOfN(N_SAMPLES, Gen.frequency(
      (3, Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.frequency(
        (4, Gen.choose(0, 99).map(Integer.valueOf)),
        (1, Gen.const(null.asInstanceOf[Integer])))).map(_.toSeq))),
      (1, Gen.const(null.asInstanceOf[Seq[Integer]]))))
  } yield (pos: Int) => V(pos, chrom, id, "A", alts, qual, filter,
    geno,
    // a 1-ploid GT cell has no separator, so phase cannot round-trip:
    // pin it false exactly as the parser will report it
    phasedRaw.zip(ploidies).map { case (ph, p) => ph && p > 1 },
    dp,
    // [null] necessarily renders as "." — the VCF missing-cell
    // sentinel — so it parses back as a null cell: canonicalize the
    // unrepresentable 1-element-all-null shape to null up front
    adRaw.map(a => if (a != null && a.length == 1 && a.head == null) null
      else a))

  test("format -> parse is identity on random ragged variants") {
    import spark.implicits._
    for (round <- 1 to 3) {
      val vs = (1 to 60).map(i => draw(vGen, 23000L * round + i)(i))
      val df = vs.toDF()
      // FORMAT cell text: DP scalar; AD Number=. with '.' for null
      // elements and a '.' cell for a null array
      val dpCells = transform(col("dp"), x => x.cast("string"))
      val adCells = transform(col("ad"), a =>
        array_join(transform(a, x => coalesce(x.cast("string"), lit("."))),
          ","))
      val lines = Vcf.formatLines(
        df, lit(null), keep = Seq("pos"),
        fmt = Seq("DP" -> dpCells, "AD" -> adCells))
        .select(col("value"))
      val parsed = Vcf.parseLines(lines, Nil,
        Seq(Vcf.FieldSpec("GT", "1", "String"),
          Vcf.FieldSpec("DP", "1", "Integer"),
          Vcf.FieldSpec("AD", ".", "Integer")), N_SAMPLES)
      val back = parsed.select(
        col("pos"), col("chrom"), col("id"), col("ref"), col("alts"),
        col("qual"), col("filter"), col("geno"), col("phased"),
        col("fmt_DP").as("dp"), col("fmt_AD").as("ad"))
      val orig = df.select(
        col("pos"), col("chrom"), col("id"), col("ref"), col("alts"),
        col("qual"), col("filter"), col("geno"), col("phased"),
        col("dp"), col("ad").cast("array<array<int>>").as("ad"))
      assert(back.count() == 60, s"round=$round")
      val extra = back.exceptAll(orig).count()
      val missing = orig.exceptAll(back).count()
      assert(extra == 0 && missing == 0,
        s"round=$round extra=$extra missing=$missing\n" +
          back.exceptAll(orig).take(2).mkString("\n"))
    }
  }
}

object VcfRoundTripPropertySpec {
  // top-level so Spark can derive an encoder
  final case class V(
      pos: Int,
      chrom: String,
      id: Option[String],
      ref: String,
      alts: Seq[String],
      qual: Option[Float],
      filter: Option[String],
      geno: Seq[Seq[java.lang.Long]],
      phased: Seq[Boolean],
      dp: Seq[java.lang.Integer],
      ad: Seq[Seq[java.lang.Integer]])
}
