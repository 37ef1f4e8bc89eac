package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.gds.{Gds, GdsWrite}

/** Metamorphic round trip through the FULL CoreArray container:
  * `Gds.read ∘ GdsWrite.write == identity` on random ragged variants —
  * mixed ploidy (exercising the genotype/extra overflow), null alleles
  * (missing-sentinel planes), null qual/id/filter, ragged info arrays,
  * per-sample fmt matrices — for every chunk codec. The CEU fixture
  * pins real-world shapes; this pins the generated-corner space the
  * same way the reference's randomized tests do
  * (inst/unitTests/test_func.R:92-283). */
class GdsRoundTripPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def draw[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val N_SAMPLES = 3
  import GdsRoundTripPropertySpec.GV

  private val gGen: Gen[Long => GV] = for {
    chrom <- Gen.oneOf("1", "2", "X")
    id <- Gen.option(Gen.choose(1, 999).map(n => s"rs$n"))
    nAlt <- Gen.choose(1, 4) // up to 5 alleles forces 2 bit-planes
    qual <- Gen.option(Gen.oneOf(0.0f, 10.5f, 3.25f, 99.0f))
    filter <- Gen.option(Gen.oneOf("PASS", "q10"))
    ploidies <- Gen.listOfN(N_SAMPLES, Gen.choose(1, 3))
    geno <- Gen.sequence[Seq[Seq[java.lang.Long]], Seq[java.lang.Long]](
      ploidies.map(p => Gen.listOfN(p, Gen.frequency(
        (5, Gen.choose(0L, nAlt.toLong).map(java.lang.Long.valueOf)),
        (2, Gen.const(null.asInstanceOf[java.lang.Long])))).map(_.toSeq)))
    phasedRaw <- Gen.listOfN(N_SAMPLES, Gen.oneOf(true, false))
    infoNs <- Gen.frequency(
      (4, Gen.choose(0, 99).map(Integer.valueOf)),
      (1, Gen.const(null.asInstanceOf[Integer])))
    fmtDp <- Gen.listOfN(N_SAMPLES, Gen.frequency(
      (4, Gen.choose(0, 500).map(Integer.valueOf)),
      (1, Gen.const(null.asInstanceOf[Integer]))))
  } yield (vid: Long) => GV(vid, chrom, (1000 + vid).toInt, id,
    ("A" +: Seq("C", "T", "G", "TA").take(nAlt)).mkString(","),
    qual, filter, geno,
    // container phase is per allele PAIR; 1-ploid rows carry no
    // separator bit, so pin their phase false as the reader reports
    phasedRaw.zip(ploidies).map { case (ph, p) => ph && p > 1 },
    infoNs, fmtDp)

  test("write -> read is identity on random cubes, every codec") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_gds_fuzz").toString
    for ((coder, round) <- Seq("LZMA_ra", "ZIP_ra", "LZ4_ra").zipWithIndex) {
      val vs = (1 to 50).map(i => draw(gGen, 31000L * (round + 1) + i)(i))
      // container ploidy freezes on the FIRST row's most common call
      // length (reference VCF import fixes ploidy up front): shorter
      // calls read back null-PADDED to the container ploidy — the
      // reference's haploid-in-diploid "x/NA" semantics — while longer
      // calls reconstruct exactly through genotype/extra
      val ploidy = vs.head.geno.groupBy(_.length)
        .maxBy(p => (p._2.size, -p._1))._1
      val expected = vs.map(v => v.copy(geno = v.geno.map(sa =>
        if (sa.length < ploidy)
          sa ++ Seq.fill[java.lang.Long](ploidy - sa.length)(null)
        else sa)))
      val df = vs.toDF()
        .withColumnRenamed("infoNs", "info_NS")
        .withColumnRenamed("fmtDp", "fmt_DP")
      val out = s"$dir/fuzz_$coder.gds"
      GdsWrite.write(df, Seq("S1", "S2", "S3"), out, storage = coder)
      val cols = Seq("variant_id", "chrom", "pos", "id", "allele", "qual",
        "filter", "geno", "phased", "info_NS", "fmt_DP")
      val back = Gds.read(spark, out).select(cols.map(col): _*)
      val orig = expected.toDF()
        .withColumnRenamed("infoNs", "info_NS")
        .withColumnRenamed("fmtDp", "fmt_DP")
        .select(cols.map(col): _*)
      assert(back.count() == 50, coder)
      val extra = back.exceptAll(orig).count()
      val missing = orig.exceptAll(back).count()
      assert(extra == 0 && missing == 0,
        s"$coder extra=$extra missing=$missing\n" +
          back.exceptAll(orig).take(2).mkString("\n"))
      // the audit must also hold on fuzzed containers
      assert(Gds.check(spark, out).filter(!col("ok")).count() == 0, coder)
    }
  }
}

object GdsRoundTripPropertySpec {
  // top-level so Spark can derive an encoder
  final case class GV(
      variant_id: Long,
      chrom: String,
      pos: Int,
      id: Option[String],
      allele: String,
      qual: Option[Float],
      filter: Option[String],
      geno: Seq[Seq[java.lang.Long]],
      phased: Seq[Boolean],
      infoNs: Integer,
      fmtDp: Seq[Integer])
}
