package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Vcf
import graft.sources.bcf.Bcf

/** Metamorphic BCF codec fuzz: random ragged variants rendered to VCF
  * text, converted through the BCF typed-record writer, must read back
  * equal to the direct VCF parse — `Bcf.read ∘ writeFromVcf == Vcf.read`.
  * The BCF value encodings are corner-rich (int width selection by
  * magnitude, end-of-vector padding for ragged per-sample vectors,
  * missing sentinels per type); the CEU fixture never exercises most
  * magnitudes, so this generates them. */
class BcfRoundTripPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def draw[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val N_SAMPLES = 3

  // one VCF body line; magnitudes span the int8/int16/int32 BCF widths
  private val lineGen: Gen[Int => String] = for {
    chrom <- Gen.oneOf("1", "2", "X")
    id <- Gen.option(Gen.choose(1, 999).map(n => s"rs$n"))
    nAlt <- Gen.choose(1, 3)
    qual <- Gen.option(Gen.oneOf("0", "10.5", "3.25", "99"))
    filter <- Gen.option(Gen.oneOf("PASS", "q10"))
    ns <- Gen.option(Gen.oneOf(1, 120, 4000, 70000, 3000000))
    gts <- Gen.listOfN(N_SAMPLES, for {
      p <- Gen.choose(1, 3)
      alleles <- Gen.listOfN(p, Gen.frequency(
        (5, Gen.choose(0, nAlt).map(_.toString)),
        (2, Gen.const("."))))
      sep <- Gen.oneOf("/", "|")
    } yield alleles.mkString(if (p > 1) sep else ""))
    dps <- Gen.listOfN(N_SAMPLES, Gen.frequency(
      (2, Gen.oneOf(1, 100, 200, 30000, 2000000).map(_.toString)),
      (1, Gen.const("."))))
    ads <- Gen.listOfN(N_SAMPLES, Gen.frequency(
      (3, Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.frequency(
        (4, Gen.oneOf(0, 99, 500, 100000).map(_.toString)),
        (1, Gen.const(".")))).map(_.mkString(",")))),
      (1, Gen.const("."))))
  } yield (pos: Int) => {
    val alts = Seq("C", "T", "G").take(nAlt).mkString(",")
    val info = ns.map(v => s"NS=$v").getOrElse(".")
    val cells = gts.indices.map(i => s"${gts(i)}:${dps(i)}:${ads(i)}")
    (Seq(chrom, (1000 + pos).toString, id.getOrElse("."), "A", alts,
      qual.getOrElse("."), filter.getOrElse("."), info, "GT:DP:AD") ++
      cells).mkString("\t")
  }

  test("vcf -> bcf -> read equals the direct parse on random variants") {
    val info = Seq(Vcf.FieldSpec("NS", "1", "Integer"))
    val fmt = Seq(Vcf.FieldSpec("GT", "1", "String"),
      Vcf.FieldSpec("DP", "1", "Integer"),
      Vcf.FieldSpec("AD", ".", "Integer"))
    // FILTER strings must be header-declared for the BCF dictionary
    // (htslib-compatible strictness)
    val header0 = Vcf.formatHeader(info, fmt, Seq("S1", "S2", "S3"))
    val header = header0.init ++
      Seq("""##FILTER=<ID=q10,Description="">""") :+ header0.last
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bcf_fuzz").toString
    for (round <- 1 to 3) {
      val body = (1 to 50).map(i => draw(lineGen, 41000L * round + i)(i))
      val vcfPath = s"$dir/fuzz_$round.vcf"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(vcfPath),
        (header ++ body).mkString("\n").getBytes("UTF-8"))
      val bcfPath = s"$dir/fuzz_$round.bcf"
      Bcf.writeFromVcf(vcfPath, bcfPath)
      val viaBcf = Bcf.read(spark, bcfPath)
      val direct = Vcf.read(spark, vcfPath)
      assert(viaBcf.count() == 50, s"round=$round")
      assert(viaBcf.schema == direct.schema, s"round=$round")
      val a = viaBcf.collect().map(_.toSeq).toSet
      val b = direct.collect().map(_.toSeq).toSet
      assert((a diff b).isEmpty && (b diff a).isEmpty,
        s"round=$round bcf differs:\n${(a diff b).take(1)}\nvs\n" +
          s"${(b diff a).take(1)}")
    }
  }
}
