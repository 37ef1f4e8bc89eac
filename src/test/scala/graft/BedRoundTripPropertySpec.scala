package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.bed.Bed

/** Metamorphic round trip through the PLINK BED triplet:
  * `Bed.read ∘ Bed.write == identity` on random 2-bit dosage matrices.
  * The BedSpec golden tests pin the reference's code tables and the
  * 8-sample SynthGeno shape; this fuzzes the corners those never move:
  * sample counts across every byte-padding residue (n mod 4 = 1..0),
  * all-missing rows, single-sample and single-variant files. */
class BedRoundTripPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def draw[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("write -> read is identity on random 2-bit matrices") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bed_fuzz").toString
    for (round <- 1 to 8) {
      val n = draw(Gen.choose(1, 9), 41000L + round) // crosses n%4 = 1..0
      val nVar = draw(Gen.choose(1, 30), 42000L + round)
      val rowBytes = (n + 3) / 4
      val rows = (0 until nVar).map { v =>
        val codes = (0 until n).map(s =>
          draw(Gen.choose(0, 3), 43000L * round + 97L * v + s))
        val pg = new Array[Byte](rowBytes) // pad bits stay 0
        codes.zipWithIndex.foreach { case (c, i) =>
          pg(i >> 2) = (pg(i >> 2) | (c << ((i & 3) * 2))).toByte
        }
        (v.toLong, "1", 100 + v, s"v$v", "A,C", pg)
      }
      val df = rows.toDF("vid", "chrom", "pos", "id", "allele", "pg")
      val prefix = s"$dir/fuzz_$round"
      Bed.write(df, "vid", (1 to n).map(i => s"S$i"), prefix)

      val back = Bed.read(spark, prefix)
        .orderBy("vid").collect()
      assert(back.length == nVar, s"round=$round")
      rows.zip(back).foreach { case ((vid, _, pos, id, allele, pg), r) =>
        assert(r.getLong(0) == vid && r.getInt(2) == pos
          && r.getString(3) == id && r.getString(4) == allele,
          s"round=$round vid=$vid meta")
        assert(r.getAs[Array[Byte]]("pg").toSeq == pg.toSeq,
          s"round=$round vid=$vid n=$n pg")
      }
      assert(Bed.sampleIds(Bed.readFam(prefix + ".fam")) ==
        (1 to n).map(i => s"S$i"), s"round=$round fam")
    }
  }
}
