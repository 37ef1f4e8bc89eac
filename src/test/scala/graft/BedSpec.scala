package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.genetics._
import graft.genomics.SynthGeno
import graft.sources.bed.Bed

class BedSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  test("hand-built .bed decodes per the reference cvt tables") {
    // 6 samples, 2 variants; bed codes per sample:
    //   v0: 00 01 10 11 00 10  → engine 0 3 1 2 0 1 → dosage 0 . 1 2 0 1
    //   v1: 11 11 01 00 10 01  → engine 2 2 3 0 1 3 → dosage 2 2 . 0 1 .
    val dir = java.nio.file.Files.createTempDirectory("graft_bed").toString
    val p = s"$dir/tiny"
    // rowBytes = ceil(6/4) = 2; sample s sits at bits (s%4)*2 of byte s/4
    def packBed(codes: Seq[Int]): Array[Byte] = {
      val out = new Array[Byte]((codes.length + 3) / 4)
      codes.zipWithIndex.foreach { case (c, i) =>
        out(i >> 2) = (out(i >> 2) | (c << ((i & 3) << 1))).toByte
      }
      out
    }
    val bed = new java.io.FileOutputStream(p + ".bed")
    bed.write(Array(0x6c, 0x1b, 0x01).map(_.toByte))
    bed.write(packBed(Seq(0, 1, 2, 3, 0, 2)))
    bed.write(packBed(Seq(3, 3, 1, 0, 2, 1)))
    bed.close()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p + ".fam"),
      (1 to 6).map(i => s"F$i I$i 0 0 1 -9").mkString("\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p + ".bim"),
      "1\trs1\t0\t100\tC\tA\n1\trs2\t0\t200\tG\tT\n")

    val df = Bed.read(spark, p).orderBy("vid")
      .select(col("vid"), col("chrom"), col("pos"), col("id"), col("allele"),
        unpack2b(col("pg"), lit(6)).as("dos"))
      .collect()
    assert(df(0).getString(4) == "A,C" && df(1).getString(4) == "T,G")
    assert(df(0).getInt(2) == 100 && df(1).getString(3) == "rs2")
    assert(df(0).getSeq[Any](5) == Seq(0, null, 1, 2, 0, 1))
    assert(df(1).getSeq[Any](5) == Seq(2, 2, null, 0, 1, null))
    assert(Bed.sampleIds(Bed.readFam(p + ".fam")) ==
      (1 to 6).map(i => s"I$i"))
  }

  test("write → read round-trips the SynthGeno cube") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bed").toString
    val p = s"$dir/synth"
    val src = SynthGeno.variants(spark, "/root/testdata/sf0.001")
      .select(col("vid"), col("chrom"), col("pos"),
        col("vid").cast("string").as("id"),
        lit("A,C").as("allele"), pack2b(col("geno")).as("pg"))
    Bed.write(src, "vid", (0 until SynthGeno.nSamples).map(s => s"S$s"), p)

    val back = Bed.read(spark, p)
    assert(back.count() == src.count())
    // bed row order = vid order, so the bim id column carries vid through
    val a = src.select(col("vid"), col("chrom"), col("pos"), col("pg"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getAs[Array[Byte]](3).toSeq)).sortBy(_._1)
    val b = back.select(col("id"), col("chrom"), col("pos"), col("pg"))
      .collect().map(r => (r.getString(0).toLong, r.getString(1),
        r.getInt(2).toLong, r.getAs[Array[Byte]](3).toSeq)).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(Bed.sampleIds(Bed.readFam(p + ".fam")) ==
      (0 until SynthGeno.nSamples).map(s => s"S$s"))
  }

  test("dup sample ids fall back to family-individual") {
    val fam = Seq(Bed.Fam("F1", "A", "0", "0", "1", "-9"),
      Bed.Fam("F2", "A", "0", "0", "1", "-9"))
    assert(Bed.sampleIds(fam) == Seq("F1-A", "F2-A"))
  }
}
