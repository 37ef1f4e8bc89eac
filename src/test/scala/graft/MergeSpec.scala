package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MergeVariants._

/** Golden + differential tests for the merge kernels (allele-set union and
  * genotype index remap), mirroring the reference's multi-file merge cases
  * (SEQ_MergeAllele/SEQ_MergeGeno, src/FileMerge.cpp). */
class MergeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df = {
    import spark.implicits._
    Seq(
      ("A,C,G", "A,G,T",
        Seq(Seq[java.lang.Long](0L, 2L), Seq[java.lang.Long](1L, null))),
      ("A,C", "A,C",
        Seq(Seq[java.lang.Long](1L, 1L), Seq[java.lang.Long](null, null)))
    ).toDF("sa", "sb", "gb")
  }

  test("allele union golden: order preserved, right-only appended") {
    val r = df.select(alleleUnion(col("sa"), col("sb"))).collect()
    assert(r(0).getString(0) == "A,C,G,T")
    assert(r(1).getString(0) == "A,C")
  }

  test("remap golden: indices re-coded into the union list") {
    // gb is coded in sb ("A,G,T"); union(sa,sb) = "A,C,G,T":
    //   0 (A) -> 0, 1 (G) -> 2, 2 (T) -> 3, null stays null
    val r = df.select(remapGeno(col("gb"), col("sb"),
      alleleUnion(col("sa"), col("sb"))).as("rg")).collect()
    assert(r(0).getSeq[collection.Seq[Any]](0) ==
      Seq(Seq(0L, 3L), Seq(2L, null)))
    assert(r(1).getSeq[collection.Seq[Any]](0) ==
      Seq(Seq(1L, 1L), Seq(null, null)))
  }

  test("codegen merge kernels == declarative HOF reference") {
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val diff = df.select(
            alleleUnion(col("sa"), col("sb")).as("u1"),
            alleleUnionHof(col("sa"), col("sb")).as("u2"),
            remapGeno(col("gb"), col("sb"),
              alleleUnionHof(col("sa"), col("sb"))).as("r1"),
            remapGenoHof(col("gb"), col("sb"),
              alleleUnionHof(col("sa"), col("sb"))).as("r2"))
          .filter(col("u1") =!= col("u2") || !(col("r1") === col("r2")))
          .count()
        assert(diff == 0, s"mode=$mode")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
