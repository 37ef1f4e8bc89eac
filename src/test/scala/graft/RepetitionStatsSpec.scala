package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TrainingData

/** Differential + golden tests for the one-pass repetition-stats kernel:
  * it must agree with the declarative explode/window/groupBy twin
  * value-for-value, in both execution modes. */
class RepetitionStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id")
      .select("doc_id", "n_words", "max_run", "top2_frac", "dup5_frac")
      .collect().map(_.toString).toSeq

  test("kernel == declarative twin on crafted edge cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),                                   // empty
      (2L, "   "),                                // whitespace only
      (3L, "one"),                                // single token
      (4L, "a a a a b b a"),                      // runs + repeated bigram
      (5L, "x y x y x y x y"),                    // dominant bigram
      (6L, "a b c d e a b c d e a b c d e"),      // duplicated 5-grams
      (7L, "t1 t2\tt3\n t4   t5"),                // mixed whitespace
      (8L, "z z z z z z z z z z"),                // one long run
      (9L, "aa bb aa bb cc aa bb"),               // bigram tie-breaking
      (10L, "p q r s t u v w"),                   // all unique
      (11L, null.asInstanceOf[String])            // null text == empty
    ).toDF("doc_id", "text")
    assert(collect(TrainingData.repetitionStats(docs)) ==
      collect(TrainingData.repetitionStatsDeclarative(docs)))
  }

  test("kernel == declarative twin on the documents table") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001",
      "documents").select("doc_id", "text")
    assert(collect(TrainingData.repetitionStats(docs)) ==
      collect(TrainingData.repetitionStatsDeclarative(docs)))
  }

  test("fuzzed texts: kernel == declarative twin on 200 random docs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // tiny alphabet forces runs, repeated bigrams, duplicated 5-grams
    // and count ties (the tie-break path); mixed whitespace separators
    val word = Gen.oneOf("a", "b", "ab", "ba", "ccc")
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \n ")
    val doc: Gen[String] = for {
      n <- Gen.choose(0, 40)
      ws <- Gen.listOfN(n, word)
      ss <- Gen.listOfN(math.max(n - 1, 0), sep)
    } yield (ws.headOption.toList ++
      ss.zip(ws.drop(1)).flatMap { case (s, w) => Seq(s, w) }).mkString
    val seed = 137L
    val docs = (0 until 200).map(i =>
      (i.toLong, doc.pureApply(Gen.Parameters.default, Seed(seed + i))))
      .toDF("doc_id", "text")
    assert(collect(TrainingData.repetitionStats(docs)) ==
      collect(TrainingData.repetitionStatsDeclarative(docs)))
  }

  test("kernel golden values") {
    import spark.implicits._
    import org.apache.spark.sql.graft.Bridge
    val st = Bridge.column(graft.functions.expressions
      .RepetitionStatsExpr(Bridge.expression(col("text"))))
    // "a a a a b b a": 7 words, 7 chars, run 4; bigram "a a" count 3
    // (starts 0,1,2 -> covers slots 0..3 = 4 chars); dup5: "a a a a b"
    // unique etc -> 0
    val r = Seq((1L, "a a a a b b a")).toDF("doc_id", "text")
      .select(st.as("st")).collect()(0).getSeq[Long](0)
    assert(r == Seq(7L, 7L, 4L, 4L, 0L))
    // "a b c d e a b c d e a b c d e": 15 words; "a b c d e" occurs 3x
    // (also "b c d e a" 2x, ...) -> every slot covered = 15 chars;
    // top bigram "a b" 3x covering 6 chars
    val r2 = Seq((1L, "a b c d e a b c d e a b c d e"))
      .toDF("doc_id", "text")
      .select(st.as("st")).collect()(0).getSeq[Long](0)
    assert(r2 == Seq(15L, 15L, 1L, 6L, 15L))
  }

  test("kernel agrees across codegen and interpreted execution") {
    import spark.implicits._
    val docs = Seq((1L, "m n m n m o o o p"),
      (2L, "q r s q r s q r s q r s")).toDF("doc_id", "text")
    val modes = Seq("CODEGEN_ONLY", "NO_CODEGEN").map { mode =>
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try collect(TrainingData.repetitionStats(docs))
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(modes(0) == modes(1))
  }
}
