package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TrainingData

/** Hand-computed golden trajectory for the distributed BPE trainer on the
  * classic low/lower/newest corpus (Sennrich et al. 2016, §3.2 shape):
  * pair counts are weighted by word frequency, ties break
  * lexicographically, merges apply greedily left-to-right. The q127/q128
  * oracles prove Spark==DuckDB on the real corpus; this pins WHAT the
  * loop computes on a corpus small enough to verify by hand. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // low ×5, lower ×2, newest ×6
  private def corpus = {
    import spark.implicits._
    Seq(
      ("d1", "low low low low low"),
      ("d2", "lower lower"),
      ("d3", "newest newest newest newest newest newest")
    ).toDF("doc_id", "text")
  }

  test("bpeTrain reproduces the hand-computed merge trajectory") {
    val got = TrainingData.bpeTrain(corpus, nMerges = 8)
      .orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[String]("merged"),
        r.getAs[Long]("cnt"))).toSeq
    val expected = Seq(
      (1, "w", "e", "we", 8L),        // we: 2 (lower) + 6 (newest)
      (2, "l", "o", "lo", 7L),        // lo: 5 + 2
      (3, "e", "we", "ewe", 6L),      // 6-way tie, "e" lexicographically first
      (4, "ewe", "s", "ewes", 6L),
      (5, "ewes", "t", "ewest", 6L),
      (6, "n", "ewest", "newest", 6L),
      (7, "lo", "w", "low", 5L),
      (8, "lo", "we", "lowe", 2L))
    assert(got == expected)
  }

  test("bpeEncode applies merges in order; fingerprint pins the sequence") {
    import spark.implicits._
    val merges = TrainingData.bpeTrain(corpus, nMerges = 8)
      .orderBy("round").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    val doc = Seq(("x", "low lower newest")).toDF("doc_id", "text")
    val r = TrainingData.bpeEncode(doc, merges).collect()(0)
    // low → (low); lower → (lowe)(r); newest → (newest)
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Long]("n_subwords") == 4L)
    val expectedEnc = "(low) (lowe)(r) (newest)"
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(expectedEnc.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getAs[String]("enc_fp") == fp)
  }

  test("bpeTrain stops early when no pair remains") {
    import spark.implicits._
    val tiny = Seq(("d", "ab ab")).toDF("doc_id", "text")
    val got = TrainingData.bpeTrain(tiny, nMerges = 5).collect()
    // (a)(b) merges once to (ab); afterwards every word is one symbol
    assert(got.length == 1)
    assert(got(0).getAs[String]("merged") == "ab")
  }
}
