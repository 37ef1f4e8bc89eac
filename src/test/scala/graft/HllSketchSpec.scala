package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TrainingData

/** Gates for the deterministic-HLL family: the reusable Aggregator's
  * merge-mergeability contract (merge(a, b) == rebuild, the q291
  * property at the class level), hash parity with the SQL-replayable
  * construction, and the q300 sketched-profile accuracy gate — the
  * ln-corrected estimate within 5 % of the EXACT per-column NDVs at
  * sf0.01 AND sf0.1 (the 100 TB ANALYZE path SCALE.md documents). */
class HllSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("HllAggregator: merge(reduce(A), reduce(B)) == reduce(A ++ B) " +
      "for every power-of-two register count") {
    val vals = (0 until 5000).map(i => s"tok${i % 1700}_${i % 13}")
    val (a, b) = vals.splitAt(1800)
    for (m <- Seq(16, 64, 1024, 4096)) {
      val agg = new TrainingData.HllAggregator(m)
      def build(vs: Seq[String]) = vs.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(build(a), build(b))
      val whole = build(vals)
      assert(merged.toSeq == whole.toSeq, s"m=$m")
    }
  }

  test("hll60 matches the SQL construction conv(substr(md5(v),1,15)," +
      "16,10) bit-for-bit") {
    import spark.implicits._
    val vals = Seq("a", "tok_42", "", "πδ", "1999-12-31 23:59:59",
      "the quick brown fox")
    val sql = vals.toDF("v")
      .select(conv(substring(md5(col("v")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(vals.map(TrainingData.hll60) == sql)
  }

  test("estimate helpers: exact-BIGINT z, raw formula, linear-" +
      "counting branch") {
    val m = 64
    val agg = new TrainingData.HllAggregator(m)
    val regs = (0 until 500).map(i => s"v$i").foldLeft(agg.zero)(agg.reduce)
    val z = TrainingData.hllZ(regs, m)
    assert(z == regs.map(r => 1L << (55 - r)).sum)
    val est = TrainingData.hllEstimate(regs, m)
    val exact = 500.0
    assert(math.abs(est - exact) / exact < 0.25,
      s"64-register sketch of 500 distinct: est=$est")
  }

  test("streaming HLL == batch HLL: grouped register state merges " +
      "correctly across micro-batches (continuous distinct counting)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val hll = udaf(new TrainingData.HllAggregator(64))
    val rows = (0 until 3000).map(i =>
      (s"src${i % 4}", s"tok${i % 700}_${i % 11}"))
    val mem = MemoryStream[(String, String)](spark)
    val q = mem.toDF().toDF("source", "tok")
      .groupBy(col("source")).agg(hll(col("tok")).as("regs"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(rows.take(1000))
      q.processAllAvailable()
      mem.addData(rows.drop(1000))
      q.processAllAvailable()
      val streamed = spark.table("hll_stream")
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val batch = rows.toDF("source", "tok")
        .groupBy(col("source")).agg(hll(col("tok")).as("regs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(streamed.keySet == batch.keySet)
      for ((k, v) <- batch) assert(streamed(k) == v, k)
    } finally q.stop()
  }

  test("q300 sketched profile: ln-corrected NDV within 5% of exact " +
      "at sf0.01 and sf0.1 — the one-scan ANALYZE twin") {
    val m = 4096
    val fn = SparkEntry.queries("q300_table_profile_sketch")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val rows = fn(spark, sf)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(rows.length == 4, sf)
      val li = graft.core.Tables(spark, sf, "lineitem")
      val ex = li.agg(
          countDistinct(col("l_orderkey")).as("l_orderkey"),
          countDistinct(col("l_partkey")).as("l_partkey"),
          countDistinct(col("l_suppkey")).as("l_suppkey"),
          countDistinct(col("l_returnflag")).as("l_returnflag"))
        .collect().head
      val exact = Map(
        "l_orderkey" -> ex.getLong(0), "l_partkey" -> ex.getLong(1),
        "l_suppkey" -> ex.getLong(2), "l_returnflag" -> ex.getLong(3))
      for ((cname, z, v) <- rows) {
        val raw = TrainingData.hllRawEstimate(z, m)
        val est =
          if (raw <= 2.5 * m && v > 0) m * math.log(m.toDouble / v)
          else raw
        val nd = exact(cname).toDouble
        assert(math.abs(est - nd) / nd <= 0.05,
          s"$sf $cname est=$est exact=$nd")
      }
    }
  }
}
