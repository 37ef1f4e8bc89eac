package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located joins — the 100 TB shuffle-avoidance
  * pattern SCALE.md prescribes for repeated fact-to-fact joins: writing
  * both sides `bucketBy(n, key)` lets every subsequent equi-join on the
  * key run with ZERO shuffle exchanges (bucket layout IS the hash
  * partitioning), and `sortBy` additionally drops the per-task sorts.
  * This spec pins that the pattern actually holds on this engine build:
  * a regression (config default flip, bucket-info loss through the
  * relation) would silently reintroduce a full two-sided shuffle on
  * every co-located join at cluster scale.
  *
  * The suite-shared SparkSession is used as-is: sort-merge is forced
  * per-join with the `merge` hint (NOT by flipping the global broadcast
  * threshold, which would race concurrently-running plan suites), and
  * table locations are cleaned before each write so reruns and
  * standalone runs behave identically.
  */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def dropWithLocation(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a leftover location (earlier run, different catalog) blocks
    // CREATE even with mode=overwrite — remove it physically
    val wh = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
        .getPath)
    val loc = wh.resolve(table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  private lazy val writeBucketed: Unit = {
    dropWithLocation("orders_b")
    dropWithLocation("lineitem_b")
    graft.core.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    graft.core.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"))
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
  }

  test("equi-join on the bucket key runs with zero shuffle exchanges") {
    writeBucketed
    val j = spark.table("lineitem_b")
      .join(spark.table("orders_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("l_quantity")).as("q"))
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"))
    // the join itself must be exchange-free: the only allowed shuffle
    // is the one AFTER the join for the o_custkey aggregation
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected only the post-join agg exchange:\n$p")
    // bucket metadata must actually be driving the scan
    assert(p.contains("SelectedBucketsCount: 8 out of 8"), p)
  }

  test("bucketed join result equals the plain parquet join") {
    writeBucketed
    val plain = graft.core.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .join(graft.core.Tables(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).count()
    val bucketed = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).count()
    val a = plain.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = bucketed.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(a.sameElements(b))
  }

  test("single-sided bucketing still spares the bucketed side's shuffle") {
    writeBucketed
    // orders arrives bucketed, lineitem as plain parquet: Spark may
    // shuffle ONLY the plain side into the bucket layout
    val j = spark.table("orders_b")
      .join(graft.core.Tables(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity")).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"bucketed side must not re-shuffle:\n$p")
  }
}
