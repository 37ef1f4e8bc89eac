package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.vectorfns._

/** The persisted IVF index: q61 computes the coarse assignment inline so
  * its DuckDB oracle can replay it, with the comment that at scale the
  * assignment is a one-off build artifact — the corpus written
  * partitioned by its assigned list. This spec MATERIALIZES that claim:
  * the index directory prunes a search to its nprobe partitions at
  * planning time (the Spark analog of reading only the probed inverted
  * lists), and the pruned search returns exactly the full-scan answer
  * restricted to those lists. */
class IvfIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("partitionBy(assigned) index prunes search to nprobe lists") {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        quantize(col("embedding"), 10000).as("qv"))
      .withColumn("nrm", dotLong(col("qv"), col("qv")))
    // coarse quantizer: per-label centroid sums (q38/q61 shape)
    val cents = e.select(col("label"), posexplode(col("qv")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i")).agg(sum(col("x")).as("sx"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("i"), col("sx")))).as("pairs"))
      .select(col("label").as("c_label"),
        transform(col("pairs"), p => p.getField("sx")).as("cv"))
      .withColumn("cnrm", dotLong(col("cv"), col("cv")))
    val wA = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("c_label"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("qv"), col("nrm"), col("c_label"),
        cosineQ(dotLong(col("qv"), col("cv")), col("nrm"), col("cnrm"))
          .as("ccos"))
      .withColumn("rn", row_number().over(wA)).filter(col("rn") === 1)
      .select(col("vec_id"), col("qv"), col("nrm"),
        col("c_label").as("assigned"))

    // build the index: one directory per inverted list
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    assigned.write.partitionBy("assigned").mode("overwrite").parquet(idx)

    val nLists = assigned.select(col("assigned")).distinct().count().toInt
    val nprobe = math.min(2, nLists)
    val probeLists = assigned.select(col("assigned")).distinct()
      .orderBy(col("assigned")).limit(nprobe)
      .collect().map(_.get(0)).toSeq

    val pruned = spark.read.parquet(idx)
      .filter(col("assigned").isin(probeLists: _*))

    // planning-time pruning: the scan touches nprobe directories only
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.selectedPartitions.partitionCount == nprobe,
      s"scan reads ${scan.selectedPartitions.partitionCount} lists, " +
        s"wanted $nprobe of $nLists")

    // and the pruned read IS the full corpus restricted to those lists
    val want = assigned.filter(col("assigned").isin(probeLists: _*))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val got = pruned.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }
}
