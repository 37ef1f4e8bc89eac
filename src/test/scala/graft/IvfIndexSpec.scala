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

  // the IVF-PQ build artifact (q114's comment made concrete): the index
  // persists ONLY (vec_id, codes) per inverted list — PQ_M bytes of
  // payload per vector — and a search reads nprobe list directories,
  // reconstructing ADC distances from the persisted codes alone. The
  // pruned-index ADC must equal the inline computation exactly.
  test("persisted PQ-codes index: pruned ADC == inline ADC on probed lists") {
    val M = 16; val DSUB = 4; val K = 16
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        quantize(col("embedding"), 10000).as("qv"))
    val cbRow = e.orderBy(col("vec_id")).limit(K)
      .agg(array_sort(collect_list(struct(col("vec_id"), col("qv"))))
        .as("pairs"))
      .select(transform(col("pairs"), p => p.getField("qv")).as("cbs"))
    // lists = labels (the q38 coarse shape suffices for the I/O claim)
    val coded = e.crossJoin(broadcast(cbRow))
      .select(col("vec_id"), col("label").as("cid"),
        pqEncode(col("qv"), col("cbs"), M, DSUB).as("codes"))
    val idx = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    coded.write.partitionBy("cid").mode("overwrite").parquet(idx)

    val lists = coded.select(col("cid")).distinct()
      .orderBy(col("cid")).limit(2).collect().map(_.get(0)).toSeq
    val probe = e.orderBy(col("vec_id")).limit(1)
      .crossJoin(broadcast(cbRow))
      .select(col("vec_id").as("probe_id"),
        transform(sequence(lit(0), lit(M - 1)), m =>
          transform(sequence(lit(0), lit(K - 1)), k =>
            l2Long(slice(col("qv"), m * DSUB + 1, lit(DSUB)),
              slice(element_at(col("cbs"), (k + 1).cast("int")),
                m * DSUB + 1, lit(DSUB))))).as("dtab"))

    val prunedIdx = spark.read.parquet(idx)
      .filter(col("cid").isin(lists: _*))
    val scanned = prunedIdx.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    assert(scanned.selectedPartitions.partitionCount == 2)

    def adcOf(codes: DataFrame): Map[Long, Long] = codes
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), pqAdc(col("dtab"), col("codes")).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val fromIndex = adcOf(prunedIdx)
    val inline = adcOf(coded.filter(col("cid").isin(lists: _*)))
    assert(fromIndex == inline && fromIndex.nonEmpty)
  }
}
