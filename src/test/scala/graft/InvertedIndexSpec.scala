package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.textfns._

/** The persisted inverted index behind keyword search: q83 computes tf/df
  * inline so its DuckDB oracle can replay the ranking, with the claim
  * that at scale the postings are a one-off build artifact — (term,
  * doc, tf) rows written `partitionBy(term)`, one directory per posting
  * list. This spec materializes the claim: a query's scan prunes to its
  * terms' directories at planning time, and searching the pruned
  * postings returns exactly the inline top-k. */
class InvertedIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "join", "window")

  test("partitionBy(term) postings prune a search to its query terms") {
    val docs = Tables(spark, dir, "documents")
    val postings = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val idx = java.nio.file.Files.createTempDirectory("graft_inv").toString
    postings.write.partitionBy("term").mode("overwrite").parquet(idx)

    val vocab = postings.select(col("term")).distinct().count()
    val pruned = spark.read.parquet(idx)
      .filter(col("term").isin(terms: _*))
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.selectedPartitions.partitionCount == terms.length,
      s"scan reads ${scan.selectedPartitions.partitionCount} posting " +
        s"lists, wanted ${terms.length} of $vocab")

    // searching the pruned postings == the inline q83 pipeline
    val n = docs.agg(count(lit(1)).as("__n"))
    val dfT = pruned.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val got = pruned.join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("__idf",
        floor((col("__n") * 10000).cast("double") / col("__df"))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__m"),
        sum(col("tf") * col("__idf")).as("score"))
      .filter(col("__m") === terms.length)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = graft.pipeline.TrainingData
      .keywordSearch(docs, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty)
  }
}
