package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TrainingData

/** Scale-linearity probe for the heavy pipeline operators (q68/q72/q76/
  * q81/q92 shapes): times each on the sfDir corpus and on a 10×
  * deterministic expansion, and reports wall-clock ratios. The design
  * claim under test is "no hidden quadratic": every operator is built
  * on bucketed/banded joins and linear shuffles, so 10× data must cost
  * ~10× (ratio well under 15 leaves headroom for fixed overheads and
  * shuffle-partition effects, never for O(n²) blowup — a pair-enumerating
  * implementation would come back ~100×).
  *
  * The 10× corpus is 10 DISJOINT replica shards: every token carries a
  * per-shard suffix, so shards share no shingles and the duplicate
  * DENSITY matches the base corpus (the right null model for a
  * linearity test — naive replication would multiply cluster sizes,
  * which is a data change, not a scale change). Embeddings perturb one
  * coordinate per shard for the same reason.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.ScaleProbe"; one JSON line on stdout + target/scaleprobe.json.
  */
object ScaleProbe {
  private val Factor = 10

  private def expandDocs(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(k - 1))).as("__r"))
      .select((col("doc_id") * k + col("__r")).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit("_"), col("__r"))), " ").as("text"))

  private def expandVecs(vecs: DataFrame, k: Int): DataFrame =
    vecs.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(k - 1))).as("__r"))
      .select((col("vec_id") * k + col("__r")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + (col("__r") * (i % 7 - 3)).cast("float") * 0.01f)
          .as("embedding"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = graft.core.Tables(spark, sfDir, "documents")
      .select("doc_id", "text")
    val docsN = expandDocs(docs1, Factor)
    val vecs1 = graft.core.Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val vecsN = expandVecs(vecs1, Factor)
    // materialize the inputs once so expansion cost never pollutes the
    // operator timings
    docs1.cache(); docsN.cache(); vecs1.cache(); vecsN.cache()
    docs1.count(); docsN.count(); vecs1.count(); vecsN.count()

    def quant(df: DataFrame): DataFrame = df.select(col("vec_id"),
      graft.functions.vectorfns.quantize(col("embedding"), 10000)
        .as("qv"))

    val ops: Seq[(String, DataFrame => DataFrame, Boolean)] = Seq(
      ("ngram_jaccard",
        d => TrainingData.similarityJoin(d, shingleN = 3, threshold = 0.8),
        false),
      ("dedup_clusters",
        d => TrainingData.dedupClusters(d, shingleN = 3, minhashK = 32,
          bands = 8, rowsPerBand = 4, threshold = 0.5), false),
      ("dup_span_removal",
        d => TrainingData.removeDuplicatedSpans(d, l = 8), false),
      ("quality_gate", d => TrainingData.qualityGate(d), false),
      ("semdedup",
        d => TrainingData.semDedup(quant(d), k = 8, iters = 2, tau = 0.4,
          clusterCap = 64), true))

    def time(fn: => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results = ops.map { case (name, fn, onVecs) =>
      val (small, big) = if (onVecs) (vecs1, vecsN) else (docs1, docsN)
      // min-of-2: first run pays Janino/JIT compile
      val t1 = math.min(time(fn(small)), time(fn(small)))
      val tN = math.min(time(fn(big)), time(fn(big)))
      val ratio = tN / math.max(t1, 1e-9)
      (name, t1, tN, ratio)
    }
    val json = results.map { case (n, t1, tN, r) =>
      f""""$n":{"base_s":$t1%.2f,"x${Factor}_s":$tN%.2f,"ratio":$r%.2f,"ok":${r < 15}}"""
    }.mkString("{\"factor\":" + Factor + ",\"sf\":\"" + sfDir + "\",", ",", "}")
    println(json)
    val out = java.nio.file.Paths.get("target", "scaleprobe.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bad = results.filter(_._4 >= 15)
    if (bad.nonEmpty) {
      System.err.println(s"SUPERLINEAR: ${bad.map(_._1).mkString(",")}")
      spark.stop(); sys.exit(1)
    }
    spark.stop()
  }
}
