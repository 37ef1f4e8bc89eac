package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix array over a tokenized corpus by PREFIX DOUBLING
  * (Manber–Myers 1990 lifted onto DataFrames) — the index structure
  * exact-substring dedup literature builds on (Lee et al. 2022 §3 uses
  * a suffix array where this engine's span dedup uses span keys; this
  * operator supplies the real thing for the queries that need ordered
  * suffixes, e.g. longest-repeated-substring audits).
  *
  * Positions are (doc_id, off) pairs — suffixes never cross a document
  * boundary, and a position past its document's end compares BELOW any
  * token (rank sentinel 0), the standard shorter-suffix-first rule.
  * Ranks double per round: rank_{2k}(p) = dense-rank of
  * (rank_k(p), rank_k(p+k) or 0), so after ⌈log₂ CAP⌉ rounds two
  * positions share a rank iff their first CAP tokens agree; the final
  * suffix index breaks residual ties by (doc_id, off) for determinism.
  *
  * Scale shape: the only global-order step is the dense rank itself,
  * computed WITHOUT a single-partition window by the range-partition
  * trick: distinct keys → `repartitionByRange` → partition-local
  * row_number + a driver-side prefix over the per-partition counts
  * (#partitions rows — the two-level-cumsum discipline at the sort
  * layer; the sampled range bounds affect only the split points, never
  * the resulting rank values). Every other step is a (doc_id, off)
  * equi-join. 5 fixed rounds (CAP = 32) keep the plan replayable by an
  * unrolled SQL oracle.
  */
object SuffixArray {

  val Cap = 32

  /** Dense rank (1-based) of the distinct `keys` combinations in their
    * ascending order, joined back onto `df` as `out` — no
    * single-partition exchange: ranks come from range partitioning +
    * local numbering + a broadcast per-partition offset table. */
  def denseRank(df: DataFrame, keys: Seq[String], out: String)
      : DataFrame = {
    // materialized: the offsets job and the ranking job MUST read the
    // same physical partitioning (the offsets are per-partition-id) —
    // recomputing the range exchange per consumer would also recompute
    // its boundary sample, coupling correctness to two jobs making
    // identical planning decisions; one eager checkpoint removes both
    // the risk and the duplicate work
    val dk = df.select(keys.map(col): _*).distinct()
      .repartitionByRange(keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = dk.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).zip(counts)
      .map { case (off, (pid, _)) => pid -> off }
    // per-partition offsets attach via a BROADCAST JOIN on __pid (the
    // numberVariants pattern, api/SeqArray.scala) — NEVER an O(P)-deep
    // when-chain: P is the shuffle partition count (thousands on a real
    // cluster) and linear expression trees of that depth blow the
    // analyzer/codegen stack (SCALE.md "Cohort-width expression trees")
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    val wLocal = Window.partitionBy(col("__pid"))
      .orderBy(keys.map(col): _*)
    val ranked = dk
      .withColumn("__r", row_number().over(wLocal).cast("long"))
      .join(offDf, "__pid")
      .withColumn(out, col("__off") + col("__r"))
      .select((keys.map(col) :+ col(out)): _*)
    df.join(ranked, keys)
  }

  /** Suffix-array table for a (doc_id, text) corpus: one row per token
    * position with `sa` (the 1-based suffix index in lexicographic
    * order of the ≤ `cap`-token suffixes, ties by (doc_id, off)),
    * the equivalence `rank`, and the position's (doc_id, off).
    * `cap` must be a power of two so the doubling rounds land exactly
    * on it (round shifts 1,2,…,cap/2 ⇒ ranks distinguish the first
    * `cap` tokens) and the unrolled SQL oracle replays round-for-round.
    * Default [[Cap]] = 32 serves the 4-gram/LRS consumers; the Lee et
    * al. 2022 exact-substring threshold (50 tokens) needs cap = 64. */
  def build(docs: DataFrame, cap: Int = Cap): DataFrame = {
    require(cap >= 2 && (cap & (cap - 1)) == 0,
      s"cap must be a power of two >= 2; got $cap")
    val spark = docs.sparkSession
    val pos = docs
      .select(col("doc_id"),
        filter(split(col("text"), "\\s+"), t => t =!= "").as("__toks"))
      .select(col("doc_id"),
        posexplode_outer(col("__toks")).as(Seq("off", "tok")))
      .filter(col("tok").isNotNull)
      .withColumn("off", col("off").cast("long"))
    var cur = denseRank(pos, Seq("tok"), "rank")
      .select(col("doc_id"), col("off"), col("rank"))
      .localCheckpoint(true)
    var k = 1L
    var distinct = false
    while (k < cap && !distinct) {
      val shifted = cur.select(col("doc_id"),
        (col("off") - k).as("off"), col("rank").as("__r2"))
      val paired = cur.join(shifted, Seq("doc_id", "off"), "left")
        .withColumn("__r2", coalesce(col("__r2"), lit(0L)))
      cur = denseRank(paired, Seq("rank", "__r2"), "__nr")
        .select(col("doc_id"), col("off"), col("__nr").as("rank"))
        .localCheckpoint(true)
      k *= 2
      // once every position ranks uniquely, a further doubling round
      // is the identity on both the order AND the dense-rank values
      // (ordering by (r, r2) with r distinct orders by r, and its
      // dense rank re-emits 1..n = r) — so exiting early produces the
      // same table the oracle's fixed unrolled rounds produce
      if (k < cap) {
        val Array(n, mx) = cur.agg(count(lit(1)), max(col("rank")))
          .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
        distinct = n == mx
      }
    }
    denseRank(cur, Seq("rank", "doc_id", "off"), "sa")
      .select(col("sa"), col("rank"), col("doc_id"), col("off"))
  }
}
