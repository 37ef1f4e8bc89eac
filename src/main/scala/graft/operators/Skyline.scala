package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (maximize one integer attribute, minimize the
  * other) with NO pairwise dominance join: because both attributes are
  * integers, dominance reduces to prefix maxima over the minimized
  * attribute's order, computed with the TWO-LEVEL bucket discipline
  * ([[Spearman.midranks2]] shape): a per-value maxima table (distinct-
  * value-sized), bucket maxima over `minCol div bucketWidth` (summary-
  * sized), one ordered window over the tiny bucket table, and a
  * BALANCED per-bucket partitioned window for the within-bucket prefix
  * — so a high-cardinality integer attribute (epoch millis,
  * micro-cents) never forces a data-sized single-partition sort or an
  * over-broadcast. Ties on both attributes are mutually non-dominating
  * and all kept. The streaming twin is
  * [[graft.streaming.EventStream.skylineStream]].
  */
object Skyline {

  /** Rows of `df` not dominated by any other row, where y dominates x
    * iff y.`maxCol` ≥ x.`maxCol` ∧ y.`minCol` ≤ x.`minCol` with at
    * least one strict. Both columns must be integral. Output keeps
    * every input column. `bucketWidth` trades bucket-table size
    * against per-bucket window width; any positive value is correct
    * (integral `div` is monotone, so bucket order composed with
    * in-bucket value order is the total `minCol` order). */
  def maxMin(df: DataFrame, maxCol: String, minCol: String,
      bucketWidth: Long = 1L << 20): DataFrame = {
    require(!df.columns.exists(_.startsWith("__")),
      "skyline writes __-prefixed working columns; input already has one")
    require(bucketWidth > 0,
      s"bucketWidth must be positive; got $bucketWidth")
    val classes = df.groupBy(col(minCol))
      .agg(max(col(maxCol)).as("__cls_max"))
      .withColumn("__skb",
        expr(s"CAST(`$minCol` AS BIGINT) div ${bucketWidth}L"))
    // strict prefix max over the TINY bucket summary (all earlier
    // buckets), never the per-value table
    val wB = Window.orderBy(col("__skb"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val bucketPfx = classes.groupBy(col("__skb"))
      .agg(max(col("__cls_max")).as("__bmax"))
      .withColumn("__bpfx", max(col("__bmax")).over(wB))
      .select(col("__skb"), col("__bpfx"))
    // strict within-bucket prefix max under a balanced per-bucket window
    val wIn = Window.partitionBy(col("__skb")).orderBy(col(minCol))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val pfx = classes
      .withColumn("__ipfx", max(col("__cls_max")).over(wIn))
      .join(broadcast(bucketPfx), Seq("__skb"))
      // greatest() skips nulls: first value of first bucket gets null
      .withColumn("__pfx_max", greatest(col("__bpfx"), col("__ipfx")))
      .select(col(minCol), col("__cls_max"), col("__pfx_max"))
    // no broadcast hint: the per-value table is distinct-value-sized,
    // which for a near-unique minCol approaches data-sized — AQE
    // converts to broadcast at runtime when it is actually small
    df.join(pfx, Seq(minCol))
      .filter(col(maxCol) === col("__cls_max")
        && (col("__pfx_max").isNull || col("__pfx_max") < col(maxCol)))
      .drop("__cls_max", "__pfx_max")
      .select(df.columns.map(col): _*)
  }
}
