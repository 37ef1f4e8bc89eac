package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT weighted median per group without a data-sized sort or window.
  *
  * The classic scale-exact quantile shape (two-level bucket cumsum — the
  * same discipline as `TrainingData.packSequences`): a data-sized
  * `percentile`/global-sort answer needs every group's values ranked in
  * one place, which at 100 TB is either a skewed per-group partition
  * (5 groups = 5 tasks) or a global sort. Instead:
  *
  *  1. collapse to per-(group, value) weight partials — ONE shuffle that
  *     scales with DISTINCT values (the data sits on an integer grid, so
  *     this is grid-bounded, not row-bounded);
  *  2. re-aggregate to per-(group, bucket) totals — a second summary-sized
  *     shuffle (#groups × #buckets rows);
  *  3. run the cumulative scan on the TINY bucket table (the per-group
  *     window here orders #buckets rows — broadcast-scale by construction);
  *  4. descend into the single median bucket per group and repeat the
  *     cumulative scan over that bucket's values only — bounded by
  *     bucketWidth grid points per group, never by corpus size.
  *
  * Median convention: the LOWER weighted median — the smallest value v
  * with 2·cumWeight(≤v) ≥ totalWeight. All comparisons are exact integer
  * cross-multiplications; no double appears until the caller divides.
  */
object WeightedMedian {

  /** Per-group lower weighted median of integer `valueCol` under integer
    * `weightCol`. Output: groupCols ++ (w_total, median_v). */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      weightCol: String, bucketWidth: Long): DataFrame =
    exactQuantiles(df, groupCols, valueCol, weightCol, bucketWidth,
        Seq((1, 2)))
      .select(groupCols.map(col) ++ Seq(col("w_total"),
        col("quantile_v").as("median_v")): _*)

  /** Per-group lower weighted quantiles at RATIONAL levels num/den —
    * the smallest v with cumWeight(≤v)·den ≥ totalWeight·num (so (1,2)
    * is the lower median, (99,100) the p99). One row per group ×
    * quantile. The bucket cumulative stage runs ONCE; every requested
    * level reuses it, and the data-sized join descends into the union
    * of the (≤ #groups × #levels) target buckets in one pass.
    * Output: groupCols ++ (q_num, q_den, w_total, quantile_v). */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String, bucketWidth: Long,
      quantiles: Seq[(Int, Int)]): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive; got $bucketWidth")
    require(groupCols.nonEmpty, "need at least one group column")
    require(quantiles.nonEmpty &&
      quantiles.forall { case (n, d) => n > 0 && n <= d },
      s"quantile levels must satisfy 0 < num/den <= 1; got $quantiles")
    val g = groupCols.map(col)
    // 1. grid-bounded value partials. The explicit isnotnull matters:
    // the step-4 join INFERS isnotnull(valueCol) on its pv branch,
    // which made the two pv subtrees canonically different — the
    // executed q231 plan ran the data-sized pv exchange TWICE (round-12
    // plan evidence). With the filter written once here, both branches
    // are identical and ReuseExchange folds them. (Null values never
    // reached the quantile scan anyway — the inner join dropped them;
    // they no longer count toward bucket totals either, which is the
    // right quantile semantic and a no-op on non-null inputs.)
    val pv = df.filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol).as("__v"): _*)
      .agg(sum(col(weightCol)).as("__w"))
      .withColumn("__b", expr(s"__v div $bucketWidth"))
      .filter(col("__b").isNotNull)
    // 2. summary-sized bucket totals
    val pb = pv.groupBy(g :+ col("__b"): _*).agg(sum(col("__w")).as("__wb"))
    // 3. cumulative scan over the bucket summary (tiny by construction)
    val wPart = Window.partitionBy(g: _*)
    val wCum = wPart.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bkt = pb
      .withColumn("__cum", sum(col("__wb")).over(wCum))
      .withColumn("__tot", sum(col("__wb")).over(
        wPart.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    // one target bucket per (group, level); the union stays ≤ levels ×
    // #groups rows — broadcast-scale by construction
    val targetBuckets = quantiles.map { case (num, den) =>
      bkt.filter(col("__cum") * den >= col("__tot") * num)
        .groupBy(g: _*)
        .agg(min_by(struct(col("__b"),
          (col("__cum") - col("__wb")).as("__pre"), col("__tot")),
          col("__b")).as("__mb"))
        .select(g ++ Seq(lit(num).as("q_num"), lit(den).as("q_den"),
          col("__mb.__b").as("__b"), col("__mb.__pre"),
          col("__mb.__tot")): _*)
    }.reduce(_ unionAll _)
    // 4. exact scan inside the target buckets only
    val wQ = Window.partitionBy(g :+ col("q_num") :+ col("q_den"): _*)
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pv.join(broadcast(targetBuckets), groupCols :+ "__b")
      .withColumn("__cv", sum(col("__w")).over(wQ))
      .filter((col("__pre") + col("__cv")) * col("q_den")
        >= col("__tot") * col("q_num"))
      .groupBy(g :+ col("q_num") :+ col("q_den"): _*)
      .agg(min(col("__v")).as("quantile_v"),
        min(col("__tot")).as("w_total"))
      .select(g ++ Seq(col("q_num").cast("long"), col("q_den").cast("long"),
        col("w_total"), col("quantile_v")): _*)
  }
}
