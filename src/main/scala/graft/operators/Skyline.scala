package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (maximize one integer attribute, minimize the
  * other) with NO pairwise dominance join: because both attributes are
  * integers, dominance reduces to prefix maxima over the minimized
  * attribute's order, and the per-value maxima table is
  * DISTINCT-VALUE-sized — bounded by the attribute's domain, not the
  * row count — so the one ordered window runs over a broadcast-size
  * summary (the two-level-cumsum discipline applied to prefix-max).
  * Ties on both attributes are mutually non-dominating and all kept.
  * The streaming twin is [[graft.streaming.EventStream.skylineStream]].
  */
object Skyline {

  /** Rows of `df` not dominated by any other row, where y dominates x
    * iff y.`maxCol` ≥ x.`maxCol` ∧ y.`minCol` ≤ x.`minCol` with at
    * least one strict. Both columns must be integral. Output keeps
    * every input column. */
  def maxMin(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    require(!df.columns.exists(_.startsWith("__")),
      "skyline writes __-prefixed working columns; input already has one")
    val wPfx = Window.orderBy(col(minCol))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val classes = df.groupBy(col(minCol))
      .agg(max(col(maxCol)).as("__cls_max"))
      .withColumn("__pfx_max", max(col("__cls_max")).over(wPfx))
    df.join(broadcast(classes), Seq(minCol))
      .filter(col(maxCol) === col("__cls_max")
        && (col("__pfx_max").isNull || col("__pfx_max") < col(maxCol)))
      .drop("__cls_max", "__pfx_max")
      .select(df.columns.map(col): _*)
  }
}
