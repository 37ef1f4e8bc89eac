package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: attach to each left row the LATEST right row with
  * `rightTime <= leftTime` for the same key (builder brief's example of an
  * operator Spark's built-ins lack; absent from the reference, SURVEY §2.4).
  *
  * Spark-first shape: instead of a range join (which plans as a nested
  * loop) or a per-key sort-merge in driver code, both sides are unioned and
  * a single `last(..., ignoreNulls)` running window per key attaches the
  * most recent right values — ONE shuffle on the key, no row explosion,
  * O(n log n) per partition for the sort. Right rows must be unique per
  * (key, time) — pre-aggregate duplicates or results would be
  * tie-dependent. Equal timestamps match (<=), like DuckDB's ASOF JOIN.
  */
object AsOfJoin {

  /** @param rightVals (outputName, column-of-right) values to attach;
    *                  must be non-null on right rows. */
  def lastPrior(
      left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightVals: Seq[(String, Column)]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left.select(
      (Seq(leftKey.as("__k"), leftTime.as("__t"), lit(1).as("__side")) ++
        leftCols.map(col) ++
        rightVals.map { case (n, _) => lit(null).as(s"__v_$n") }): _*)
    val rTagged = right.select(
      (Seq(rightKey.as("__k"), rightTime.as("__t"), lit(0).as("__side")) ++
        leftCols.map(n => lit(null).as(n)) ++
        rightVals.map { case (n, c) => c.as(s"__v_$n") }): _*)
    // right (side=0) sorts before left (side=1) at equal times → <= matches
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select((leftCols.map(col) :+ col("__side")) ++
        rightVals.map { case (n, _) =>
          last(col(s"__v_$n"), ignoreNulls = true).over(w).as(n) }: _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
