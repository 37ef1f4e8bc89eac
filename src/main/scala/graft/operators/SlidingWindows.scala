package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Genomic sliding windows — the reference's `seqUnitSlidingWindows`
  * (/root/reference/R/UnitList.R:121-175, C kernel
  * src/ReadByUnit.cpp:30-114): per chromosome, overlapping bp windows of
  * width `winSize` stepped by `winShift`, each holding the ids of the
  * variants it covers; optionally drop windows whose member set equals the
  * previous window's (`dup.rm`).
  *
  * Spark-first shape: instead of the reference's sorted cursor walk, each
  * variant *generates* the window-start keys it belongs to
  * (explode(sequence(...))) and a groupBy on (chrom, win_start) assembles
  * members — fully parallel, one shuffle, no ordering requirement on input.
  * Window membership: win_start = k*winShift covers positions
  * [win_start, win_start + winSize - 1]; floor-division keeps k exact for
  * negative numerators (truncating division would drop the first window).
  */
object SlidingWindows {

  /** One row per (chrom, win_start) with sorted member ids. `pos` must be
    * non-negative. Output: chrom, win_start, n_variants, members
    * (ARRAY of id), deduped consecutively when dupRm.
    *
    * `memberFlag`: when given, only flagged variants are counted/collected
    * — but windows are still generated from every variant. Evaluating the
    * flag inside the pre-explode projection (one codegen pass, CSE'd)
    * instead of a separate Filter matters: predicate pushdown would inline
    * a heavy flag expression into the filter condition multiple times. */
  def windows(
      variants: DataFrame, chrom: Column, pos: Column, id: Column,
      winSize: Long, winShift: Long, dupRm: Boolean = false,
      memberFlag: Option[Column] = None): DataFrame = {
    require(winSize > 0 && winShift > 0, "winSize/winShift must be positive")
    val kMin = greatest(lit(0L),
      floor((pos - winSize).cast("double") / winShift).cast("long") + 1L)
    val kMax = floor(pos.cast("double") / winShift).cast("long")
    val exploded = variants.select(chrom.as("chrom"), id.as("__id"),
        memberFlag.getOrElse(lit(true)).as("__f"),
        explode(sequence(kMin, kMax)).as("__k"))
      .select(col("chrom"), (col("__k") * winShift).as("win_start"),
        col("__id"), col("__f"))
    val grouped = exploded.groupBy(col("chrom"), col("win_start"))
      .agg(sum(when(col("__f"), 1L).otherwise(0L)).as("n_variants"),
        sort_array(collect_list(when(col("__f"), col("__id"))))
          .as("members"))
    if (!dupRm) grouped
    else {
      val w = Window.partitionBy(col("chrom")).orderBy(col("win_start"))
      grouped.withColumn("__prev", lag(col("members"), 1).over(w))
        .filter(col("__prev").isNull || !(col("__prev") === col("members")))
        .drop("__prev")
    }
  }
}
