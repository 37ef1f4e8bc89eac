package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (bucketed) interval joins.
  *
  * The reference's GRanges-style containment filter
  * (`/root/reference/src/SeqArray.cpp:780-868`) is a point-in-interval join.
  * Spark plans a non-equi join as BroadcastNestedLoopJoin, which is O(n*m)
  * and falls over at cluster scale. Banding turns it into an equi-join:
  * every interval is exploded to each fixed-width band it overlaps, every
  * point maps to exactly one band, and the equi-join on the band key is
  * shuffle-partitionable (or broadcastable when the interval side is small).
  * A residual predicate re-checks exact containment, so results equal the
  * naive join. Cost: intervals duplicate ceil(span/bandWidth)+1 times —
  * pick `bandWidth` on the order of the typical interval span.
  */
object RangeJoin {

  /** Join `points` to `intervals` where `point` ∈ [`lo`, `hi`).
    * `point`, `lo`, `hi` must be numeric columns of the respective frames.
    * Returns points ⨝ intervals with exact containment; band key is dropped.
    */
  def pointInInterval(
      points: DataFrame, point: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    require(!(points.columns ++ intervals.columns).exists(_.startsWith("__")),
      "pointInInterval uses internal __ columns")
    val iv = intervals.withColumn("__band",
      explode(sequence(
        floor(lo / bandWidth).cast("long"),
        floor(hi / bandWidth).cast("long"))))
    val pt = points.withColumn("__band", floor(point / bandWidth).cast("long"))
    pt.join(iv, "__band")
      .filter(point >= lo && point < hi)
      .drop("__band")
  }

  /** Interval×interval OVERLAP join with a reciprocal-overlap gate
    * (`bedtools intersect -f x -r`): pairs where [loA, hiA) ∩ [loB, hiB)
    * is non-empty and the overlap covers ≥ minNum/minDen of BOTH
    * intervals — integer cross-multiplied, so the gate replays
    * engine-exact. Both sides explode to their covering bands; a pair
    * meets in every band their overlap covers, so it is kept ONLY in
    * the overlap's FIRST band (`floor(max(lo)/bandWidth)`) — the
    * standard banded-join dedup, no `dropDuplicates` shuffle. Adds
    * `ov_len` (exact overlap length). Intervals must be non-empty
    * (`hi > lo`). */
  def intervalOverlap(
      a: DataFrame, loA: Column, hiA: Column,
      b: DataFrame, loB: Column, hiB: Column,
      bandWidth: Long, minNum: Int = 0, minDen: Int = 1): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    require(minDen > 0 && minNum >= 0, "reciprocal gate must be >= 0")
    require(!(a.columns ++ b.columns).exists(_.startsWith("__")),
      "intervalOverlap uses internal __ columns")
    require(!(a.columns ++ b.columns).contains("ov_len"),
      "intervalOverlap emits ov_len; rename the input's ov_len column")
    def bands(lo: Column, hi: Column) = explode(sequence(
      floor(lo / bandWidth).cast("long"),
      floor((hi - 1) / bandWidth).cast("long")))
    val ab = a.withColumn("__band", bands(loA, hiA))
    val bb = b.withColumn("__band", bands(loB, hiB))
    ab.join(bb, "__band")
      .filter(loA < hiB && loB < hiA)
      .filter(floor(greatest(loA, loB) / bandWidth).cast("long")
        === col("__band"))
      .withColumn("ov_len", least(hiA, hiB) - greatest(loA, loB))
      .filter(col("ov_len") * minDen >= lit(minNum) * (hiA - loA) &&
        col("ov_len") * minDen >= lit(minNum) * (hiB - loB))
      .drop("__band")
  }
}
