package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-insensitive content digest, two-level (seqDigest,
  * /root/reference/R/Summary.R:781-820 — the reference also splits and
  * hashes progressively rather than materializing the whole vector).
  *
  * Level 1 buckets members by a PORTABLE hash of the member string (two
  * md5-hex chars via ascii(), reproducible in any SQL engine for oracle
  * parity) and digests each bucket's sorted members; level 2 digests the
  * bucket digests in bucket order. No single aggregation cell ever holds
  * more than ~1/buckets of a group, so a 6.5M-variant chromosome digests
  * in 64 parallel, bounded cells instead of one multi-GB string.
  */
object Digest {

  /** Bucket id in [0, buckets) from the member encoding — portable
    * across engines (md5 hex prefix, not xxhash). */
  def bucketOf(s: Column, buckets: Int): Column =
    (ascii(substring(md5(s), 1, 1)) * 128 +
      ascii(substring(md5(s), 2, 1))) % buckets

  /** Per-group `n` (member count) and `digest`. `df` must contain the
    * group columns and the member encoding `s`. */
  def twoLevel(df: DataFrame, groupCols: Seq[Column], s: Column,
      buckets: Int = 64): DataFrame = {
    val level1 = df
      .withColumn("__bucket", bucketOf(s, buckets))
      .groupBy(groupCols :+ col("__bucket"): _*)
      .agg(count(lit(1)).as("__bn"),
        md5(array_join(sort_array(collect_list(s)), ",")).as("__d1"))
    level1
      .groupBy(groupCols: _*)
      .agg(sum(col("__bn")).cast("long").as("n"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("__bucket"), col("__d1")))),
            x => x.getField("__d1")),
          ",")).as("digest"))
  }

  /** Whole-table digest → one row (n, digest). */
  def table(df: DataFrame, s: Column, buckets: Int = 256): DataFrame =
    twoLevel(df.select(s.as("__s"), lit(1).as("__g")),
      Seq(col("__g")), col("__s"), buckets).drop("__g")
}
