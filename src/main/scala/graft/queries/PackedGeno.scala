package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.genetics._
import graft.genomics.SynthGeno

/** Packed-genotype fast path at biobank width (VERDICT "wrong" #5): the
  * unpacked `ARRAY<ARRAY<BIGINT>>` cube costs ~16 bytes per allele; the
  * reference stores 2 bits (src/ConvVCF2GDS.cpp:994-995). These two
  * queries measure the SAME allele-frequency aggregation over a
  * 1024-sample cube — q52 scanning the nested arrays with [[genoStats]],
  * q53 scanning the 2-bit BINARY with [[genoStatsPacked]] (4 samples per
  * table lookup, ~16× less parquet). Both are oracle-checked; their
  * bench-time ratio is the packed-path speedup.
  *
  * The wide cube tiles SynthGeno's 8 samples ×128 on a deterministic
  * ~1-in-40 variant subset, materialized once per sf-dir under /tmp so the
  * timed plan is scan+kernel, not synthesis.
  */
object PackedGeno extends QueryModule {

  private val REP = 128
  private val WideSamples = REP * SynthGeno.nSamples

  private def widePath(dir: String, packed: Boolean): String =
    s"/tmp/graft_wide_${new java.io.File(dir).getName}_" +
      (if (packed) "packed" else "unpacked")

  private def ensureWide(s: SparkSession, dir: String,
      packed: Boolean): String = {
    val p = widePath(dir, packed)
    if (!new java.io.File(p + "/_SUCCESS").exists()) {
      val wide = SynthGeno.variants(s, dir)
        .filter(col("vid") % 40 === 1)
        .select(col("vid"),
          flatten(array_repeat(col("geno"), REP)).as("geno"))
      val df =
        if (packed) wide.select(col("vid"), pack2b(col("geno")).as("pg"))
        else wide
      df.write.mode("overwrite").parquet(p)
    }
    p
  }

  private def statsCols(st: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = Seq(
    element_at(st, 1).as("n_total"),
    element_at(st, 2).as("n_called"),
    element_at(st, 3).as("ac_ref"),
    element_at(st, 4).as("miss_calls"),
    element_at(st, 5).as("miss_alleles"))

  // Unpacked-cube semantics: per-allele nulls count individually.
  private val q52 = Q("q52_wide_af_unpacked",
    (s, dir) => {
      val p = ensureWide(s, dir, packed = false)
      s.read.parquet(p)
        .select(col("vid") +: statsCols(genoStats(col("geno"), lit(0))): _*)
    },
    Some(s"""WITH variants AS (${SynthGeno.sqlCte})
      SELECT vid,
        CAST($REP * len(flatten(geno)) AS BIGINT) AS n_total,
        CAST($REP * len(list_filter(flatten(geno), a -> a IS NOT NULL))
          AS BIGINT) AS n_called,
        CAST($REP * len(list_filter(flatten(geno), a -> a = 0))
          AS BIGINT) AS ac_ref,
        CAST($REP * len(list_filter(geno, sa ->
          len(list_filter(sa, a -> a IS NULL)) > 0)) AS BIGINT)
          AS miss_calls,
        CAST($REP * len(list_filter(flatten(geno), a -> a IS NULL))
          AS BIGINT) AS miss_alleles
      FROM variants WHERE vid % 40 = 1"""))

  // Packed semantics: a call with ANY missing allele packs to code 3
  // (fully missing) — the oracle mirrors that fold.
  private val q53 = Q("q53_wide_af_packed",
    (s, dir) => {
      val p = ensureWide(s, dir, packed = true)
      s.read.parquet(p)
        .select(col("vid") +:
          statsCols(genoStatsPacked(col("pg"), lit(WideSamples))): _*)
    },
    Some(s"""WITH variants AS (${SynthGeno.sqlCte})
      SELECT vid,
        CAST(2 * $REP * len(geno) AS BIGINT) AS n_total,
        CAST(2 * $REP * len(list_filter(geno, sa ->
          len(list_filter(sa, a -> a IS NULL)) = 0)) AS BIGINT) AS n_called,
        CAST($REP * COALESCE(list_sum(list_transform(list_filter(geno, sa ->
          len(list_filter(sa, a -> a IS NULL)) = 0), sa ->
          len(list_filter(sa, a -> a = 0)))), 0) AS BIGINT) AS ac_ref,
        CAST($REP * len(list_filter(geno, sa ->
          len(list_filter(sa, a -> a IS NULL)) > 0)) AS BIGINT)
          AS miss_calls,
        CAST(2 * $REP * len(list_filter(geno, sa ->
          len(list_filter(sa, a -> a IS NULL)) > 0)) AS BIGINT)
          AS miss_alleles
      FROM variants WHERE vid % 40 = 1"""))

  override def queries: Seq[Q] = Seq(q52, q53)
}
