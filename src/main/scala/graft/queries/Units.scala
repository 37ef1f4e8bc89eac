package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.genetics._
import graft.genomics.SynthGeno
import graft.operators.SlidingWindows

/** Genomic-window ("unit") operators (SURVEY.md §2.6) plus the digest and
  * summary jobs (§2.5, §2.1) over the deterministic SynthGeno variants.
  *
  * Scale notes: window assembly is one shuffle on (chrom, win_start) after a
  * bounded explode (each variant lands in ceil(size/shift) windows); the
  * digest is a per-group md5 of ordered members — at real scale the
  * hash-of-hashes split the reference uses (R/Summary.R:816) maps to a
  * two-level groupBy, which the spec exercises.
  */
object Units extends QueryModule {

  private val WIN_SIZE = 2000L
  private val WIN_SHIFT = 1000L

  private def withCte(body: String): String =
    s"WITH variants AS (${SynthGeno.sqlCte})\n$body"

  private def withCtes(extra: String, body: String): String =
    s"WITH variants AS (${SynthGeno.sqlCte}),\n$extra\n$body"

  /** DuckDB window-membership CTE matching [[SlidingWindows.windows]]. */
  private def winCte(src: String): String =
    s"""ks AS (SELECT chrom, vid,
         unnest(range(
           greatest(0, CAST(floor((pos - $WIN_SIZE.0) / $WIN_SHIFT) AS BIGINT) + 1),
           CAST(floor(pos / $WIN_SHIFT.0) AS BIGINT) + 1)) AS k
       FROM $src),
      grouped AS (SELECT chrom, k * $WIN_SHIFT AS win_start,
         COUNT(*) AS n_variants,
         string_agg(vid, ',' ORDER BY vid) AS members
       FROM ks GROUP BY chrom, k)"""

  // --- seqUnitSlidingWindows incl. dup.rm (R/UnitList.R:121-175). ----------
  private val q25 = Q("q25_sliding_windows",
    (s, dir) => {
      val v = SynthGeno.variants(s, dir)
      SlidingWindows.windows(v, col("chrom"), col("pos"), col("vid"),
          WIN_SIZE, WIN_SHIFT, dupRm = true)
        .select(col("chrom"), col("win_start"), col("n_variants"),
          array_join(transform(col("members"), m => m.cast("string")), ",")
            .as("members"))
    },
    Some(withCtes(winCte("variants"),
      """SELECT chrom, win_start, n_variants, members FROM
        (SELECT *, LAG(members) OVER (PARTITION BY chrom ORDER BY win_start)
           AS prev FROM grouped)
      WHERE prev IS NULL OR prev <> members""")))

  // --- seqUnitFilterCond (R/UnitList.R:12-114): drop rare variants inside
  // units by allele-frequency, then drop units below a minimum size. --------
  private val q26 = Q("q26_unit_filter_cond",
    (s, dir) => {
      // af ∈ [0.2, 0.8] as exact-integer bounds (5*ac ⋛ called), evaluated
      // as a member flag inside the window operator's projection — a
      // pre-filter would get the genoStats expression inlined into the
      // pushed-down predicate several times.
      val st = genoStats(col("geno"), lit(0))
      val called = element_at(st, 2)
      val ac = element_at(st, 3)
      val flag = called > 0 && ac * 5 >= called && ac * 5 <= called * 4
      SlidingWindows.windows(SynthGeno.variants(s, dir),
          col("chrom"), col("pos"), col("vid"), WIN_SIZE, WIN_SHIFT,
          memberFlag = Some(flag))
        .filter(col("n_variants") >= 5)
        .select(col("chrom"), col("win_start"), col("n_variants"))
    },
    Some(withCtes(s"""common AS (SELECT * FROM variants
        WHERE CAST(len(list_filter(flatten(geno), a -> a = 0)) AS DOUBLE)
          / NULLIF(len(list_filter(flatten(geno), a -> a IS NOT NULL)), 0)
          BETWEEN 0.2 AND 0.8),
      ${winCte("common")}""",
      """SELECT chrom, win_start, n_variants FROM grouped
      WHERE n_variants >= 5""")))

  // --- seqDigest (R/Summary.R:781-820): order-insensitive content digest
  // per chromosome. Two-level split-then-hash-of-hashes (the reference's
  // own answer at scale, R/Summary.R:816): members bucket by a portable
  // md5-prefix hash, each bucket digests its sorted members (cells are
  // ~1/64th of a chromosome, never one giant string), and the chromosome
  // digest is the md5 of the bucket digests in bucket order. Shuffle
  // parallelism is #chrom × 64 instead of #chrom. ---------------------------
  private val q27 = Q("q27_digest",
    (s, dir) => {
      val v = SynthGeno.variants(s, dir)
      graft.operators.Digest.twoLevel(
        v.select(col("chrom"),
          concat_ws(":", col("vid"), col("pos"), col("nall")).as("s")),
        Seq(col("chrom")), col("s"))
    },
    Some(withCte(s"""SELECT chrom, CAST(SUM(bn) AS BIGINT) AS n,
      md5(string_agg(d1, ',' ORDER BY bucket)) AS digest
      FROM (
        SELECT chrom, bucket, COUNT(*) AS bn,
          md5(string_agg(s, ',' ORDER BY s)) AS d1
        FROM (
          SELECT chrom, vid || ':' || pos || ':' || nall AS s,
            (ascii(substring(md5(vid || ':' || pos || ':' || nall), 1, 1))
              * 128 +
             ascii(substring(md5(vid || ':' || pos || ':' || nall), 2, 1)))
              % 64 AS bucket
          FROM variants)
        GROUP BY chrom, bucket)
      GROUP BY chrom""")))

  // --- seqSummary tabulations (R/Summary.R:233-427, 652-775): per-(chrom,
  // n-allele) variant counts and position stats. ----------------------------
  private val q28 = Q("q28_summary_tab",
    (s, dir) => {
      val v = SynthGeno.variants(s, dir)
      v.groupBy(col("chrom"), col("nall"))
        .agg(count(lit(1)).as("n_variants"),
          min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"),
          countDistinct(col("pos")).as("n_pos"))
    },
    Some(withCte("""SELECT chrom, nall, COUNT(*) AS n_variants,
      MIN(pos) AS min_pos, MAX(pos) AS max_pos,
      COUNT(DISTINCT pos) AS n_pos
      FROM variants GROUP BY chrom, nall""")))

  // $chrom_pos2 exact semantics (src/GetData.cpp:710-748): "chrom:pos" for
  // the first occurrence, "chrom:pos_k" for the k-th duplicate — the dup
  // counter is a row_number over the key in variant order.
  private val q48 = Q("q48_chrom_pos2",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val v = SynthGeno.variants(s, dir)
      val w = Window.partitionBy(col("chrom"), col("pos")).orderBy(col("vid"))
      v.withColumn("rn", row_number().over(w))
        .select(col("vid"),
          concat(col("chrom"), lit(":"), col("pos"),
            when(col("rn") > 1, concat(lit("_"), col("rn") - 1))
              .otherwise(lit(""))).as("chrom_pos2"))
    },
    Some(withCte("""SELECT vid,
      chrom || ':' || pos ||
        (CASE WHEN rn > 1 THEN '_' || (rn - 1) ELSE '' END) AS chrom_pos2
      FROM (SELECT vid, chrom, pos,
              ROW_NUMBER() OVER (PARTITION BY chrom, pos ORDER BY vid) AS rn
            FROM variants)""")))

  override def queries: Seq[Q] = Seq(q25, q26, q27, q28, q48)
}
