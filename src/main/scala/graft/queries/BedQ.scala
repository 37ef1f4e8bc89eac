package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.genetics._
import graft.genomics.SynthGeno
import graft.sources.bed.Bed

/** PLINK BED triplet round-trip (`seqGDS2BED` → `seqBED2GDS`, reference
  * R/Conversion.R:833-1447): the SynthGeno cube is exported once per
  * sf-dir as .bed/.bim/.fam, read back through [[Bed.read]]'s
  * range-partitioned matrix scan, and aggregated with the packed
  * GenoStats kernel — so the oracle checks the file codec, the 2-bit
  * translation tables, AND the packed aggregation in one pass. Packed
  * semantics: a call with any missing allele folds to fully missing
  * (BED has one missing code). */
object BedQ extends QueryModule {

  private def prefix(dir: String): String =
    s"/tmp/graft_bed_${new java.io.File(dir).getName}/synth"

  private def ensureBed(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val p = prefix(dir)
    if (!new java.io.File(p + ".bed").exists()) {
      new java.io.File(p).getParentFile.mkdirs()
      val src = SynthGeno.variants(s, dir)
        .select(col("vid"), col("chrom"), col("pos"),
          col("vid").cast("string").as("id"),
          lit("A,C").as("allele"), pack2b(col("geno")).as("pg"))
      Bed.write(src, "vid", (0 until SynthGeno.nSamples).map(i => s"S$i"), p)
    }
    p
  }

  private val q54 = Q("q54_bed_roundtrip",
    (s, dir) => {
      val p = ensureBed(s, dir)
      val st = genoStatsPacked(col("pg"), lit(SynthGeno.nSamples))
      Bed.read(s, p)
        .select(col("id").cast("long").as("vid"), col("chrom"), col("pos"),
          element_at(st, 2).as("n_called"),
          element_at(st, 3).as("ac_ref"),
          element_at(st, 4).as("miss_calls"))
    },
    Some(s"""WITH variants AS (${SynthGeno.sqlCte})
      SELECT vid, chrom, CAST(pos AS INT) AS pos,
        CAST(2 * len(list_filter(geno, sa ->
          len(list_filter(sa, a -> a IS NULL)) = 0)) AS BIGINT) AS n_called,
        CAST(COALESCE(list_sum(list_transform(list_filter(geno, sa ->
          len(list_filter(sa, a -> a IS NULL)) = 0), sa ->
          len(list_filter(sa, a -> a = 0)))), 0) AS BIGINT) AS ac_ref,
        CAST(len(list_filter(geno, sa ->
          len(list_filter(sa, a -> a IS NULL)) > 0)) AS BIGINT)
          AS miss_calls
      FROM variants"""))

  // SNP-GDS round-trip (`seqGDS2SNP` → `seqSNP2GDS` file level,
  // reference R/Conversion.R:555-832): same one-code-per-call fold as
  // BED, different container — genotype codes re-expand to normalized
  // pairs, so geno_stats over the read-back equals the packed-fold
  // oracle directly.
  private def snpPath(dir: String): String =
    s"/tmp/graft_snpgds_${new java.io.File(dir).getName}.gds"

  private def ensureSnp(s: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val p = snpPath(dir)
    if (!new java.io.File(p).exists()) {
      val src = SynthGeno.variants(s, dir)
        .select(col("vid").as("variant_id"), col("chrom"),
          col("pos").cast("int").as("pos"),
          concat(lit("rs"), col("vid")).as("id"),
          lit("A,C").as("allele"), col("geno"))
      graft.sources.gds.SnpGds.write(src,
        (0 until SynthGeno.nSamples).map(i => s"S$i"), p)
    }
    p
  }

  private val q56 = Q("q56_snpgds_roundtrip",
    (s, dir) => {
      val p = ensureSnp(s, dir)
      val st = genoStats(col("geno"), lit(0))
      graft.sources.gds.SnpGds.read(s, p)
        .select(col("variant_id").as("vid"), col("chrom"),
          col("pos").cast("long").as("pos"),
          element_at(st, 2).as("n_called"),
          element_at(st, 3).as("ac_ref"),
          element_at(st, 5).as("miss_alleles"))
    },
    Some(s"""WITH variants AS (${SynthGeno.sqlCte})
      SELECT vid, chrom, pos,
        CAST(2 * len(list_filter(geno, sa ->
          len(list_filter(sa, a -> a IS NULL)) = 0)) AS BIGINT) AS n_called,
        CAST(COALESCE(list_sum(list_transform(list_filter(geno, sa ->
          len(list_filter(sa, a -> a IS NULL)) = 0), sa ->
          len(list_filter(sa, a -> a = 0)))), 0) AS BIGINT) AS ac_ref,
        CAST(2 * len(list_filter(geno, sa ->
          len(list_filter(sa, a -> a IS NULL)) > 0)) AS BIGINT)
          AS miss_alleles
      FROM variants"""))

  override def queries: Seq[Q] = Seq(q54, q56)
}
