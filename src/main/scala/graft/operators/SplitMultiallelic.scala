package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** bcftools-norm-style multiallelic split ("atomization"): a variant with
  * A = nall−1 alternate alleles becomes A biallelic records, one per alt
  * index k — every sample-allele recodes `a == k → 1`, any other called
  * allele `→ 0`, missing stays missing (the `bcftools norm -m-` genotype
  * rule). Biallelic inputs pass through as their single k = 1 record
  * unchanged in effect. The reference keeps multiallelic cubes intact
  * (SeqArray stores allele lists verbatim — `SURVEY.md` §1.3); this is
  * the companion operator pipelines run in FRONT of biallelic-only tools
  * (PLINK BED export, SNP-GDS, the packed 2-bit kernels), after which
  * the atomized cube flows through the existing biallelic paths
  * unchanged.
  *
  * Scale: a narrow explode — no shuffle, record count grows by
  * Σ(nall−2); the per-record work is one pass over the cube. */
object SplitMultiallelic {

  def apply(variants: DataFrame, genoCol: String = "geno",
      nallCol: String = "nall"): DataFrame =
    variants
      .withColumn("alt_index",
        explode(sequence(lit(1L), col(nallCol).cast("long") - 1L)))
      .withColumn(genoCol,
        transform(col(genoCol), sa => transform(sa, a =>
          when(a.isNull, lit(null).cast("long"))
            .when(a === col("alt_index"), lit(1L))
            .otherwise(lit(0L)))))
      .withColumn(nallCol, lit(2))
}
