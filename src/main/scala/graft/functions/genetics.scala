package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Genotype-array column functions re-expressing the reference's per-variant
  * kernels (SeqArray `src/Methods.cpp`) as Spark higher-order-function
  * compositions — declarative, so Catalyst fuses them into one scan with
  * column pruning, and partial aggregation mirrors the reference's
  * `.combine="+"` worker merge (`R/Utilities.R:1008-1124`).
  *
  * Genotype representation (SURVEY.md §1.5): `geno` is `ARRAY<ARRAY<LONG>>` —
  * outer index = sample ordinal (aligned to the broadcastable samples table),
  * inner = ploidy allele indices (0 = REF, k>0 = k-th ALT). A null allele is
  * a missing call — the reference's 0xFF raw / NA_INTEGER convention
  * (`src/Index.h:56`, `src/Methods.cpp:122-136`).
  */
object genetics {

  /** All allele calls of a variant, ploidy-flattened. */
  def flatAlleles(geno: Column): Column = flatten(geno)

  /** Number of non-missing allele calls (denominator of allele frequency;
    * reference `FC_AF_Ref`, `src/Methods.cpp:409-425`). */
  def nCalledAlleles(geno: Column): Column =
    size(filter(flatten(geno), a => a.isNotNull))

  /** Count of calls equal to allele index `k` (reference `seqAlleleCount`,
    * `src/Methods.cpp:613-801`). */
  def alleleCount(geno: Column, k: Column): Column =
    size(filter(flatten(geno), a => a === k))

  /** Frequency of allele `k` among called alleles; null when nothing called
    * (reference `seqAlleleFreq(ref.allele=k)`, `R/Methods.R:905-1021`). */
  def alleleFreq(geno: Column, k: Column): Column = {
    val called = nCalledAlleles(geno)
    when(called > 0, alleleCount(geno, k).cast("double") / called)
  }

  /** Fraction of missing allele calls over ploidy×samples (reference
    * `seqMissing(per.variant=TRUE)`, `FC_Missing_PerVariant`,
    * `src/Methods.cpp:122-293`). */
  def missingRate(geno: Column): Column = {
    val total = size(flatten(geno))
    when(total > 0, (total - nCalledAlleles(geno)).cast("double") / total)
  }

  /** True when a single sample's call has any missing allele. */
  def sampleMissing(sampleAlleles: Column): Column =
    exists(sampleAlleles, a => a.isNull)

  /** Per-sample count of non-REF alleles; null for samples with a missing
    * allele (reference `$dosage_alt`, `src/GetData.cpp:311-410`). */
  def dosageAlt(geno: Column): Column =
    transform(geno, sa =>
      when(exists(sa, a => a.isNull), lit(null))
        .otherwise(size(filter(sa, a => a =!= 0))))

  /** Per-sample count of REF alleles; null on missing (reference `$dosage`). */
  def dosageRef(geno: Column): Column =
    transform(geno, sa =>
      when(exists(sa, a => a.isNull), lit(null))
        .otherwise(size(filter(sa, a => a === 0))))

  /** One sample's VCF GT string, any ploidy: "0/1", "1|2", "./." — missing
    * allele renders ".", separator by phase (reference GT formatters,
    * `src/ConvGDS2VCF.cpp:571-989`, `R/Methods-SeqVarGDSClass.R:190-199`). */
  def gtString(sampleAlleles: Column, phased: Column): Column = {
    val sep = when(phased, lit("|")).otherwise(lit("/"))
    val strs = transform(sampleAlleles, a =>
      coalesce(a.cast("string"), lit(".")))
    aggregate(strs, lit(""),
      (acc, x) => when(acc === "", x).otherwise(concat(acc, sep, x)))
  }

  /** Number of alleles at a variant from the "REF,ALT1,…" string (reference
    * `$num_allele` / `GetNumOfAllele`, `src/GetData.cpp:619-634`). */
  def numAllele(alleleStr: Column): Column = size(split(alleleStr, ","))

  /** REF / ALT split of the comma-joined allele string (reference `$ref` /
    * `$alt`, `src/GetData.cpp:637-680`). */
  def refAllele(alleleStr: Column): Column =
    element_at(split(alleleStr, ","), 1)
  def altAlleles(alleleStr: Column): Column = {
    val parts = split(alleleStr, ",")
    slice(parts, lit(2), size(parts) - 1)
  }
}
