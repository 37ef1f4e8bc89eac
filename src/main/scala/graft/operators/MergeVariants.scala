package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Allele-set union + genotype index remap — the core of the reference's
  * `seqMerge` variant-union mode (/root/reference/R/UtilsMerge.R:258-1006;
  * C remap kernels src/FileMerge.cpp:56-458, esp. SEQ_MergeGeno's per-file
  * allele-index translation at :110-229).
  *
  * When two files carry the same variant with differently-ordered (or
  * partially overlapping) ALT lists, the merged file's allele list is the
  * left list followed by right-only alleles, and every genotype allele
  * index from either file must be re-coded into the merged list. These are
  * pure per-row expressions — the merge itself is an ordinary outer join,
  * so Catalyst plans/shuffles it like any relational join.
  */
object MergeVariants {
  import org.apache.spark.sql.graft.Bridge
  import graft.functions.expressions.{AlleleUnionExpr, RemapGenoExpr}

  /** Union of two "REF,ALT1,…" strings: left order preserved, right-only
    * alleles appended in right order. Assumes equal REF (the reference
    * requires it — merge keys include the allele string otherwise).
    * Codegen expression; see [[alleleUnionHof]] for the declarative form. */
  def alleleUnion(a: Column, b: Column): Column =
    Bridge.column(AlleleUnionExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Re-code a genotype cube (ARRAY<ARRAY<allele idx>>) from `oldAlleles`
    * ("REF,ALT…" of its source file) into `newAlleles` (merged). Null
    * allele (missing call) stays null; 0-based indices. Codegen expression;
    * see [[remapGenoHof]]. */
  def remapGeno(geno: Column, oldAlleles: Column, newAlleles: Column): Column =
    Bridge.column(RemapGenoExpr(Bridge.expression(geno),
      Bridge.expression(oldAlleles), Bridge.expression(newAlleles)))

  // ---- declarative reference implementations (differential oracles) ------

  def alleleUnionHof(a: Column, b: Column): Column = {
    val as = split(a, ",")
    val bs = split(b, ",")
    array_join(concat(as, filter(bs, x => !array_contains(as, x))), ",")
  }

  def remapGenoHof(geno: Column, oldAlleles: Column, newAlleles: Column): Column = {
    val os = split(oldAlleles, ",")
    val ns = split(newAlleles, ",")
    transform(geno, sa =>
      transform(sa, x =>
        (array_position(ns, element_at(os, (x + 1).cast("int"))) - 1)
          .cast("long")))
  }
}
