package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused per-variant association kernels over a collapsed-dosage array
  * (`d ARRAY<BIGINT>`, null = missing sample) with per-sample weight
  * vectors carried as ONE array literal each.
  *
  * These replace the statically-unrolled per-sample-ordinal sum trees
  * (the `Σ_s f(element_at(d, s+1))` reduce pattern) that grew the
  * ANALYZED plan O(cohort width) — fine at the 8-sample fixture, an
  * analyzer/codegen blow-up at biobank width (the round-9 verdict's
  * "unrolled-reduce class"; same failure mode the S²-literal pair fans
  * had before `graft.functions.pairs`). Each kernel is O(1) plan nodes
  * at ANY sample count: the weights are a single `Literal(ArrayData)`
  * child and the per-sample loop lives in generated code, exactly like
  * the reference's per-variant C kernels (SeqArray src/Methods.cpp:
  * 122-801 iterate samples inside one native loop; the cohort width
  * never appears in the call graph).
  *
  * Null convention: a null dosage cell is a missing sample — it joins
  * no called-sample sum; "coalesce" sums (x taken as 0 when missing)
  * are identical to called-only sums because the missing term is 0.
  * All outputs are exact BIGINTs (the repo's oracle discipline: integer
  * sums, one final division at presentation).
  */
private[graft] trait DosageWeightInput { self: Expression =>
  protected def longArrayOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
}

/** `[n, sx, sxx, sw, swx, sww]` over CALLED samples of dosage `d` with
  * weight vector `w` (one literal ARRAY<BIGINT>, one entry per sample):
  * n = #called, sx = Σx, sxx = Σx², sw = Σw, swx = Σw·x, sww = Σw² —
  * the sufficient statistics of every 1-covariate score test. Samples
  * beyond min(|d|, |w|) are ignored (the unrolled trees this replaces
  * summed ordinals 0 until |w|). */
case class DosageWeightedStats(left: Expression, right: Expression)
    extends BinaryExpression with DosageWeightInput {

  override def checkInputDataTypes(): TypeCheckResult =
    if (longArrayOk(left) && longArrayOk(right))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dosage_weighted_stats(ARRAY<BIGINT>, ARRAY<BIGINT>); got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dosage_weighted_stats"

  override protected def nullSafeEval(dAny: Any, wAny: Any): Any = {
    val d = dAny.asInstanceOf[ArrayData]
    val w = wAny.asInstanceOf[ArrayData]
    var n = 0L; var sx = 0L; var sxx = 0L
    var sw = 0L; var swx = 0L; var sww = 0L
    val m = math.min(d.numElements(), w.numElements())
    var i = 0
    while (i < m) {
      if (!d.isNullAt(i) && !w.isNullAt(i)) {
        val x = d.getLong(i); val wi = w.getLong(i)
        n += 1; sx += x; sxx += x * x
        sw += wi; swx += wi * x; sww += wi * wi
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(n, sx, sxx, sw, swx, sww))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, w) => {
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val x = ctx.freshName("x"); val wi = ctx.freshName("wi")
      val n = ctx.freshName("n"); val sx = ctx.freshName("sx")
      val sxx = ctx.freshName("sxx"); val sw = ctx.freshName("sw")
      val swx = ctx.freshName("swx"); val sww = ctx.freshName("sww")
      s"""
         |long $n = 0L, $sx = 0L, $sxx = 0L, $sw = 0L, $swx = 0L, $sww = 0L;
         |int $m = Math.min($d.numElements(), $w.numElements());
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($d.isNullAt($i) || $w.isNullAt($i)) continue;
         |  long $x = $d.getLong($i); long $wi = $w.getLong($i);
         |  $n++; $sx += $x; $sxx += $x * $x;
         |  $sw += $wi; $swx += $wi * $x; $sww += $wi * $wi;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray(
         |    new long[] {$n, $sx, $sxx, $sw, $swx, $sww});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DosageWeightedStats =
    copy(left = l, right = r)
}

/** Two-weight sufficient statistics `[n, sx, sxx, s1, sx1, s11, s2,
  * sx2, s22, s12]` over called samples — the 3×3 normal-equation
  * inputs of the covariate-adjusted GWAS (y ~ β₀ + β_g·x + β_z·z):
  * s1/s2 sum the weights, sx1/sx2 the cross terms with the dosage,
  * s11/s22 the squares and s12 = Σw1·w2. */
case class DosageTwoWeightStats(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with DosageWeightInput {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(longArrayOk))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "dosage_two_weight_stats(ARRAY<BIGINT> ×3); got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dosage_two_weight_stats"

  override protected def nullSafeEval(dAny: Any, aAny: Any, bAny: Any): Any = {
    val d = dAny.asInstanceOf[ArrayData]
    val w1 = aAny.asInstanceOf[ArrayData]
    val w2 = bAny.asInstanceOf[ArrayData]
    var n = 0L; var sx = 0L; var sxx = 0L
    var s1 = 0L; var sx1 = 0L; var s11 = 0L
    var s2 = 0L; var sx2 = 0L; var s22 = 0L; var s12 = 0L
    val m = math.min(d.numElements(),
      math.min(w1.numElements(), w2.numElements()))
    var i = 0
    while (i < m) {
      if (!d.isNullAt(i) && !w1.isNullAt(i) && !w2.isNullAt(i)) {
        val x = d.getLong(i); val a = w1.getLong(i); val b = w2.getLong(i)
        n += 1; sx += x; sxx += x * x
        s1 += a; sx1 += a * x; s11 += a * a
        s2 += b; sx2 += b * x; s22 += b * b; s12 += a * b
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      Array(n, sx, sxx, s1, sx1, s11, s2, sx2, s22, s12))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, w1, w2) => {
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val x = ctx.freshName("x"); val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      s"""
         |long[] $acc = new long[10];
         |int $m = Math.min($d.numElements(),
         |  Math.min($w1.numElements(), $w2.numElements()));
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($d.isNullAt($i) || $w1.isNullAt($i) || $w2.isNullAt($i))
         |    continue;
         |  long $x = $d.getLong($i);
         |  long $a = $w1.getLong($i); long $b = $w2.getLong($i);
         |  $acc[0]++; $acc[1] += $x; $acc[2] += $x * $x;
         |  $acc[3] += $a; $acc[4] += $a * $x; $acc[5] += $a * $a;
         |  $acc[6] += $b; $acc[7] += $b * $x; $acc[8] += $b * $b;
         |  $acc[9] += $a * $b;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): DosageTwoWeightStats =
    copy(first = f, second = s, third = t)
}

/** Per-mask weighted sums `out[m] = Σ_s masks[m][s] · coalesce(d[s], 0)`
  * — K weighted contrasts of one dosage vector in a single pass (the
  * permutation-test kernel: each mask is one permuted label set).
  * `masks` is ONE literal ARRAY<ARRAY<BIGINT>>; null dosage contributes
  * 0 to every mask alike (the permutation-invariance contract). */
case class DosageMaskedSums(left: Expression, right: Expression)
    extends BinaryExpression with DosageWeightInput {

  override def checkInputDataTypes(): TypeCheckResult = {
    val masksOk = right.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    if (longArrayOk(left) && masksOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dosage_masked_sums(ARRAY<BIGINT>, ARRAY<ARRAY<BIGINT>>); got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dosage_masked_sums"

  override protected def nullSafeEval(dAny: Any, mAny: Any): Any =
    DosageMaskedSums.eval(dAny.asInstanceOf[ArrayData],
      mAny.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, masks) =>
      s"""${ev.value} = graft.functions.expressions.DosageMaskedSums$$
         |  .MODULE$$.eval($d, $masks);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DosageMaskedSums =
    copy(left = l, right = r)
}

object DosageMaskedSums {
  def eval(d: ArrayData, masks: ArrayData): ArrayData = {
    val k = masks.numElements()
    val out = new Array[Long](k)
    var m = 0
    while (m < k) {
      if (!masks.isNullAt(m)) {
        val w = masks.getArray(m)
        val n = math.min(d.numElements(), w.numElements())
        var s = 0L
        var i = 0
        while (i < n) {
          if (!d.isNullAt(i) && !w.isNullAt(i)) s += w.getLong(i) * d.getLong(i)
          i += 1
        }
        out(m) = s
      }
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Fused [[graft.operators.PopGen.hapAlt]]: per (sample, ploidy-slot)
  * haplotype alt indicators in one loop — 1/0 for an alt/ref allele of
  * a PHASED sample, null when the sample is unphased or the allele
  * missing/short. Replaces the N·ploidy-term `array(...)` unroll (O(1)
  * plan nodes at any cohort width); `ploidy` is a literal. */
case class HapAltExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with GenoInput {

  override def checkInputDataTypes(): TypeCheckResult = {
    val phasedOk = second.dataType match {
      case ArrayType(BooleanType, _) => true
      case _ => false
    }
    if (genoOk(first) && phasedOk && third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "hap_alt(ARRAY<ARRAY<BIGINT>>, ARRAY<BOOLEAN>, INT); got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "hap_alt"

  override protected def nullSafeEval(gAny: Any, pAny: Any, plAny: Any): Any =
    HapAltExpr.eval(gAny.asInstanceOf[ArrayData],
      pAny.asInstanceOf[ArrayData], plAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, p, pl) =>
      s"""${ev.value} = graft.functions.expressions.HapAltExpr$$.MODULE$$
         |  .eval($g, $p, $pl);
       """.stripMargin)

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): HapAltExpr =
    copy(first = f, second = s, third = t)
}

object HapAltExpr {
  def eval(geno: ArrayData, phased: ArrayData, ploidy: Int): ArrayData = {
    val nS = geno.numElements()
    val out = new Array[Any](nS * ploidy)
    var s = 0
    while (s < nS) {
      val isPhased = s < phased.numElements() && !phased.isNullAt(s) &&
        phased.getBoolean(s)
      val sa = if (geno.isNullAt(s)) null else geno.getArray(s)
      var p = 0
      while (p < ploidy) {
        val slot =
          if (!isPhased || sa == null || p >= sa.numElements() ||
            sa.isNullAt(p)) null
          else java.lang.Long.valueOf(if (sa.getLong(p) != 0L) 1L else 0L)
        out(s * ploidy + p) = slot
        p += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}
