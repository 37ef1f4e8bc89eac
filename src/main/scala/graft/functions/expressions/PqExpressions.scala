package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen kernels for the product-quantization path (q105) and the
  * windowed-LD path (q108). The declarative HOF twins (kept in
  * [[graft.functions.vectorfns]] / the query oracles) are interpreted
  * per row — CodegenFallback — and dominated both queries at sf0.1
  * (encode: M·K·DSUB multiply-subtracts per corpus row; scan: a 64-dim
  * L2 per (corpus, probe) pair). Each kernel is one fused loop inside
  * whole-stage codegen.
  *
  * Reference analog: the hand-SIMD count/dosage kernels the reference
  * keeps for exactly this reason (/root/reference/src/vectorization.h:
  * 304-438).
  */

/** Integer squared-L2 distance of two ARRAY<BIGINT> over their overlap;
  * null elements are skipped (treated as matching — they contribute 0). */
case class L2DistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "l2_i64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getLong(i) - y.getLong(i)
        s += d * d
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    final long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistLong =
    copy(left = newLeft, right = newRight)
}

/** PQ encoder: `qv` (ARRAY<BIGINT>, the full vector) against codebook
  * `cbs` (ARRAY<ARRAY<BIGINT>>, K full-width codewords) → ARRAY<INT> of
  * `m` codes, code `sub` = the codeword index minimizing the integer
  * squared-L2 over dims [sub·dsub, (sub+1)·dsub); ties break to the
  * smallest index (first minimum — the rule the SQL oracle replays via
  * list_position-of-min). Out-of-range dims contribute 0 (never happens
  * with a well-formed codebook; the guard keeps eval total). */
case class PqEncode(left: Expression, right: Expression, m: Int, dsub: Int)
    extends BinaryExpression {

  require(m > 0 && dsub > 0, "m and dsub must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, ARRAY<ARRAY<BIGINT>>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val k = cb.numElements()
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < k) {
        val cw = cb.getArray(c)
        var s = 0L
        var i = sub * dsub
        val end = i + dsub
        while (i < end) {
          val x = if (i < v.numElements() && !v.isNullAt(i)) v.getLong(i)
            else 0L
          val y = if (i < cw.numElements() && !cw.isNullAt(i)) cw.getLong(i)
            else 0L
          val d = x - y
          s += d * d
          i += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      out(sub) = best
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("out")
      val sub = ctx.freshName("sub")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val k = ctx.freshName("k")
      val cw = ctx.freshName("cw")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |final int $k = $b.numElements();
         |final int[] $out = new int[$m];
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  int $best = 0;
         |  long $bestD = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    final org.apache.spark.sql.catalyst.util.ArrayData $cw =
         |      $b.getArray($c);
         |    long $s = 0L;
         |    final int $end = ($sub + 1) * $dsub;
         |    for (int $i = $sub * $dsub; $i < $end; $i++) {
         |      final long $x =
         |        ($i < $a.numElements() && !$a.isNullAt($i))
         |          ? $a.getLong($i) : 0L;
         |      final long $y =
         |        ($i < $cw.numElements() && !$cw.isNullAt($i))
         |          ? $cw.getLong($i) : 0L;
         |      final long $d = $x - $y;
         |      $s += $d * $d;
         |    }
         |    if ($s < $bestD) { $bestD = $s; $best = $c; }
         |  }
         |  $out[$sub] = $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** ADC lookup-sum: `dtab` (ARRAY<ARRAY<BIGINT>>, per-subspace distance
  * rows) indexed by `codes` (ARRAY<INT>) → Σ_sub dtab[sub][codes[sub]].
  * Out-of-range or null cells contribute 0. */
case class PqAdcLookup(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(LongType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<ARRAY<BIGINT>>, ARRAY<INT>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val dtab = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val n = math.min(dtab.numElements(), codes.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!dtab.isNullAt(i) && !codes.isNullAt(i)) {
        val row = dtab.getArray(i)
        val c = codes.getInt(i)
        if (c >= 0 && c < row.numElements() && !row.isNullAt(c))
          s += row.getLong(c)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    final org.apache.spark.sql.catalyst.util.ArrayData $row =
         |      $a.getArray($i);
         |    final int $c = $b.getInt($i);
         |    if ($c >= 0 && $c < $row.numElements() && !$row.isNullAt($c)) {
         |      $s += $row.getLong($c);
         |    }
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcLookup =
    copy(left = newLeft, right = newRight)
}

/** One-pass paired-dosage sums for LD: two nullable ARRAY<BIGINT> dosage
  * vectors → ARRAY<BIGINT> [n, sx, sy, sxy, sxx, syy] over the sample
  * indices where BOTH are non-null (pairwise-complete observations).
  * Replaces five interpreted `aggregate` HOFs plus a zip_with+filter
  * per variant pair in the q108 hot loop. */
case class LdPairStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ld_pair_stats"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val len = math.min(x.numElements(), y.numElements())
    var n = 0L; var sx = 0L; var sy = 0L
    var sxy = 0L; var sxx = 0L; var syy = 0L
    var i = 0
    while (i < len) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val u = x.getLong(i); val v = y.getLong(i)
        n += 1; sx += u; sy += v
        sxy += u * v; sxx += u * u; syy += v * v
      }
      i += 1
    }
    new GenericArrayData(Array(n, sx, sy, sxy, sxx, syy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val n = ctx.freshName("n")
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      val sxy = ctx.freshName("sxy")
      val sxx = ctx.freshName("sxx")
      val syy = ctx.freshName("syy")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
         |final int $len = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $n = 0L, $sx = 0L, $sy = 0L, $sxy = 0L, $sxx = 0L, $syy = 0L;
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    final long $u = $a.getLong($i);
         |    final long $v = $b.getLong($i);
         |    $n++; $sx += $u; $sy += $v;
         |    $sxy += $u * $v; $sxx += $u * $u; $syy += $v * $v;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new long[] {$n, $sx, $sy, $sxy, $sxx, $syy});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LdPairStats =
    copy(left = newLeft, right = newRight)
}
