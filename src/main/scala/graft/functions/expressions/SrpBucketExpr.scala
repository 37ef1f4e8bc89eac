package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd signed-random-projection LSH bucket id over `ARRAY<BIGINT>`.
  *
  * Bit j of the bucket is the sign of the projection onto pseudo-
  * hyperplane (table, j) whose ±1 components come from the pure-integer
  * mixer `(seed_j + i * 40503) % 97 % 2` (1-based component index i —
  * replayable in any SQL engine, see `vectorfns.srpBucketSql`).
  *
  * The declarative form runs one interpreted `aggregate(transform(...))`
  * HOF pair PER BIT (16 bits × 4 tables = 64 interpreted passes per row
  * in the ANN queries); this expression computes every bit in one fused
  * loop over the vector — bits×dims multiply-adds inside whole-stage
  * codegen. Null array → null; null elements contribute 0.
  */
case class SrpBucket(child: Expression, bits: Int, table: Int)
    extends UnaryExpression {

  require(bits > 0 && bits < 31, "bits must be in [1,30]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"

  private def seedOf(j: Int): Long = (table * 131L + j + 1) * 2654435761L

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val acc = new Array[Long](bits)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = x.getLong(i)
        val i1 = i + 1L
        var j = 0
        while (j < bits) {
          val sign = if ((seedOf(j) + i1 * 40503L) % 97 % 2 == 0) 1L else -1L
          acc(j) += v * sign
          j += 1
        }
      }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < bits) {
      if (acc(j) >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      val bkt = ctx.freshName("bkt")
      val seeds = ctx.freshName("seeds")
      // hyperplane seeds are compile-time constants of (table, bits);
      // the L suffix is required — they exceed Int.MaxValue and Janino
      // rejects bare int literals that overflow (round-4 codegen bug)
      val seedInit = (0 until bits).map(j => s"${seedOf(j)}L").mkString(", ")
      s"""
         |final long[] $seeds = new long[] { $seedInit };
         |final long[] $acc = new long[$bits];
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  final long $v = $a.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    $acc[$j] += (($seeds[$j] + ($i + 1L) * 40503L) % 97 % 2 == 0)
         |      ? $v : -$v;
         |  }
         |}
         |long $bkt = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($acc[$j] >= 0) $bkt |= 1L << $j;
         |}
         |${ev.value} = $bkt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : SrpBucket = copy(child = newChild)
}
