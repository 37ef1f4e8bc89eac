package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd signed-random-projection LSH bucket id over `ARRAY<BIGINT>`.
  *
  * Bit j of the bucket is the sign of the projection onto pseudo-
  * hyperplane (table, j) whose ±1 components come from a pure-integer
  * xorshift-multiply mixer over the key `(table·131 + j + 1, i)`
  * (1-based component index i). All arithmetic stays inside non-negative
  * 63-bit range (mod the Mersenne prime 2^31−1 after each multiply), so
  * the identical value is replayable in any SQL engine with plain BIGINT
  * ops — see `vectorfns.srpBucketSql`. The two xor-shift rounds between
  * the multiplies are load-bearing: a chain of multiply-mod rounds alone
  * is one LINEAR map mod M, which collapses the whole family to shifted
  * copies of a single ±1 sequence (at most M_small distinct hyperplanes —
  * the round-4 recall bug: 4 tables × 16 bits yielded only 68 distinct
  * patterns and ~0.10 recall@3). This family measures i.i.d.-grade:
  * balance 0.50, pairwise agreement 0.50 ± the binomial stdev.
  *
  * The declarative form runs one interpreted `aggregate(transform(...))`
  * HOF pair PER BIT; this expression computes every bit in one fused
  * loop over the vector inside whole-stage codegen, reading the ±1 signs
  * from a lazily-built per-operator cache (signs depend only on (table,
  * bits, i), never on the row). Null array → null; null elements
  * contribute 0.
  */
case class SrpBucket(child: Expression, bits: Int, table: Int)
    extends UnaryExpression {

  require(bits > 0 && bits < 31, "bits must be in [1,30]")
  // keeps (key·131071 + i)·2654435761 inside signed-64 for any realistic
  // dim, so the SQL replay never hits BIGINT overflow
  require(table >= 0 && table <= 128, "table must be in [0,128]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val acc = new Array[Long](bits)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = x.getLong(i)
        var j = 0
        while (j < bits) {
          acc(j) += (if (SrpBucket.signBit(table, j, i + 1L)) v else -v)
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
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      val bkt = ctx.freshName("bkt")
      val keys = ctx.freshName("keys")
      // sign cache: signs[i*bits + j] for component i < cached length.
      // Signs are constants of (table, bits, i) — computed once per
      // operator instance, reused for every row.
      val signs = ctx.addMutableState("byte[]", "srpSigns")
      val signN = ctx.addMutableState("int", "srpSignN")
      // hyperplane keys are compile-time constants of (table, bits);
      // the L suffix is required — Janino rejects bare int literals
      // that overflow (round-4 codegen bug)
      val keyInit =
        (0 until bits).map(j => s"${table * 131L + j + 1}L").mkString(", ")
      s"""
         |final long[] $keys = new long[] { $keyInit };
         |final int $n = $a.numElements();
         |if ($n > $signN) {
         |  $signs = new byte[$n * $bits];
         |  for (int $i = 0; $i < $n; $i++) {
         |    for (int $j = 0; $j < $bits; $j++) {
         |      long $h = (($keys[$j] * 131071L + ($i + 1L)) * 2654435761L)
         |        % 2147483647L;
         |      $h ^= $h >>> 15;
         |      $h = ($h * 40503L) % 2147483647L;
         |      $h ^= $h >>> 13;
         |      $signs[$i * $bits + $j] =
         |        (($h & 1L) == 1L) ? (byte) 1 : (byte) -1;
         |    }
         |  }
         |  $signN = $n;
         |}
         |final long[] $acc = new long[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  final long $v = $a.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    $acc[$j] += ($signs[$i * $bits + $j] > 0) ? $v : -$v;
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

object SrpBucket {
  /** True ⇒ +1 hyperplane component for (table, bit j, 1-based index i).
    * Kept on the companion so the interpreted path and tests share one
    * definition of the mixer. */
  def signBit(table: Int, j: Int, i1: Long): Boolean = {
    var h = ((table * 131L + j + 1) * 131071L + i1) * 2654435761L
    h %= 2147483647L
    h ^= h >>> 15
    h = (h * 40503L) % 2147483647L
    h ^= h >>> 13
    (h & 1L) == 1L
  }
}
