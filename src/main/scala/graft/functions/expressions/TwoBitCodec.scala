package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** 2-bit packed REF-dosage codec — the reference's `seqGet2bGeno` export
  * (/root/reference/R/Methods.R:1224-1342, C kernel
  * src/Methods.cpp:1119-1213) and the PLINK BED storage convention
  * (`seqBED2GDS`/`seqGDS2BED`, R/Conversion.R:833-1447): per sample, the
  * number of REF alleles (0..2) packed 4 samples/byte, missing call = 3.
  * Packing is the ML-feature/array-interchange path; at 100 TB the packed
  * column is ~8× smaller than the nested allele arrays.
  */
case class Pack2bRefDosage(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(LongType, _), _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pack_2b(ARRAY<ARRAY<BIGINT>>); got ${t.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_2b"

  override protected def nullSafeEval(g: Any): Any =
    Pack2bRefDosage.pack(g.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g =>
      s"""${ev.value} = graft.functions.expressions.Pack2bRefDosage$$.MODULE$$
         |  .pack($g);
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Pack2bRefDosage =
    copy(child = c)
}

object Pack2bRefDosage {
  /** missing (any null allele / null call / dosage > 2) packs as 3. */
  def pack(geno: ArrayData): Array[Byte] = {
    val n = geno.numElements()
    val out = new Array[Byte]((n + 3) / 4)
    var i = 0
    while (i < n) {
      var code = 3
      if (!geno.isNullAt(i)) {
        val sa = geno.getArray(i)
        var d = 0
        var miss = false
        var j = 0
        while (j < sa.numElements()) {
          if (sa.isNullAt(j)) miss = true
          else if (sa.getLong(j) == 0L) d += 1
          j += 1
        }
        if (!miss && d <= 2) code = d
      }
      out(i >> 2) = (out(i >> 2) | (code << ((i & 3) << 1))).toByte
      i += 1
    }
    out
  }
}

/** Inverse of [[Pack2bRefDosage]]: packed bytes + sample count →
  * ARRAY<INT> REF dosages, code 3 → null. */
case class Unpack2bDosage(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unpack_2b(BINARY, INT); got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "unpack_2b"

  override protected def nullSafeEval(b: Any, n: Any): Any =
    Unpack2bDosage.unpack(b.asInstanceOf[Array[Byte]],
      n.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, n) =>
      s"""${ev.value} = graft.functions.expressions.Unpack2bDosage$$.MODULE$$
         |  .unpack($b, (int) $n);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Unpack2bDosage = copy(left = l, right = r)
}

object Unpack2bDosage {
  def unpack(bytes: Array[Byte], n: Int): GenericArrayData = {
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val code = (bytes(i >> 2) >>> ((i & 3) << 1)) & 3
      out(i) = if (code == 3) null else java.lang.Integer.valueOf(code)
      i += 1
    }
    new GenericArrayData(out)
  }
}
