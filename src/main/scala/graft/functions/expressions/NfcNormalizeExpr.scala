package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization — the text-cleaning pass every
  * large-corpus pipeline runs before dedup/tokenization (decomposed
  * e + U+0301 and composed é are the SAME text to a tokenizer but
  * different bytes to an exact-hash dedup; normalizing first is what
  * makes content-addressed dedup honest). Fused codegen wrapper over
  * the JDK's `java.text.Normalizer` (Unicode canonical composition —
  * the same algorithm DuckDB's utf8proc `nfc_normalize` implements,
  * which is what makes an exact cross-engine oracle possible).
  * Reference-adjacent: SeqArray's string annotations pass through
  * untouched bytes; a Spark-side corpus engine owns this step. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize(STRING); got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(t: Any): Any =
    NfcNormalizeExpr.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = graft.functions.expressions.NfcNormalizeExpr$$
         |  .MODULE$$.nfc($t);
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr =
    copy(child = c)
}

object NfcNormalizeExpr {
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    // isNormalized is a cheap scan; the common (already-NFC) case
    // allocates nothing and returns the input bytes untouched
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}
