package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NFC_NORMALIZE(str) — Unicode canonical composition (NFC), the
  * standard first step of text canonicalization in training-data
  * pipelines: 'e' + U+0301 combining acute and the precomposed 'é' must
  * hash/dedup identically. Spark has no built-in normalizer function, so
  * this wraps `java.text.Normalizer` as a native expression WITH codegen
  * (one static call — stays inside the whole-stage span, so it can sit
  * in a 100-TB scan projection like any other string function).
  *
  * Already-normalized text (the overwhelming case — `isNormalized` is a
  * cheap quick-check scan) returns the input UTF8String without copying.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
