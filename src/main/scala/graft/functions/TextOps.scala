package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression.
  *
  * A crawl corpus mixes composed ("é") and decomposed ("e" + U+0301)
  * encodings of the same text; every downstream exact operation — dedup
  * fingerprints, token counts, vocabulary joins, PII patterns — silently
  * fragments unless the corpus is normalized first, so normalization is
  * the FIRST pass of a text pipeline and must run at scan speed. The JDK
  * normalizer (`java.text.Normalizer`, pure JDK public API) does the work;
  * wrapping it as an Expression keeps the pass inside whole-stage codegen
  * (no UDF boundary, no extra row copy).
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"normalize_nfc expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NormalizeNfc.nfc(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"UTF8String.fromString(graft.functions.NormalizeNfc.nfc($s.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeNfc = copy(child = newChild)
}

object NormalizeNfc {
  /** Fast path: `isNormalized` is a cheap scan that avoids allocating for
    * the (overwhelmingly common) already-composed input. */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Column API entry point. */
  def apply(c: Column): Column =
    GraftSqlBridge.column(NormalizeNfc(GraftSqlBridge.expression(c)))
}
