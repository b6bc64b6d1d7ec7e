package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode normalization
  * (java.text.Normalizer) — the first step of every serious corpus
  * cleaning pipeline (CCNet normalizes before LM scoring; dedup keyed on
  * un-normalized text misses composed/decomposed twins: "é" as U+00E9
  * vs "e"+U+0301 hash apart but render identically).
  *
  * Why an Expression and not a UDF: normalization sits in the middle of
  * corpus-scale projections; doGenCode emits one static call on the
  * referenced Form so the projection stays inside whole-stage codegen
  * (the BpeApplyExpr pattern — no Scala-function boxing per row).
  *
  * Forms: NFC (canonical compose — the storage/dedup canonical form,
  * oracle-checkable against DuckDB's nfc_normalize), NFD, NFKC
  * (compatibility compose — folds ligatures/width/circled digits, the
  * aggressive pre-tokenization form), NFKD.
  */
case class NormalizeExpr(child: Expression, form: String) extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unicode_normalize form must be one of NFC|NFD|NFKC|NFKD, got $form")

  @transient private lazy val javaForm: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"unicode_normalize requires string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(input.asInstanceOf[UTF8String].toString, javaForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("normForm", javaForm, classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(), $formRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)
}

object NormalizeExpr {

  /** Column-API entry point. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    ColumnBridge.column(NormalizeExpr(ColumnBridge.expression(text), form))
}
