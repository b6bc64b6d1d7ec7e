package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression applying a trained BPE merge list to one
  * word — the encode side of [[graft.operators.TextOps.bpeMerges]], and
  * the standard open-vocabulary property of BPE: ANY word segments, seen
  * in training or not, because merging starts from characters.
  *
  * Algorithm (the reference tokenizer rule): repeatedly find the adjacent
  * symbol pair with the LOWEST merge rank present in the word and merge
  * all its occurrences greedy-leftmost; stop when no adjacent pair is in
  * the merge table. Applying ranks in order reproduces the training
  * partition for in-vocabulary words.
  *
  * Why an Expression: segmentation is per-word scalar work in the middle
  * of corpus-scale scans; a driver-side map would mean collect, and a HOF
  * chain would interpret K nested folds per word. doGenCode emits a single
  * call on the referenced expression object, so the projection stays
  * inside whole-stage codegen with one virtual call per row (the
  * compiled-regex pattern RegExpExtract uses).
  */
// IndexedSeq fields, not Array: case-class equality on Array is reference
// equality, and two structurally identical instances (same merge list
// constructed twice) would never canonicalize — blocking Catalyst
// subexpression elimination and exchange reuse
case class BpeApplyExpr(child: Expression, lefts: IndexedSeq[String], rights: IndexedSeq[String])
    extends UnaryExpression {

  require(lefts.length == rights.length)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"bpe_apply requires string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  @transient private lazy val rankOf: Map[(String, String), Int] =
    lefts.zip(rights).zipWithIndex.map { case (p, i) => p -> i }.toMap

  /** Public so generated code can call it via an addReferenceObj handle. */
  def applyWord(w: UTF8String): ArrayData = {
    val word = w.toString
    if (word.isEmpty) return new GenericArrayData(Array.empty[Any])
    // split by CODE POINT, not Java char: a supplementary-plane character
    // (emoji, rare CJK) is two chars, and lone surrogates re-encode as
    // replacement bytes — breaking the subwords-reassemble-to-word
    // invariant for any non-BMP text
    val syms0 = scala.collection.mutable.ArrayBuffer.empty[String]
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val n = Character.charCount(cp)
      syms0 += word.substring(ci, ci + n)
      ci += n
    }
    var syms = syms0
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        rankOf.get((syms(i), syms(i + 1))) match {
          case Some(rk) if rk < bestRank => bestRank = rk
          case _ =>
        }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val l = lefts(bestRank)
        val r = rights(bestRank)
        val next = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            next += l + r
            j += 2
          } else {
            next += syms(j)
            j += 1
          }
        }
        syms = next
        if (syms.length < 2) done = true
      }
    }
    new GenericArrayData(syms.map(s => UTF8String.fromString(s): Any).toArray)
  }

  override def nullSafeEval(input: Any): Any = applyWord(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this, classOf[BpeApplyExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.applyWord($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyExpr =
    copy(child = newChild)
}

object BpeApplyExpr {

  /** Column-API entry point over a trained merge list. */
  def bpeApply(word: Column, merges: Seq[graft.operators.TextOps.BpeMerge]): Column = {
    val ranked = merges.sortBy(_.rank)
    ColumnBridge.column(
      BpeApplyExpr(
        ColumnBridge.expression(word),
        ranked.map(_.left).toIndexedSeq,
        ranked.map(_.right).toIndexedSeq))
  }
}
