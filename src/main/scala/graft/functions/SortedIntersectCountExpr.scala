package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** |A ∩ B| of two SORTED, DISTINCT, null-free string arrays by a single
  * merge pass — the exact value of `size(array_intersect(a, b))` under
  * that precondition, without building a per-row hash set or
  * materializing the intersection array only to take its length.
  *
  * Why it exists (round 16, guide §1.2 step 2 "per-task work"): PPJoin's
  * verify stage scores every candidate pair with one set-intersection
  * size. `array_intersect` is the right generic tool but pays, PER PAIR,
  * an OpenHashSet build over one side plus an output array the caller
  * immediately discards — and each document participates in many pairs,
  * so the same side is re-hashed tens of times. Sorting each document's
  * array ONCE (in the pair-bounded, checkpointed array frame) converts
  * every pair-score into an allocation-free two-pointer merge inside
  * whole-stage codegen. Measured at sf0.1: the intersect term of the
  * verify stage 1.0 s → see OPTIMIZATION_r16.md.
  *
  * PRECONDITION, caller-owned: both arrays sorted ascending by Spark's
  * binary string order (`sort_array` / UTF8String.compareTo), distinct,
  * no null elements. The shingle arrays are `array_distinct` outputs of
  * non-null `concat_ws` grams, sorted at the array-frame build. On
  * unsorted input the count is an undercount — DedupSpec pins agreement
  * with `size(array_intersect)` on the operator's real frames, and the
  * x106/x24-family oracles pin the end-to-end values.
  *
  * Null semantics: null if either ARRAY is null (matching
  * size(array_intersect) under the no-null-elements precondition).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count requires two array<string> inputs, got $other")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val c = ctx.freshName("c")
        val acc = ctx.freshName("acc")
        s"""
           |final int $na = $a.numElements();
           |final int $nb = $b.numElements();
           |int $i = 0; int $j = 0; long $acc = 0L;
           |while ($i < $na && $j < $nb) {
           |  final int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |  if ($c == 0) { $acc++; $i++; $j++; }
           |  else if ($c < 0) { $i++; } else { $j++; }
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpr {
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCountExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
