package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a full MinHash signature in one
  * pass over a shingle-hash array: for each of H affine hash functions
  * h_i(x) = (a_i x + b_i) mod p, the minimum over the array.
  *
  * Why a custom Expression (SURVEY.md §2.8 preference order): the built-in
  * composition `array(array_min(transform(hs, ...)) x H)` walks the array H
  * times through interpreted higher-order-function lambdas and allocates H
  * intermediate arrays per row — ~100ns/element-op across tens of millions
  * of ops at bench scale. This expression is a single fused loop with
  * `doGenCode` (stays inside whole-stage codegen), zero intermediate
  * allocations, and identical arithmetic, so signatures are bit-identical
  * to the HOF formulation (DedupSpec asserts it).
  */
// IndexedSeq fields, not Array: case-class equality on Array is reference
// equality, so two instances built from the same hash family would never
// canonicalize (blocks subexpression elimination / exchange reuse)
case class MinHashSigExpr(child: Expression, as: IndexedSeq[Long], bs: IndexedSeq[Long], prime: Long)
    extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty)

  @transient private lazy val asA: Array[Long] = as.toArray
  @transient private lazy val bsA: Array[Long] = bs.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val h = as.length
    val mins = Array.fill(h)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < h) {
        val v = java.lang.Math.floorMod(x * asA(j) + bsA(j), prime)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", asA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bsA, "long[]")
    nullSafeCodeGen(
      ctx,
      ev,
      c => {
        val mins = ctx.freshName("mins")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val x = ctx.freshName("x")
        val v = ctx.freshName("v")
        val n = ctx.freshName("n")
        s"""
           |long[] $mins = new long[${as.length}];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |final int $n = $c.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  final long $x = $c.getLong($i);
           |  for (int $j = 0; $j < ${as.length}; $j++) {
           |    final long $v = java.lang.Math.floorMod($x * $aRef[$j] + $bRef[$j], ${prime}L);
           |    if ($v < $mins[$j]) $mins[$j] = $v;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
           |""".stripMargin
      })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {

  /** Column-API entry point. */
  def minhashSig(hashes: Column, as: Seq[Long], bs: Seq[Long], prime: Long): Column =
    ColumnBridge.column(
      MinHashSigExpr(ColumnBridge.expression(hashes), as.toIndexedSeq, bs.toIndexedSeq, prime))
}
