package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Native Catalyst expression computing a full PQ code vector in one pass:
  * for each of m subspaces, the argmin centroid by squared L2 distance,
  * scored as |c|^2 - 2 sv.c (|sv|^2 is constant within a subspace so it
  * never needs computing).
  *
  * Why a custom Expression (SURVEY.md §2.8 preference order): the built-in
  * composition — per subspace, an array of ksub literal-expanded distance
  * expressions fed through array_position(array_min(...)) under a lambda
  * binding — is ~10k interpreted expression nodes per row (HOFs never
  * enter whole-stage codegen), measured at ~3 s for a 5k-row encode pass
  * where the arithmetic itself is ~1k fused multiply-adds. This expression
  * is a single generated loop (doGenCode) over a flattened codebook
  * reference; the interpreted fallback runs the identical loop.
  *
  * Arithmetic parity with training ([[graft.operators.Similarity.pqCodebooks]]):
  * the score is cn2[j] - 2.0 * dot(sv, c_j) with dot folded sequentially in
  * element order from 0.0 (the DotProductExpr order) and cn2 precomputed by
  * the same fold, so encode reproduces the training partition bit-exactly;
  * ties keep the smallest code, matching training's min(struct(d, code)).
  *
  * @param flat   codebooks flattened [sub][code][dim/m] in row-major order
  * @param cn2    |c|^2 per flattened [sub][code]
  * @param counts centroids per subspace (ragged when the corpus had fewer
  *               rows than ksub)
  * @param dsub   subvector width (dim / m)
  */
// IndexedSeq fields, not Array: case-class equality on Array is reference
// equality, so two structurally identical instances (the same codebook
// flattened twice) would never compare equal — blocking Catalyst
// subexpression elimination and exchange-reuse canonicalization. The hot
// loops below run over private array views, so per-row cost is unchanged.
case class PqEncodeExpr(child: Expression, flat: IndexedSeq[Float], cn2: IndexedSeq[Double], counts: IndexedSeq[Int], dsub: Int)
    extends UnaryExpression {

  require(counts.nonEmpty && counts.forall(_ >= 1) && dsub >= 1)
  require(flat.length == counts.sum * dsub && cn2.length == counts.sum)

  @transient private lazy val flatA: Array[Float] = flat.toArray
  @transient private lazy val cn2A: Array[Double] = cn2.toArray
  @transient private lazy val countsA: Array[Int] = counts.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"pq_encode requires array<float|double>, got $other")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  // null on short/null-element arrays even when the CHILD is non-nullable:
  // without this override ev.isNull is the FalseLiteral and the generated
  // `false = true;` does not compile (same rationale as DotProductExpr)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  // lazy: child.dataType is only callable after analysis resolves it
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private val m = counts.length

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < m * dsub) return null
    val codes = new Array[Byte](m)
    var off = 0 // flattened centroid cursor: codebooks are stored back to back
    var s = 0
    while (s < m) {
      var best = Double.MaxValue
      var bestJ = 0
      var j = 0
      while (j < countsA(s)) {
        var dot = 0.0
        var t = 0
        while (t < dsub) {
          val x = if (arr.isNullAt(s * dsub + t)) return null
          else if (isFloat) arr.getFloat(s * dsub + t).toDouble
          else arr.getDouble(s * dsub + t)
          dot += x * flatA((off + j) * dsub + t).toDouble
          t += 1
        }
        val d = cn2A(off + j) - 2.0 * dot
        if (d < best) { best = d; bestJ = j }
        j += 1
      }
      codes(s) = bestJ.toByte
      off += countsA(s)
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flatA, "float[]")
    val cn2Ref = ctx.addReferenceObj("pqCn2", cn2A, "double[]")
    val countsRef = ctx.addReferenceObj("pqCounts", countsA, "int[]")
    val getElem = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(
      ctx,
      ev,
      c => {
        val codes = ctx.freshName("codes")
        val off = ctx.freshName("off")
        val s = ctx.freshName("s")
        val j = ctx.freshName("j")
        val t = ctx.freshName("t")
        val dot = ctx.freshName("dot")
        val d = ctx.freshName("d")
        val best = ctx.freshName("best")
        val bestJ = ctx.freshName("bestJ")
        val bad = ctx.freshName("bad")
        s"""
           |byte[] $codes = new byte[$m];
           |boolean $bad = $c.numElements() < ${m * dsub};
           |if (!$bad) {
           |  int $off = 0;
           |  for (int $s = 0; $s < $m && !$bad; $s++) {
           |    double $best = Double.MAX_VALUE;
           |    int $bestJ = 0;
           |    for (int $j = 0; $j < $countsRef[$s] && !$bad; $j++) {
           |      double $dot = 0.0;
           |      for (int $t = 0; $t < $dsub; $t++) {
           |        if ($c.isNullAt($s * $dsub + $t)) { $bad = true; break; }
           |        $dot += (double) $c.$getElem($s * $dsub + $t)
           |          * (double) $flatRef[($off + $j) * $dsub + $t];
           |      }
           |      double $d = $cn2Ref[$off + $j] - 2.0 * $dot;
           |      if ($d < $best) { $best = $d; $bestJ = $j; }
           |    }
           |    $codes[$s] = (byte) $bestJ;
           |    $off += $countsRef[$s];
           |  }
           |}
           |if ($bad) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
           |}
           |""".stripMargin
      })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqEncodeExpr {

  /** Column-API entry point over the nested codebook shape
    * [[graft.operators.Similarity.pqCodebooks]] returns.
    */
  def pqEncode(emb: Column, codebooks: Array[Array[Array[Float]]]): Column = {
    val counts = codebooks.map(_.length).toIndexedSeq
    val dsub = codebooks(0)(0).length
    val flat = codebooks.flatMap(_.flatMap(_.toSeq)).toIndexedSeq
    val cn2 = codebooks
      .flatMap(_.map(_.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))).toIndexedSeq
    ColumnBridge.column(
      PqEncodeExpr(ColumnBridge.expression(emb), flat, cn2, counts, dsub))
  }
}
