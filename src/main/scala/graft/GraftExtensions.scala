package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

import graft.functions.MinHashSigExpr
import graft.operators.Dedup

/** SparkSessionExtensions entry point: registers the engine's native
  * functions so plain `spark.sql(...)` can use them —
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`. For an
  * already-running session (e.g. notebooks), `GraftExtensions.register`
  * installs the same functions directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.minhashSigFunction)
}

object GraftExtensions {

  /** `minhash_sig(hashArray[, numHashes])` — the fused MinHash signature
    * expression over the engine's standard hash-parameter family (same
    * family as Dedup.minhashSignatures*, so SQL-computed signatures are
    * comparable with DataFrame-computed ones).
    */
  val minhashSigFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
    {
      case Seq(child) =>
        build(child, 32)
      case Seq(child, IntegerLiteral(h)) if h > 0 =>
        build(child, h)
      case other =>
        throw new IllegalArgumentException(
          s"minhash_sig expects (array<bigint>[, numHashes literal]), got ${other.size} args")
    })

  private def build(child: Expression, numHashes: Int): MinHashSigExpr = {
    val params = Dedup.defaultHashParams(numHashes)
    MinHashSigExpr(child, params.map(_._1).toArray, params.map(_._2).toArray, Dedup.MinHashPrime)
  }

  /** Install into a live session (same registration the extension does). */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = minhashSigFunction
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
