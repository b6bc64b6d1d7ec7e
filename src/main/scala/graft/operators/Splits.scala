package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: assign each row
  * to a named fold by hashing its key.
  *
  * Why not `randomSplit`: Spark's randomSplit is seed- AND
  * partitioning-dependent (it samples per partition), so the same row can
  * change folds when the input is repartitioned, compacted, or grows — a
  * training-data leak waiting to happen. Hash-of-key assignment is stable
  * across runs, cluster sizes, and file layouts, and assigns the SAME fold
  * to the same key in every table that carries it (so a document and its
  * embeddings land in the same fold without a join).
  *
  * Scale posture: pure projection — no shuffle, no driver state; the fold
  * expression is a codegen-friendly when-chain over one xxhash64.
  */
object Splits {

  /** Hash bucket space: fold boundaries are expressed as fixed-point
    * fractions of this, so weights like 0.8/0.1/0.1 are exact.
    */
  val Buckets = 1000000L

  /** The bucket a key falls in — exposed so callers can reason about (and
    * test) assignment independent of fold boundaries.
    */
  def bucketOf(key: Column, seed: Long): Column =
    pmod(xxhash64(lit(seed), key), lit(Buckets))

  /** Add a `fold` column: each row lands in one of the named folds with
    * probability proportional to its weight (weights need not sum to 1).
    *
    * @param folds ordered (name, weight) list, e.g.
    *              Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    */
  def splitByHash(
      df: DataFrame,
      keyCol: String,
      folds: Seq[(String, Double)],
      seed: Long = 42L): DataFrame = {
    require(folds.nonEmpty && folds.forall(_._2 > 0), "fold weights must be positive")
    val total = folds.map(_._2).sum
    // cumulative upper bounds in bucket space; the last bound is forced to
    // Buckets so float accumulation can never leave a key unassigned
    val uppers = folds.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(w => math.round(w / total * Buckets))
      .dropRight(1) :+ Buckets
    val h = bucketOf(col(keyCol), seed)
    val fold = folds.map(_._1).zip(uppers).init.foldRight(lit(folds.last._1): Column) {
      case ((name, ub), els) => when(h < ub, name).otherwise(els)
    }
    df.withColumn("fold", fold)
  }
}
