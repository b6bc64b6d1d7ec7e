package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of a modern
  * curation pipeline (CCNet §4.4 / LLaMA's "trained a model to classify
  * pages" / fastText-style quality scoring): distill a heuristic gate
  * (or a hand-labeled seed set) into a calibrated per-document keep
  * probability, then filter or bucket the corpus on the smooth score
  * instead of the brittle rule conjunction.
  *
  * Shape follows this engine's bounded-model-state convention
  * (SeasonalModel's normal equations, Similarity's sample-trained
  * codebooks, TextOps' BPE merges): the model is fit DRIVER-SIDE from
  * one bounded deterministic sample job, and scoring is pure codegen'd
  * column math — a map-only projection at any corpus size. No MLlib
  * pipeline objects: L-BFGS over `treeAggregate` folds floats in
  * partition order, so its coefficients drift across partition counts;
  * the driver fit is bit-deterministic by construction.
  */
object QualityModel {

  /** Fitted logistic model: p(keep) = sigmoid(w·x + b), weights aligned
    * with `featureNames` — bounded model state, serializable as a row.
    */
  final case class LogReg(featureNames: Seq[String], weights: Array[Double], bias: Double)

  /** The default feature set: cheap per-row signals, every one a pure
    * projection over the text (no corpus statistics, so the feature pass
    * composes into any pipeline stage without a shuffle or a join).
    */
  val DefaultFeatures: Seq[String] =
    Seq("len_score", "distinct_ratio", "nonstop_ratio", "mean_word_len", "alpha_word_frac")

  /** Per-document features (doc_id + [[DefaultFeatures]]): length
    * saturation, lexical diversity, non-stopword density, mean word
    * length, alphabetic-word fraction — the signal families the
    * published quality filters (Gopher A1.1, C4, CCNet) all draw from.
    */
  /** The feature expressions over a text column, in [[DefaultFeatures]]
    * order — exposed so a pipeline can compute them INSIDE an existing
    * projection (behind its own cache boundary) and gate on plain
    * attributes, instead of paying a second tokenization pass plus a
    * join back (the Curation classifier stage does exactly this).
    */
  def featureCols(text: Column): Seq[(String, Column)] =
    featureColsFromTokens(TextOps.tokens(text))

  /** [[featureCols]] over an ALREADY-MATERIALIZED token-array column.
    * The five features reference the array ~10 times between them, and
    * the stopword/alpha terms are HOFs that keep the projection out of
    * whole-stage codegen's subexpression elimination — so an inline
    * `tokens(text)` re-runs the regex split once per reference (the
    * gramHashesFromTokenHashes finding, resurfacing here: measured ~3x
    * on the curation cap stage). Callers tokenize ONCE into an attribute
    * in a prior projection and pass it here; CollapseProject refuses to
    * inline a non-cheap alias referenced more than once, so the
    * two-projection shape is stable under optimization.
    */
  def featureColsFromTokens(toks: Column): Seq[(String, Column)] = {
    val nTok = size(toks).cast("double")
    // TextOps.countIn, not a re-derivation: the classifier's stopword
    // signal must use the SAME membership rule as the weak-label gate
    // it distills (case-sensitive, same list)
    val stopRatio = TextOps.countIn(toks, TextOps.Stopwords).cast("double") / nTok
    // degenerate docs (null or zero-token text) take defined 0.0
    // features instead of null-propagating ratios: the classifier then
    // gates them DELIBERATELY through the sigmoid, and threshold 0.0
    // keeps everything — the pipeline-identity invariant Curation
    // documents. (nTok > 0 is null for null text; when() routes both
    // the false and null cases to the 0.0 default.)
    def safe(c: Column): Column = when(nTok > 0, c).otherwise(lit(0.0))
    Seq(
      "len_score" -> safe(least(nTok / 50.0, lit(1.0))),
      "distinct_ratio" -> safe(size(array_distinct(toks)).cast("double") / nTok),
      "nonstop_ratio" -> safe(lit(1.0) - stopRatio),
      "mean_word_len" ->
        safe(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok),
      "alpha_word_frac" ->
        safe(size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nTok))
  }

  def qualityFeatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
      .select(
        col("doc_id") +:
          featureColsFromTokens(col("__toks")).map { case (n, c) => c.as(n) }: _*)

  /** Fit a logistic regression driver-side on a bounded deterministic
    * sample of `labeled` (the [[Similarity.trainingSample]] recipe: the
    * maxTrain rows with smallest (xxhash64(doc_id), doc_id) — one
    * TakeOrdered job, identical at every partition count). Full-batch
    * gradient descent on standardized features with L2; standardization
    * is folded back into the returned raw-space weights, so scoring
    * needs no stats. Deterministic end to end: hash-ordered sample,
    * sequential driver arithmetic, fixed iteration count.
    *
    * Fails fast on a single-class sample — a gate that keeps (or drops)
    * everything trains a degenerate separator silently; the caller
    * either relaxes the weak-label rule or skips the classifier.
    */
  def fit(
      labeled: DataFrame,
      featureCols: Seq[String] = DefaultFeatures,
      labelCol: String = "label",
      maxTrain: Int = 16384,
      iters: Int = 500,
      lr: Double = 0.3,
      l2: Double = 1e-4): LogReg = {
    val rows = labeled
      .select(
        (Seq(col("doc_id")) ++ featureCols.map(c => col(c).cast("double")) :+
          col(labelCol).cast("double")): _*)
      .na.drop() // null text/label rows carry no training signal
      .orderBy(xxhash64(col("doc_id")), col("doc_id"))
      .limit(maxTrain)
      .collect()
    require(rows.nonEmpty, "quality-classifier training requires a non-empty labeled sample")
    val d = featureCols.length
    val n = rows.length
    val xs = Array.ofDim[Double](n, d)
    val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < d) { xs(i)(j) = rows(i).getDouble(1 + j); j += 1 }
      ys(i) = rows(i).getDouble(1 + d)
      i += 1
    }
    require(
      ys.exists(_ > 0.5) && ys.exists(_ < 0.5),
      "quality-classifier training sample is single-class — relax or tighten the weak-label rule")
    // standardize for conditioning; zero-variance features get sigma=1
    // (their standardized column is constant 0, weight stays ~0)
    val mu = new Array[Double](d)
    val sigma = new Array[Double](d)
    var j = 0
    while (j < d) {
      var s = 0.0; i = 0
      while (i < n) { s += xs(i)(j); i += 1 }
      mu(j) = s / n
      var v = 0.0; i = 0
      while (i < n) { val c = xs(i)(j) - mu(j); v += c * c; i += 1 }
      // a (near-)constant feature keeps sigma = 1: its standardized
      // column is ~0, GD leaves its weight ~0, and the fold-back below
      // divides by 1 — a tiny true sigma here would instead amplify the
      // folded weight by 1/sigma and let mu-rounding noise dominate
      val s0 = math.sqrt(v / n)
      sigma(j) = if (s0 < 1e-9 * (math.abs(mu(j)) + 1.0)) 1.0 else s0
      j += 1
    }
    val w = new Array[Double](d)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](d)
      var gb = 0.0
      i = 0
      while (i < n) {
        var z = b; j = 0
        while (j < d) { z += w(j) * (xs(i)(j) - mu(j)) / sigma(j); j += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = p - ys(i)
        j = 0
        while (j < d) { gw(j) += err * (xs(i)(j) - mu(j)) / sigma(j); j += 1 }
        gb += err
        i += 1
      }
      j = 0
      while (j < d) { w(j) = w(j) - lr * (gw(j) / n + l2 * w(j)); j += 1 }
      b -= lr * gb / n
      it += 1
    }
    // fold standardization into raw-space coefficients:
    // z = Σ w_j (x_j - mu_j)/sigma_j + b  ==  Σ (w_j/sigma_j) x_j + (b - Σ w_j mu_j/sigma_j)
    val rawW = Array.tabulate(d)(j => w(j) / sigma(j))
    val rawB = b - (0 until d).map(j => w(j) * mu(j) / sigma(j)).sum
    LogReg(featureCols, rawW, rawB)
  }

  /** `p_keep` = sigmoid(w·x + b) over bound feature columns — pure
    * column math (codegen'd, map-only; the model is a handful of
    * literals). Threshold/bucket downstream as the pipeline needs.
    */
  def score(model: LogReg): Column = {
    val z = model.featureNames.zip(model.weights)
      .map { case (f, wj) => col(f) * wj }
      .foldLeft(lit(model.bias): Column)(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** The end-to-end stage: features → score → (doc_id, p_keep, keep).
    *
    * The keep decision compares the 6-dp-ROUNDED probability against the
    * threshold (the x44 both-sides-rounded recipe, mirrored by the x56
    * oracle's `round(p, 6) >= t`): `exp` may differ by an ulp across
    * engines/libms, and a raw compare would let that flip a keep at the
    * exact boundary.
    */
  def classify(
      docs: DataFrame,
      model: LogReg,
      threshold: Double = 0.5): DataFrame =
    qualityFeatures(docs)
      .withColumn("p_keep", score(model))
      .select(
        col("doc_id"), col("p_keep"),
        (CrossRound.r(col("p_keep"), 6) >= threshold).as("keep"))
}
