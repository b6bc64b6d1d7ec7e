package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`embeddings.embedding`,
  * array<float> — FIXTURES.md §2).
  *
  * Two paths, per the brief:
  *   - exact brute-force cosine top-k — the correctness baseline. The probe
  *     set broadcasts against the corpus, so the "cross join" is a broadcast
  *     nested loop over |probes| x |corpus| with NO shuffle of the corpus;
  *     right for few-query/any-corpus-size workloads.
  *   - random-hyperplane LSH bucketing — the scale path: corpus is bucketed
  *     once (pure column math, no shuffle), queries probe only their own
  *     buckets across T tables, and only candidates get exact scoring.
  *
  * All dot products cast elements to double BEFORE multiplying and fold
  * sequentially (functions.aggregate), so Spark and the DuckDB oracle
  * compute bit-identical sums.
  */
object Similarity {

  /** Sequential-fold dot product in double precision — the fused native
    * expression (graft.functions.DotProductExpr): one codegen'd loop with
    * the same products and summation order as the
    * `aggregate(zip_with(...))` formulation, so results (and DuckDB oracle
    * parity) are unchanged while skipping the interpreted-lambda dispatch
    * and intermediate array per row.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductExpr.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each probe vector.
    *
    * @param probes (q_id, q_emb) — small; broadcast
    * @param corpus (vec_id, embedding)
    * @return (q_id, rank, vec_id, sim) — rank 1..k by cosine desc; ties
    *         broken on (round(sim, 6), vec_id) so ordering is deterministic
    *         across engines
    */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms hoisted to one evaluation per vector (identical doubles to the
    // per-pair form — same expression, so oracle parity is unaffected)
    val corpusN = corpus.withColumn("nrm_c", norm(col("embedding")))
    val probesN = probes.withColumn("nrm_q", norm(col("q_emb")))
    val scored = corpusN
      .crossJoin(broadcast(probesN))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim", dot(col("q_emb"), col("embedding")) / (col("nrm_q") * col("nrm_c")))
      // CrossRound.r so the rank bucketing matches the oracle's multiply-
      // based round(sim, 6) on repr-tie values (the 12.34565 class)
      .withColumn("sim_r", CrossRound.r(col("sim"), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim_r").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("sim"))
  }

  /** Exact all-pairs above a cosine threshold (vec_a < vec_b). Quadratic
    * within the pairing domain — use [[blockedThresholdPairs]] with a
    * blocking key, or the LSH path, at scale.
    */
  def thresholdPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", cosine(col("emb_a"), col("emb_b")))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b", "sim")
  }

  /** Threshold pairs restricted to a blocking key (equi-join instead of a
    * cross join): the standard scale pattern when a cheap partition key
    * (label, language, cluster id) bounds where near-dups can live —
    * pair count drops from n^2 to sum of block sizes squared.
    */
  def blockedThresholdPairs(emb: DataFrame, blockKey: String, threshold: Double): DataFrame = {
    // norm per vector, not per pair: |pairs| >> |vectors| inside any block
    val withNorm = emb.withColumn("nrm", norm(col("embedding")))
    val a = withNorm.select(
      col(blockKey), col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
      col("nrm").as("nrm_a"))
    val b = withNorm.select(
      col(blockKey), col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
      col("nrm").as("nrm_b"))
    a.join(b, Seq(blockKey))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col(blockKey), col("vec_a"), col("vec_b"), col("sim"))
  }

  /** Embedding-space decontamination: drop every corpus vector whose
    * cosine to ANY banned (benchmark/eval-set) vector reaches
    * `threshold` — the SEMANTIC sibling of TextOps.decontaminate, which
    * only catches verbatim n-gram overlap; a paraphrased eval item
    * passes the exact check and leaks anyway (the contamination class
    * the GPT-3 appendix and every since-published decontam writeup
    * worries about).
    *
    * Scale posture: the banned side is a benchmark suite — thousands of
    * rows, BOUNDED — so it broadcasts and the corpus NEVER shuffles:
    * scoring is a map-only pass of |banned| fused dot products per
    * corpus row, and the kill set comes back as a broadcast semi-join.
    * The threshold compares at round(sim, 6) on both engines (the
    * x44 threshold rule). Zero-norm rows cannot match (guarded — NaN
    * would satisfy no comparison but still poisons plans elsewhere).
    *
    * @return the surviving corpus rows, schema unchanged
    */
  def semanticDecontaminate(
      corpus: DataFrame,
      banned: DataFrame,
      threshold: Double): DataFrame = {
    val bannedN = broadcast(
      banned.select(col("q_emb"), norm(col("q_emb")).as("nrm_b")))
    val contaminated = corpus
      .withColumn("nrm_c", norm(col("embedding")))
      .crossJoin(bannedN)
      .withColumn("sim",
        when(col("nrm_c") * col("nrm_b") > 0,
          dot(col("embedding"), col("q_emb")) / (col("nrm_c") * col("nrm_b")))
          .otherwise(lit(Double.NegativeInfinity)))
      .filter(CrossRound.r(col("sim"), 6) >= threshold)
      .select(col("vec_id"))
      .distinct()
    corpus.join(contaminated, Seq("vec_id"), "left_anti")
  }

  // -------------------------------------------------------------------
  // int8 quantization: the standard 4x memory/shuffle compression for
  // embedding corpora at 100 TB — float32 vectors dominate scan and
  // shuffle bytes in every ANN path above, and symmetric per-vector
  // int8 keeps cosine error negligible relative to LSH/IVF's own
  // approximation. Pure column math, no UDF.
  // -------------------------------------------------------------------

  /** Per-vector symmetric int8 quantization: scale = max|x| / 127,
    * q_i = round(x_i / scale) in [-127, 127]. The scale stays a DOUBLE so
    * max|x|/scale lands on exactly 127 +- 1 ulp (a float-rounded scale
    * could push the ratio past 127.5 and overflow the tinyint). All-zero
    * vectors quantize to zeros with scale 0.
    * Output: (vec_id, q: array<tinyint>, scale: double).
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val maxAbs = aggregate(
      col("embedding"), lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))
    emb
      .withColumn("scale", maxAbs / 127.0)
      .select(
        col("vec_id"),
        when(col("scale") === 0.0, transform(col("embedding"), _ => lit(0)))
          .otherwise(
            transform(col("embedding"), x => round(x.cast("double") / col("scale"))))
          .cast("array<tinyint>").as("q"),
        col("scale"))
  }

  /** Reconstruct approximate float vectors from int8 codes — the read
    * side of [[quantizeInt8]]; feeds any operator above that expects an
    * `embedding` column.
    */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => (x.cast("double") * scale).cast("float"))

  /** The embeddings frame with vectors round-tripped through int8 — the
    * corpus an ANN pipeline actually serves from at scale. Deterministic
    * column math end to end, so downstream top-k stays rows-stable.
    */
  def quantizedCorpus(emb: DataFrame): DataFrame =
    quantizeInt8(emb)
      .select(col("vec_id"), dequantize(col("q"), col("scale")).as("embedding"))

  // -------------------------------------------------------------------
  // Product quantization (Jegou, Douze, Schmid 2011, "Product
  // quantization for nearest neighbor search"): split each vector into m
  // subvectors, k-means each subspace to ksub centroids, store a vector
  // as m sub-byte codes. Where int8 compresses 4x, PQ compresses
  // dim*4 bytes -> m bytes (32x at dim=64, m=8) plus one shared
  // m x ksub x (dim/m) codebook — the difference between an embedding
  // corpus that fits executor memory and one that doesn't at 100 TB.
  // Training state is bounded (codebooks), encode/decode are pure
  // projections (NO shuffle), and search reuses the exact brute-force
  // scorer over reconstructed vectors.
  // -------------------------------------------------------------------

  /** |c|^2 for a literal centroid, folded in index order — matches
    * `dot(centroid, centroid)`'s sequential sum bit-exactly.
    */
  private def norm2Lit(centroid: Array[Float]): Double =
    centroid.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)

  /** Per-subspace centroid lookup tables, one literal nested array each —
    * shared by every ADC consumer so code indexing lives in ONE place.
    */
  private def pqTables(cb: Array[Array[Array[Float]]]): IndexedSeq[Column] =
    cb.toIndexedSeq.map(book =>
      array(book.map(c => array(c.toIndexedSeq.map(lit): _*)).toIndexedSeq: _*))

  /** The 1-based lookup index for subspace s, from a bound `codes` column. */
  private def pqCodeAt(s: Int): Column = element_at(col("codes"), s + 1).cast("int") + 1

  /** ADC approximate dot(q, decode(codes)): per-subspace codegen'd dots of
    * the q slice against the code's centroid lookup, summed — reads the
    * bound `codes` column, never a decode expression.
    */
  private def pqAdcDot(qEmb: Column, cb: Array[Array[Array[Float]]]): Column = {
    val dsub = cb(0)(0).length
    val tables = pqTables(cb)
    cb.indices
      .map(s => dot(slice(qEmb, s * dsub + 1, dsub), element_at(tables(s), pqCodeAt(s))))
      .reduce(_ + _)
  }

  /** Train per-subspace PQ codebooks with distributed Lloyd iterations.
    *
    * Init is the [[ivfCentroids]] recipe per subspace (the ksub corpus
    * rows with smallest xxhash64(vec_id) seed ALL m subspaces — stable,
    * uniform); each iteration assigns every subvector to its nearest
    * centroid by squared L2 (the PQ metric; cosine is wrong on
    * subvectors, whose norms carry signal) and recomputes non-empty
    * cells' means, empty cells keeping their previous centroid. The loop
    * is keyed by (sub, code) so ALL m subspaces train in the SAME two
    * shuffles per iteration, not m sequential jobs. Mean drift across
    * partition orders is collapsed by the same CrossRound.ra(7) pre-round
    * as [[kmeansCentroids]].
    *
    * The return is driver-side — bounded MODEL state (m x ksub x dim/m
    * floats, the same class as [[hyperplanes]]' literals), not data; the
    * corpus itself never leaves the executors. At 100 TB train on a
    * sampled subset and run one full encode pass, the standard recipe.
    *
    * @return codebooks(sub)(code) = centroid of length dim/m
    */
  def pqCodebooks(
      corpus: DataFrame,
      m: Int,
      ksub: Int,
      iters: Int = 2,
      dim: Int = 64): Array[Array[Array[Float]]] = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(ksub >= 1 && ksub <= 128, "ksub must fit a tinyint code in [1, 128]")
    val dsub = dim / m
    // cast up front: PqEncodeExpr accepts array<double> too, and without
    // this an array<double> corpus trains Double centroid rows that the
    // float-typed collect below would CCE on. Codebooks are float by
    // contract (PQ is lossy); for float input the cast is a no-op.
    val subs = corpus.select(
      col("vec_id"),
      posexplode(array((0 until m).map(s =>
        slice(col("embedding").cast("array<float>"), s * dsub + 1, dsub)): _*)).as(Seq("sub", "sv")))
    // bounded: ksub rows; the un-partitioned window runs AFTER the limit
    val seedW = Window.orderBy(col("h"), col("vec_id"))
    val seeds = corpus
      .select(col("vec_id"), xxhash64(col("vec_id")).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(ksub)
      .withColumn("code", (row_number().over(seedW) - 1).cast("int"))
      .select("vec_id", "code")
    var cb = subs
      .join(broadcast(seeds), Seq("vec_id"))
      .select(col("sub"), col("code"), col("sv").as("centroid"))
      // bounded: m x ksub rows. Lazy persist, not localCheckpoint — the
      // first iteration's broadcast job materializes it, so seeding costs
      // no extra barrier (each eager job ~0.15-0.2 s at local[32]). The
      // PER-ITERATION checkpoints below stay eager: they also truncate
      // lineage, which persist does not.
      .persist()
    for (it <- 0 until iters) {
      // argmin_c |sv - c|^2 = argmin_c (|c|^2 - 2 sv.c): |sv|^2 is
      // constant across codes, so it never needs computing, and the
      // remaining terms run through the codegen'd dot instead of an
      // interpreted zip_with lambda per (subvector, code) pair
      val assigned = subs
        .join(
          broadcast(cb.withColumn("cn2", dot(col("centroid"), col("centroid")))),
          Seq("sub"))
        .withColumn("d", col("cn2") - lit(2.0) * dot(col("sv"), col("centroid")))
        // argmin per subvector: smallest distance, ties to the smallest
        // code — one map-combinable aggregate, no window over the corpus
        .groupBy(col("vec_id"), col("sub"), col("sv"))
        .agg(min(struct(col("d"), col("code"))).getField("code").as("code"))
      val means = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy("sub", "code", "pos")
        .agg(CrossRound.ra(avg(col("v")), 7).as("mv"))
        .groupBy("sub", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
        .select(
          col("sub"), col("code"),
          transform(col("pm"), x => x.getField("mv")).cast("array<float>").as("refined"))
      cb = cb
        .join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"), coalesce(col("refined"), col("centroid")).as("centroid"))
      // intermediate iterations checkpoint (the next loop round consumes
      // cb twice — broadcast + coalesce join); the LAST stays lazy so the
      // final collect() is the job that runs it, saving a checkpoint job
      // + broadcast round per training call
      if (it < iters - 1) cb = cb.localCheckpoint()
    }
    val rows = cb.collect() // bounded model state: m x ksub rows
    require(rows.nonEmpty,
      "PQ training requires a non-empty corpus (no codebook seeds found)")
    val out = Array.ofDim[Array[Array[Float]]](m)
    for (s <- 0 until m) {
      val cell = rows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
      out(s) = cell.map(_.getSeq[Float](2).toArray)
    }
    out
  }

  /** PQ-encode an embedding column: per subspace, the argmin code over
    * the codebook, as ONE fused native expression
    * ([[graft.functions.PqEncodeExpr]] — codegen'd loop; the literal-
    * expanded Column composition was ~10k interpreted nodes per row and
    * dominated the whole search). Same |c|^2 - 2 sv.c score and fold
    * order as training's assignment, so codes reproduce the trained
    * partition bit-exactly. Pure projection — the 100 TB encode pass is
    * map-only, no shuffle.
    */
  def pqEncodeCol(emb: Column, codebooks: Array[Array[Array[Float]]]): Column =
    graft.functions.PqEncodeExpr.pqEncode(emb, codebooks)

  /** Reconstruct the approximate vector from PQ codes: codebook lookups
    * into ONE literal m x ksub x dsub table, flattened. The codes column
    * is referenced exactly once (the transform lambda binds it), so
    * composing decode over [[pqEncodeCol]]'s tree — as [[pqCorpus]] does
    * in a single projection — cannot duplicate the encode expression
    * m times into the task binary. Pure projection, the read side of
    * [[pqEncodeCol]].
    */
  def pqDecodeCol(codes: Column, codebooks: Array[Array[Array[Float]]]): Column = {
    val table = array(codebooks.map(book =>
      array(book.map(c => array(c.toIndexedSeq.map(lit): _*)).toIndexedSeq: _*)).toIndexedSeq: _*)
    flatten(transform(codes, (c, s) =>
      element_at(element_at(table, s + 1), c.cast("int") + 1)))
  }

  /** The embeddings frame round-tripped through PQ codes — the corpus an
    * ANN pipeline serves from when even int8 is too big ([[quantizedCorpus]]'s
    * 32x sibling). Encode + decode fuse into ONE scan-side projection.
    */
  def pqCorpus(
      emb: DataFrame, m: Int = 8, ksub: Int = 16, iters: Int = 2, dim: Int = 64): DataFrame = {
    val cb = pqCodebooks(emb, m, ksub, iters, dim)
    emb.select(
      col("vec_id"),
      pqDecodeCol(pqEncodeCol(col("embedding"), cb), cb).as("embedding"))
  }

  /** Asymmetric-distance top-k over the PQ corpus (ADC — Jegou et al.
    * §4.2): queries stay exact; each candidate's score is assembled from
    * its codes alone — per subspace, dot(q_s, codebook[s][code_s]) via
    * literal table lookups, and |x̂|^2 = Σ_s |c_{s,code_s}|^2 from a
    * literal norm table (exact, since x̂ is the concatenation). The
    * corpus side is first MATERIALIZED as (vec_id, codes, nrm) — m bytes
    * + one double per vector, the form a PQ system stores at rest (and
    * 32x smaller than the floats, so the checkpoint is cheap). This also
    * pins encode to ONE evaluation per corpus row: left lazy under the
    * cross join, CollapseProject inlines the whole argmin-encode tree
    * into every per-pair score reference (measured 5x slower).
    */
  def pqTopK(
      probes: DataFrame,
      corpus: DataFrame,
      k: Int,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2,
      dim: Int = 64): DataFrame = {
    val cb = pqCodebooks(corpus, m, ksub, iters, dim)
    val norm2Tables = cb.map(book =>
      array(book.map(c => lit(norm2Lit(c))).toIndexedSeq: _*))
    val codedN = corpus
      .select(col("vec_id"), pqEncodeCol(col("embedding"), cb).as("codes"))
      .withColumn(
        "nrm_c",
        sqrt((0 until m).map(s => element_at(norm2Tables(s), pqCodeAt(s))).reduce(_ + _)))
      // lazy persist: the cache boundary still blocks CollapseProject from
      // inlining the encode into per-pair references (the 5x class above),
      // but materialization folds into the search job instead of paying
      // its own eager-barrier round-trip
      .persist()
    val probesN = probes.withColumn("nrm_q", norm(col("q_emb")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(CrossRound.r(col("sim"), 6).desc, col("vec_id"))
    codedN
      .crossJoin(broadcast(probesN))
      .filter(col("q_id") =!= col("vec_id"))
      // a zero reconstruction (every chosen code a zero vector) makes the
      // cosine 0/0 = NaN, and Spark sorts NaN ABOVE every double — under
      // the descending rank window a degenerate candidate would top every
      // list. Sink it to -Inf instead so it ranks last.
      .withColumn("sim",
        when(col("nrm_q") * col("nrm_c") > 0,
          pqAdcDot(col("q_emb"), cb) / (col("nrm_q") * col("nrm_c")))
          .otherwise(lit(Double.NegativeInfinity)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("sim"))
  }

  /** IVF + PQ composite (IVFADC — Jegou et al. 2011 §IV, the FAISS
    * billion-vector layout): coarse IVF cells bound WHICH vectors a probe
    * scores (nprobe cells of ~|corpus|/c), PQ codes bound the BYTES each
    * candidate costs (m + 9 per vector at rest vs dim*4 floats). True
    * RESIDUAL encoding: codes quantize x - centroid(cell), so codebook
    * precision is spent on within-cell variance rather than re-describing
    * the coarse structure — reconstruction is centroid + decode(codes).
    *
    * Scoring is ADC split along the residual decomposition:
    * dot(q, x̂) = dot(q, centroid) + dot(q, r̂). The first term is
    * computed once per (probe, cell) — nprobe rows per probe, already in
    * hand when probes pick their cells; the second assembles from the
    * residual-codebook literal tables like [[pqTopK]]. |x̂| is exact,
    * computed once at encode time and stored beside the codes.
    *
    * At-rest state: the coded corpus (cell, vec_id, codes, nrm — the
    * checkpoint below; a production pipeline persists it as a table) plus
    * bounded model state (c coarse centroids + m x ksub residual
    * codebooks). The residual frame is materialized before training
    * because [[pqCodebooks]] scans its input per iteration and the
    * residuals hang off an assignment cross-join — same recurring
    * multi-consumer rule as semanticDedup's assignment.
    */
  def ivfPqTopK(
      probes: DataFrame,
      corpus: DataFrame,
      k: Int,
      c: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 1,
      refineIters: Int = 0,
      dim: Int = 64): DataFrame = {
    // persist(), NOT localCheckpoint, for every multi-consumer frame here:
    // both pin re-used lineage to one evaluation, but a localCheckpoint is
    // an EAGER job — at local[32] each round-trip costs ~0.15-0.2 s of pure
    // scheduling, and this operator had three of them (measured as the
    // whole gap to the other ANN paths). A lazy persist materializes
    // inside the FIRST consuming job (the codebook fit below), so the
    // barrier count drops without giving up single-evaluation.
    // Trade-off (the TextOps.tfidfTopTerms note, inverted): cache entries
    // outlive the returned frame until clearCache()/unpersist — fine for
    // the query-at-a-time harness (Bench drops caches between queries)
    // and for notebooks; a long-lived service materializes the coded
    // corpus into a VersionedTable instead (the documented at-rest path),
    // which removes the cache AND the refit.
    val centroids = // bounded: c rows
      if (refineIters > 0) kmeansCentroids(corpus, c, refineIters)
      else ivfCentroids(corpus, c).persist()
    val cellCentroid = centroids
      .select(col("centroid_id").as("cell"), col("centroid"))
    val assigned = ivfAssign(corpus, centroids)
      .join(broadcast(cellCentroid), Seq("cell"))
      .select(
        col("cell"), col("vec_id"),
        zip_with(col("embedding"), col("centroid"), (x, y) => x - y).as("resid"))
      .persist()
    val cb = pqCodebooks(
      assigned.select(col("vec_id"), col("resid").as("embedding")), m, ksub, iters, dim)
    // the at-rest form: m residual codes + the exact reconstruction norm.
    // The reconstruction is bound to its OWN projected column before the
    // norm reads it twice — inlined, dot(recon, recon) would evaluate the
    // whole decode tree twice per row (the expression-duplication class
    // pqTopK documents)
    val reconstructed = zip_with(
      col("centroid"), pqDecodeCol(col("codes"), cb), (x, y) => x + y)
    // persist (lazy) rather than checkpoint (eager): the cache boundary
    // still pins the encode to ONE evaluation per corpus row — an
    // InMemoryRelation cannot be projection-collapsed into the per-pair
    // score references above the join (the 5x duplication class pqTopK
    // documents) — but the materialization now happens inside the final
    // query job instead of its own barrier.
    val coded = assigned
      .select(col("cell"), col("vec_id"), pqEncodeCol(col("resid"), cb).as("codes"))
      .join(broadcast(cellCentroid), Seq("cell"))
      .select(col("cell"), col("vec_id"), col("codes"), reconstructed.as("recon"))
      .select(
        col("cell"), col("vec_id"), col("codes"),
        sqrt(dot(col("recon"), col("recon"))).as("nrm_c"))
      .persist()
    val probeCells = nearestCells(probes, centroids, nprobe)
      .select(
        col("cell"), col("q_id"), col("q_emb"),
        dot(col("q_emb"), col("centroid")).as("qc_dot"),
        norm(col("q_emb")).as("nrm_q"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(CrossRound.r(col("sim"), 6).desc, col("vec_id"))
    // probe side is |probes| x nprobe rows — broadcast so the coded corpus
    // never shuffles (the ivfTopK rule); each (q, vec) meets at most once
    broadcast(probeCells)
      .join(coded, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      // same NaN sink as pqTopK: a zero residual reconstruction in a zero
      // cell gives nrm_c = 0 and NaN would rank FIRST under desc ordering
      .withColumn("sim",
        when(col("nrm_q") * col("nrm_c") > 0,
          (col("qc_dot") + pqAdcDot(col("q_emb"), cb)) / (col("nrm_q") * col("nrm_c")))
          .otherwise(lit(Double.NegativeInfinity)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("sim"))
  }

  // -------------------------------------------------------------------
  // Random-hyperplane LSH (Charikar 2002): sign-bit buckets, T tables.
  // -------------------------------------------------------------------

  /** Deterministic Gaussian hyperplanes: T tables x nBits planes x dim. */
  def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long = 11L): Seq[Seq[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian())))
  }

  private def planeLit(p: Array[Double]): Column = array(p.toIndexedSeq.map(lit): _*)

  /** Packed sign-bit bucket id for one table — pure column math, shuffle-free. */
  def bucketCol(emb: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, i) =>
        when(dot(emb, planeLit(p)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }
      .reduce((a, b) => a.bitwiseOR(b))

  /** Corpus bucketed across T tables: (vec_id, embedding, table_id, bucket). */
  def bucketize(emb: DataFrame, planes: Seq[Seq[Array[Double]]]): DataFrame = {
    val buckets = array(planes.map(t => bucketCol(col("embedding"), t)): _*)
    emb.select(col("*"), posexplode(buckets).as(Seq("table_id", "bucket")))
  }

  // -------------------------------------------------------------------
  // IVF (inverted-file) coarse quantization — the other scale path the
  // brief names. Centroids are a deterministic hash-ordered sample of the
  // corpus (a k-means refinement drops in without changing the layout);
  // each vector lives in exactly one cell, queries probe the nprobe
  // nearest cells.
  // -------------------------------------------------------------------

  /** Deterministic centroid sample: the c corpus vectors with smallest
    * xxhash64(vec_id) — stable across runs, uniform over the corpus.
    */
  def ivfCentroids(corpus: DataFrame, c: Int): DataFrame =
    corpus
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(c)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))

  /** Lloyd refinement of the hash-sampled centroids — the standard IVF
    * training step (the sample is the init, k-means tightens it). Each
    * iteration assigns every vector to its nearest centroid (the same
    * broadcast argmax as [[ivfAssign]]) and recomputes each non-empty
    * cell's centroid as its mean vector; empty cells keep their previous
    * centroid so c never shrinks. Per-iteration state is BOUNDED
    * (c x dim values, localCheckpoint'ed like connectedComponents' loop);
    * the corpus is scanned once per iteration — at 100 TB train on a
    * sampled subset and do one final full assignment, the standard
    * recipe. Deterministic end to end: hash-ordered init, argmax ties
    * break on centroid_id, and the mean aggregation's partition-order
    * drift is collapsed by an explicit CrossRound.ra pre-round BEFORE the
    * float cast (the cast alone is only probabilistic: a mean landing
    * within the ~1e-12 drift of a float rounding boundary still flips
    * bits across partition counts; 7 dp is within float's precision near
    * unit-scale embeddings, so the round costs no real signal).
    */
  def kmeansCentroids(corpus: DataFrame, c: Int, iters: Int = 3): DataFrame = {
    var centroids = ivfCentroids(corpus, c).localCheckpoint()
    for (_ <- 0 until iters) {
      val means = ivfAssign(corpus, centroids)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(CrossRound.ra(avg(col("v")), 7).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(
          col("cell").as("centroid_id"),
          transform(col("pm"), x => x.getField("m")).cast("array<float>").as("refined"))
      centroids = centroids
        .join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"), coalesce(col("refined"), col("centroid")).as("centroid"))
        .localCheckpoint()
    }
    centroids
  }

  /** The nprobe nearest centroids per probe (broadcast argmax, the probe-
    * side mirror of [[ivfAssign]]): (cell, q_id, q_emb, centroid) — shared
    * by [[ivfTopK]] and [[ivfPqTopK]] so the tie-break rule lives once.
    */
  private def nearestCells(probes: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("centroid_id"))
    probes
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("q_emb"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col("centroid_id").as("cell"), col("q_id"), col("q_emb"), col("centroid"))
  }

  /** Assign every vector to its nearest centroid (cosine): broadcast
    * nested loop over |corpus| x c, then a per-vector argmax — one shuffle
    * on vec_id at scale, cells come out hash-partitioned by centroid.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("centroid_id"))
    corpus
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("embedding"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("centroid_id").as("cell"), col("vec_id"), col("embedding"))
  }

  /** IVF approximate top-k: probes are scored only against the vectors in
    * their nprobe nearest cells. Recall/latency trades on (c, nprobe);
    * candidates per probe ~ nprobe x |corpus| / c. `refineIters` > 0 runs
    * [[kmeansCentroids]] Lloyd steps over the sampled init — tighter cells
    * for the same (c, nprobe) budget.
    */
  def ivfTopK(
      probes: DataFrame,
      corpus: DataFrame,
      k: Int,
      c: Int = 16,
      nprobe: Int = 4,
      refineIters: Int = 0): DataFrame = {
    val centroids = // bounded: c rows
      if (refineIters > 0) kmeansCentroids(corpus, c, refineIters)
      else ivfCentroids(corpus, c).localCheckpoint()
    val cells = ivfAssign(corpus, centroids)
    val probeCells = nearestCells(probes, centroids, nprobe)
      .select("cell", "q_id", "q_emb")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(CrossRound.r(col("sim"), 6).desc, col("vec_id"))
    // probe side is |probes| x nprobe rows — broadcast it so the corpus-
    // sized cell table never shuffles (plan audit caught Spark defaulting
    // to a sort-merge join here). No candidate dedup needed: ivfAssign
    // puts each vector in exactly ONE cell (rn === 1) and a probe's
    // nprobe cells are distinct, so a (q, vec) pair meets at most once —
    // round 4 paid a corpus-wide distinct over (q_emb, embedding) rows
    // here for pairs that were already unique.
    broadcast(probeCells)
      .join(cells, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "q_emb", "vec_id", "embedding")
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("sim"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding corpus, score exact
    * cosine only WITHIN each cluster, and drop every vector that is
    * >= threshold-similar to a lower-id vector in its cluster. The paper
    * keeps the cluster item farthest from the centroid; any deterministic
    * representative rule works, and keep-smallest-id matches this
    * engine's exact-dedup convention with no extra scoring pass.
    *
    * Scale posture: the clustering IS the blocking key — the pair space
    * is the sum of squared cluster sizes, never corpus squared (reuses
    * [[blockedThresholdPairs]]); k-means state is c x dim per iteration
    * and assignment is one broadcast argmax per scan. Near-dup pairs
    * split across cluster boundaries are missed by construction — the
    * documented SemDeDup approximation; fewer, larger clusters trade
    * pair-scoring work for recall.
    *
    * @return the kept rows of `emb` (schema unchanged)
    */
  def semanticDedup(
      emb: DataFrame,
      threshold: Double,
      c: Int = 16,
      iters: Int = 2,
      maxCellSize: Option[Int] = None): DataFrame = {
    // materialized: blockedThresholdPairs self-joins this frame, and an
    // unmaterialized frame with two consumers re-executes the whole
    // cross-join + argmax assignment once PER SIDE (verified in the
    // executed plan — the recurring multi-consumer rule). Corpus-scale
    // like x24's shingle frame; a production pipeline persists the
    // assignment as a table instead (VersionedTable sink pattern).
    val assigned = ivfAssign(emb, kmeansCentroids(emb, c, iters))
      .select(col("cell"), col("vec_id"), col("embedding"))
      .localCheckpoint()
    // pair work is sum of SQUARED cell sizes, so one degenerate cluster
    // (a mass of near-identical boilerplate — the common real-world
    // corpus pathology) turns quadratic. The opt-in cap hash-splits any
    // oversized cell into ceil(n/cap) sub-cells, bounding every block at
    // ~cap rows; pairs across sub-cells of the same hot cluster are
    // missed (each sub-cell keeps its own representative) — the same
    // recall-for-boundedness trade as LSH banding, and exactly what
    // SemDeDup wants in a cluster that IS one giant duplicate class.
    val cells = maxCellSize match {
      case None => assigned
      case Some(cap) =>
        require(cap > 0, "maxCellSize must be positive")
        // bounded: c rows
        val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("__n"))
        val nSubs = greatest(
          lit(1L), floor((col("__n") + (cap - 1)) / cap).cast("long"))
        assigned
          .join(broadcast(sizes), Seq("cell"))
          .select(
            concat(
              col("cell").cast("string"), lit("#"),
              pmod(xxhash64(col("vec_id")), nSubs).cast("string")).as("cell"),
            col("vec_id"), col("embedding"))
    }
    // every pair has vec_a < vec_b, so the dropped set = distinct right
    // sides; anything never similar to a lower id survives
    val dropped = blockedThresholdPairs(cells, "cell", threshold)
      .select(col("vec_b").as("vec_id"))
      .distinct()
    emb.join(dropped, Seq("vec_id"), "left_anti")
  }

  /** Embedding near-dup pairs via LSH buckets (the scale path for
    * threshold pairing when no cheap blocking key exists): only vectors
    * sharing a (table, bucket) cell are paired and exactly scored.
    */
  def lshNearDupPairs(
      emb: DataFrame,
      threshold: Double,
      tables: Int = 4,
      bits: Int = 10,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(tables, bits, dim)
    // id-only bucket join + dedup: a pair colliding in several tables used
    // to carry BOTH embedding payloads through the distinct's shuffle —
    // now the T-fold bucket join and the dedup move only (table, bucket,
    // id) rows, and each embedding is re-attached once afterwards (two
    // equi-joins on vec_id, each shuffling the vector table once instead
    // of per-collision)
    // persist: both sides of the self-join read this frame, and lazily
    // each side would recompute the T x bits signature dots over the
    // whole corpus — the cache halves the signature work and the id-only
    // rows are small (3 longs/row x T). Same cache-lifetime note as the
    // PQ paths (ivfPqTopK).
    val bucketedIds = bucketize(emb, planes)
      .select("table_id", "bucket", "vec_id").persist()
    val pairs = bucketedIds.toDF("table_id", "bucket", "vec_a")
      .join(bucketedIds.toDF("table_id", "bucket", "vec_b"), Seq("table_id", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .distinct()
    pairs
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), Seq("vec_b"))
      .withColumn("sim", cosine(col("emb_a"), col("emb_b")))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b", "sim")
  }

  /** Approximate top-k: probes meet the corpus only inside shared
    * (table_id, bucket) cells; candidates are deduped then scored exactly.
    * Bucket-join cardinality ~ |corpus| x T / 2^bits per probe — tune bits
    * to corpus size; skewed cells are AQE skew-join territory.
    */
  def annTopK(
      probes: DataFrame,
      corpus: DataFrame,
      k: Int,
      tables: Int = 4,
      bits: Int = 10,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(tables, bits, dim)
    // same id-only dedup as lshNearDupPairs: the bucket join and the
    // cross-table distinct move (table, bucket, id) rows only; q_emb
    // re-attaches from the (small, broadcast) probe table and the corpus
    // embedding from ONE equi-join — round 4 shuffled both payloads
    // per-collision through the distinct
    val corpusIds = bucketize(corpus, planes).select("table_id", "bucket", "vec_id")
    val probeIds = bucketize(
      probes.select(col("q_id").as("vec_id"), col("q_emb").as("embedding")), planes)
      .select(col("table_id"), col("bucket"), col("vec_id").as("q_id"))
    val candidates = probeIds
      .join(corpusIds, Seq("table_id", "bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select("q_id", "vec_id")
      .distinct() // same pair can collide in several tables
      .join(broadcast(probes), Seq("q_id"))
      .join(corpus, Seq("vec_id"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(CrossRound.r(col("sim"), 6).desc, col("vec_id"))
    candidates
      .withColumn("nrm_q", norm(col("q_emb")))
      .withColumn("nrm_c", norm(col("embedding")))
      .withColumn("sim", dot(col("q_emb"), col("embedding")) / (col("nrm_q") * col("nrm_c")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("sim"))
  }
}
