package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the bounded-memory
  * frequency summary for heavy-hitter reporting over key domains too
  * large to count exactly: `depth` hash rows × `width` buckets of
  * counters; an item increments one counter per row; its estimate is the
  * MIN over its counters. Estimates never undercount (every counter the
  * item touches holds its true count plus non-negative collision mass),
  * and overcount by more than εN with probability at most δ for
  * width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉ — the guarantee that makes top-k
  * reports trustworthy without a per-key table.
  *
  * Why a sketch when groupBy-count exists: at 100 TB the distinct-token
  * domain is itself corpus-scale, so an exact count shuffles and
  * materializes billions of rows per report. The sketch's map-side
  * partial aggregation collapses every task's contribution to at most
  * depth × width cells (a few KB), the one shuffle moves only those
  * cells, and the merged sketch is a BOUNDED table any number of
  * estimate queries then broadcast-join against — build once, probe
  * cheaply, the same train-once/serve-many posture as the ANN models.
  *
  * Determinism: counters are exact integer sums over deterministic
  * hash positions, so the whole sketch — including its collision
  * errors — reproduces bit-for-bit on any engine that mirrors the
  * hash. The x80 oracle does exactly that (XxHash64Sql string + long
  * CTE chains, the x35 bloom recipe): even the overestimates are
  * hash-gated, not tolerated.
  */
object Sketches {

  /** The row-`i` counter position of a key: the variable-length key
    * collapses to ONE long via `xxhash64(key)` (seed 42), then each row
    * derives its position from that long with a chained-seed hash —
    * `pmod(xxhash64(lit(i), h), width)`. Hashing the long instead of
    * re-hashing the string per row keeps the d-row cost O(len + d)
    * instead of O(d·len), and keeps the oracle mirror to one string
    * chain plus d long chains.
    */
  def cmsBucket(key: Column, row: Int, width: Int): Column =
    pmod(xxhash64(lit(row.toLong), xxhash64(key)), lit(width.toLong))

  private def positions(key: Column, depth: Int, width: Int): Column =
    posexplode(array((0 until depth).map(i => cmsBucket(key, i, width)): _*))

  /** Build the sketch: one pass over the items, one shuffle of at most
    * depth × width cells per task (the groupBy's partial aggregation is
    * the memory bound — cell count never scales with items or distinct
    * keys). Returns the merged counter table (row_i, bucket, cnt).
    */
  def cmsCells(
      items: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "sketch dimensions must be positive")
    items
      .select(positions(col(keyCol), depth, width).as(Seq("row_i", "bucket")))
      .groupBy("row_i", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketches of the SAME (depth, width) spec: counters add
    * cell-wise — CMS is a linear sketch, so build-per-partition /
    * build-per-day then merge equals one build over the union, EXACTLY
    * (integer sums; SketchesSpec pins it). This is the incremental
    * maintenance path: a daily batch builds its own d×w cells (cost =
    * the batch) and folds into the committed corpus sketch with a
    * bounded d×w aggregate — the corpus is never re-scanned, the same
    * O(batch) commit shape as the x29b postings and the BM25 ledger.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("row_i", "bucket")
      .agg(sum(col("cnt")).as("cnt"))

  // -------------------------------------------------------------------
  // HyperLogLog (Flajolet et al. 2007) — the bounded-memory DISTINCT
  // counter, the counting twin of the CMS frequency sketch: m = 2^p
  // registers each holding the maximum leading-zero rank seen among the
  // hashes routed to it. Where CMS merges by cell-wise ADDITION (linear),
  // HLL merges by register-wise MAX (idempotent) — so re-ingesting the
  // same batch twice cannot inflate the estimate, and per-day register
  // tables fold into the committed corpus sketch with a bounded m-row
  // aggregate (the O(batch) incremental shape again). Spark's own
  // approx_count_distinct is this sketch fused into an aggregate, but
  // its binary state can't be externalized, versioned, or merged across
  // engines — this register-table form can (and is exactly
  // oracle-mirrorable, collisions included).
  //
  // Bit layout per key (engine-portable two's-complement ops only —
  // arithmetic >> then mask, identical in Spark and DuckDB): register
  // index = low p bits of xxhash64(key); rank substream = the next 32
  // bits; rho = (leading zeros in those 32 bits) + 1 via the bin()
  // bit-length mirror, 33 when the substream is all-zero.
  // -------------------------------------------------------------------

  /** Pre-folded alpha_m · m² of the raw-estimate formula (m ≥ 128
    * form) — ONE Scala double, interpolated verbatim into the oracle so
    * both engines divide by the identical constant.
    */
  def hllAlphaM2(p: Int): Double = {
    val m = 1 << p
    0.7213 / (1.0 + 1.079 / m) * m * m
  }

  /** Build the register table: one pass, one shuffle of at most m cells
    * per task (groupBy-MAX is map-side combinable and bounded exactly
    * like the CMS build). Duplicate occurrences are free — MAX is
    * idempotent, so no distinct pre-shuffle is ever needed.
    */
  def hllRegisters(items: DataFrame, keyCol: String, p: Int): DataFrame =
    hllRegistersHashed(items, xxhash64(col(keyCol)), Nil, p)

  /** Register cells of a pre-computed 64-bit hash: (idx, rho) from the
    * low p bits / the 32-bit substream above them — shared by the flat
    * and keyed builders so one formula is what every oracle mirrors.
    */
  private def hllCells(h: Column, p: Int): (Column, Column) = {
    val m = 1L << p
    val w = shiftright(h, p).bitwiseAND(lit(4294967295L))
    val rho = when(w === 0, lit(33L))
      .otherwise(lit(33L) - length(bin(w)).cast("long"))
    (h.bitwiseAND(lit(m - 1)).as("idx"), rho.as("rho"))
  }

  /** Keyed register build over an arbitrary hash expression: one sketch
    * per `groupCols` value (e.g. per day), still ONE map-side-combinable
    * shuffle bounded by |groups| × m cells. Taking the hash as a Column
    * lets callers pick a seeded `xxhash64(lit(seed), key)` the oracle
    * mirrors with the long CTE chain.
    */
  def hllRegistersHashed(
      items: DataFrame, hash: Column, groupCols: Seq[String], p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "HLL precision must be in [4, 16]")
    val (idx, rho) = hllCells(hash, p)
    items
      .select(groupCols.map(col) ++ Seq(idx, rho): _*)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Merge two register tables of the SAME precision: register-wise MAX
    * (idempotent — the union of the underlying sets, exactly; SketchesSpec
    * pins merge ≡ one-shot build, and that re-merging a batch is a
    * no-op).
    */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("idx")
      .agg(max(col("rho")).as("rho"))

  /** Estimate distinct count from a register table: harmonic mean of
    * 2^-rho over all m registers (absent rows are zero registers), with
    * Flajolet's small-range linear-counting correction. One bounded
    * aggregate over an ≤ m-row table. Every term is an exact power of
    * two within a 33-exponent span, so the sum — and therefore the
    * estimate — is order-exact in double precision: plain r4, no drift
    * collapse. (The large-range 2^32 correction is omitted: the 32-bit
    * substream saturates far beyond any corpus this serves at p ≤ 16.)
    */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame =
    hllEstimateKeyed(registers, Nil, p)

  /** The same estimate per `groupCols` value (one row per group's
    * sketch): a grouped aggregate over a |groups| × ≤ m register table —
    * the serving shape for per-window / per-slice cardinality reports
    * where the corpus was folded once and everything after lives in
    * sketch space.
    */
  def hllEstimateKeyed(
      registers: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "HLL precision must be in [4, 16]")
    val m = 1 << p
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_present"),
        coalesce(sum(pow(lit(2.0), -col("rho").cast("double"))), lit(0.0))
          .as("sum_present"))
      .withColumn("n_zero", lit(m.toLong) - col("n_present"))
      .withColumn("sum_pow",
        col("sum_present") + col("n_zero").cast("double"))
      .withColumn("raw", lit(hllAlphaM2(p)) / col("sum_pow"))
      .select(
        groupCols.map(col) ++ Seq(
          lit(m.toLong).as("m"),
          col("n_zero"),
          when(col("raw") <= lit(2.5 * m) && col("n_zero") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero").cast("double")))
            .otherwise(col("raw")).as("est")): _*)
  }

  /** Fixed-grid histogram sketch — the mergeable quantile summary (the
    * third of the sketch family: CMS counts frequencies, HLL counts
    * distincts, this one summarizes a VALUE distribution): values bin
    * into a fixed [lo, lo + nBins·width) grid (overflow clamps into the
    * edge bins), and the cell table is bounded by nBins regardless of
    * input size. Build is one map-side-combinable shuffle; merge is
    * cell-wise SUM (linear, like the CMS — two commits fold to exactly
    * the one-shot build, so incremental ingestion is free); quantile
    * estimates interpolate linearly inside the covering bin, with error
    * bounded by one bin width. Exact percentiles buffer each group's
    * values; at 100 TB this fixed-memory, externalizable, cross-engine
    * cell table is what a serving layer stores and merges instead.
    * Deterministic end to end (integer counts, single-op double math),
    * so the oracle mirrors the whole estimate — grid error included.
    */
  def histCells(
      df: DataFrame, valueCol: String,
      lo: Double, width: Double, nBins: Int): DataFrame = {
    require(width > 0, "width must be positive")
    require(nBins > 1, "need at least two bins")
    df.select(
        least(
          greatest(floor((col(valueCol).cast("double") - lit(lo)) / lit(width)),
            lit(0.0)),
          lit((nBins - 1).toDouble))
          .cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise SUM merge of two histogram sketches on the SAME grid —
    * exactly the one-shot build of the concatenated inputs.
    */
  def histMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bin").agg(sum(col("cnt")).as("cnt"))

  /** Interpolated quantile estimates from a histogram sketch: for each
    * probability p, the first bin whose running count reaches p·N, with
    * linear interpolation inside it (the classic NIST interpolated
    * histogram percentile). Everything runs over the bounded cell
    * table — window folds exchange ≤ nBins rows, the probe×cells cross
    * is |probs| × nBins — so estimating any number of quantiles never
    * touches the corpus again.
    */
  def histQuantiles(
      cells: DataFrame, probs: Seq[Double],
      lo: Double, width: Double): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      "probs must be in (0, 1]")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val wCum = org.apache.spark.sql.expressions.Window.partitionBy().orderBy("bin")
    val cum = cells
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("cum_before", col("cum") - col("cnt"))
    val parr = array(probs.map(lit): _*)
    val pdf = cells.sparkSession.range(probs.size.toLong)
      .select(element_at(parr, col("id").cast("int") + 1).as("p"))
    val cand = pdf.crossJoin(cum)
      .filter(col("cum").cast("double") >= col("p") * col("n").cast("double"))
    cand.groupBy("p").agg(min(col("bin")).as("bin"))
      .join(cum, Seq("bin"))
      .select(
        col("p"), col("n"),
        (lit(lo) + lit(width) * (col("bin").cast("double") +
          (col("p") * col("n").cast("double") - col("cum_before").cast("double"))
            / col("cnt").cast("double"))).as("est"))
  }

  /** Point-estimate each candidate key against a built sketch: the MIN
    * of its depth counters (missing cells read 0 — a key the sketch
    * never saw estimates 0, never null). The cell table is bounded by
    * construction, so it broadcasts and the candidates stream map-side —
    * estimating a billion candidates costs one scan of them, zero
    * shuffles of the sketch.
    */
  def cmsEstimate(
      cells: DataFrame, candidates: DataFrame,
      keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "sketch dimensions must be positive")
    candidates
      .select(col(keyCol), positions(col(keyCol), depth, width).as(Seq("row_i", "bucket")))
      .join(broadcast(cells), Seq("row_i", "bucket"), "left")
      .na.fill(0, Seq("cnt"))
      .groupBy(keyCol)
      .agg(min(col("cnt")).as("est"))
  }
}
