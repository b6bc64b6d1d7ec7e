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
