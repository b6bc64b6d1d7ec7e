package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT tooling — Z-order (Morton) clustering,
  * the storage-side scan-pruning lever for 100 TB tables.
  *
  * A table sorted on one column prunes scans on that column only: every
  * file spans nearly the full range of every OTHER predicate column, so
  * a `user_id = ?` probe over a time-sorted event log still opens every
  * file. Interleaving the bits of several quantized dimensions into one
  * sort key (Morton 1966; the technique behind Delta/Iceberg's
  * `OPTIMIZE ZORDER BY`) makes files cover small HYPERCUBES of the key
  * space instead of thin slabs, so min/max file statistics prune
  * multi-dimensional and single-dimension predicates alike — the
  * difference between touching ~√F and all F files on the second
  * dimension. LayoutSpec measures exactly that contract.
  *
  * Everything here is closed-form integer math (quantize = one exact
  * integral division against broadcast bounds; interleave = shift/mask
  * bit assembly), so the whole key derivation restates in ANSI SQL and
  * carries a DuckDB oracle (x64) — and it all runs inside whole-stage
  * codegen, no UDFs.
  */
object Layout {

  /** The interleaved Morton value of per-dimension quantized ranks
    * `qs` (each already in `[0, 1<<bits)`): bit `i` of dimension `j`
    * lands at position `i*d + (d-1-j)`, so the FIRST dimension takes
    * the more significant bit of each group — dimension order is the
    * (documented) tie-break, not a semantic choice.
    */
  def interleave(qs: Seq[Column], bits: Int): Column = {
    val d = qs.size
    require(d >= 1, "need at least one dimension")
    require(bits * d <= 63, s"z-value needs $bits*$d bits; must fit a signed 64-bit key")
    val parts =
      for {
        (q, j) <- qs.zipWithIndex
        i <- 0 until bits
      } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * d + (d - 1 - j))
    parts.reduce(_.bitwiseOR(_))
  }

  /** Add a `zval` column: the Z-order key over the named BIGINT
    * dimensions, each quantized to `bits` bits against its own global
    * min/max. The bounds are ONE bounded aggregate row broadcast back
    * (never a per-row window); quantization is exact integral math —
    * `(v - lo) * 2^bits DIV (hi - lo + 1)` — so a value at `hi` lands
    * on level `2^bits - 1` and a degenerate constant dimension on 0.
    * Timestamps/dates: convert to epoch integers first
    * (`unix_micros`), which keeps the arithmetic engine-portable.
    * Null dimension values propagate to a null `zval` (range-partition
    * them into their own bucket or filter first). The quantization
    * product `(v − lo) · 2^bits` must fit a signed 64-bit — true for
    * epoch micros, ids and counters at any `bits` this key admits, but
    * NOT for a full-range 64-bit hash column: reduce such a dimension
    * (e.g. `shiftrightunsigned(h, 64 − bits)`) before z-ordering it.
    */
  def zOrderKey(df: DataFrame, dims: Seq[String], bits: Int): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension")
    val levels = 1L << bits
    // helper columns wear the __ prefix so user columns cannot collide
    val boundCols = dims.zipWithIndex.flatMap { case (d, j) =>
      Seq(min(col(d)).as(s"__lo_$j"), max(col(d)).as(s"__hi_$j"))
    }
    val bounds = df.agg(boundCols.head, boundCols.tail: _*)
    val withQ = dims.indices.foldLeft(df.crossJoin(broadcast(bounds))) { (acc, j) =>
      acc.withColumn(s"__q_$j",
        expr(s"(`${dims(j)}` - __lo_$j) * $levels DIV (__hi_$j - __lo_$j + 1)"))
    }
    withQ
      .withColumn("zval", interleave(dims.indices.map(j => col(s"__q_$j")), bits))
      .drop(dims.indices.map(j => s"__q_$j") ++
        dims.indices.flatMap(j => Seq(s"__lo_$j", s"__hi_$j")): _*)
  }

  /** Write `df` Z-ordered into `numFiles` range-partitioned, key-sorted
    * parquet files — the OPTIMIZE job. `repartitionByRange` on the key
    * (one shuffle, sampled range boundaries — never a single-partition
    * global sort) gives each output file a tight contiguous z-range,
    * i.e. a small hypercube of the dimension space for min/max pruning
    * to cut. The helper key never reaches disk.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dims: Seq[String],
      bits: Int,
      numFiles: Int): Unit =
    zOrderKey(df, dims, bits)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max of the given columns — the statistics a format
    * metadata layer (parquet footers, Delta/Iceberg manifests) keeps
    * and a pruning planner consults. Exposed so the skip rate of a
    * layout is measurable ([[LayoutSpec]] asserts z-order's) rather
    * than asserted: `SELECT count(*) FROM files WHERE lo <= x AND
    * x <= hi` is exactly the planner's file-pruning test.
    */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumn("__file", input_file_name())
      .groupBy("__file")
      .agg(
        min(col(cols.head)).as(s"${cols.head}_lo"),
        cols.flatMap(c =>
          Seq(min(col(c)).as(s"${c}_lo"), max(col(c)).as(s"${c}_hi"))).tail: _*)
}
