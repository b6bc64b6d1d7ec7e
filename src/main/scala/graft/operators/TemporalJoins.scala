package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: as-of (latest-at-or-
  * before) and interval-containment joins — the two custom-operator
  * classes the extension brief names. Both are built by COMPOSING
  * existing shuffle-parallel operators (preference (a) of the brief's
  * custom-operator ladder): no BroadcastNestedLoopJoin, no theta-join
  * row explosion, at any scale.
  *
  * The reference itself has no temporal joins (SURVEY.md §2.3 "not
  * present"); these serve the time-series side of a training-data
  * pipeline — aligning events to the freshest model/feature snapshot
  * (as-of) and attributing points to sessions/windows (interval).
  */
object TemporalJoins {

  /** Shared tagged-union prep of both as-of directions: left/right rows
    * in one fixed schema (keys..., __ts, __side, __l, __r). One payload
    * struct per side keeps the union schema fixed no matter the caller's
    * column sets (nulls on the opposite side); keys and ts ride ONCE as
    * the top-level window columns — duplicating them inside the structs
    * would double the key/ts bytes through the operator's single
    * (deliberately key-hot) shuffle. Right rows with a null timestamp
    * are dropped ("no snapshot", not "the earliest/latest snapshot" —
    * nulls-first/last window order would otherwise hand them to left
    * rows; DuckDB's ASOF never matches null either), and so are
    * null-KEY right rows (ASOF equi-keys are SQL equality —
    * NULL-never-matches — but Window.partitionBy groups nulls into one
    * partition and would let a null-key left row adopt a null-key right
    * row).
    */
  private final case class AsofSides(
      l: DataFrame, r: DataFrame,
      leftCols: Seq[String], rightPayloadCols: Seq[String])

  private def asofTagSides(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String): AsofSides = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val rightPayloadCols = right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val leftPayloadCols = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val leftCols = left.columns.toSeq
    require(
      leftCols.intersect(rightPayloadCols).isEmpty,
      "rename overlapping right columns before the as-of join")
    val rightStructT = org.apache.spark.sql.types.StructType(
      right.select((rightPayloadCols :+ tsCol).map(col): _*).schema.fields)
    val leftStructT = org.apache.spark.sql.types.StructType(
      left.select(leftPayloadCols.map(col): _*).schema.fields)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"),
        lit(1).as("__side"),
        struct(leftPayloadCols.map(col): _*).as("__l"),
        lit(null).cast(rightStructT).as("__r")): _*)
    val r = right
      .filter(col(tsCol).isNotNull)
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(
          col(tsCol).as("__ts"),
          lit(0).as("__side"),
          lit(null).cast(leftStructT).as("__l"),
          struct((rightPayloadCols :+ tsCol).map(col): _*).as("__r")): _*)
    AsofSides(l, r, leftCols, rightPayloadCols)
  }

  /** Shared un-tagging of a matched as-of frame back into caller schema:
    * left columns unchanged, right payload columns appended, plus the
    * matched right timestamp as `<prefix>_<tsCol>`.
    */
  private def asofFinish(
      matched: DataFrame, sides: AsofSides,
      keys: Seq[String], tsCol: String, prefix: String): DataFrame =
    matched.select(
      sides.leftCols.map(c =>
        if (c == tsCol) col("__ts").as(c)
        else if (keys.contains(c)) col(c)
        else col(s"__l.$c").as(c)) ++
        sides.rightPayloadCols.map(c => col(s"__match.$c").as(c)) :+
        col(s"__match.$tsCol").as(s"${prefix}_$tsCol"): _*)

  /** Backward as-of join: for every left row, attach the LATEST right row
    * of the same key with `right.tsCol <= left.tsCol` (inclusive — the
    * DuckDB `ASOF JOIN ... ON l.ts >= r.ts` semantics), or nulls when no
    * right row precedes it. Left rows are never dropped or duplicated.
    *
    * Implementation is the published one-shuffle recipe, NOT a range
    * join: tag both sides, union, and take `last(right_payload,
    * ignoreNulls)` over a per-key window ordered by (ts, side) with
    * side sorting right rows BEFORE left rows at equal timestamps so
    * ties match inclusively. ONE shuffle on `keys` + a per-key sort —
    * at 100 TB this is the same plan class as sessionization (a
    * degenerately hot key is AQE/salting territory), where the naive
    * `l.key = r.key AND r.ts <= l.ts` theta-join degenerates to a
    * per-key cross product.
    *
    * Contract: `right` must be unique per (keys, tsCol) — an as-of
    * source is a keyed time series; duplicate timestamps would make
    * "the latest row" ill-defined on every engine.
    *
    * @param keys   equi-join key columns present on both sides
    * @param tsCol  timestamp/ordering column name, present on both sides
    *               (same type both sides; any orderable type)
    * @param blockWidthMicros opt-in hot-key hatch: 0 (default) runs the
    *        one-window plan above; > 0 splits every key's timeline into
    *        time blocks of this many microseconds and windows per
    *        (key, block), with one bounded carry pass stitching block
    *        boundaries — see [[asofJoinBackwardBlocked]]. Results are
    *        identical; requires a temporal (timestamp/date) `tsCol`.
    * @return left columns unchanged, plus every non-key right column
    *         (its `tsCol` renamed `asof_<tsCol>`), nullable
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      blockWidthMicros: Long = 0L): DataFrame = {
    val sides = asofTagSides(left, right, keys, tsCol)
    val matched =
      if (blockWidthMicros <= 0L) {
        val w = Window
          .partitionBy(keys.map(col): _*)
          .orderBy(col("__ts"), col("__side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sides.l.unionByName(sides.r)
          .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
          .filter(col("__side") === 1)
      } else asofJoinBackwardBlocked(sides.l, sides.r, keys, blockWidthMicros)
    asofFinish(matched, sides, keys, tsCol, "asof")
  }

  /** Forward as-of join: for every left row, attach the EARLIEST right
    * row of the same key with `right.tsCol >= left.tsCol` (inclusive —
    * DuckDB's `ASOF LEFT JOIN ... ON l.ts <= r.ts`), or nulls when no
    * right row follows. The "next scheduled snapshot / next price tick /
    * next maintenance window" lookup — the mirror of
    * [[asofJoinBackward]], and the same ONE-shuffle tagged-union window
    * plan with the ORDER reversed: descending timestamps make "earliest
    * following right row" the running `last(__r)` exactly as ascending
    * made "latest preceding". `desc_nulls_first` keeps null-ts left rows
    * match-free (they sort before every real right row in the reversed
    * order). Same contract as backward: right unique per (keys, tsCol),
    * overlapping right columns renamed first. The matched timestamp
    * returns as `asof_next_<tsCol>`. No blocked hatch — a degenerately
    * hot key takes the [[asofJoinBackwardBlocked]] treatment with the
    * sign of the block carry flipped; compose on demand.
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String): DataFrame = {
    val sides = asofTagSides(left, right, keys, tsCol)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc_nulls_first, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = sides.l.unionByName(sides.r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    asofFinish(matched, sides, keys, tsCol, "asof_next")
  }

  /** The hot-key hatch behind `asofJoinBackward(blockWidthMicros > 0)`:
    * the one-window plan concentrates each key on one task (the same
    * plan class as sessionization), so a degenerately hot key — a
    * null-like sentinel branch, a default user id — serializes its whole
    * timeline. This path splits every key's timeline into fixed-width
    * time BLOCKS and windows per (key, block), spreading the hot key
    * across ceil(span / blockWidth) tasks, then stitches block
    * boundaries with a carry pass:
    *
    *   1. one aggregate per (key, block): the block's latest right
    *      payload (`max_by` over right-side rows) — bounded by
    *      #keys x #blocks, far below the row count, on the SAME spread
    *      key as the windows;
    *   2. a per-key window over that bounded seed frame computes each
    *      block's carry-in = the latest right payload of any EARLIER
    *      block (hot-key cost here: #blocks rows, not #rows);
    *   3. carries re-enter the union as synthetic right-tagged rows
    *      sorted BEFORE their block's real rows (`__ord` 0 vs 1) — no
    *      equality join back (which would drop null-key left rows), and
    *      the per-(key, block) window then resolves exactly the
    *      backward as-of semantics: latest in-block right at-or-before,
    *      else the carry.
    *
    * Block assignment is any monotone function of the timestamp, so
    * floor(micros / width) boundary behavior cannot change results —
    * only the spread. Null timestamps take a sentinel block that sorts
    * first and never carries. Requires a temporal `tsCol` (cast to
    * timestamp must be defined); width trades spread against per-block
    * carry overhead exactly like [[intervalJoin]]'s bucketWidth.
    */
  private def asofJoinBackwardBlocked(
      l: DataFrame,
      r: DataFrame,
      keys: Seq[String],
      blockWidthMicros: Long): DataFrame = {
    val blk = coalesce(
      floor(unix_micros(col("__ts").cast("timestamp")) / blockWidthMicros).cast("long"),
      lit(Long.MinValue))
    val u = l.unionByName(r)
      .withColumn("__blk", blk)
      .withColumn("__ord", lit(1))
    val seeds = u
      .groupBy((keys :+ "__blk").map(col): _*)
      .agg(max_by(col("__r"), when(col("__side") === 0, col("__ts"))).as("__blkLast"))
    val wCarry = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val synthetic = seeds
      .withColumn("__carry", last(col("__blkLast"), ignoreNulls = true).over(wCarry))
      .filter(col("__carry").isNotNull)
      .select(
        keys.map(col) ++ Seq(
          lit(null).cast(u.schema("__ts").dataType).as("__ts"),
          lit(0).as("__side"),
          lit(null).cast(u.schema("__l").dataType).as("__l"),
          col("__carry").as("__r"),
          col("__blk"),
          lit(0).as("__ord")): _*)
    val w = Window
      .partitionBy((keys :+ "__blk").map(col): _*)
      .orderBy(col("__ord"), col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.unionByName(synthetic)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
  }

  /** Interval-containment join: every (point, interval) pair of the same
    * key with `startCol <= point.tsCol <= endCol`. Inner semantics;
    * points in no interval drop out, points in several match each.
    *
    * Implementation is time-bucketed equi-join, not a theta join: both
    * sides map onto integer buckets of `bucketWidth` micros — a point
    * lands in exactly ONE bucket, an interval explodes onto every
    * bucket it overlaps — so candidates meet through a plain
    * shuffle-hash equi-join on (keys, bucket) and one exact BETWEEN
    * filter finishes the job. Each true pair is produced exactly once
    * (the point's single bucket), so no distinct pass is needed.
    *
    * 100 TB posture: shuffle keyed on (keys, bucket) — adding the
    * bucket to the key SPREADS a hot key across its time range, the
    * opposite of the as-of join's hot-key concentration. Interval-side
    * fan-out is ceil(span / bucketWidth) rows per interval: pick
    * bucketWidth near the TYPICAL interval span so fan-out stays O(1)
    * per interval while bucket population stays bounded (the
    * standard span/selectivity trade of every bucketized range join —
    * Spark has no IEJoin).
    *
    * @param tsCol    point timestamp column (TIMESTAMP/TIMESTAMP_NTZ)
    * @param startCol interval start column on `intervals`
    * @param endCol   interval end column (inclusive) on `intervals`
    * @param bucketWidthMicros bucket size in microseconds (default 1 h)
    * @return point columns + every non-key interval column
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketWidthMicros: Long = 3600L * 1000000L): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one equi-key")
    require(bucketWidthMicros > 0, "bucketWidthMicros must be positive")
    // same contract as the as-of join, checked up front: an overlapping
    // non-key name would otherwise surface as an opaque
    // AMBIGUOUS_REFERENCE at analysis time
    require(
      points.columns.toSeq.intersect(
        intervals.columns.filterNot(keys.contains).toSeq).isEmpty,
      "rename overlapping interval columns before the interval join")
    // NTZ-proof epoch micros (the unix_millis/TIMESTAMP_NTZ lesson):
    // cast to session-tz timestamp first — a no-op for tz inputs, exact
    // under the pinned-UTC session for NTZ inputs
    def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
    val p = points.withColumn(
      "__bucket", floor(micros(col(tsCol)) / bucketWidthMicros))
    val iv = intervals
      .withColumn(
        "__bucket",
        explode(sequence(
          floor(micros(col(startCol)) / bucketWidthMicros),
          floor(micros(col(endCol)) / bucketWidthMicros))))
    val intervalPayload = intervals.columns.filterNot(keys.contains).toSeq
    p.join(iv, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .select(
        points.columns.filterNot(_ == "__bucket").map(col).toSeq ++
          intervalPayload.map(col): _*)
  }
}
