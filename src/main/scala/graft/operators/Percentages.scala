package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The precompute pipeline: Spark restatement of the reference's
  * `precompute_percentages.py` batch job.
  *
  * Reference semantics (file:line into /root/reference/):
  *   - two scans with a 2019-2024 year predicate
  *     (precompute_percentages.py:96-103)
  *   - month/day derivation (precompute_percentages.py:120-129)
  *   - two grouped sums (O28/O29, precompute_percentages.py:132-139)
  *   - then a quadruple nested loop of point lookups computing, per
  *     (branch, move_type, month, day), `move_count / total_count * 100`
  *     (precompute_percentages.py:178-239), upserted in batches of 1000.
  *
  * Spark restatement (SURVEY.md §2.3 O22): the whole loop IS one equi-join.
  * Two partial+final hash aggregations and one shuffle-hash/sort-merge join —
  * 2 shuffles total instead of 110x|T|x12x31 point lookups. Rows with
  * total_cnt == 0 are dropped, matching the reference's skip
  * (precompute_percentages.py:209-215); invalid (month, day) combinations
  * (Feb 30, ...) can never arise because keys derive from real dates (O16 —
  * precompute_percentages.py:190-193 becomes a no-op by construction).
  *
  * Scale posture: both aggregations shuffle on subsets of the same key family
  * (branch, [move_type,] month, day); the join keys (branch, month, day) have
  * bounded cardinality (110 x 366 ~ 40k) so the join side built from
  * forecasting_data is tiny after aggregation — Catalyst/AQE broadcasts it at
  * any input scale, making the whole pipeline ONE real shuffle over the fact
  * data at 100 TB.
  */
object Percentages {

  /** O28: grouped sum over 4 keys (precompute_percentages.py:134). */
  def moveGrouped(historical: DataFrame): DataFrame =
    historical
      .groupBy(
        col("branch"),
        col("move_type"),
        month(col("ds")).cast("long").as("month"),
        dayofmonth(col("ds")).cast("long").as("day"))
      .agg(sum(col("cnt")).as("move_cnt"))

  /** O29: grouped sum over 3 keys (precompute_percentages.py:135). */
  def totalGrouped(forecasting: DataFrame): DataFrame =
    forecasting
      .groupBy(
        col("branch"),
        month(col("ds")).cast("long").as("month"),
        dayofmonth(col("ds")).cast("long").as("day"))
      .agg(sum(col("cnt")).as("total_cnt"))

  /** O22: the ratio join. Output key: (branch, move_type, month, day);
    * avg_percentage = 100 * move_cnt / total_cnt, total_cnt > 0 only.
    */
  def percentages(historical: DataFrame, forecasting: DataFrame): DataFrame = {
    val mg = moveGrouped(historical)
    val tg = totalGrouped(forecasting)
    mg.join(tg, Seq("branch", "month", "day"), "inner")
      .filter(col("total_cnt") > 0)
      .select(
        col("branch"),
        col("move_type"),
        col("month"),
        col("day"),
        col("move_cnt"),
        col("total_cnt"),
        (lit(100.0) * col("move_cnt") / col("total_cnt")).as("avg_percentage"))
  }

  /** Convenience: the full pipeline from a testdata dir. */
  def percentages(spark: SparkSession, dir: String): DataFrame =
    percentages(Tables.historicalData(spark, dir), Tables.forecastingData(spark, dir))

  /** O31: the monthly average the serving fallback uses
    * (main.py:102-106) — materialized once instead of per-request SQL.
    */
  def monthlyAvg(pct: DataFrame): DataFrame =
    pct
      .groupBy(col("branch"), col("move_type"), col("month"))
      .agg(avg(col("avg_percentage")).as("month_avg"))

  /** O5: idempotent persisted form of the percentages table. Partitioned by
    * `month` (the reference's own PK prefix suggests the access pattern:
    * serving always probes one (month, day) slice — partition pruning replaces
    * the reference's composite index, precompute_percentages.py:73-74).
    * Overwrite-recompute replaces the reference's ON CONFLICT upsert
    * (precompute_percentages.py:218-233); the checkpoint/resume machinery
    * (O6, precompute_percentages.py:82-91) is subsumed by deterministic
    * recompute + Spark stage retry.
    */
  def writePercentages(pct: DataFrame, outPath: String): Unit =
    pct.write.mode("overwrite").partitionBy("month").parquet(outPath)
}
