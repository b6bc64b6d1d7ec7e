package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Percentages
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions shared by every query (FIXTURES.md §4):
  *   - deterministic: fixed `today` parameters, no wall clock, no rand();
  *   - canonical ORDER BY over the full output key in both the Spark query
  *     and its DuckDB oracle;
  *   - doubles rounded to a fixed scale at the output edge (r4/r2 below);
  *   - dates emitted as 'yyyy-MM-dd' strings, ints as BIGINT, so Spark
  *     parquet output and DuckDB result hash identically;
  *   - every computed column aliased to the same lowercase name on both
  *     sides.
  */
object SparkEntry {

  /** Round a small-magnitude double (ratios, percentages) for hash parity
    * (cross-engine-safe multiply form — see operators.CrossRound).
    */
  private def r4(c: Column): Column = graft.operators.CrossRound.r(c, 4)

  /** Round a money-magnitude sum: FP accumulation order across partitions can
    * drift ~1e-4 on 1e9-scale sums, so 2 decimals is the safe scale.
    */
  private def r2(c: Column): Column = graft.operators.CrossRound.r(c, 2)

  /** r4 for AGGREGATE-fed doubles — see CrossRound.ra (oracle mirror:
    * `round(round(x, 8), 4)`).
    */
  private def r4a(c: Column): Column = graft.operators.CrossRound.ra(c, 4)

  private def fmtDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Fixture train cutoff for o30/forecaster queries — the reference's own
    * cutoff is 2023-12-31 (pretrain_models.py:20) but the driver testdata
    * spans Jan 2024 only, so the fixture uses a cutoff inside that span.
    */
  val FixtureTrainCutoff = "2024-01-20"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship is the /forecast/ serving lifecycle
    * (main.py:187-338) — one per-day forecast row per branch for the
    * fixture window, through the full clamp → model → fallback-join →
    * scale → classify assembly.
    */
  def entry(spark: SparkSession): DataFrame =
    ServingQueries.queries("o42_forecast_daily")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Queries. Keys are SURVEY.md §2 operator IDs (oNN_*) for reference
  // parity, xNN_* for the large-scale-pipeline extensions, fNN_* for the
  // forecaster, sNN_* for streaming-equivalent batch semantics.
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ ServingQueries.queries ++ ExtensionQueries.queries

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O2/O3/O10: projected scans of the two fact views with the year filter.
    "o03_scan_historical" -> ((s, dir) =>
      Tables
        .historicalData(s, dir)
        .select(fmtDate(col("ds")).as("ds"), col("branch"), col("move_type"), r4(col("cnt")).as("cnt"))
        .orderBy("ds", "branch", "move_type")),
    "o02_scan_forecasting" -> ((s, dir) =>
      Tables
        .forecastingData(s, dir)
        .select(fmtDate(col("ds")).as("ds"), col("branch"), r4(col("cnt")).as("cnt"))
        .orderBy("ds", "branch")),

    // O28: 4-key grouped sum (precompute_percentages.py:134).
    "o28_grouped_sum4" -> ((s, dir) =>
      Percentages
        .moveGrouped(Tables.historicalData(s, dir))
        .select(col("branch"), col("move_type"), col("month"), col("day"), r4(col("move_cnt")).as("move_cnt"))
        .orderBy("branch", "move_type", "month", "day")),

    // O29: 3-key grouped sum (precompute_percentages.py:135).
    "o29_grouped_sum3" -> ((s, dir) =>
      Percentages
        .totalGrouped(Tables.forecastingData(s, dir))
        .select(col("branch"), col("month"), col("day"), r4(col("total_cnt")).as("total_cnt"))
        .orderBy("branch", "month", "day")),

    // O30: training prep — daily totals keyed (ds, branch) from the
    // UNFILTERED table (pretrain_models.py:9,13) with the train cutoff
    // applied (pretrain_models.py:20: ds <= '2023-12-31'). The engine
    // default cutoff is the reference's; the fixture instantiates
    // 2024-01-20 because the testdata postdates the reference's cutoff
    // (events span Jan 2024 only) — the cutoff must actually bite.
    "o30_training_prep" -> ((s, dir) =>
      Tables
        .forecastingDataAll(s, dir)
        .filter(col("ds") <= lit(FixtureTrainCutoff))
        .select(fmtDate(col("ds")).as("ds"), col("branch"), r4(col("cnt")).as("y"))
        .orderBy("ds", "branch")),

    // O22: the flagship precompute ratio join.
    "o22_percentages" -> ((s, dir) =>
      Percentages
        .percentages(s, dir)
        .select(
          col("branch"),
          col("move_type"),
          col("month"),
          col("day"),
          r4(col("move_cnt")).as("move_cnt"),
          r4(col("total_cnt")).as("total_cnt"),
          r4(col("avg_percentage")).as("avg_percentage"))
        .orderBy("branch", "move_type", "month", "day")),

    // O31: monthly average of percentages (main.py:102-106).
    "o31_monthly_avg" -> ((s, dir) =>
      Percentages
        .monthlyAvg(Percentages.percentages(s, dir))
        .select(col("branch"), col("move_type"), col("month"), r4a(col("month_avg")).as("month_avg"))
        .orderBy("branch", "move_type", "month")),

    // O33/O34: DISTINCT move types, sorted (main.py:205,
    // precompute_percentages.py:155-156).
    "o33_distinct_move_types" -> ((s, dir) =>
      Tables.historicalData(s, dir).select(col("move_type")).distinct().orderBy("move_type")),
  )

  /** Shared oracle CTE chain computing the DENSE percentages table (mirrors
    * Percentages.percentagesSingleScan: zero-percentage rows kept, Feb 29
    * excluded, total_cnt > 0 only). Appended after Tables.FactCtes.
    */
  val DensePctCtes: String =
    """mg AS (
      |  SELECT branch, move_type, EXTRACT(MONTH FROM ds) AS month,
      |         EXTRACT(DAY FROM ds) AS day, SUM(cnt) AS move_cnt
      |  FROM historical_data GROUP BY 1, 2, 3, 4),
      |tg AS (
      |  SELECT branch, month, day, SUM(move_cnt) AS total_cnt
      |  FROM mg GROUP BY 1, 2, 3),
      |mts AS (SELECT DISTINCT move_type FROM historical_data),
      |pct AS (
      |  SELECT tg.branch, mts.move_type, tg.month, tg.day,
      |         COALESCE(mg.move_cnt, 0) AS move_cnt,
      |         tg.total_cnt,
      |         100.0 * COALESCE(mg.move_cnt, 0) / tg.total_cnt AS avg_percentage
      |  FROM tg CROSS JOIN mts
      |  LEFT JOIN mg ON mg.branch = tg.branch AND mg.move_type = mts.move_type
      |              AND mg.month = tg.month AND mg.day = tg.day
      |  WHERE tg.total_cnt > 0 AND NOT (tg.month = 2 AND tg.day = 29))""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    coreOracleSql ++ ServingQueries.oracleSql ++ ExtensionQueries.oracleSql

  private def coreOracleSql: Map[String, String] = Map(
    "o03_scan_historical" ->
      s"""${Tables.FactCtes}
         |SELECT strftime(ds, '%Y-%m-%d') AS ds, branch, move_type, round(cnt, 4) AS cnt
         |FROM historical_data
         |ORDER BY 1, 2, 3""".stripMargin,
    "o02_scan_forecasting" ->
      s"""${Tables.FactCtes}
         |SELECT strftime(ds, '%Y-%m-%d') AS ds, branch, round(cnt, 4) AS cnt
         |FROM forecasting_data
         |ORDER BY 1, 2""".stripMargin,
    "o28_grouped_sum4" ->
      s"""${Tables.FactCtes}
         |SELECT branch, move_type, EXTRACT(MONTH FROM ds) AS month, EXTRACT(DAY FROM ds) AS day,
         |       round(SUM(cnt), 4) AS move_cnt
         |FROM historical_data
         |GROUP BY 1, 2, 3, 4
         |ORDER BY 1, 2, 3, 4""".stripMargin,
    "o29_grouped_sum3" ->
      s"""${Tables.FactCtes}
         |SELECT branch, EXTRACT(MONTH FROM ds) AS month, EXTRACT(DAY FROM ds) AS day,
         |       round(SUM(cnt), 4) AS total_cnt
         |FROM forecasting_data
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,
    "o30_training_prep" ->
      s"""${Tables.FactAllCtes}
         |SELECT strftime(ds, '%Y-%m-%d') AS ds, branch, round(cnt, 4) AS y
         |FROM forecasting_data_all
         |WHERE ds <= DATE '$FixtureTrainCutoff'
         |ORDER BY 1, 2""".stripMargin,
    "o22_percentages" ->
      s"""${Tables.FactCtes},
         |$DensePctCtes
         |SELECT branch, move_type, month, day,
         |       round(move_cnt, 4) AS move_cnt,
         |       round(total_cnt, 4) AS total_cnt,
         |       round(avg_percentage, 4) AS avg_percentage
         |FROM pct
         |ORDER BY 1, 2, 3, 4""".stripMargin,
    "o31_monthly_avg" ->
      s"""${Tables.FactCtes},
         |$DensePctCtes
         |SELECT branch, move_type, month, round(round(AVG(avg_percentage), 8), 4) AS month_avg
         |FROM pct
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,
    "o33_distinct_move_types" ->
      s"""${Tables.FactCtes}
         |SELECT DISTINCT move_type FROM historical_data ORDER BY 1""".stripMargin,
  )
}
