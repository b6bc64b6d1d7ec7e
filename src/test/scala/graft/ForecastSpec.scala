package graft

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Forecast, Percentages}
import graft.sources.Tables

/** Golden-case tests for the serving pipeline (reference semantics from
  * main.py:215-228 clamp, :85-121 fallback, :269-280 classification).
  */
class ForecastSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  def ld(s: String): LocalDate = LocalDate.parse(s)

  // -------------------- window clamp (main.py:215-228) --------------------

  test("clamp: input within 3 days of today starts at today") {
    val (s, e) = Forecast.windowClamp(ld("2024-01-28"), ld("2024-01-25"))
    assert(s === ld("2024-01-25") && e === ld("2024-01-31"))
  }

  test("clamp: input in the past starts at today") {
    val (s, e) = Forecast.windowClamp(ld("2024-01-20"), ld("2024-01-25"))
    assert(s === ld("2024-01-25") && e === ld("2024-01-31"))
  }

  test("clamp: input within 3 days of the horizon cap ends at the cap") {
    val (s, e) = Forecast.windowClamp(ld("2025-07-28"), ld("2024-01-25"))
    assert(s === ld("2025-07-25") && e === ld("2025-07-31"))
  }

  test("clamp: mid-range input is centered +-3 days") {
    val (s, e) = Forecast.windowClamp(ld("2024-06-15"), ld("2024-01-25"))
    assert(s === ld("2024-06-12") && e === ld("2024-06-18"))
  }

  test("clamp: boundary day 4 from today is centered, day 3 snaps to today") {
    val (s4, _) = Forecast.windowClamp(ld("2024-01-29"), ld("2024-01-25"))
    assert(s4 === ld("2024-01-26")) // centered
    val (s3, _) = Forecast.windowClamp(ld("2024-01-28"), ld("2024-01-25"))
    assert(s3 === ld("2024-01-25")) // snapped
  }

  test("clamp: today within 6 days of cap clamps the end") {
    val (s, e) = Forecast.windowClamp(ld("2025-07-29"), ld("2025-07-28"))
    assert(s === ld("2025-07-28") && e === ld("2025-07-31"))
  }

  test("clamp: columnar form agrees with scalar form on all probes") {
    val today = ld("2024-01-25")
    val probes = ServingQueries.ClampProbes
    val (st, en) = Forecast.windowClampCols(
      to_date(col("p")), lit(java.sql.Date.valueOf(today)),
      lit(java.sql.Date.valueOf(Forecast.MaxDate)))
    probes.foreach { p =>
      val (s, e) = Forecast.windowClamp(ld(p), today)
      val row = probes.toDF("p").filter(col("p") === p)
        .select(st.cast("string"), en.cast("string")).head()
      assert(row.getString(0) === s.toString, s"start for $p")
      assert(row.getString(1) === e.toString, s"end for $p")
    }
  }

  // -------------------- fallback chain (main.py:85-121) --------------------

  test("fallback: day hit, month fallback, and 1.0 default all occur in fixture window") {
    val pct = Percentages.percentages(spark, sf)
    val req = Forecast.explodeWindow(
      pct.select("branch").distinct(),
      lit(java.sql.Date.valueOf(ServingQueries.winStart)),
      lit(java.sql.Date.valueOf(ServingQueries.winEnd)))
      .withColumn("move_type", lit("click"))
      .withColumn("month", month(col("ds")).cast("long"))
      .withColumn("day", dayofmonth(col("ds")).cast("long"))
    val levels = Forecast.fallbackPct(req, pct)
      .groupBy("fallback_level").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(levels.contains("month"), s"expected month fallback rows, got $levels")
    assert(levels.contains("default"), s"expected default rows, got $levels")
    // default rows are the February days: 3 per branch
    assert(levels("default") % 3 === 0)
    // default level must be exactly 1.0
    val d = Forecast.fallbackPct(req, pct)
      .filter(col("fallback_level") === "default")
      .select("effective_pct").distinct().collect()
    assert(d.length === 1 && d.head.getDouble(0) === 1.0)
  }

  // -------------------- classification (main.py:269-280) --------------------

  test("classification: exact +-5 boundary is 'consistent', beyond is not") {
    val df = Seq(5.0, -5.0, 5.000001, -5.000001, 0.0, 5.0000000001, 12.0, -7.5)
      .toDF("diff")
      .select(col("diff"), Forecast.classifyDiff(col("diff")).as("cls"))
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(df(5.0) === "consistent")
    assert(df(-5.0) === "consistent")
    assert(df(0.0) === "consistent")
    assert(df(5.000001) === "stronger")
    assert(df(-5.000001) === "weaker")
    // last-ulp noise below the 1e-6 guard must NOT flip the label
    assert(df(5.0000000001) === "consistent")
    assert(df(12.0) === "stronger")
    assert(df(-7.5) === "weaker")
  }

  test("pyRound matches Python round-half-even") {
    val got = Seq(0.5, 1.5, 2.5, 3.5, -0.5, -1.5, 2.4999, 2.5001)
      .toDF("x").select(col("x"), Forecast.pyRound(col("x")).as("r"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got(0.5) === 0L && got(1.5) === 2L && got(2.5) === 2L && got(3.5) === 4L)
    assert(got(-0.5) === 0L && got(-1.5) === -2L)
    assert(got(2.4999) === 2L && got(2.5001) === 3L)
  }

  test("comment %.1f pre-rounding: multiply-form half-even matches DuckDB (o43 parity pin)") {
    // The o43 oracle formats round_even(x * 10, 0) / 10 on its side and
    // this engine bround(x * 10) / 10 — probed identical in DuckDB on
    // every tie class (21.25+-ulp, 12.35, 12.25, 0.05, 0.15, 2.675,
    // 99.95, 3.35, 3.3499999999999996), so THIS behavior is the
    // cross-engine contract; a silent change here would break the o43
    // hash gate. Documented CPython deviation: f"{12.35:.1f}" is "12.3"
    // (binary half-even of the unrounded value); both engines here emit
    // 12.4 (12.35d * 10 rounds to exactly 123.5, half-even -> 124).
    val got = Seq(12.35, 12.25, 0.05, 0.15, 2.675, 99.95, 3.35)
      .toDF("x")
      .select(col("x"), format_string("%.1f", bround(col("x") * 10) / 10).as("s"))
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got(12.35) === "12.4")
    assert(got(12.25) === "12.2")
    assert(got(0.05) === "0.0")
    assert(got(0.15) === "0.2")
    assert(got(2.675) === "2.7")
    assert(got(99.95) === "100.0")
    assert(got(3.35) === "3.4")
  }

  // -------------------- validation quirks (main.py:200-209) ----------------

  test("invalid move type degrades to null (=> 100%), not an error") {
    val pct = Percentages.percentages(spark, sf)
    val eff = Forecast.effectiveMoveType(Seq("click", "NoSuchType").toDF("move_type"), pct)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(eff("click") === Some("click"))
    assert(eff("NoSuchType") === None)
  }

  // -------------------- end-to-end shape ----------------------------------

  test("dailyForecast with no move type uses 100% and the fixed phrase") {
    val pct = Percentages.percentages(spark, sf)
    val model = Forecast.baselineUpper(Tables.forecastingData(spark, sf))
    val daily = Forecast.dailyForecast(
      model, pct, None, ServingQueries.InputDate, ServingQueries.Today).cache()
    assert(daily.filter(col("input_pct") =!= 100.0).count() === 0)
    assert(daily.filter(col("predicted_moves") =!= col("branch_forecast")).count() === 0)
    assert(daily.select("comment").distinct().head().getString(0) === Forecast.NoMoveTypePhrase)
    daily.unpersist()
  }

  test("comments are formatted phrases carrying move type and both percentages (O43)") {
    val pct = Percentages.percentages(spark, sf)
    val model = Forecast.baselineUpper(Tables.forecastingData(spark, sf))
    val daily = Forecast.dailyForecast(
      model, pct, Some("click"), ServingQueries.InputDate, ServingQueries.Today).cache()
    // every comment mentions the move type and two one-decimal percentages
    assert(daily.filter(!col("comment").contains("click")).count() === 0)
    assert(daily.filter(!col("comment").rlike("\\d+\\.\\d%.*\\d+\\.\\d%")).count() === 0)
    // phrase bank is actually exercised across its 3 entries
    assert(daily.select("comment").distinct().count() > 3)
    daily.unpersist()
  }

  test("dailyForecast counts are non-negative and window has <= 7 days") {
    val pct = Percentages.percentages(spark, sf)
    val model = Forecast.baselineUpper(Tables.forecastingData(spark, sf))
    val daily = Forecast.dailyForecast(
      model, pct, Some("click"), ServingQueries.InputDate, ServingQueries.Today).cache()
    assert(daily.filter(col("branch_forecast") < 0 || col("predicted_moves") < 0).count() === 0)
    val spans = daily.groupBy("branch").agg(countDistinct("ds").as("n"))
    assert(spans.filter(col("n") > 7).count() === 0)
    daily.unpersist()
  }

  test("summary coalesces empty history to the input percentage (main.py:303)") {
    // craft a daily frame with hist_avg all null (no-move-type analog)
    val daily = Seq(
      ("B1", "2024-01-28", 10L, 5L, 50.0),
      ("B1", "2024-01-29", 8L, 4L, 50.0))
      .toDF("branch", "ds", "branch_forecast", "predicted_moves", "input_pct")
      .withColumn("hist_avg", lit(null).cast("double"))
    val s = Forecast.summarize(daily, Some("click")).head()
    assert(s.getAs[Double]("period_avg") === 50.0)
  }

  test("trends JSON includes an entry for every year, empty years as empty arrays") {
    import graft.operators.Trends
    val rows = Trends.trends(
      Tables.historicalData(spark, sf), ServingQueries.TrendsBranch, None,
      ServingQueries.trStart, ServingQueries.trEnd)
    val js = Trends.toJsonResult(
      spark, rows, ServingQueries.TrendsBranch, None,
      ServingQueries.trStart, ServingQueries.trEnd).head().getString(0)
    // all six years 2019-2024 present (main.py:364-393 appends every year)
    (2019 to 2024).foreach(y => assert(js.contains(s""""year":$y"""), s"year $y missing: $js"))
    // data lives only in 2024 (testdata spans Jan 2024)
    assert(js.contains(""""year":2019,"data":[]"""))
    assert(js.contains(""""year":2024,"data":[{"""))
  }

  test("toJsonResults emits one valid JSON document per branch") {
    val pct = Percentages.percentages(spark, sf)
    val model = Forecast.baselineUpper(Tables.forecastingData(spark, sf))
    val daily = Forecast.dailyForecast(
      model, pct, Some("click"), ServingQueries.InputDate, ServingQueries.Today)
    val summary = Forecast.summarize(daily, Some("click"))
    val js = Forecast.toJsonResults(
      daily, summary, Some("click"), ServingQueries.winStart, ServingQueries.winEnd).cache()
    assert(js.count() === daily.select("branch").distinct().count())
    val parsed = js.select(get_json_object(col("result_json"), "$.total_predicted_moves").as("t"))
    assert(parsed.filter(col("t").isNull).count() === 0)
    js.unpersist()
  }
}
