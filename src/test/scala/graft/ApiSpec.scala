package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{Api, ForecastInput}
import graft.operators.{Forecast, Percentages}
import graft.sources.Tables

/** Typed API boundary tests: request validation semantics (ValueError
  * analogs), silent move-type degrade, typed results.
  */
class ApiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  val sf = "/root/testdata/sf0.001"
  def pct = Percentages.percentages(spark, sf)
  def model = Forecast.baselineUpper(Tables.forecastingData(spark, sf))

  test("forecast returns typed daily and summary rows for the requested branch") {
    val (daily, summary) = Api.forecast(
      spark, ForecastInput("2024-01-31", "B7", Some("click")),
      model, pct, ServingQueries.Today)
    val days = daily.collect()
    assert(days.nonEmpty && days.forall(_.branch == "B7"))
    assert(days.forall(d => d.predicted_moves >= 0 && d.comment.nonEmpty))
    val s = summary.collect()
    assert(s.length === 1 && s.head.total_predicted_moves >= 0)
  }

  test("bad date format raises the ValueError analog") {
    val e = intercept[IllegalArgumentException] {
      Api.forecast(spark, ForecastInput("31-01-2024", "B7", None), model, pct, ServingQueries.Today)
    }
    assert(e.getMessage.contains("YYYY-MM-DD"))
  }

  test("date beyond the horizon cap raises") {
    val e = intercept[IllegalArgumentException] {
      Api.forecast(spark, ForecastInput("2025-08-01", "B7", None), model, pct, ServingQueries.Today)
    }
    assert(e.getMessage.contains("2025-07-31"))
  }

  test("invalid move type silently degrades to the 100% no-type path") {
    val (daily, _) = Api.forecast(
      spark, ForecastInput("2024-01-31", "B7", Some("NotAType")),
      model, pct, ServingQueries.Today)
    val days = daily.collect()
    assert(days.forall(_.comment_class == "no_move_type"))
    assert(days.forall(d => d.predicted_moves == d.branch_forecast))
  }
}
