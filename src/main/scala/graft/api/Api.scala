package graft.api

import java.time.LocalDate

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Forecast, Percentages}

/** Typed API boundary (SURVEY §1.3): the relational pipeline stays
  * DataFrame-based; requests and results cross the boundary as case-class
  * Datasets, mirroring the reference's pydantic models
  * (ForecastInput main.py:124-127, result shape main.py:321-332).
  */
case class ForecastInput(date: String, branch: String, move_type: Option[String])

case class DailyForecast(
    branch: String,
    ds: java.sql.Date,
    branch_forecast: Long,
    predicted_moves: Long,
    comment_class: String,
    comment: String)

case class ForecastSummary(
    branch: String,
    total_predicted_moves: Long,
    total_branch_forecast: Long,
    average_daily_moves: Long,
    current_pct: Double,
    period_avg: Double,
    summary_class: String)

object Api {

  /** The `/forecast/` request surface, typed end to end: validates the
    * input date (strict parse + horizon cap — ValueError analogs as
    * IllegalArgumentException), applies the invalid-move-type silent
    * degrade, runs the set-oriented pipeline for ALL branches, and filters
    * to the requested one.
    */
  def forecast(
      spark: SparkSession,
      input: ForecastInput,
      model: org.apache.spark.sql.DataFrame,
      pct: org.apache.spark.sql.DataFrame,
      today: LocalDate): (Dataset[DailyForecast], Dataset[ForecastSummary]) = {
    import spark.implicits._
    val inputDate =
      try LocalDate.parse(input.date)
      catch {
        case _: java.time.format.DateTimeParseException =>
          // main.py:190-193
          throw new IllegalArgumentException(
            "Invalid date format. Use YYYY-MM-DD (e.g., '2025-06-30')")
      }
    if (inputDate.isAfter(Forecast.MaxDate))
      // main.py:195-197
      throw new IllegalArgumentException(s"Date must be on or before ${Forecast.MaxDate}")

    // main.py:204-209 — invalid move type silently degrades to None
    val validTypes = pct.select("move_type").distinct().as[String].collect().toSet
    val effMoveType = input.move_type.filter(validTypes.contains)

    val daily = Forecast.dailyForecast(model, pct, effMoveType, inputDate, today)
      .filter(col("branch") === input.branch)
    val summary = Forecast.summarize(daily, effMoveType)
      // CrossRound so the API reports the same digits as the oracle-gated
      // query surface (o36) — and partition-order-stably (period_avg is an
      // AVG over doubles)
      .withColumn("current_pct", graft.operators.CrossRound.ra(col("current_pct"), 6))
      .withColumn("period_avg", graft.operators.CrossRound.ra(col("period_avg"), 6))
    (
      daily
        .select("branch", "ds", "branch_forecast", "predicted_moves", "comment_class", "comment")
        .as[DailyForecast],
      summary
        .select(
          "branch", "total_predicted_moves", "total_branch_forecast",
          "average_daily_moves", "current_pct", "period_avg", "summary_class")
        .as[ForecastSummary])
  }
}
