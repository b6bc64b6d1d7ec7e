package graft.operators

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** O32: `/historical_trends/` (main.py:340-407) as ONE query.
  *
  * The reference runs SIX sequential Postgres round-trips — one per year
  * 2019-2024 — each rewriting the clamped window into that year via
  * `start_date.replace(year=y)` (main.py:363-366) and running
  * filter + GROUP BY Date + ORDER BY Date (main.py:368-386). Here the six
  * per-year BETWEENs become one pushed-down OR-of-ranges predicate over a
  * single scan, grouped by (year, date) — one shuffle on a bounded key
  * space instead of six scans.
  *
  * Fidelity notes:
  *   - `replace(year=y)` on Feb 29 throws in the reference; LocalDate
  *     `withYear` snaps to Feb 28 instead. Callers with Feb-29 windows get
  *     the snapped range rather than an error (documented deviation).
  *   - A window crossing Dec 31 inverts under per-year rewriting
  *     (start > end), yielding empty per-year results — a reference quirk
  *     BETWEEN reproduces exactly.
  */
object Trends {

  def trends(
      historical: DataFrame,
      branch: String,
      moveType: Option[String],
      start: LocalDate,
      end: LocalDate,
      yearLo: Int = Tables.YearLo,
      yearHi: Int = Tables.YearHi): DataFrame = {
    val inAnyYearWindow: Column = (yearLo to yearHi)
      .map { y =>
        col("ds").between(
          lit(java.sql.Date.valueOf(start.withYear(y))),
          lit(java.sql.Date.valueOf(end.withYear(y))))
      }
      .reduce(_ || _)
    historical
      .filter(col("branch") === branch)
      .filter(moveType.map(mt => col("move_type") === mt).getOrElse(lit(true)))
      .filter(inAnyYearWindow)
      .groupBy(year(col("ds")).as("year"), col("ds"))
      .agg(sum(col("cnt")).as("total_moves"))
      .select(
        col("year").cast("long").as("year"),
        date_format(col("ds"), "MM-dd").as("date"),
        col("total_moves"))
      .orderBy("year", "date")
  }

  /** O46 for trends: the nested TrendsResult document (main.py:395-403).
    * Fidelity quirk preserved: the reference appends an entry for EVERY
    * year in the range, with an empty data array when the year has no rows
    * (main.py:364-393 — the per-year loop always appends) — so the
    * year spine is generated and left-joined, not derived from the data.
    */
  def toJsonResult(
      spark: SparkSession,
      trendRows: DataFrame,
      branch: String,
      moveType: Option[String],
      start: java.time.LocalDate,
      end: java.time.LocalDate,
      yearLo: Int = Tables.YearLo,
      yearHi: Int = Tables.YearHi): DataFrame = {
    import spark.implicits._
    val perYear = trendRows
      .groupBy(col("year"))
      .agg(sort_array(collect_list(struct(col("date"), col("total_moves").as("moves"))))
        .as("data"))
    val spine = (yearLo.toLong to yearHi.toLong).toDF("year")
    val years = spine
      .join(perYear, Seq("year"), "left")
      .select(col("year"), coalesce(col("data"), array()).as("data"))
      // sort_array (by the struct's leading year field) — collect_list
      // gives no ordering guarantee even after orderBy
      .agg(sort_array(collect_list(struct(col("year"), col("data"))))
        .as("historical_trends"))
    years.select(
      to_json(struct(
        lit(branch).as("branch"),
        lit(moveType.orNull).as("move_type"),
        col("historical_trends"),
        struct(
          lit(start.toString).as("start_date"),
          lit(end.toString).as("end_date")).as("window"))).as("result_json"))
  }
}
