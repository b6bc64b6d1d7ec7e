package graft

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Trends

/** Golden pin for the documented Feb-29 deviation (Trends.scala header):
  * the reference's `start_date.replace(year=y)` THROWS for Feb 29 rewritten
  * into a non-leap year (main.py:363-366 has no guard); the engine's
  * LocalDate.withYear SNAPS to Feb 28 instead, so a Feb-29 window returns
  * the snapped per-year ranges rather than erroring. This test exists so
  * the documented behavior cannot silently change.
  */
class TrendsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("Feb-29 window snaps to Feb 28 in non-leap years instead of erroring") {
    import spark.implicits._
    val hist = Seq(
      // (ds, branch, move_type, cnt) — one row on each boundary-adjacent day
      ("2024-02-28", "B1", "click", 1.0),
      ("2024-02-29", "B1", "click", 2.0), // leap day exists in 2024
      ("2024-03-01", "B1", "click", 4.0),
      ("2023-02-28", "B1", "click", 8.0), // 2023 has no Feb 29
      ("2023-03-01", "B1", "click", 16.0),
      ("2020-02-29", "B1", "click", 32.0) // leap day exists in 2020
    ).toDF("ds", "branch", "move_type", "cnt")
      .select(
        org.apache.spark.sql.functions.to_date($"ds").as("ds"),
        $"branch", $"move_type", $"cnt")

    val feb29 = LocalDate.parse("2024-02-29")
    val out = Trends
      .trends(hist, "B1", None, feb29, feb29, yearLo = 2019, yearHi = 2024)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet

    // Leap years keep the true Feb-29 window; non-leap years snap both
    // endpoints to Feb 28 — so 2023 returns its Feb-28 row, and no year
    // leaks a Mar-01 row or throws.
    assert(out === Set(
      (2020L, "02-29", 32.0),
      (2023L, "02-28", 8.0),
      (2024L, "02-29", 2.0)))
  }
}
