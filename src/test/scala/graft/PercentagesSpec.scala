package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Percentages

object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.getOrCreate("local[4]")
}

class PercentagesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("percentages: per (branch,month,day) the move_type shares sum to 100") {
    val pct = Percentages.percentages(spark, sf)
    val sums = pct
      .groupBy("branch", "month", "day")
      .agg(sum("avg_percentage").as("s"))
      .filter(abs(col("s") - 100.0) > 1e-9)
    assert(sums.count() === 0)
  }

  test("percentages: values within (0, 100] and total_cnt > 0") {
    val pct = Percentages.percentages(spark, sf).cache()
    assert(pct.filter(col("avg_percentage") <= 0 || col("avg_percentage") > 100.0001).count() === 0)
    assert(pct.filter(col("total_cnt") <= 0).count() === 0)
    pct.unpersist()
  }

  test("percentages: key is unique (branch, move_type, month, day)") {
    val pct = Percentages.percentages(spark, sf)
    val dups = pct.groupBy("branch", "move_type", "month", "day").count().filter(col("count") > 1)
    assert(dups.count() === 0)
  }

  test("moveGrouped row count bounds the join output (SURVEY §5 property)") {
    val hist = graft.sources.Tables.historicalData(spark, sf)
    val fc = graft.sources.Tables.forecastingData(spark, sf)
    val mg = Percentages.moveGrouped(hist).count()
    val joined = Percentages.percentages(hist, fc).count()
    assert(joined <= mg)
  }

  test("monthlyAvg: one row per (branch, move_type, month)") {
    val ma = Percentages.monthlyAvg(Percentages.percentages(spark, sf))
    assert(ma.count() === ma.select("branch", "move_type", "month").distinct().count())
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
