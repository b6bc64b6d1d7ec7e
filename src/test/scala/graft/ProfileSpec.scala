package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

class ProfileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("tableProfile: nulls, exact distincts, numeric/temporal bounds; one row per column") {
    val df = Seq(
      (1L, Option("a"), Option(2.5), Option(Timestamp.valueOf("2024-01-01 00:00:00"))),
      (2L, Option("a"), Option(-1.0), Option(Timestamp.valueOf("2024-01-03 12:00:00"))),
      (3L, None, None, None),
      (4L, Option("b"), Option(2.5), Option(Timestamp.valueOf("2024-01-02 00:00:00"))))
      .toDF("id", "s", "v", "t")
    val got = Profile.tableProfile(df, Seq("id", "s", "v", "t"))
      .collect()
      .map(r => r.getString(0) -> (
        r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap
    assert(got.size === 4)
    assert(got("id") === ((4L, 0L, 4L, Some(1.0), Some(4.0))))
    // distinct counts NON-NULL values; string columns carry null bounds
    assert(got("s") === ((4L, 1L, 2L, None, None)))
    assert(got("v") === ((4L, 1L, 2L, Some(-1.0), Some(2.5))))
    // temporal bounds on the epoch-micros axis (exact in double)
    val dayUs = 86400e6
    val (n, nn, nd, mn, mx) = got("t")
    assert(n === 4L && nn === 1L && nd === 3L)
    assert(mx.get - mn.get === 2.5 * dayUs)
  }

  test("tableProfile: single aggregate — the plan scans the input once") {
    val df = (1L to 100L).map(i => (i, s"s$i", i * 1.5)).toDF("a", "b", "c")
    val plan = Profile.tableProfile(df, Seq("a", "b", "c"))
      .queryExecution.optimizedPlan.toString
    val scans = "LocalRelation|LogicalRDD".r.findAllIn(plan).length
    assert(scans === 1, s"expected one scan of the input:\n${plan.take(800)}")
  }
}
