package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CrossRound

/** Pins the cross-engine rounding contract: CrossRound.r must agree with
  * DuckDB's multiply-based round (the oracle side), NOT with Spark's
  * repr-based round(x, s) — 12.34565 is the witness value where they
  * differ (DuckDB/CrossRound: 12.3456; plain Spark round: 12.3457).
  */
class CrossRoundSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("r(x, 4) matches DuckDB round semantics, including the repr-tie witness") {
    val vals = Seq(0.12345, 0.12355, 2.00005, 0.00005, 12.34565, 99.99995, -0.12345)
    val got = vals.toDF("x")
      .select(col("x"), CrossRound.r(col("x"), 4).as("r"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // values verified against DuckDB round(x::DOUBLE, 4)
    assert(got(0.12345) === 0.1235)
    assert(got(0.12355) === 0.1236)
    assert(got(2.00005) === 2.0001)
    assert(got(0.00005) === 0.0001)
    assert(got(12.34565) === 12.3456) // plain Spark round(x,4) gives 12.3457 — the latent bug
    assert(got(99.99995) === 100.0)
    assert(got(-0.12345) === -0.1235) // away from zero on both engines
  }

  test("r never yields negative zero from Spark (BigDecimal path)") {
    val r = Seq(-1e-17).toDF("x").select(CrossRound.r(col("x"), 4)).head().getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(r) === 0L)
  }
}
