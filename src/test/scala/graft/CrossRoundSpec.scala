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

  test("bround(r(x, 6) * 10) / 10 collapses partition-order drift on the 21.25 tie (o43 witness)") {
    // the round-3 red row: (B94, 2024-01-31)'s monthly-average hist_avg is
    // exactly 21.25 at 4 shuffle partitions but 21.25 + 1 ulp at 32 — the
    // unguarded bround(x, 1) then formats "21.2" vs "21.3". The 6 dp
    // pre-round must land every ordering on the same digit. The half-even
    // step is the MULTIPLY form (round-5 ADVICE): scale-0 tie points are
    // half-integers, exactly representable, so Spark's repr-based bround
    // and DuckDB's binary round_even cannot diverge there.
    val exact = 21.25
    val up = java.lang.Math.nextUp(exact)
    val down = java.lang.Math.nextDown(exact)
    val got = Seq(exact, up, down).toDF("x")
      .select(format_string("%.1f", bround(CrossRound.r(col("x"), 6) * 10) / 10).as("s"))
      .collect().map(_.getString(0)).toSeq
    // DuckDB: printf('%.1f', round_even(round(x, 6) * 10, 0) / 10) = '21.2'
    // for all three (probed); half-even on the .25 tie rounds DOWN to even
    assert(got === Seq("21.2", "21.2", "21.2"))
    // and the unguarded form is genuinely unstable across the same inputs —
    // the regression this guard exists for
    val raw = Seq(exact, up).toDF("x")
      .select(format_string("%.1f", bround(col("x"), 1)).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(raw === Seq("21.2", "21.3"))
  }

  test("ra(x, 4) equals the oracle composition round(round(x, 8), 4) and absorbs ulp drift") {
    val ties = Seq(21.25, 3.14155, 0.00005, 12.34565, 7.0 / 3.0, 100.0 / 7.0)
    val probes = ties.flatMap(v => Seq(v, java.lang.Math.nextUp(v), java.lang.Math.nextDown(v)))
    val rows = probes.toDF("x")
      .select(col("x"), CrossRound.ra(col("x"), 4).as("ra"), CrossRound.r(col("x"), 4).as("r"))
      .collect()
    // drift absorption: x, nextUp(x), nextDown(x) must all round identically
    // (plain r does NOT have this property — r(nextDown(0.00005), 4) is 0.0
    // while r(0.00005, 4) is 0.0001; that instability is what ra removes)
    rows.grouped(3).foreach { g =>
      assert(g.map(_.getDouble(1)).distinct.size === 1,
        s"ra not drift-stable around ${g.head.getDouble(0)}")
    }
    // on the exact (unperturbed) values ra agrees with plain r — none of
    // them sits on an 8 dp tie, so the pre-round is value-preserving there
    rows.grouped(3).map(_.head).foreach(r => assert(r.getDouble(1) === r.getDouble(2)))
  }
}
