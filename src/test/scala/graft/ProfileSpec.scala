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

  test("keySkewReport: hot keys, shares, and the skew factor that names the salting candidate") {
    // key 7 dominates: 60 of 100 rows; nine other keys 4-5 rows each
    val rows = Seq.fill(60)(7L) ++ (1L to 8L).flatMap(k => Seq.fill(5)(k * 100L))
    val df = rows.toDF("k")
    val got = Profile.keySkewReport(df, "k", topK = 3).collect()
    assert(got.length === 3)
    val top = got.head
    assert(top.getLong(0) === 7L && top.getLong(1) === 60L)
    assert(math.abs(top.getDouble(2) - 0.6) < 1e-12)
    // 9 distinct keys, mean count 100/9 -> skew = 60 * 9 / 100 = 5.4
    assert(math.abs(top.getDouble(3) - 5.4) < 1e-12)
    // uniform ties order by key ascending after the count
    assert(got(1).getLong(0) === 100L && got(2).getLong(0) === 200L)
  }

  test("quantileReport: exact interpolated percentiles per group, nulls ignored") {
    val df = ((1 to 100).map(i => ("a", Some(i.toDouble))) ++
      Seq(("a", None), ("b", Some(10.0)), ("b", Some(20.0))))
      .toDF("g", "v")
    val got = Profile.quantileReport(df, "g", "v", Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // 1..100: PERCENTILE_CONT lerps at rank p(n-1): p50 = 50.5, p90 = 90.1, p99 = 98.01 + 0.99 ~= 99.01
    val (n, p50, p90, p99) = got("a")
    assert(n === 100L)
    assert(math.abs(p50 - 50.5) < 1e-9)
    assert(math.abs(p90 - 90.1) < 1e-9)
    assert(math.abs(p99 - 99.01) < 1e-9)
    val (nb, b50, b90, b99) = got("b")
    assert(nb === 2L && math.abs(b50 - 15.0) < 1e-9 && math.abs(b99 - 19.9) < 1e-9 && b90 === 19.0)
  }

  test("tableProfile: single aggregate — the plan scans the input once") {
    val df = (1L to 100L).map(i => (i, s"s$i", i * 1.5)).toDF("a", "b", "c")
    val plan = Profile.tableProfile(df, Seq("a", "b", "c"))
      .queryExecution.optimizedPlan.toString
    val scans = "LocalRelation|LogicalRDD".r.findAllIn(plan).length
    assert(scans === 1, s"expected one scan of the input:\n${plan.take(800)}")
  }

  test("psiReport: identical slices score zero, dense spine, clamped overflow bin") {
    // identical distributions → p == q in every bin → every term exactly 0
    val slice = (1 to 60).map(i => Tuple1((i % 120).toLong)).toDF("f")
    val same = Profile.psiReport(slice, slice, "f", binWidth = 30, nBins = 4)
      .collect()
    assert(same.length === 4, "one row per bin, empty bins included")
    assert(same.map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    assert(same.forall(r => r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0))
    // values beyond nBins·width land in the LAST bin, not off the spine
    val over = Seq(1000L, 5L).toDF("f")
    val bins = Profile.psiReport(over, over, "f", binWidth = 30, nBins = 4)
      .filter(col("n_ref") > 0).collect().map(_.getLong(0)).sorted.toSeq
    assert(bins === Seq(0L, 3L))
  }

  test("psiReport: a genuine shift scores large; terms are nonnegative and sum to the total") {
    val ref = (1 to 100).map(_ => Tuple1(10L)).toDF("f")   // all mass bin 0
    val cur = (1 to 100).map(_ => Tuple1(100L)).toDF("f")  // all mass bin 3
    val rows = Profile.psiReport(ref, cur, "f", binWidth = 30, nBins = 4)
      .collect()
    val terms = rows.map(_.getDouble(3))
    val total = rows.map(_.getDouble(4)).distinct
    // PSI terms (p−q)·ln(p/q) are individually nonnegative
    assert(terms.forall(_ >= 0.0))
    assert(total.length === 1 && math.abs(terms.sum - total.head) < 1e-12)
    assert(total.head > 0.25, s"full mass shift must read 'shifted', got ${total.head}")
  }

  test("correlations: hand-computed signs and magnitudes, partitioning invariance") {
    // y = 2x exactly (r = 1), z = -x + 10 (r = -1 with x), w uncorrelated-ish
    val df = Seq(
      (1.0, 2.0, 9.0, 3.0), (2.0, 4.0, 8.0, 1.0),
      (3.0, 6.0, 7.0, 4.0), (4.0, 8.0, 6.0, 1.0), (5.0, 10.0, 5.0, 5.0))
      .toDF("x", "y", "z", "w")
    val got = Profile.correlations(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(got(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(got(("x", "z")) + 1.0) < 1e-12)
    assert(math.abs(got(("y", "z")) + 1.0) < 1e-12)
    // hand-computed r(x, w): n=5, sx=15, sw=14, sxw=46, sxx=55, sww=52
    val expXW = (5.0 * 46 - 15 * 14) /
      (math.sqrt(5.0 * 55 - 15.0 * 15) * math.sqrt(5.0 * 52 - 14.0 * 14))
    assert(math.abs(got(("x", "w")) - expXW) < 1e-12)
    assert(got.size === 6)
    // exact decimal moments make the result partition-order invariant
    val wide = Profile.correlations(df.repartition(7), Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(wide === got)
    // a row with any null drops listwise: every pair sees the same n
    val withNull = df.union(Seq((6.0, 12.0, 4.0, Double.NaN)).toDF("x", "y", "z", "w")
      .select(col("x"), col("y"), col("z"), lit(null).cast("double").as("w")))
    val gn = Profile.correlations(withNull, Seq("x", "y", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(gn(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(gn(("x", "w")) - expXW) < 1e-12) // the null row never entered
  }

  test("correlations: decimal overflow throws loudly instead of silently shrinking n") {
    // 1e17 exceeds DECIMAL(18,2) (16 integral digits max) → the non-ANSI
    // cast nulls it; the old na.drop silently dropped the row — now the
    // fold counts it and the query must THROW naming the column
    val df = Seq((1.0, 2.0), (1.0e17, 4.0), (3.0, 6.0)).toDF("x", "y")
    val e = intercept[Exception] {
      Profile.correlations(df, Seq("x", "y")).collect()
    }
    assert(e.getMessage.contains("DECIMAL(18,2)") || Option(e.getCause)
      .exists(_.getMessage.contains("DECIMAL(18,2)")), s"got: ${e.getMessage}")
  }

  test("embeddingDimProfile: hand-computed per-dim moments; exact min/max; nulls never crash") {
    val df = Seq(
      (1L, Seq(1.0f, 10.0f)),
      (2L, Seq(2.0f, 20.0f)),
      (3L, Seq(3.0f, 30.0f)))
      .toDF("vec_id", "embedding")
    val got = Profile.embeddingDimProfile(df)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // dim 0: values 1,2,3 → mean 2, var = (1+4+9)/3 − 4 = 2/3
    assert(got(0L)._1 === 3L)
    assert(got(0L)._2 === 1.0 && got(0L)._3 === 3.0)
    assert(got(0L)._4 === 2.0)
    assert(math.abs(got(0L)._5 - 2.0 / 3.0) < 1e-6)
    // dim 1: ×10 → mean 20, var = 200/3
    assert(got(1L)._4 === 20.0)
    assert(math.abs(got(1L)._5 - 200.0 / 3.0) < 1e-4)
    // partitioning invariance (the ra collapse's whole point)
    val wide = Profile.embeddingDimProfile(df.repartition(7)).orderBy("dim").collect().toSeq
    val one = Profile.embeddingDimProfile(df.coalesce(1)).orderBy("dim").collect().toSeq
    assert(wide === one)
  }

  test("correlations: a zero-variance column yields NULL, not NaN/Inf") {
    val df = Seq((1.0, 5.0, 1.0), (2.0, 5.0, 2.0), (3.0, 5.0, 4.0))
      .toDF("x", "c", "y")
    val got = Profile.correlations(df, Seq("x", "c", "y"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> Option(r.get(2))).toMap
    assert(got(("x", "c")) === None) // undefined, stated as null
    assert(got(("c", "y")) === None)
    assert(got(("x", "y")).exists(v => math.abs(v.asInstanceOf[Double]) <= 1.0))
  }
}
