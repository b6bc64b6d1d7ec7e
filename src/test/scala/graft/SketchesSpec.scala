package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Count-min sketch properties (SURVEY §5-style shape pins): the
  * one-sided error guarantee, exactness without collisions, zero for
  * unseen keys, boundedness of the cell table, and partition-width
  * determinism (the x80 oracle then pins the exact counter values —
  * collisions included — against the DuckDB hash mirror).
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val D = 4
  private val W = 64

  // zipf-ish corpus: key k_i appears i times — known exact counts
  private def items = (1 to 40).flatMap(i => Seq.fill(i)(s"key_$i")).toDF("token")

  test("estimates never undercount, and cells are bounded by depth x width") {
    val cells = Sketches.cmsCells(items, "token", D, W).cache()
    assert(cells.count() <= D.toLong * W)
    // every row_i's counters sum to the item count — mass is conserved
    val perRow = cells.groupBy("row_i").agg(sum("cnt").as("s"))
      .collect().map(r => r.getLong(1)).toSeq
    assert(perRow === Seq.fill(D)(items.count()))
    val est = Sketches.cmsEstimate(cells, items.distinct(), "token", D, W)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = (1 to 40).map(i => s"key_$i" -> i.toLong).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k estimated ${est(k)} below true $n")
    }
  }

  test("collision-free estimates are exact; a wide sketch recovers the true top-k") {
    // 40 keys in 4x4096 cells: collisions are possible but the MIN over
    // 4 independent rows almost surely hits a clean counter — with this
    // fixed seed set the estimates are exactly the true counts (and if
    // a hash change ever breaks that, this pin should fail loudly)
    val wide = 4096
    val cells = Sketches.cmsCells(items, "token", D, wide)
    val est = Sketches.cmsEstimate(cells, items.distinct(), "token", D, wide)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 40).foreach(i => assert(est(s"key_$i") === i.toLong))
  }

  test("unseen keys estimate from the sketch, never null; empty input gives empty cells") {
    val cells = Sketches.cmsCells(items, "token", D, W)
    val unseen = Seq("never_seen_a", "never_seen_b").toDF("token")
    val est = Sketches.cmsEstimate(cells, unseen, "token", D, W)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // an unseen key may alias onto occupied counters (overcount) but can
    // never read null; with an EMPTY sketch it must read exactly 0
    assert(est.size === 2 && est.values.forall(_ >= 0L))
    val emptyCells = Sketches.cmsCells(items.filter(lit(false)), "token", D, W)
    val zero = Sketches.cmsEstimate(emptyCells, unseen, "token", D, W)
      .collect().map(r => r.getLong(1)).toSeq
    assert(zero === Seq(0L, 0L))
  }

  test("cmsMerge: split-build-merge equals the one-shot sketch counter-for-counter (linearity)") {
    val half1 = (1 to 40).flatMap(i => Seq.fill((i + 1) / 2)(s"key_$i")).toDF("token")
    val half2 = (1 to 40).flatMap(i => Seq.fill(i / 2)(s"key_$i")).toDF("token")
    val merged = Sketches.cmsMerge(
      Sketches.cmsCells(half1, "token", D, W),
      Sketches.cmsCells(half2, "token", D, W))
    val oneShot = Sketches.cmsCells(items, "token", D, W)
    assert(merged.exceptAll(oneShot).count() === 0 &&
      oneShot.exceptAll(merged).count() === 0)
    // merging an EMPTY batch is the identity
    val withEmpty = Sketches.cmsMerge(
      oneShot, Sketches.cmsCells(items.filter(lit(false)), "token", D, W))
    assert(withEmpty.exceptAll(oneShot).count() === 0)
  }

  test("sketch and estimates are partition-width deterministic") {
    val a = Sketches.cmsCells(items, "token", D, W)
    val b = Sketches.cmsCells(items.repartition(13), "token", D, W)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    val ea = Sketches.cmsEstimate(a, items.distinct(), "token", D, W)
    val eb = Sketches.cmsEstimate(b, items.distinct().repartition(7), "token", D, W)
    assert(ea.exceptAll(eb).count() === 0 && eb.exceptAll(ea).count() === 0)
  }
}
