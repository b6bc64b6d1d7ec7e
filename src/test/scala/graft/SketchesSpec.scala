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

  test("hll: estimate lands near exact, registers are bounded, merge is the idempotent union") {
    val P = 9
    val keys = (1 to 3000).map(i => s"tok_$i")
    val corpus = keys.flatMap(k => Seq(k, k)).toDF("token") // duplicates are free
    val regs = Sketches.hllRegisters(corpus, "token", P).cache()
    assert(regs.count() <= (1L << P))
    val est = Sketches.hllEstimate(regs, P).collect().head.getDouble(2)
    // p=9 → ~4.6% std error; 15% is a generous 3-sigma band
    assert(math.abs(est - 3000.0) / 3000.0 < 0.15, s"est $est too far from 3000")
    // split-build-MAX-merge equals the one-shot registers exactly
    val half1 = keys.take(1700).toDF("token")
    val half2 = keys.drop(1300).toDF("token") // overlapping halves — union semantics
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(half1, "token", P),
      Sketches.hllRegisters(half2, "token", P))
    assert(merged.exceptAll(regs).count() === 0 &&
      regs.exceptAll(merged).count() === 0)
    // re-merging an already-ingested batch is a no-op (idempotence)
    val again = Sketches.hllMerge(regs, Sketches.hllRegisters(half1, "token", P))
    assert(again.exceptAll(regs).count() === 0 &&
      regs.exceptAll(again).count() === 0)
  }

  test("hll set algebra: inclusion-exclusion intersection tracks planted overlap") {
    val P = 9
    // A = 1..2000, B = 1001..3000: |A∩B| = 1000, |A∪B| = 3000
    def regsOf(lo: Int, hi: Int) =
      Sketches.hllRegisters((lo to hi).map(i => s"tok_$i").toDF("token"), "token", P)
    val (ra, rb) = (regsOf(1, 2000), regsOf(1001, 3000))
    def est(r: org.apache.spark.sql.DataFrame) =
      Sketches.hllEstimate(r, P).collect().head.getDouble(2)
    val (ea, eb, eu) = (est(ra), est(rb), est(Sketches.hllMerge(ra, rb)))
    val inter = math.max(0.0, ea + eb - eu)
    // three sketches compound error; 25% on the 1000-truth is ~3 sigma
    assert(math.abs(inter - 1000.0) / 1000.0 < 0.25, s"inter $inter too far from 1000")
    // identical sets: intersection ≈ either side exactly (union IS the side)
    assert(math.abs((ea + ea - est(Sketches.hllMerge(ra, ra))) - ea) < 1e-9)
    // disjoint sets: clamped estimate stays near 0 relative to the sides
    val rc = regsOf(10001, 12000)
    val dj = math.max(0.0, ea + est(rc) - est(Sketches.hllMerge(ra, rc)))
    assert(dj < 0.15 * 2000.0, s"disjoint estimate $dj too large")
  }

  test("hll: small-range linear counting is exact-ish at tiny cardinality; empty input estimates 0") {
    val P = 9
    val tiny = (1 to 5).map(i => s"k$i").toDF("token")
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(tiny, "token", P), P).collect().head
    // 5 distinct, 512 registers: no collision plausible; m·ln(m/V) with
    // V = 507 gives 5.02… — within half a count of truth
    assert(math.abs(est.getDouble(2) - 5.0) < 1.0)
    val empty = Sketches.hllEstimate(
      Sketches.hllRegisters(tiny.filter(lit(false)), "token", P), P)
      .collect().head
    assert(empty.getLong(1) === (1L << P) && empty.getDouble(2) === 0.0)
  }

  test("hll keyed build/estimate slice-equals the flat sketch per group") {
    val P = 9
    // two groups with overlapping key sets and different cardinalities
    val rows = ((1 to 800).map(i => ("a", i.toLong)) ++
      (500 to 1700).map(i => ("b", i.toLong))).toDF("g", "k")
    val keyed = Sketches.hllRegistersHashed(
      rows, xxhash64(lit(93L), col("k")), Seq("g"), P).cache()
    // each group's register slice is exactly the flat build of that slice
    Seq("a", "b").foreach { g =>
      val flat = Sketches.hllRegistersHashed(
        rows.filter(col("g") === g), xxhash64(lit(93L), col("k")), Nil, P)
      val slice = keyed.filter(col("g") === g).drop("g")
      assert(flat.exceptAll(slice).count() === 0 &&
        slice.exceptAll(flat).count() === 0, s"group $g registers diverge")
    }
    // keyed estimate rows carry the group key and match per-slice estimates
    val est = Sketches.hllEstimateKeyed(keyed, Seq("g"), P)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    Seq("a" -> 800.0, "b" -> 1201.0).foreach { case (g, n) =>
      assert(math.abs(est(g) - n) / n < 0.15, s"group $g est ${est(g)} vs $n")
    }
  }

  test("hll registers are partition-width deterministic") {
    val corpus = (1 to 2000).map(i => s"tok_$i").toDF("token")
    val a = Sketches.hllRegisters(corpus, "token", 9)
    val b = Sketches.hllRegisters(corpus.repartition(13), "token", 9)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("histogram sketch: cells bounded, merge equals one-shot, quantiles within a bin width") {
    val vals = (1 to 1000).map(i => Tuple1(i.toDouble)).toDF("v")
    val cells = Sketches.histCells(vals, "v", lo = 0.0, width = 10.0, nBins = 128)
    assert(cells.count() <= 128)
    // two-commit merge is exactly the one-shot build
    val merged = Sketches.histMerge(
      Sketches.histCells(vals.filter(col("v") <= 400), "v", 0.0, 10.0, 128),
      Sketches.histCells(vals.filter(col("v") > 400), "v", 0.0, 10.0, 128))
    assert(merged.exceptAll(cells).count() === 0 &&
      cells.exceptAll(merged).count() === 0)
    // interpolated estimates sit within one bin width of the exact value
    val est = Sketches.histQuantiles(cells, Seq(0.5, 0.9, 0.99), 0.0, 10.0)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    Seq(0.5 -> 500.5, 0.9 -> 900.1, 0.99 -> 990.01).foreach { case (p, exact) =>
      assert(math.abs(est(p) - exact) <= 10.0, s"p=$p est ${est(p)} vs $exact")
    }
    // overflow and underflow clamp into the edge bins, never off-grid
    val wild = Seq(-50.0, 1e9).toDF("v")
    val bins = Sketches.histCells(wild, "v", 0.0, 10.0, 128)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(bins === Seq(0L, 127L))
  }

  test("histogram quantiles: p=1.0 lands in the last occupied bin; width-deterministic") {
    val vals = (1 to 100).map(i => Tuple1(i.toDouble)).toDF("v")
    val cells = Sketches.histCells(vals, "v", 0.0, 10.0, 32)
    val top = Sketches.histQuantiles(cells, Seq(1.0), 0.0, 10.0).collect().head
    assert(top.getDouble(2) <= 110.0 && top.getDouble(2) >= 100.0)
    val a = Sketches.histCells(vals, "v", 0.0, 10.0, 32)
    val b = Sketches.histCells(vals.repartition(13), "v", 0.0, 10.0, 32)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
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
