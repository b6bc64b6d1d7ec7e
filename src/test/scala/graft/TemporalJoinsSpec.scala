package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // left: (key, ts, tag); right: (key, ts, v) — a keyed time series
  private def left = Seq(
    ("a", ts("2020-01-01 00:00:00"), "before-any"),
    ("a", ts("2020-01-02 00:00:00"), "tie"),
    ("a", ts("2020-01-03 12:00:00"), "between"),
    ("a", ts("2020-01-10 00:00:00"), "after-all"),
    ("b", ts("2020-01-05 00:00:00"), "other-key"),
    ("c", ts("2020-01-05 00:00:00"), "no-right-key")
  ).toDF("k", "t", "tag")

  private def right = Seq(
    ("a", ts("2020-01-02 00:00:00"), 10L),
    ("a", ts("2020-01-03 00:00:00"), 20L),
    ("a", ts("2020-01-04 00:00:00"), 30L),
    ("b", ts("2020-01-01 00:00:00"), 99L)
  ).toDF("k", "t", "v")

  test("asof backward: latest at-or-before per key, inclusive ties, misses are null") {
    val out = TemporalJoins.asofJoinBackward(left, right, Seq("k"), "t")
      .select(col("tag"), col("v"), col("asof_t"))
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out("before-any") === None) // no right row precedes it
    assert(out("tie") === Some(10L)) // equal timestamps match (>= semantics)
    assert(out("between") === Some(20L)) // 01-03 00:00 is latest <= 01-03 12:00
    assert(out("after-all") === Some(30L)) // past the last right row: latest overall
    assert(out("other-key") === Some(99L)) // keys never cross
    assert(out("no-right-key") === None) // left key absent from right
  }

  test("asof backward: left rows are never dropped or duplicated; deterministic across widths") {
    val a = TemporalJoins.asofJoinBackward(left, right, Seq("k"), "t")
    assert(a.count() === left.count())
    val b = TemporalJoins.asofJoinBackward(left.repartition(7), right.repartition(3), Seq("k"), "t")
    assert(
      a.orderBy("k", "t").collect().map(_.toString).toSeq ===
        b.orderBy("k", "t").collect().map(_.toString).toSeq)
  }

  test("asof backward: null right timestamps are no-snapshot rows, never matched") {
    val withNull = right.unionByName(
      Seq(("a", null.asInstanceOf[Timestamp], 777L)).toDF("k", "t", "v"))
    val out = TemporalJoins.asofJoinBackward(left, withNull, Seq("k"), "t")
      .select(col("tag"), col("v"))
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // identical to the no-null-row result: the DuckDB ASOF oracle's
    // l.ts >= r.ts never matches a null timestamp either
    assert(out("before-any") === None)
    assert(out("tie") === Some(10L))
    assert(out("after-all") === Some(30L))
  }

  test("asof backward: null keys never match — SQL equality, not window-partition grouping") {
    // a null-key right row must not become "the snapshot" for null-key
    // left rows (Window.partitionBy groups nulls together; the DuckDB
    // ASOF equi-key never matches NULL = NULL)
    val l = Seq(
      (Option("a"), ts("2020-01-05 00:00:00"), "keyed"),
      (Option.empty[String], ts("2020-01-05 00:00:00"), "nullkey")
    ).toDF("k", "t", "tag")
    val r = Seq(
      (Option("a"), ts("2020-01-01 00:00:00"), 1L),
      (Option.empty[String], ts("2020-01-01 00:00:00"), 99L)
    ).toDF("k", "t", "v")
    val out = TemporalJoins.asofJoinBackward(l, r, Seq("k"), "t")
      .collect()
      .map(row => row.getString(2) -> (if (row.isNullAt(3)) None else Some(row.getLong(3))))
      .toMap
    assert(out("keyed") === Some(1L))
    assert(out("nullkey") === None) // surfaced, but with a null match
  }

  test("asof blocked hatch: byte-identical to the one-window plan on a planted hot key, spread across blocks") {
    // one key carries 90% of rows — the degenerate shape that serializes
    // the one-window plan onto a single task
    val base = ts("2020-01-01 00:00:00").getTime
    def at(minutes: Long) = new Timestamp(base + minutes * 60000L)
    val hotLeft = (0L until 900L).map(i => (Option("hot"), Option(at(i * 37)), s"h$i"))
    val coldLeft = (0L until 80L).map(i => (Option(s"k${i % 8}"), Option(at(i * 211)), s"c$i"))
    val edgeLeft = Seq(
      (Option("hot"), Option(at(6 * 60)), "tie"), // exactly on a right row
      (Option.empty[String], Option(at(100)), "nullkey"),
      (Option("hot"), Option.empty[Timestamp], "nullts"))
    val lhs = (hotLeft ++ coldLeft ++ edgeLeft).toDF("k", "t", "tag")
    val rhs = ((0L until 90L).map(i => (Option("hot"), Option(at(i * 6 * 60)), i)) ++
      (0L until 8L).map(i => (Option(s"k$i"), Option(at(i * 97)), 1000L + i)) ++
      Seq((Option.empty[String], Option(at(0)), 9999L)))
      .toDF("k", "t", "v")
    def run(width: Long) =
      TemporalJoins.asofJoinBackward(lhs, rhs, Seq("k"), "t", width)
        .orderBy("tag")
        .collect()
        .map(_.toString)
        .toSeq
    val plain = run(0L)
    // one-hour blocks: the hot key's ~23-day timeline spans >500 blocks,
    // so the windows run per (key, block) instead of one hot task
    assert(run(3600L * 1000000L) === plain)
    // and a coarse width (one day) must stitch across blocks identically
    assert(run(24L * 3600L * 1000000L) === plain)
    // spread proof: distinct hour-blocks actually cover the hot timeline
    val hotBlocks = hotLeft.flatMap(_._2).map(t => t.getTime / 3600000L).distinct.size
    assert(hotBlocks > 500, s"hot key spans only $hotBlocks blocks")
  }

  private def points = Seq(
    (1L, ts("2020-01-01 10:00:00")), // inside iv1
    (1L, ts("2020-01-01 12:00:00")), // on iv1's inclusive end boundary
    (1L, ts("2020-01-01 13:00:00")), // in no interval
    (1L, ts("2020-01-02 09:00:00")), // inside iv2 (multi-bucket span)
    (2L, ts("2020-01-01 10:00:00")) // other key: iv1's window must not leak
  ).toDF("k", "t")

  private def intervals = Seq(
    (1L, 1L, ts("2020-01-01 09:00:00"), ts("2020-01-01 12:00:00")),
    (1L, 2L, ts("2020-01-02 00:00:00"), ts("2020-01-02 23:00:00"))
  ).toDF("k", "iv", "s", "e")

  test("interval join: inclusive containment, no cross-key leaks, one row per true pair") {
    val out = TemporalJoins.intervalJoin(points, intervals, Seq("k"), "t", "s", "e")
      .select("k", "t", "iv")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    assert(out.length === 3) // 13:00 point and key-2 point match nothing
    val byPoint = out.map { case (k, t, iv) => (k, t) -> iv }.toMap
    assert(byPoint((1L, ts("2020-01-01 10:00:00"))) === 1L)
    assert(byPoint((1L, ts("2020-01-01 12:00:00"))) === 1L) // end inclusive
    assert(byPoint((1L, ts("2020-01-02 09:00:00"))) === 2L) // 24-bucket span, exactly once
  }

  test("interval join: overlapping intervals both match; bucket width does not change results") {
    val overlapping = intervals.unionByName(
      Seq((1L, 3L, ts("2020-01-01 09:30:00"), ts("2020-01-01 10:30:00"))).toDF("k", "iv", "s", "e"))
    def run(widthMicros: Long) =
      TemporalJoins.intervalJoin(points, overlapping, Seq("k"), "t", "s", "e", widthMicros)
        .select("k", "t", "iv")
        .orderBy("k", "t", "iv")
        .collect()
        .map(_.toString)
        .toSeq
    val hourly = run(3600L * 1000000L)
    // the key-1 10:00 point now sits in iv1 AND iv3 (two rows); the
    // key-2 10:00 point still matches nothing
    assert(hourly.count(_.contains("10:00")) === 2)
    assert(hourly === run(60L * 1000000L)) // minutely buckets: same pairs
    assert(hourly === run(7L * 24 * 3600L * 1000000L)) // one giant bucket: same pairs
  }

  test("asof forward: earliest at-or-after per key, inclusive ties, misses are null") {
    val out = TemporalJoins.asofJoinForward(left, right, Seq("k"), "t")
      .select(col("tag"), col("v"), col("asof_next_t"))
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out("before-any") === Some(10L)) // earliest following right row
    assert(out("tie") === Some(10L)) // equal timestamps match (<= semantics)
    assert(out("between") === Some(30L)) // 01-04 is earliest >= 01-03 12:00
    assert(out("after-all") === None) // nothing follows the last right row
    assert(out("other-key") === None) // b's only right row precedes it
    assert(out("no-right-key") === None)
  }

  test("asof forward: left preserved; null right ts/keys never match; width-deterministic") {
    val withNulls = right
      .unionByName(Seq(("a", null.asInstanceOf[Timestamp], 777L)).toDF("k", "t", "v"))
      .unionByName(Seq((null.asInstanceOf[String], ts("2020-01-06 00:00:00"), 888L))
        .toDF("k", "t", "v"))
    val a = TemporalJoins.asofJoinForward(left, withNulls, Seq("k"), "t")
    assert(a.count() === left.count())
    val got = a.select(col("tag"), col("v")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // identical to the clean-right result: the planted null rows are
    // no-snapshot rows on every engine (DuckDB forward ASOF parity)
    assert(got("before-any") === Some(10L) && got("after-all") === None)
    val b = TemporalJoins.asofJoinForward(
      left.repartition(7), withNulls.repartition(3), Seq("k"), "t")
    assert(
      a.orderBy("k", "t").collect().map(_.toString).toSeq ===
        b.orderBy("k", "t").collect().map(_.toString).toSeq)
  }
}
