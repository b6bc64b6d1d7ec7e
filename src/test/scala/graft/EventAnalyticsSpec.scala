package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

/** Product-analytics operators: typed JSON extraction totality, cohort
  * retention cells, and the ordered-funnel semantics — including the
  * earliest-after-previous case a global-min funnel would get wrong.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("propsLong: well-formed, missing-field and malformed payloads are total") {
    val df = Seq(
      (1L, """{"k": 87}"""),
      (2L, """{"other": 1}"""),
      (3L, """not json"""),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "props")
      .select(col("id"), EventAnalytics.propsLong(col("props"), "k").as("k"))
    val got = df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L) === Some(87L))
    assert(got(2L) === None)
    assert(got(3L) === None)
    assert(got(4L) === None)
  }

  private def ev(rows: (Long, String, String)*) =
    rows.toSeq.toDF("user_id", "event_type", "ts")
      .withColumn("ts", to_timestamp(col("ts")))

  test("retentionCohorts: day-grain cells, sizes and ratios hand-check") {
    // A first-seen day1 (active day1+day3), B day1 only, C first-seen day3
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-03 10:00:00"),
      (2L, "view", "2024-01-01 11:00:00"),
      (3L, "view", "2024-01-03 12:00:00"))
    val got = EventAnalytics.retentionCohorts(events, grain = "day")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got(("2024-01-01", "2024-01-01")) === ((2L, 2L, 1.0)))
    assert(got(("2024-01-01", "2024-01-03")) === ((1L, 2L, 0.5)))
    assert(got(("2024-01-03", "2024-01-03")) === ((1L, 1L, 1.0)))
    assert(got.size === 3)
  }

  test("dailyAnomalies: a planted spike flags; steady days don't; constant series never do") {
    // type A: ten days at 5/day then a 50-event spike; type B constant
    val rows = (for {
      d <- 1 to 10; k <- 1 to 5
    } yield (100L + k, "A", f"2024-01-$d%02d 10:00:00")) ++
      (1 to 50).map(k => (200L + k, "A", "2024-01-11 10:00:00")) ++
      (1 to 11).flatMap(d => (1 to 3).map(k => (300L + k, "B", f"2024-01-$d%02d 12:00:00")))
    val events = ev(rows.map(r => (r._1, r._2, r._3)): _*)
    val got = EventAnalytics.dailyAnomalies(events, zThreshold = 2.0)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
      .toMap
    val spike = got(("2024-01-11", "A"))
    assert(spike._1 === 50L && spike._3, s"spike day should flag: $spike")
    assert(spike._2.get > 3.0)
    for (d <- 1 to 10) {
      val (_, _, flag) = got((f"2024-01-$d%02d", "A"))
      assert(!flag, s"steady day $d must not flag")
    }
    // constant series: sigma = 0 -> no z, never anomalous
    for (d <- 1 to 11) {
      val (n, z, flag) = got((f"2024-01-$d%02d", "B"))
      assert(n === 3L && z.isEmpty && !flag)
    }
  }

  test("robustAnomalies: MAD flags a spike the mean/sigma variant can be blinded to; MAD=0 never flags") {
    // type A: ten days at 5/day + one 500-event day. The catastrophic
    // day drags mu to ~50 and sigma to ~142, so its plain z is only
    // ~3.2 — but MORE IMPORTANTLY the steady days sit at z ~ -0.3
    // while under median/MAD the spike's M = 0.6745*(500-5)/0 ... MAD
    // of (0,0,0,0,0,0,0,0,0,0,495) = 0 -> undefined. Use a less
    // degenerate shape: counts 4,5,6 alternating + spike, so MAD > 0.
    val rows = (for { d <- 1 to 9; k <- 1 to (4 + (d % 3)) }
      yield (100L + k, "A", f"2024-01-$d%02d 10:00:00")) ++
      (1 to 500).map(k => (900L + k, "A", "2024-01-10 10:00:00")) ++
      (1 to 11).flatMap(d => (1 to 3).map(k => (300L + k, "B", f"2024-01-$d%02d 12:00:00")))
    val events = ev(rows.map(r => (r._1, r._2, r._3)): _*)
    val got = EventAnalytics.robustAnomalies(events, mThreshold = 3.5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(5)).map(_.asInstanceOf[Double]), r.getBoolean(6)))
      .toMap
    val spike = got(("2024-01-10", "A"))
    assert(spike._1 === 500L && spike._3, s"spike day should flag: $spike")
    for (d <- 1 to 9) {
      val (_, m, flag) = got((f"2024-01-$d%02d", "A"))
      assert(!flag && m.exists(v => math.abs(v) < 3.5), s"steady day $d must not flag")
    }
    // constant series: MAD = 0 -> no M, never anomalous
    for (d <- 1 to 11) {
      val (n, m, flag) = got((f"2024-01-$d%02d", "B"))
      assert(n === 3L && m.isEmpty && !flag)
    }
    // robustness contrast: the spike drags the MEAN far above every
    // steady day, but the MEDIAN stays at the steady level — the med
    // column must sit inside the steady range, not near the mean
    val medA = EventAnalytics.robustAnomalies(events).filter(col("event_type") === "A")
      .select("med").head().getDouble(0)
    assert(medA >= 4.0 && medA <= 6.0, s"median should resist the spike, got $medA")
  }

  test("sessionize: gap splits, inclusive boundary, single-event sessions, per-user independence") {
    val df = Seq(
      // user 1: three events 10 min apart (one session), then a 31-min
      // gap (new session with one event)
      (1L, 100L, "2024-01-01 10:00:00"),
      (1L, 101L, "2024-01-01 10:10:00"),
      (1L, 102L, "2024-01-01 10:20:00"),
      (1L, 103L, "2024-01-01 10:51:00"),
      // user 2: a gap of EXACTLY 30 min stays in-session (<= boundary)
      (2L, 200L, "2024-01-01 09:00:00"),
      (2L, 201L, "2024-01-01 09:30:00"))
      .toDF("user_id", "event_id", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = EventAnalytics.sessionize(df, gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(5)))
      .toMap
    assert(got.size === 3)
    assert(got((1L, 1L)) === ((3L, 1200000000L))) // 3 events, 20 min span
    assert(got((1L, 2L)) === ((1L, 0L)))          // singleton session
    assert(got((2L, 1L)) === ((2L, 1800000000L))) // exact-gap stays joined
    // width determinism
    val a = EventAnalytics.sessionize(df, 30).collect().map(_.toString).sorted.toSeq
    val b = EventAnalytics.sessionize(df.repartition(7), 30).collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("funnel: ordered semantics, horizon, and the pre-step-1 event that must not hide a later one") {
    val events = ev(
      // u1: clean signup -> view -> purchase inside the horizon
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 01:00:00"),
      (1L, "purchase", "2024-01-01 02:00:00"),
      // u2: only view is BEFORE the signup -> stops at step 1
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "signup", "2024-01-01 01:00:00"),
      // u3: view after the 7-day horizon -> stops at step 1
      (3L, "signup", "2024-01-01 00:00:00"),
      (3L, "view", "2024-01-09 00:00:00"),
      // u4: a view BEFORE signup AND one after — the later one counts
      // (a global-min funnel would wrongly drop this user at step 2);
      // purchase lands between the early view and the valid one -> out
      (4L, "view", "2024-01-01 00:00:00"),
      (4L, "signup", "2024-01-02 00:00:00"),
      (4L, "purchase", "2024-01-02 06:00:00"),
      (4L, "view", "2024-01-02 12:00:00"),
      // u5: never signs up -> not in the funnel population
      (5L, "view", "2024-01-01 00:00:00"),
      (5L, "purchase", "2024-01-01 01:00:00"))
    val got = EventAnalytics
      .funnel(events, Seq("signup", "view", "purchase"), horizonDays = 7)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) === (("signup", 4L, 1.0)))
    assert(got(2L) === (("view", 2L, 0.5)))    // u1 and u4
    assert(got(3L) === (("purchase", 1L, 0.25))) // u1 only
  }

  test("pivotDaily: per-type column pairs, absent cells are 0 not null") {
    val events = Seq(
      (1L, "click", "2024-01-01 10:00:00", 1.0),
      (1L, "click", "2024-01-01 11:00:00", 2.0),
      (2L, "view", "2024-01-01 12:00:00", 5.0),
      (3L, "error", "2024-01-02 09:00:00", 1.5))
      .toDF("user_id", "event_type", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = EventAnalytics.pivotDaily(events, Seq("click", "view", "error"))
      .orderBy("day").collect()
    assert(got.map(_.getAs[String]("day")).toSeq === Seq("2024-01-01", "2024-01-02"))
    val d1 = got(0)
    assert(d1.getAs[Long]("click_n") === 2L)
    assert(d1.getAs[Double]("click_sum") === 3.0)
    assert(d1.getAs[Long]("view_n") === 1L)
    assert(d1.getAs[Double]("view_sum") === 5.0)
    assert(d1.getAs[Long]("error_n") === 0L)
    assert(d1.getAs[Double]("error_sum") === 0.0)
    val d2 = got(1)
    assert(d2.getAs[Long]("click_n") === 0L)
    assert(d2.getAs[Double]("click_sum") === 0.0)
    assert(d2.getAs[Long]("error_n") === 1L)
    assert(d2.getAs[Double]("error_sum") === 1.5)
    // a type absent from the whole input still gets its columns
    val cols = EventAnalytics.pivotDaily(events, Seq("click", "purchase")).columns.toSeq
    assert(cols === Seq("day", "click_n", "click_sum", "purchase_n", "purchase_sum"))
  }

  test("pivotDaily rejects an empty or duplicated type domain") {
    val events = ev((1L, "click", "2024-01-01 10:00:00")).withColumn("value", lit(1.0))
    intercept[IllegalArgumentException](EventAnalytics.pivotDaily(events, Nil))
    intercept[IllegalArgumentException](
      EventAnalytics.pivotDaily(events, Seq("click", "click")))
  }

  test("funnelStepTimes: hand-computed percentiles over converting users only") {
    val events = Seq(
      // three users sign up; deltas to 'view': 10s, 20s, 30s; only
      // user 1 purchases (40s after its view)
      (1L, 1L, "signup", "2024-01-01 00:00:00"),
      (2L, 1L, "view", "2024-01-01 00:00:10"),
      (3L, 1L, "purchase", "2024-01-01 00:00:50"),
      (4L, 2L, "signup", "2024-01-01 01:00:00"),
      (5L, 2L, "view", "2024-01-01 01:00:20"),
      (6L, 3L, "signup", "2024-01-01 02:00:00"),
      (7L, 3L, "view", "2024-01-01 02:00:30"),
      (8L, 4L, "signup", "2024-01-01 03:00:00")) // never converts
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = EventAnalytics.funnelStepTimes(
      events, Seq("signup", "view", "purchase"), horizonDays = 7)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // view step: deltas [10, 20, 30] — p50 = 20, p90 = 20 + 0.8*10 = 28
    assert(got(2L)._1 === "view" && got(2L)._2 === 3L)
    assert(math.abs(got(2L)._3 - 20.0) < 1e-9)
    assert(math.abs(got(2L)._4 - 28.0) < 1e-9)
    // purchase step: single delta [40] — both percentiles 40; n = 1
    assert(got(3L) === (("purchase", 1L, 40.0, 40.0)))
    assert(got.size === 2) // the never-converting user adds no row
  }

  test("transitionMatrix: consecutive pairs per user, cross-user isolation, row-normalized p") {
    val events = Seq(
      // user 1: view -> click -> view -> purchase
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (2L, 1L, "click", "2024-01-01 00:01:00"),
      (3L, 1L, "view", "2024-01-01 00:02:00"),
      (4L, 1L, "purchase", "2024-01-01 00:03:00"),
      // user 2: view -> view (its last event never pairs with user 1's)
      (5L, 2L, "view", "2024-01-01 00:00:30"),
      (6L, 2L, "view", "2024-01-01 00:00:45"))
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = EventAnalytics.transitionMatrix(events)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // from 'view': ->click (1), ->purchase (1), ->view (1) — p = 1/3 each
    assert(got(("view", "click")) === ((1L, 1.0 / 3)))
    assert(got(("view", "purchase")) === ((1L, 1.0 / 3)))
    assert(got(("view", "view")) === ((1L, 1.0 / 3)))
    assert(got(("click", "view")) === ((1L, 1.0)))
    // no cross-user pair, no pair out of the terminal events
    assert(got.size === 4)
    assert(!got.contains(("purchase", "view")))
  }

  test("attribution: first/last touch, lookback boundaries, ties, organic conversions") {
    val events = Seq(
      // user 1: view(t=0s) click(t=100s) purchase(t=200s) view(t=300s)
      (10L, 1L, "view", "2024-01-01 00:00:00", 0.0),
      (11L, 1L, "click", "2024-01-01 00:01:40", 0.0),
      (12L, 1L, "purchase", "2024-01-01 00:03:20", 9.5),
      (13L, 1L, "view", "2024-01-01 00:05:00", 0.0),
      // user 2: touch EXACTLY at the 7-day boundary (included), organic later
      (20L, 2L, "click", "2024-01-01 00:00:00", 0.0),
      (21L, 2L, "purchase", "2024-01-08 00:00:00", 1.0),
      (22L, 2L, "purchase", "2024-01-16 00:00:00", 2.0), // > 7d after any touch
      // user 3: touch at the SAME instant as the conversion — excluded
      (30L, 3L, "view", "2024-01-01 00:00:00", 0.0),
      (31L, 3L, "purchase", "2024-01-01 00:00:00", 3.0),
      // user 4: same-timestamp touches — event_id breaks the argmax tie
      (40L, 4L, "view", "2024-01-01 00:00:00", 0.0),
      (41L, 4L, "click", "2024-01-01 00:00:00", 0.0),
      (42L, 4L, "purchase", "2024-01-01 00:00:01", 4.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = EventAnalytics.attribution(
      events, "purchase", Seq("click", "view"), 7L * 24 * 3600 * 1000000L)
      .collect().map(r => r.getLong(1) -> r).toMap
    // user 1: last = click@100s, first = view@0s; the post-purchase view never counts
    assert(got(12L).getString(3) === "click" && got(12L).getLong(4) === 11L)
    assert(got(12L).getLong(5) === 100L * 1000000L)
    assert(got(12L).getString(6) === "view" && got(12L).getLong(7) === 10L)
    // user 2: boundary touch attributes the first purchase, not the second
    assert(got(21L).getLong(4) === 20L)
    assert(got(22L).isNullAt(3) && got(22L).isNullAt(7))
    // user 3: same-instant touch is NOT a preceding touch
    assert(got(31L).isNullAt(3))
    // user 4: equal-ts touches — higher event_id wins last, lower wins first
    assert(got(42L).getLong(4) === 41L && got(42L).getLong(7) === 40L)
    assert(got.size === 5)
  }

  test("pathNgrams: hand-counted trigrams, per-user boundaries, short streams drop") {
    // user 1: view click buy view click (3 trigrams)
    // user 2: view click (too short for n=3 — contributes nothing)
    // user 3: view click buy (1 trigram, same as user 1's first)
    val events = Seq(
      (1L, 10L, "view", "2024-01-01 10:00:00"),
      (1L, 11L, "click", "2024-01-01 10:01:00"),
      (1L, 12L, "buy", "2024-01-01 10:02:00"),
      (1L, 13L, "view", "2024-01-01 10:03:00"),
      (1L, 14L, "click", "2024-01-01 10:04:00"),
      (2L, 20L, "view", "2024-01-01 11:00:00"),
      (2L, 21L, "click", "2024-01-01 11:01:00"),
      (3L, 30L, "view", "2024-01-01 12:00:00"),
      (3L, 31L, "click", "2024-01-01 12:01:00"),
      (3L, 32L, "buy", "2024-01-01 12:02:00"))
      .toDF("user_id", "event_id", "event_type", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = EventAnalytics.pathNgrams(events, n = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(got(("view", "click", "buy")) === 2L)
    assert(got(("click", "buy", "view")) === 1L)
    assert(got(("buy", "view", "click")) === 1L)
    assert(got.size === 3) // user 2's short stream contributed nothing
    // equal-ts ordering falls to event_id: swap times to force the tie
    val tied = Seq(
      (1L, 2L, "b", "2024-01-01 10:00:00"),
      (1L, 1L, "a", "2024-01-01 10:00:00"),
      (1L, 3L, "c", "2024-01-01 10:00:00"))
      .toDF("user_id", "event_id", "event_type", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val t = EventAnalytics.pathNgrams(tied, n = 3).collect()
    assert(t.length === 1 &&
      (t.head.getString(0), t.head.getString(1), t.head.getString(2)) === (("a", "b", "c")))
  }
}
