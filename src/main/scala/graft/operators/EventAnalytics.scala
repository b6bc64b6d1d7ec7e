package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Product-analytics operators over the event stream (`events` table:
  * event_id, ts, user_id, event_type, value, props) — the classic OLAP
  * queries an analytics engine serves next to the curation surface:
  * semi-structured property extraction, cohort retention, and ordered
  * funnel conversion. All closed-form and ANSI-expressible, so each
  * carries a DuckDB oracle (x66/x67/x68).
  *
  * Scale shapes: everything reduces through per-user or per-cohort
  * aggregates — one shuffle on user_id for the user-grain rollups, one
  * on the (cohort, period) cell for retention — and never a corpus-wide
  * window or sort. The joins (retention's events × first-seen, the
  * funnel's per-step event slice × conversion table) are user-keyed
  * equi against per-user aggregates: both sides are user-cardinality
  * at 100 TB, so a shuffle join is the correct plan there (the
  * x24-class PlanAudit allowance).
  */
object EventAnalytics {

  /** Typed extraction of a JSON properties column — schema-on-read for
    * the semi-structured payload every event pipeline drags along.
    * `from_json` with an EXPLICIT schema (never schema inference, which
    * would scan the corpus twice): malformed or missing fields come
    * back null (PERMISSIVE), so the operator is total.
    */
  def propsLong(props: Column, field: String): Column =
    from_json(props, new StructType().add(field, LongType)).getField(field)

  /** Calendar-period key for cohort/retention reports over the
    * (timezone-naive) event time — string-comparable and
    * engine-portable: "month" → 'yyyy-MM', "day" → 'yyyy-MM-dd'.
    */
  private def periodOf(ts: Column, grain: String): Column = grain match {
    case "month" => date_format(ts, "yyyy-MM")
    case "day"   => date_format(ts, "yyyy-MM-dd")
    case other   => throw new IllegalArgumentException(s"unknown grain: $other")
  }

  /** Cohort retention: users grouped by the period of their FIRST event
    * (the cohort), each later period scored by how many of them came
    * back. One row per (cohort, period) with the distinct active count,
    * the cohort's size, and their ratio.
    *
    * Shape: first-seen is one per-user aggregate (shuffle on user_id);
    * events join it user-keyed (both sides user-cardinality — shuffle
    * join is the right plan at scale); cells reduce by (cohort, period)
    * with an exact COUNT(DISTINCT user) — exact is the oracle surface;
    * swap in approx_count_distinct at the 100 TB scale where a ±2%
    * cohort cell is acceptable, the x28 convention. Cohort sizes are a
    * bounded (periods × 1) aggregate, broadcast back.
    */
  def retentionCohorts(events: DataFrame, grain: String = "month"): DataFrame = {
    val firstSeen = events.groupBy("user_id")
      .agg(periodOf(min(col("ts")), grain).as("cohort"))
    // firstSeen is one row per user already — a plain count, no
    // distinct-expand needed
    val cohortSize = firstSeen.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_size"))
    events
      .select(col("user_id"), periodOf(col("ts"), grain).as("period"))
      .join(firstSeen, Seq("user_id"))
      .groupBy("cohort", "period")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(cohortSize), Seq("cohort"))
      .select(
        col("cohort"), col("period"), col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }

  /** Daily volume anomaly detection per event type — the monitoring
    * query every event pipeline runs over itself: z-score each
    * (type, day) count against that type's own daily mean and
    * population stddev, flag |z| beyond the threshold. A type with a
    * constant daily series (σ = 0) has no defined z and is never
    * anomalous.
    *
    * Shape: one shuffle to daily cells, one bounded per-type stats
    * aggregate broadcast back — never a window over the corpus. The
    * z-score and the flag both ride the CrossRound.ra collapse (σ and
    * μ are aggregate-fed doubles, so the flag's threshold compare must
    * see the same rounded value on every engine and at every
    * parallelism).
    */
  def dailyAnomalies(events: DataFrame, zThreshold: Double = 2.0): DataFrame = {
    val daily = events
      .groupBy(periodOf(col("ts"), "day").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type")
      .agg(avg(col("n")).as("mu"), stddev_pop(col("n")).as("sigma"))
    daily.join(broadcast(stats), Seq("event_type"))
      .withColumn("z",
        when(col("sigma") > 0, (col("n") - col("mu")) / col("sigma")))
      .select(col("day"), col("event_type"), col("n"), col("z"),
        coalesce(abs(CrossRound.ra(col("z"), 6)) > zThreshold, lit(false))
          .as("is_anomaly"))
  }

  /** Robust daily anomaly detection per event type — the median/MAD
    * counterpart of [[dailyAnomalies]]: modified z-score
    * M = 0.6745 · (n − median) / MAD (Iglewicz & Hoaglin's outlier
    * labeling), flag |M| beyond the threshold (their canonical 3.5).
    * Medians fix the mean/σ variant's blind spot: one catastrophic day
    * inflates σ enough to hide itself (and mask real anomalies) — the
    * breakdown point of z-scores is 0%, of MAD 50%. A type whose daily
    * counts are majority-constant (MAD = 0) has no defined M and is
    * never flagged.
    *
    * Shape: one shuffle to daily cells, then two bounded per-type
    * aggregates (median, then MAD over the deviations) broadcast back —
    * never a corpus window. Exact medians are ORDER-INDEPENDENT, so
    * unlike the σ path nothing here needs the aggregate-drift (ra)
    * collapse: counts are integers, medians are exact binary halves,
    * and M is one deterministic double expression (plain r-rounding in
    * the flag, mirrored verbatim in the oracle).
    */
  def robustAnomalies(events: DataFrame, mThreshold: Double = 3.5): DataFrame = {
    val daily = events
      .groupBy(periodOf(col("ts"), "day").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy("event_type")
      .agg(median(col("n")).as("med"))
    val dev = daily.join(broadcast(med), Seq("event_type"))
    val mad = dev.groupBy("event_type")
      .agg(median(abs(col("n") - col("med"))).as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .withColumn("m",
        when(col("mad") > 0,
          lit(0.6745) * (col("n") - col("med")) / col("mad")))
      .select(col("day"), col("event_type"), col("n"), col("med"),
        col("mad"), col("m"),
        coalesce(abs(CrossRound.r(col("m"), 6)) > mThreshold, lit(false))
          .as("is_anomaly"))
  }

  /** Batch gap-based sessionization — the batch twin of the streaming
    * sessionizer (`Ingest.sessionize`): a user's events split into
    * sessions wherever the gap to the previous event exceeds
    * `gapMinutes`. One row per session with its event count, start/end
    * (epoch micros — the engine-portable time axis) and duration.
    * Every output column is integral, so the row is drift-free by
    * construction (no float collapse anywhere).
    *
    * Shape: ONE shuffle on user_id for the lag/cumsum window (windows
    * partition by user — user-cardinality state, never a corpus-wide
    * sort), then the per-session rollup groupBy. The window's order key
    * is (ts, event_id) so simultaneous events are deterministically
    * ordered on every engine and at every parallelism.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    require(gapMinutes > 0, "session gap must be positive")
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val us = unix_micros(col("ts").cast("timestamp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("e_us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), us.as("e_us"))
      .withColumn("is_new",
        when(col("e_us") - lag(col("e_us"), 1).over(w) <= gapUs, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("session_id", sum(col("is_new")).over(w))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("e_us")).as("start_us"),
        max(col("e_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Wide-format daily activity report — the pivot every BI layer asks
    * of an event table: one row per day, one (count, value-sum) column
    * pair per event type. The type domain is EXPLICIT (`types`), never
    * inferred: Spark's two-pass pivot-value discovery would scan the
    * corpus twice, and an open domain makes the output schema
    * data-dependent — both wrong at 100 TB. With the domain pinned the
    * whole pivot compiles to ONE conditional-aggregation shuffle on
    * day (exactly the SQL a hand-written `SUM(CASE WHEN …)` produces),
    * |days| × (2·|types| + 1) output cells, no second pass.
    *
    * The value sums are float aggregates, so they ride the
    * CrossRound.ra collapse (partition-order drift); counts are exact.
    * Absent (day, type) cells surface as 0 / 0.0 — a report row is
    * total over the domain, never null-holed.
    */
  def pivotDaily(events: DataFrame, types: Seq[String]): DataFrame = {
    require(types.nonEmpty && types.distinct.size == types.size,
      "pivot needs a non-empty, duplicate-free type domain")
    val wide = events
      .groupBy(periodOf(col("ts"), "day").as("day"))
      .pivot("event_type", types)
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"))
    val cols = col("day") +: types.flatMap(t =>
      Seq(
        coalesce(col(s"${t}_n"), lit(0L)).as(s"${t}_n"),
        CrossRound.ra(coalesce(col(s"${t}_sum_value"), lit(0.0)), 4)
          .as(s"${t}_sum")))
    wide.select(cols: _*)
  }

  /** Ordered funnel conversion: how many users performed `steps` in
    * order, every later step within `horizonDays` of their FIRST step-1
    * event. t_0 is the user's earliest step-1 event; t_i is the
    * EARLIEST step-i event at or after t_(i-1) and inside the horizon —
    * the strict-sequence semantics of product funnels (a purchase
    * before the signup does not count, but a later one still does:
    * each step's time is "earliest AFTER the previous conversion",
    * not the step's global minimum, which would undercount users whose
    * first step-i event predates step 1).
    *
    * Shape: one per-user aggregate for t_0, then one user-keyed
    * left-join + per-user min per LATER step — each round shuffles only
    * the step-i event slice (one event type) against the per-user
    * conversion table, so cost scales with the funnel's own events,
    * and the step count is a small constant. The final per-step rows
    * explode out of a single bounded global aggregate. Never a per-user
    * sort or an all-events self-join.
    */
  /** The per-user conversion table behind [[funnel]] and
    * [[funnelStepTimes]]: one row per step-1 user with t_0..t_k =
    * first qualifying event time per step (earliest-AFTER-previous,
    * inside the horizon from t_0), null where the user never reached
    * the step.
    */
  private def convTable(
      events: DataFrame,
      steps: Seq[String],
      horizonDays: Int): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val horizonUs = horizonDays.toLong * 24L * 3600L * 1000000L
    val us = unix_micros(col("ts").cast("timestamp"))
    val t0 = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(us).as("t_0"))
    steps.indices.tail.foldLeft(t0) { (acc, i) =>
      val stepEv = events.filter(col("event_type") === steps(i))
        .select(col("user_id"), us.as("e_us"))
      val keys = "user_id" +: (0 until i).map(j => s"t_$j")
      acc.join(stepEv, Seq("user_id"), "left")
        .groupBy(keys.head, keys.tail: _*)
        .agg(min(when(
          col("e_us") >= col(s"t_${i - 1}") &&
            col("e_us") - col("t_0") <= horizonUs,
          col("e_us"))).as(s"t_$i"))
    }
  }

  /** Step-transition latency percentiles — the "how long does
    * conversion take" report next to [[funnel]]'s "how many convert":
    * per transition, exact interpolated percentiles of
    * (t_i − t_{i−1}) in seconds over the users who reached step i.
    *
    * Shape: the SAME conv fold as the funnel, then ONE aggregate row
    * holding every transition's count and percentiles (aggregate
    * functions skip the non-converting users' null deltas, so no
    * per-step re-scan and no corpus-scale persist), exploded to one
    * row per transition. Deltas are exact integer micros; the
    * interpolation is the only float op (the x89 lerp class — callers
    * apply the ra collapse).
    */
  def funnelStepTimes(
      events: DataFrame,
      steps: Seq[String],
      horizonDays: Int): DataFrame = {
    val conv = convTable(events, steps, horizonDays)
    // exact percentile, not the sketch: the driver-facing report wants
    // the x89 semantics (ANSI PERCENTILE_CONT over the micros deltas)
    val exactAggs = steps.indices.tail.flatMap { i =>
      Seq(
        count(col(s"t_$i")).as(s"n_$i"),
        expr(s"percentile(t_$i - t_${i - 1}, 0.5)").as(s"p50_$i"),
        expr(s"percentile(t_$i - t_${i - 1}, 0.9)").as(s"p90_$i"))
    }
    val one = conv.agg(exactAggs.head, exactAggs.tail: _*)
    one
      .select(explode(array(steps.indices.tail.map(i =>
        struct(
          lit(i + 1).cast("long").as("step"),
          lit(steps(i)).as("event_type"),
          col(s"n_$i").as("n_users"),
          (col(s"p50_$i") / 1e6).as("p50_s"),
          (col(s"p90_$i") / 1e6).as("p90_s"))): _*)).as("r"))
      .select("r.step", "r.event_type", "r.n_users", "r.p50_s", "r.p90_s")
  }

  def funnel(
      events: DataFrame,
      steps: Seq[String],
      horizonDays: Int): DataFrame = {
    val conv = convTable(events, steps, horizonDays)
    val counts = conv.agg(
      count(col("t_0")).as("n_0"),
      steps.indices.tail.map(i => count(col(s"t_$i")).as(s"n_$i")): _*)
    counts
      .select(explode(array(steps.indices.map(i =>
        struct(
          lit(i + 1).cast("long").as("step"),
          lit(steps(i)).as("event_type"),
          col(s"n_$i").as("n_users"),
          (col(s"n_$i").cast("double") / col("n_0").cast("double"))
            .as("conversion"))): _*))
        .as("r"))
      .select("r.step", "r.event_type", "r.n_users", "r.conversion")
  }

  /** Event-type transition matrix — the first-order Markov view of
    * user behavior (the numbers behind every Sankey/flow diagram and
    * next-action model): for each (from, to) pair of CONSECUTIVE
    * events of one user, the transition count and probability
    * p(to | from).
    *
    * Shape: ONE user-keyed window shuffle for the lead() pairing
    * (ordered by (t_us, event_id) — a unique key, so consecutive-ness
    * is engine-deterministic), then a groupBy over the |types|²-BOUNDED
    * pair table; the row-probability normalizer is a window over that
    * bounded table, never a second corpus pass. Counts are exact longs
    * and p is one long/long division — order-exact, no float
    * accumulation.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val us = unix_micros(col("ts").cast("timestamp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t_us", "event_id")
    val wFrom = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
    events
      .select(col("user_id"), col("event_id"), col("event_type"), us.as("t_us"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn(
        "p",
        col("n").cast("double") / sum(col("n")).over(wFrom).cast("double"))
  }

  /** Top event-path n-grams ([[transitionMatrix]]'s higher-order
    * companion): the most common length-`n` consecutive event-type
    * sequences per user stream — the path-analysis report ("what do
    * users actually do around a purchase") that first-order transition
    * probabilities structurally cannot show (Markov chains forget where
    * the user came FROM two steps ago).
    *
    * Shape: ONE user-keyed window shuffle — n−1 lead() columns over the
    * same (t_us, event_id)-ordered window collapse into one window node —
    * then a groupBy bounded by |types|^n (the report's own cardinality,
    * a few hundred rows for any real event taxonomy). Paths shorter than
    * n at a stream's tail drop (lead returns null). No top-k cut here:
    * callers rank/limit the bounded result, keeping this operator a pure
    * aggregate.
    */
  def pathNgrams(events: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 2, s"path n-grams need n >= 2: $n")
    val us = unix_micros(col("ts").cast("timestamp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t_us", "event_id")
    val base = events
      .select(col("user_id"), col("event_id"), col("event_type"), us.as("t_us"))
    val steps = (1 until n).foldLeft(base) { (df, i) =>
      df.withColumn(s"step_$i", lead(col("event_type"), i).over(w))
    }
    val stepCols = col("event_type").as("step_0") +:
      (1 until n).map(i => col(s"step_$i"))
    steps
      .filter((1 until n).map(i => col(s"step_$i").isNotNull).reduce(_ && _))
      .groupBy(stepCols: _*)
      .agg(count(lit(1)).as("n_paths"))
  }

  /** First/last-touch conversion attribution — for every conversion
    * event, the first and last preceding touch event of the same user
    * inside a lookback window: the report marketing analytics runs on
    * every event stream ("which channel gets credit for this
    * purchase").
    *
    * Shape: ONE user-keyed window shuffle, never a conversions×touches
    * self-join (per-user theta products blow up on power users — the
    * exact hot-key failure the as-of join's block hatch exists for).
    * Each row carries a nullable touch struct; first/last touch are
    * min/max of that struct over a RANGE frame [t − lookback, t), so
    * frame membership is by VALUE (ties at the boundary resolve
    * identically on every engine) and the struct's (t_us, event_id)
    * lead makes the argmax order-deterministic without any row-order
    * tie-break. Aggregate min/max skip nulls, so non-touch rows in the
    * frame contribute nothing; a conversion with no touch in window
    * reports null attribution rather than vanishing — the "organic
    * conversion" row the report needs most.
    */
  def attribution(
      events: DataFrame,
      convType: String,
      touchTypes: Seq[String],
      lookbackUs: Long): DataFrame = {
    require(touchTypes.nonEmpty, "at least one touch type")
    require(lookbackUs > 0, s"lookback must be positive: $lookbackUs")
    val us = unix_micros(col("ts").cast("timestamp"))
    val tagged = events.select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      us.as("t_us"),
      when(
        col("event_type").isin(touchTypes: _*),
        struct(
          us.as("t_us"), col("event_id").as("event_id"),
          col("event_type").as("event_type"))).as("touch"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t_us")
      .rangeBetween(-lookbackUs, -1L)
    tagged
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("t_us"),
        max(col("touch")).over(w).as("lt"),
        min(col("touch")).over(w).as("ft"))
      .filter(col("event_type") === convType)
      .select(
        col("user_id"),
        col("event_id").as("conv_event_id"),
        col("value"),
        col("lt.event_type").as("last_touch_type"),
        col("lt.event_id").as("last_touch_event"),
        (col("t_us") - col("lt.t_us")).as("last_touch_lag_us"),
        col("ft.event_type").as("first_touch_type"),
        col("ft.event_id").as("first_touch_event"))
  }
}
