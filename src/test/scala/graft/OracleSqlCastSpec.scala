package graft

import org.scalatest.funsuite.AnyFunSuite

/** The DuckDB HUGEINT gate, in-JVM (round-10 verdict ask #7): DuckDB
  * widens SUM over any integer type to HUGEINT, which pandas reads as
  * dtype=object — so a FINAL result column that is a bare integer SUM
  * hash-mismatches the Spark BIGINT even when every value is equal (the
  * x66 red of round 9). The sweep's selfcheck gates this with real
  * dtypes, but only when the sweep runs; this spec makes `sbt test`
  * refuse the class too.
  *
  * Static SQL can't tell which SUM reaches the final projection, so the
  * rule is allowlist-pinned: every EXISTING bare integer SUM (86
  * occurrences, all interior — they feed ratios/casts downstream and are
  * hash-green in CORRECTNESS_r10) is reviewed and pinned per query; any
  * NEW one fails the suite until the author either writes
  * `CAST(SUM(x) AS BIGINT)` or consciously re-pins after checking the
  * sum never reaches the output uncast. The exact-match test keeps the
  * allowlist honest in both directions (a removed sum must update the
  * pin too).
  */
class OracleSqlCastSpec extends AnyFunSuite {

  /** Count SUM( occurrences that are (a) not wrapped in CAST(...) and
    * (b) summing an integer-looking argument (no float marker — '.',
    * '::', CAST, DOUBLE, FLOAT — anywhere in the argument). DuckDB sums
    * float arguments to DOUBLE, which pandas reads as float64 on both
    * engines, so those cannot produce the HUGEINT class.
    */
  private[graft] def bareIntSums(sql: String): Int = {
    val sumPat = "(?i)sum\\s*\\(".r
    val castTail = "(?i)cast\\s*\\($".r
    sumPat.findAllMatchIn(sql).count { m =>
      var depth = 1
      var j = m.end
      while (depth > 0 && j < sql.length) {
        if (sql(j) == '(') depth += 1
        else if (sql(j) == ')') depth -= 1
        j += 1
      }
      val arg = sql.substring(m.end, math.max(m.end, j - 1)).toLowerCase
      val pre = sql.substring(math.max(0, m.start - 60), m.start)
      val wrapped = castTail.findFirstIn(pre.replaceAll("\\s+$", "")).isDefined
      val floaty = Seq(".", "::", "cast", "double", "float").exists(arg.contains)
      !wrapped && !floaty
    }
  }

  /** Reviewed interior sums per query (see class doc). Computed from the
    * round-11 oracle map; every entry verified hash-green.
    */
  private val Reviewed: Map[String, Int] = Map(
    "o02_scan_forecasting" -> 1, "o03_scan_historical" -> 1,
    "o12_forecast_no_move_type" -> 1, "o15_null_validation" -> 1,
    "o22_percentages" -> 3, "o24_fallback_chain" -> 3,
    "o25_branch_validation" -> 1, "o26_move_type_validation" -> 3,
    "o28_grouped_sum4" -> 2, "o29_grouped_sum3" -> 2,
    "o30_training_prep" -> 1, "o31_monthly_avg" -> 3,
    "o32_trends" -> 2, "o32_trends_mt" -> 2,
    "o33_distinct_move_types" -> 1, "o35_count" -> 3,
    "o36_forecast_summary" -> 3, "o42_forecast_daily" -> 3,
    "o43_comments" -> 3, "s01_daily_counts" -> 1, "s02_sessions" -> 1,
    // the streamed rows share their batch restatements' SQL verbatim
    // (the round-13 alias map), so they inherit the same reviewed sums
    "s01s_daily_counts_streamed" -> 1, "s02s_sessions_streamed" -> 1,
    "x02_token_stats" -> 1, "x102_pivot_events" -> 5,
    "x104_oov_by_lang" -> 2, "x113_vocab_coverage" -> 2,
    // x122: the four sums are over `v`, an alias of CAST(… AS DOUBLE) —
    // double-typed, so DuckDB sums to DOUBLE; the bare-name heuristic
    // just can't see through the alias (reviewed round 11, hash-green)
    "x122_embedding_profile" -> 4,
    // x133/x134: the three interior sums (rc's bucket counts and the two
    // scalar totals) feed ln() as doubles and never reach the output —
    // the output sums are CAST(… AS BIGINT) / a double sum (reviewed
    // round 13, hash-green in the selfcheck sweep)
    "x133_dsir_weights" -> 3, "x134_dsir_select" -> 3,
    "x17_rollup_totals" -> 2, "x18_rolling_7day" -> 1,
    "x25_repetition" -> 1, "x27_source_mix" -> 1, "x32_mix_weights" -> 2,
    "x36_resampled_corpus" -> 2, "x39_unigram_logprob" -> 2,
    "x40_pack_sequences" -> 1, "x44_ppl_buckets" -> 2,
    "x45_audio_features" -> 2, "x47_gopher_rules" -> 1,
    "x53_curation_pipeline" -> 4, "x54_asof_join" -> 1,
    "x55_interval_join" -> 1, "x62_bm25_topk" -> 1,
    "x63_bm25_indexed" -> 1, "x65_bigram_logprob" -> 3,
    "x69_hashed_embedding" -> 1, "x74_rollup_report" -> 1,
    "x75_running_user_value" -> 1, "x77_bm25_appended" -> 1,
    "x78_asof_forward" -> 1, "x95_psi_drift" -> 1,
    "x99_token_budget" -> 1)

  test("no NEW bare integer SUM in oracle SQL (the DuckDB HUGEINT class)") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val n = bareIntSums(sql)
        val ok = Reviewed.getOrElse(name, 0)
        if (n > ok) Some(s"$name: $n bare integer SUM(...) (reviewed: $ok)")
        else None
    }
    assert(offenders.isEmpty,
      offenders.mkString(
        "\nDuckDB widens integer SUM to HUGEINT -> pandas object dtype -> " +
          "hash mismatch even on equal values. Write CAST(SUM(x) AS BIGINT) " +
          "(or verify the sum never reaches the output uncast and re-pin " +
          "OracleSqlCastSpec.Reviewed):\n", "\n", ""))
  }

  test("the reviewed allowlist matches the current SQL exactly (no stale pins)") {
    val stale = Reviewed.toSeq.sortBy(_._1).flatMap { case (name, n) =>
      SparkEntry.oracleSql.get(name) match {
        case None => Some(s"$name: pinned but no longer in oracleSql")
        case Some(sql) if bareIntSums(sql) != n =>
          Some(s"$name: pinned $n, found ${bareIntSums(sql)} — update the pin")
        case _ => None
      }
    }
    assert(stale.isEmpty, stale.mkString("\n"))
  }

  test("the detector detects: a deliberately uncast SUM would fail this suite") {
    assert(bareIntSums("SELECT l_flag, SUM(k) AS s FROM t GROUP BY 1") === 1)
    assert(bareIntSums("SELECT CAST(SUM(k) AS BIGINT) AS s FROM t") === 0)
    assert(bareIntSums("SELECT sum(x * 1.0) FROM t") === 0)
    assert(bareIntSums("SELECT sum(CAST(x AS DOUBLE)) FROM t") === 0)
    assert(bareIntSums("SELECT sum(t.value) FROM t") === 0) // field access: float marker
    assert(bareIntSums("SELECT sum(a), sum(b) FROM t") === 2)
    assert(bareIntSums("SELECT sum(CASE WHEN f THEN 1 ELSE 0 END) FROM t") === 1)
  }
}
