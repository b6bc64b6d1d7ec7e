package graft

/** Stage-timing harness for x106 (PPJoin) perf work. Since round 12 it
  * delegates to [[graft.operators.Dedup.ppjoinStageTimings]] — the
  * PRODUCTION frames via ppjoinFrames, not a hand-kept replica (the
  * round-11 version reproduced the candidate stage inline and would have
  * drifted from the operator on the next change). The same decomposition
  * ships per round in BENCH_DETAIL's x106_stages block; this tool exists
  * for interactive reps during perf iteration (TimeX41 precedent).
  */
object TimeX106 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def dropCached(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
    }
    import graft.sources.Tables
    import graft.operators.Dedup
    val threshold = 0.5
    (1 to 3).foreach { rep =>
      val docs = Tables.documents(spark, dir)
      dropCached()
      Dedup.ppjoinStageTimings(docs, threshold).foreach { case (stage, sec, rows) =>
        println(f"[x106] rep $rep $stage%-12s ($rows%8d rows): $sec%.3f s")
      }
      // one-shot cross-check: the SAME frames forced through the final
      // barrier only — stage sums must track this (they do: the round-12
      // probe showed ~4.0 s one-shot vs ~4.1 s stage sum; `build` is the
      // AQE-eager construction share, see ppjoinFrames' scaladoc)
      dropCached()
      var t0 = System.nanoTime()
      val (_, _, scoredOnly) = Dedup.ppjoinFrames(docs, threshold, 3)
      val tBuild = (System.nanoTime() - t0) / 1e9
      scoredOnly.count()
      println(f"[x106] rep $rep scored-only (fresh frames, one action): ${(System.nanoTime() - t0) / 1e9}%.3f s (build $tBuild%.3f s)")
      // whole operator for reference, measured CLEAN (caches and
      // checkpoints from the stage timings dropped first — leaving them
      // in place flattered the first measurement of this file by ~40%)
      dropCached()
      t0 = System.nanoTime()
      Dedup.ppjoinNearDups(docs, threshold).count()
      println(f"[x106] rep $rep whole: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      dropCached()
    }
    spark.stop()
  }
}
