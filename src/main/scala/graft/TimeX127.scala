package graft

import org.apache.spark.sql.functions._

/** Stage-timing harness for x127 (fuzzy decontam) perf work — times the
  * jaccardDecontam frames at the x127 split (benchmark = doc_id % 10
  * == 0) plus the x29-shaped jaccardNearDupsAgainst path for reference.
  * Interactive-rep tool (TimeX106 precedent). This harness found both
  * round-13 x127 regressions: the forced broadcast of the oversized
  * fixture benchmark's postings, and the inline-tokens O(tokens²)
  * lambda evaluation in the n_b projection (see candDocs' comment in
  * [[graft.operators.Dedup.jaccardDecontam]]).
  */
object TimeX127 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def dropCached(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
    }
    import graft.sources.Tables
    import graft.operators.Dedup
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[x127] $label%-28s ($n%8d rows): ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to 3).foreach { rep =>
      println(s"[x127] --- rep $rep ---")
      val docs = Tables.documents(spark, dir)
      val probe = docs.filter(col("doc_id") % 10 =!= 0)
      val bench = docs.filter(col("doc_id") % 10 === 0)
      dropCached()
      // construction = the eager pair-bounded checkpoints (bench
      // shingle df, candidates, candidate docs); action = the closing
      // joins over those materialized frames
      var whole: org.apache.spark.sql.DataFrame = null
      time("jd_construct") { whole = Dedup.jaccardDecontam(probe, bench, 0.5, 2, 100); 0L }
      time("jd_action") { whole.count() }
      dropCached()
      time("whole_jaccardDecontam") {
        Dedup.jaccardDecontam(probe, bench, 0.5, 2, 100).count()
      }
      dropCached()
      time("whole_x29_path") {
        Dedup.jaccardNearDupsAgainst(probe, bench, 0.5, 2, 100).count()
      }
      dropCached()
    }
    spark.stop()
  }
}
