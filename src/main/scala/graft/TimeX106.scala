package graft

import org.apache.spark.sql.functions._

/** Scratch stage-timing harness for x106 (PPJoin) perf work: times the
  * prefix/candidate stage separately from the verify stage so a verify
  * optimization can be attributed instead of guessed. Not part of any
  * gate; kept for the next perf pass (TimeX41 precedent).
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
    import graft.operators.{Dedup, TextOps}
    val threshold = 0.5
    val n = 3
    (1 to 3).foreach { rep =>
      val docs = Tables.documents(spark, dir)
      var t0 = System.nanoTime()
      // --- stage 1: shingle + df + prefix + candidate self-join (the
      // cand frame of Dedup.ppjoinNearDups, reproduced)
      val sh = TextOps.shingles(docs, n).filter(col("shingle").isNotNull)
      val dfTab = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      val ranked = sh.join(dfTab, Seq("shingle"))
        .withColumn("len", count(lit(1)).over(wDoc))
        .withColumn("pos", row_number().over(wDoc.orderBy(col("df"), col("shingle"))))
      val alphaFrac = threshold / (1.0 + threshold)
      val prefix = ranked
        .filter(col("pos") <= col("len") - ceil(lit(threshold) * col("len")).cast("long") + 1)
        .select(col("shingle"), col("doc_id"), col("len"), col("pos"))
      val iPrefixEnd =
        col("len") - ceil(lit(2.0 * alphaFrac) * col("len") - lit(1e-9)).cast("long") + 1
      val probeSide = prefix.select(
        col("shingle"), col("doc_id").as("doc_p"),
        col("len").as("n_p"), col("pos").as("pos_p"))
      val indexSide = prefix
        .filter(col("pos") <= iPrefixEnd)
        .select(
          col("shingle"), col("doc_id").as("doc_i"),
          col("len").as("n_i"), col("pos").as("pos_i"))
      val cand = probeSide
        .join(indexSide, Seq("shingle"))
        .filter(
          col("n_i") < col("n_p") ||
            (col("n_i") === col("n_p") && col("doc_i") < col("doc_p")))
        .filter(col("n_i").cast("double") >= ceil(lit(threshold) * col("n_p")))
        .filter(
          lit(1) + least(col("n_p") - col("pos_p"), col("n_i") - col("pos_i")) >=
            ceil(lit(alphaFrac) * (col("n_p") + col("n_i")) - lit(1e-9)))
        .select(
          least(col("doc_p"), col("doc_i")).as("doc_a"),
          greatest(col("doc_p"), col("doc_i")).as("doc_b"),
          when(col("doc_p") < col("doc_i"), col("n_p")).otherwise(col("n_i")).as("n_a"),
          when(col("doc_p") < col("doc_i"), col("n_i")).otherwise(col("n_p")).as("n_b"))
        .groupBy("doc_a", "doc_b")
        .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
        .localCheckpoint(false)
      val nCand = cand.count()
      println(f"[x106] rep $rep stage1 (prefix+cand, $nCand pairs): ${(System.nanoTime() - t0) / 1e9}%.3f s")
      // --- stage 2: shingleFrame build alone
      t0 = System.nanoTime()
      TextOps.shingleFrame(docs, n).queryExecution.toRdd.count()
      println(f"[x106] rep $rep shingleFrame alone: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      // --- stage 3: verify from cand (semi-join + arrays + intersect)
      t0 = System.nanoTime()
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .unionByName(cand.select(col("doc_b").as("doc_id")))
        .distinct()
      val arrs = TextOps.shingleFrame(docs, n)
        .join(candDocs, Seq("doc_id"), "leftsemi")
        .select(col("doc_id"), col("shingle_arr"))
        .localCheckpoint(false)
      val scored = cand
        .join(arrs.select(col("doc_id").as("doc_a"), col("shingle_arr").as("arr_a")), Seq("doc_a"))
        .join(arrs.select(col("doc_id").as("doc_b"), col("shingle_arr").as("arr_b")), Seq("doc_b"))
        .select(
          col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
          size(array_intersect(col("arr_a"), col("arr_b"))).cast("long").as("n_inter"))
        .localCheckpoint(false)
      val out = scored
        .withColumn(
          "jaccard",
          col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
        .filter(col("jaccard") >= threshold)
        .count()
      println(f"[x106] rep $rep stage3 (verify, $out survivors): ${(System.nanoTime() - t0) / 1e9}%.3f s")
      // --- whole operator for reference, measured CLEAN (caches and
      // checkpoints from the stage timings dropped first — leaving them
      // in place flattered the first measurement of this file by ~40%)
      dropCached()
      t0 = System.nanoTime()
      Dedup.ppjoinNearDups(docs, threshold, n).count()
      println(f"[x106] rep $rep whole: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      dropCached()
    }
    spark.stop()
  }
}
