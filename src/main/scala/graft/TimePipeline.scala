package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Dev tool: phase-level wall-clock breakdown of the composed curation
  * pipeline (x53/x57) at sf0.1 — pinpoints which materialization barrier
  * carries the composition overhead (the x53-vs-stage-sum delta the
  * round-7 verdict watch-listed). Usage: runMain graft.TimePipeline
  * [classifier]
  */
object TimePipeline {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val withClassifier = args.contains("classifier")
    def dropCached(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
    }
    (1 to 3).foreach { round =>
      val docs = Tables.documents(spark, dir)
      val banned = docs.filter(col("doc_id") < 50)
      var last = System.nanoTime()
      def lap(label: String): Unit = {
        val now = System.nanoTime()
        println(f"[phase] run $round $label%-28s ${(now - last) / 1e9}%7.3f s")
        last = now
      }
      val capped = TextOps.capPerSource(docs, "doc_id", 20)
        .select(
          col("doc_id"), col("source"), col("text"),
          TextOps.qualityCol(TextOps.tokens(col("text"))).as("quality_score"))
        .persist()
      capped.count(); lap("cap")
      val filt0 = capped
        .join(
          TextOps.repetitionStats(capped)
            .select(col("doc_id"), col("dup_line_frac"), col("top_bigram_frac")),
          Seq("doc_id"))
        .filter(
          col("quality_score") >= 0.65 &&
            graft.operators.CrossRound.r(col("dup_line_frac"), 6) <= 0.2 &&
            graft.operators.CrossRound.r(col("top_bigram_frac"), 6) <= 0.1)
        .select(col("doc_id"), col("source"), col("text"), col("quality_score"))
      val filt = if (withClassifier) filt0.persist() else filt0
      filt.count(); lap("gates")
      val gated =
        if (!withClassifier) filt
        else {
          val model = graft.operators.QualityModel.fit(
            graft.operators.QualityModel.qualityFeatures(docs)
              .join(TextOps.qualityScore(docs), Seq("doc_id"))
              .withColumn("label", (col("quality_score") >= lit(0.65)).cast("int")))
          lap("classifier-fit")
          val g = filt.join(
            graft.operators.QualityModel.classify(filt, model, 0.5)
              .filter(col("keep")).select("doc_id"),
            Seq("doc_id"), "left_semi")
          g.count(); lap("classifier-gate")
          g
        }
      val exd = Dedup.dropExactDuplicates(gated).persist()
      exd.count(); lap("exact_dedup")
      val pairs = Dedup.jaccardNearDups(exd, 0.5, 2, 100)
        .select(col("doc_a"), col("doc_b"))
      pairs.count(); lap("near_dup_pairs")
      val nd = Dedup.dropNearDuplicatesBy(exd, pairs, "quality_score").persist()
      nd.count(); lap("near_dup_retention(CC)")
      val cleanIds = TextOps.contamination(nd, banned, 10)
        .filter(!col("contaminated")).select("doc_id").persist()
      cleanIds.count(); lap("decontam_ids")
      val clean = nd.join(cleanIds, Seq("doc_id"), "left_semi")
      val resampled = TextOps
        .resampleByTemperature(clean, 0.7, carryCols = Seq("text", "quality_score"))
        .withColumn("copy_id", col("copy_id").cast("long"))
      resampled.count(); lap("resample")
      graft.operators.Splits
        .packSequences(
          resampled.withColumn(
            "pack_key",
            concat(col("doc_id").cast("string"), lit("#"), col("copy_id").cast("string"))),
          512, 1, idCol = "pack_key",
          carryCols = Seq("doc_id", "copy_id", "source", "quality_score"))
        .count(); lap("pack")
      dropCached()
    }
    spark.stop()
  }
}
