package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Dev tool: phase-level wall-clock breakdown of the composed curation
  * pipeline (x53/x57) at sf0.1 — pinpoints which materialization barrier
  * carries the composition overhead (the x53-vs-stage-sum delta the
  * round-7 verdict watch-listed). Drives the SHIPPED
  * [[Curation.pipelineRun]] through its exposed `stages` barriers, so it
  * cannot drift from the real chain (the round-8 review found the
  * previous hand-copied restatement timing a superseded classifier
  * shape). Usage: runMain graft.operators.TimePipeline [classifier]
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
      // the x56 weak-label fit recipe (ExtensionQueries.qualityModelFor)
      val classifier =
        if (!withClassifier) None
        else {
          val model = QualityModel.fit(
            QualityModel.qualityFeatures(docs)
              .join(TextOps.qualityScore(docs), Seq("doc_id"))
              .withColumn("label", (col("quality_score") >= lit(0.65)).cast("int")))
          lap("classifier-fit")
          Some((model, 0.5))
        }
      val run = Curation.pipelineRun(docs, banned, classifier = classifier)
      // materialize each of the run's OWN barriers in lineage order —
      // each count pays exactly the work between this barrier and the
      // previous one, the shipped plan's cost attribution
      run.stages.foreach { case (name, df) => df.count(); lap(name) }
      run.output.count(); lap("resample+pack(output)")
      run.cleanup()
      dropCached()
    }
    spark.stop()
  }
}
