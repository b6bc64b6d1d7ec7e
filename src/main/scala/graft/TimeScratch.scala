package graft

import org.apache.spark.sql.functions._

/** Throwaway phase-timing probe for optimization round 15. */
object TimeScratch {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val v = body
      println(f"[scratch] $name%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      v
    }
    spark.read.parquet(s"$dir/region.parquet").count()
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.sharedState.cacheManager.clearCache()
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      t("o43 full")(SparkEntry.queries("o43_comments")(spark, dir).count())
      drop()
      val hist = graft.sources.Tables.historicalData(spark, dir)
      t("hist scan")(hist.write.format("noop").mode("overwrite").save())
      val pct = graft.operators.Percentages.percentagesSingleScan(hist)
      t("percentages (ckpt inside)")(pct.write.format("noop").mode("overwrite").save())
      drop()
      t("o42 full")(SparkEntry.queries("o42_forecast_daily")(spark, dir).count())
      drop()
      t("o12 full")(SparkEntry.queries("o12_forecast_no_move_type")(spark, dir).count())
      drop()
      t("f02 full")(SparkEntry.queries("f02_forecast_serving")(spark, dir).count())
      drop()
    }
    spark.stop()
  }
}
