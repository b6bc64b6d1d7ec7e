package graft
object TimeX41 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]")
    val dir = "/root/testdata/sf0.1"
    def dropCached(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
    }
    val name = if (args.nonEmpty) args(0) else "x41_ivfpq_topk"
    val fn = SparkEntry.queries(name)
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"[time] run $i: ${(System.nanoTime()-t0)/1e9}%.3f s")
      dropCached()
    }
    spark.stop()
  }
}
