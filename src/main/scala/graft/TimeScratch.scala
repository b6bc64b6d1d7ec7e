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
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      v
    }
    // warm the JVM like the bench does
    spark.read.parquet(s"$dir/region.parquet").count()
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val q = SparkEntry.queries("x103_textrank")
      t("x103 full")(q(spark, dir).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.sharedState.cacheManager.clearCache()
      // piecewise
      val pairs = graft.sources.Tables.documents(spark, dir)
        .select(filter(graft.operators.TextOps.tokens(col("text")), t => length(t) > 0).as("toks"))
        .select(explode(when(size(col("toks")) >= 2, expr(
          "transform(sequence(0, size(toks)-2), " +
            "i -> named_struct('u', least(toks[i], toks[i+1]), " +
            "'v', greatest(toks[i], toks[i+1])))"))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
        .filter(col("u") =!= col("v"))
        .groupBy("u", "v")
        .agg(count(lit(1)).as("w"))
        .select("u", "v")
      t("adjacency count")(pairs.count())
      val fwd = pairs
        .filter(col("u").isNotNull && col("v").isNotNull)
        .select(col("u"), col("v"), lit(1.0).as("w"))
      val edges = fwd.unionByName(
        fwd.select(col("v").as("u"), col("u").as("v"), col("w"))).persist()
      val deg = edges.groupBy("u").agg(sum(col("w")).as("d"))
      val withDeg = edges.join(deg, Seq("u")).persist()
      val n = t("deg.count")(deg.count())
      var ranks = t("init barrier")(
        deg.select(col("u").as("node"), (lit(1.0) / n).as("rank")).localCheckpoint(true))
      val base = lit((1.0 - 0.85) / n)
      for (i <- 1 to 5) {
        var next = withDeg
          .join(ranks, col("u") === col("node"))
          .select(col("v"), (col("rank") * col("w") / col("d")).as("c"))
          .groupBy(col("v").as("node"))
          .agg(graft.operators.CrossRound.ra(base + lit(0.85) * sum(col("c")), 8).as("rank"))
        if (i % 3 == 0 || i == 5) {
          next = t(s"iter $i barrier")(next.localCheckpoint(true))
        }
        ranks = next
      }
      t("final orderBy")(
        ranks.select(col("node").as("token"), col("rank")).orderBy("token").count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
