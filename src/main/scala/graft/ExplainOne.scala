package graft

/** Dev tool: execute one registered query and print its FINAL adaptive
  * physical plan (AQE re-plans at runtime, so the static explain() tree
  * is not what actually ran — same rationale as PlanAudit.auditExecuted).
  * Usage: runMain graft.ExplainOne <query> [sfDir]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate("local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    // Execute df's OWN plan (df.count() would spawn a separate
    // QueryExecution and leave this one's AdaptiveSparkPlanExec
    // un-executed, printing the static pre-AQE tree — the exact pitfall
    // PlanAudit.auditExecuted documents).
    val n = df.queryExecution.toRdd.count()
    println(f"[explain-one] $name ran in ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
