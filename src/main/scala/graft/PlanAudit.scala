package graft

/** Physical-plan audit over the whole query surface: counts parquet scans,
  * join strategies, and cartesian products per query and fails (nonzero
  * exit) if a plan regresses into a cartesian product or an unexpected
  * sort-merge join. Output is the source of PLANS.md.
  *
  * Usage: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate(s"local[8]")
    var bad = List.empty[String]
    println("| query | parquet scans | broadcast joins | sort-merge joins | cartesian |")
    println("|---|---|---|---|---|")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, dir)
      df.count() // finalize AQE so the audited plan is the executed one
      val plan = df.queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).length
      val scans = n("Scan parquet")
      val bcast = n("BroadcastHashJoin|BroadcastNestedLoop")
      val smj = n("SortMergeJoin")
      val cart = n("CartesianProduct")
      println(s"| $name | $scans | $bcast | $smj | $cart |")
      if (cart > 0) bad ::= s"$name: cartesian product"
      if (smj > 0) bad ::= s"$name: sort-merge join (expected broadcast at this scale)"
    }
    spark.stop()
    bad.foreach(b => System.err.println(s"[plan-audit] REGRESSION: $b"))
    if (bad.nonEmpty) sys.exit(1)
  }
}
