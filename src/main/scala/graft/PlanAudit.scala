package graft

/** Physical-plan audit over the whole query surface: counts parquet scans,
  * join strategies, and cartesian products per query and fails (nonzero
  * exit) if a plan regresses into a cartesian product or an unexpected
  * sort-merge join. Output is the source of PLANS.md.
  *
  * Usage: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {

  /** Lambda-bearing higher-order functions whose appearance inside a Filter
    * condition signals the pushed-filter-inlines-a-projection trap: the
    * optimizer duplicates the aliased array expression into the filter, and
    * each per-element reference re-evaluates the whole upstream transform.
    */
  private val HofMarkers =
    Seq("transform(", "aggregate(", "element_at(", "zip_with(", "array_min(", "array_max(")

  /** Count Filter operators (plain or inside whole-stage codegen, e.g.
    * "*(2) Filter (...)") whose printed condition mentions a higher-order
    * array function. Plan text puts each operator on one line, so a
    * line-level scan attributes expressions to the right operator.
    */
  private val FilterLine = """^[\s:+|-]*(\*\(\d+\)\s*)?Filter [(\s]""".r

  def hofInFilterCount(plan: String): Int =
    plan.linesIterator.count { line =>
      FilterLine.findFirstIn(line).isDefined && HofMarkers.exists(line.contains)
    }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate(s"local[8]")
    var bad = List.empty[String]
    println("| query | parquet scans | broadcast joins | sort-merge joins | cartesian | HOF-in-filter |")
    println("|---|---|---|---|---|---|")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, dir)
      df.count() // finalize AQE so the audited plan is the executed one
      val plan = df.queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).length
      val scans = n("Scan parquet")
      val bcast = n("BroadcastHashJoin|BroadcastNestedLoop")
      val smj = n("SortMergeJoin")
      val cart = n("CartesianProduct")
      val hofFilters = hofInFilterCount(plan)
      println(s"| $name | $scans | $bcast | $smj | $cart | $hofFilters |")
      if (cart > 0) bad ::= s"$name: cartesian product"
      if (smj > 0) bad ::= s"$name: sort-merge join (expected broadcast at this scale)"
      if (hofFilters > 0)
        bad ::= s"$name: higher-order function inside a Filter condition " +
          "(pushed-down filter re-evaluates an inlined array expression per element — " +
          "guard inside the projection with when/otherwise instead; " +
          "this class caused 22x regressions twice: TextOps r1, winnowFingerprints r2)"
    }
    spark.stop()
    bad.foreach(b => System.err.println(s"[plan-audit] REGRESSION: $b"))
    if (bad.nonEmpty) sys.exit(1)
  }
}
