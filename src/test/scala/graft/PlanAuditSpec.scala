package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Tables

/** The audit must flag the real optimizer behavior that produced two 22x
  * regressions: PushDownPredicate pushing a post-projection filter below a
  * derived-array projection, inlining the whole array expression into the
  * filter condition (re-evaluated per element). Tests drive actual plans
  * through Catalyst on parquet-backed data — a LocalRelation would be
  * constant-folded away and never exercise the pushdown.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)

  test("flags the pushed-filter-inlines-HOF shape (the round-2 x16 bug, reconstructed)") {
    // winnowFingerprints' round-2 shape: derived-array projection, THEN a
    // size filter — PushDownPredicate inlines the transform into the filter
    val bad = docs
      .select(
        col("doc_id"),
        transform(split(col("text"), "\\s+"), t => xxhash64(t)).as("hs"))
      .filter(size(col("hs")) >= 4)
    val c = PlanAudit.auditExecuted(bad)
    assert(c.hofFilters >= 1, s"expected the inlined-HOF filter flagged, got $c")
  }

  test("does not flag the fixed in-projection guard (current winnowFingerprints)") {
    val c = PlanAudit.auditExecuted(Dedup.winnowFingerprints(docs))
    assert(c.hofFilters === 0, s"clean shape wrongly flagged: $c")
    assert(c.scans === 1)
  }

  test("does not flag plain-attribute or non-HOF filters") {
    val plain = docs.filter(length(col("text")) > 10 && size(split(col("text"), "\\s+")) >= 3)
    val c = PlanAudit.auditExecuted(plain)
    assert(c.hofFilters === 0)
    assert(c.scans === 1)
  }

  test("counts broadcast joins and scans through finalized AQE plans") {
    val small = docs.select(col("doc_id")).limit(10)
    val joined = docs.join(broadcast(small), Seq("doc_id"))
    val c = PlanAudit.auditExecuted(joined)
    assert(c.bcastJoins === 1, s"expected one broadcast join, got $c")
    assert(c.scans === 2)
    assert(c.cartesian === 0 && c.smj === 0)
  }

  test("per-stage gate: a stage regressed to a cartesian or excess BNLJ fails") {
    // a stage whose join degenerated to a cartesian product must trip the
    // same violations() the main per-query gate runs
    val burst = PlanAudit.auditExecuted(
      docs.limit(20).crossJoin(docs.limit(20).select(col("doc_id").as("other"))))
    assert(
      PlanAudit.violations("x53/gates", burst, allowedSmj = 2, allowedBnlj = 0, requireWgl = false)
        .exists(v => v.contains("cartesian") || v.contains("BroadcastNestedLoopJoin")),
      s"regressed stage not flagged: $burst")
    // and a clean equi-join shape passes
    val ok = PlanAudit.auditExecuted(docs.join(broadcast(docs.select("doc_id").limit(5)), Seq("doc_id")))
    assert(PlanAudit.violations("x53/gates", ok, 2, 0, requireWgl = false).isEmpty)
  }

  test("global-window gate: unbounded single-partition windows flag; aggregate-bounded pass") {
    import org.apache.spark.sql.expressions.Window
    // a global window directly over corpus rows — the regression the
    // round-11 gate exists for (corpus-cardinality rows on ONE partition)
    val wAll = Window.partitionBy().orderBy("doc_id")
    val bad = docs.withColumn("rn", row_number().over(wAll))
    val cBad = PlanAudit.auditExecuted(bad)
    assert(cBad.unboundedGlobalWindows >= 1, s"unbounded global window not flagged: $cBad")
    assert(PlanAudit.violations("q", cBad, 0, 0, requireWgl = false)
      .exists(_.contains("single-partition window")))
    // the legal shape: the same window ABOVE an aggregation boundary
    // (group-space input — Vocab.rankVocab / Sketches.histQuantiles class)
    val ok = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(Window.partitionBy().orderBy("lang")))
    val cOk = PlanAudit.auditExecuted(ok)
    assert(cOk.unboundedGlobalWindows === 0, s"aggregate-bounded window wrongly flagged: $cOk")
    // ... including through a REUSED single-partition exchange (x97's
    // two stacked global windows share one exchange; the boundary search
    // must follow ReusedExchange to the original subtree)
    val two = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .withColumn("cum", sum(col("n")).over(Window.partitionBy().orderBy("lang")))
    val cTwo = PlanAudit.auditExecuted(two)
    assert(cTwo.unboundedGlobalWindows === 0, s"reused-exchange window wrongly flagged: $cTwo")
  }

  test("curation stage audit: every lineage-cut stage sits inside its pinned allowances") {
    val stages = graft.operators.Curation.auditStages(
      docs, banned = docs.filter(col("doc_id") < 50))
    assert(stages.map(_._1) === Seq(
      "cap", "gates", "exact_dedup", "near_dup_pairs",
      "near_dup_retention", "decontam", "resample", "pack"))
    stages.foreach { case (stage, df) =>
      val c = PlanAudit.auditExecuted(df)
      val v = PlanAudit.violations(
        s"x53/$stage", c,
        PlanAudit.StageAllowedSmj.getOrElse(stage, 0),
        PlanAudit.StageAllowedBnlj.getOrElse(stage, 0),
        PlanAudit.StageRequiredWgl.contains(stage))
      assert(v.isEmpty, s"stage $stage violates its pin: $v ($c)")
    }
  }
}
