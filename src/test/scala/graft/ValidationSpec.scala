package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Validation
import graft.operators.Validation._

/** Data-validation suite semantics: exact metrics on planted defects
  * (nulls, duplicate keys, range violations, FK orphans), the pass
  * verdict rules, and the one-scan single-aggregate shape (the x94
  * oracle then hash-pins the report over the TPC-H tables).
  */
class ValidationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // 8 rows: one null key, one duplicate key (4), two out-of-range vals
  private def child = Seq(
    (Option(1L), 10.0), (Option(2L), 20.0), (Option(3L), -5.0),
    (Option(4L), 30.0), (Option(4L), 99.0), (Option(5L), 40.0),
    (None, 50.0), (Option(9L), 60.0)).toDF("k", "v")

  private def parent = Seq(1L, 2L, 3L, 4L, 5L).toDF("pk")

  test("single-pass checks: exact metrics and pass verdicts on planted defects") {
    val got = Validation.checksReport(child, "child", Seq(
        rowCount,
        dupCount("k"),
        nullFrac("k"),
        violFrac("oor_frac_v", !col("v").between(0, 60))))
      .collect().map(r => r.getString(1) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(got("row_count") === ((8.0, true)))
    // 7 non-null keys, 6 distinct → 1 duplicate
    assert(got("pk_dup_k") === ((1.0, false)))
    assert(got("null_frac_k") === ((1.0 / 8.0, false)))
    // -5 and 99 violate [0, 60] → 2/8
    assert(got("oor_frac_v") === ((0.25, false)))
  }

  test("a clean table passes every check") {
    val clean = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val got = Validation.checksReport(clean, "t", Seq(
        rowCount, dupCount("k"), nullFrac("k"),
        violFrac("oor_frac_v", !col("v").between(0, 60))))
      .collect()
    assert(got.forall(_.getBoolean(3)), "clean table must pass all checks")
    assert(got.map(_.getString(0)).toSet === Set("t"))
  }

  test("fkOrphans counts unmatched and NULL keys; zero orphans passes") {
    val row = Validation.fkOrphans(child, "k", parent, "pk", "child")
      .collect().head
    // k=9 has no parent, k=NULL cannot resolve → 2 orphans
    assert(row.getString(0) === "child" && row.getString(1) === "fk_orphans_k")
    assert(row.getDouble(2) === 2.0 && !row.getBoolean(3))
    val ok = Validation.fkOrphans(
      child.filter(col("k").isNotNull && col("k") <= 5), "k", parent, "pk", "child")
      .collect().head
    assert(ok.getDouble(2) === 0.0 && ok.getBoolean(3))
  }

  test("all single-table checks fold in ONE aggregate — the plan scans the input once") {
    val df = child.localCheckpoint(true)
    val plan = Validation.checksReport(df, "t", Seq(
        rowCount, dupCount("k"), nullFrac("k"),
        violFrac("oor_frac_v", !col("v").between(0, 60))))
      .queryExecution.optimizedPlan.toString
    val scans = "LocalRelation|LogicalRDD".r.findAllIn(plan).size
    assert(scans === 1, s"expected one scan of the table, plan:\n${plan.take(800)}")
  }
}
