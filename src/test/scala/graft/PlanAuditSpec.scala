package graft

import org.scalatest.funsuite.AnyFunSuite

/** The HOF-in-Filter audit rule must catch the pushed-filter-inlines-a-
  * projection trap that twice produced 22x regressions (TextOps round 1,
  * Dedup.winnowFingerprints round 2) — and must NOT flag higher-order
  * functions that live in Project/Generate nodes, where they belong.
  */
class PlanAuditSpec extends AnyFunSuite {

  // Condensed from the actual executed plan of the round-2 regression:
  // PushDownPredicate pushed `size(hs) >= 4` below the projections and
  // inlined the whole gram expression into the filter condition.
  private val badPlan =
    """*(2) Generate explode(fps#103), [doc_id#0L], false, [fp#90L]
      |+- *(2) Project [doc_id#0L, array_distinct(transform(sequence(1, ...))) AS fps#103]
      |   +- *(1) Filter (size(array_distinct(transform(sequence(1, (size(transform(split(text#1, \s+, -1), lambdafunction(...)), true) - 2)), lambdafunction(pmod(element_at(transform(split(text#1, ...), ...), ...)))), true) >= 4)
      |      +- *(1) ColumnarToRow
      |         +- FileScan parquet [doc_id#0L,text#1]""".stripMargin

  // The fixed shape: the filter is gone, the guard lives inside the
  // projection, and the only Filter left tests a plain attribute.
  private val goodPlan =
    """*(2) Generate explode(fps#103), [doc_id#0L], false, [fp#90L]
      |+- *(2) Project [doc_id#0L, CASE WHEN (size(hs#77, true) >= 4) THEN array_distinct(transform(sequence(1, (size(hs#77, true) - 3)), lambdafunction(array_min(slice(hs#77, lambda i#104, 4)), lambda i#104, false))) ELSE [] END AS fps#103]
      |   +- Project [doc_id#0L, array_distinct(transform(th#76, ...)) AS hs#77]
      |      +- *(1) Filter (size(split(text#1, \s+, -1), true) >= 3)
      |         +- FileScan parquet [doc_id#0L,text#1]""".stripMargin

  test("flags a Filter whose condition inlines higher-order functions") {
    assert(PlanAudit.hofInFilterCount(badPlan) === 1)
  }

  test("does not flag HOFs inside Project/Generate, or plain-attribute Filters") {
    assert(PlanAudit.hofInFilterCount(goodPlan) === 0)
  }

  test("matches Filter under both codegen and plain operator prefixes") {
    val plain = "+- Filter (element_at(transform(xs#1, x -> x), 1) > 0)"
    val codegen = ":  +- *(3) Filter (aggregate(zip_with(a#1, b#2, ...), 0.0, ...) > 1)"
    assert(PlanAudit.hofInFilterCount(plain + "\n" + codegen) === 2)
  }
}
