package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation suite — the declarative check battery every
  * ingest runs before promoting a drop (the Deequ posture, re-expressed
  * as plain aggregates): null fractions, key uniqueness, value-range
  * conformance, and referential integrity, each reported as one row of
  * a long-format (table, check, metric, pass) frame.
  *
  * Scale shape: ALL single-table checks on a table fold in ONE
  * aggregate over one scan (metrics are counts/averages — map-side
  * combinable), and the report explodes from that single aggregate row,
  * so a 100 TB table costs one pass regardless of how many checks it
  * carries. Referential integrity is the one check that genuinely needs
  * a second input: a LEFT ANTI equi-join child→parent (one shuffle, or
  * a broadcast when the parent is a dim) aggregated to its orphan
  * count — never a collect, never a cartesian.
  *
  * Determinism: every metric is an exact count or a single division of
  * exact longs, so the oracle mirrors each check as literal SQL and the
  * pass verdicts compare exact zeroes — no tolerance, no rounding
  * dependence (`pass` is derived from the UNROUNDED metric, whose
  * zero/nonzero status is exact).
  */
object Validation {

  /** One single-pass check: `agg` evaluates inside the table's one
    * aggregate; `metric` is a violation measure (count or fraction)
    * unless `passWhenPositive` flips the verdict to metric > 0
    * (row_count's presence check).
    */
  final case class Check(name: String, agg: Column, passWhenPositive: Boolean = false)

  /** Presence: the table has rows at all. */
  val rowCount: Check =
    Check("row_count", count(lit(1)).cast("double"), passWhenPositive = true)

  /** Fraction of rows where `c` is NULL (completeness). */
  def nullFrac(c: String): Check =
    Check(s"null_frac_$c", avg(when(col(c).isNull, 1.0).otherwise(0.0)))

  /** Duplicate count among NON-NULL values of a key column:
    * COUNT(c) − COUNT(DISTINCT c) — zero iff the column is unique.
    */
  def dupCount(c: String): Check =
    Check(s"pk_dup_$c", (count(col(c)) - countDistinct(col(c))).cast("double"))

  /** Fraction of rows violating a predicate (NULL predicate rows do not
    * count as violations — SQL CASE semantics on both engines).
    */
  def violFrac(name: String, bad: Column): Check =
    Check(name, avg(when(bad, 1.0).otherwise(0.0)))

  /** Run every check of one table in a single aggregate pass and emit
    * the long-format report rows.
    */
  def checksReport(df: DataFrame, table: String, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate at least one check")
    val aggs = checks.map(c => c.agg.as(s"__${c.name}"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.map { c =>
      val m = col(s"__${c.name}").cast("double")
      struct(
        lit(c.name).as("check_name"),
        m.as("metric"),
        (if (c.passWhenPositive) m > 0.0 else m === 0.0).as("pass"))
    }
    one
      .select(explode(array(rows: _*)).as("r"))
      .select(
        lit(table).as("table_name"),
        col("r.check_name").as("check_name"),
        col("r.metric").as("metric"),
        col("r.pass").as("pass"))
  }

  /** Referential integrity: rows of `child` whose `key` has no match in
    * `parent.parentKey` (NULL keys count as orphans — an FK that can't
    * resolve). One anti-join + one count; the report row unions onto the
    * single-pass frames.
    */
  def fkOrphans(
      child: DataFrame, key: String,
      parent: DataFrame, parentKey: String, table: String): DataFrame =
    child
      .join(parent, child(key) === parent(parentKey), "left_anti")
      .agg(count(lit(1)).cast("double").as("metric"))
      .select(
        lit(table).as("table_name"),
        lit(s"fk_orphans_$key").as("check_name"),
        col("metric"),
        (col("metric") === 0.0).as("pass"))
}
