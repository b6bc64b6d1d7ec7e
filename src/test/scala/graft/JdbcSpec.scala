package graft

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Exercises the O1 JDBC reader (Tables.jdbcTable) against embedded Apache
  * Derby — the one JDBC engine that ships inside Spark's own jar directory,
  * so the test runs in the zero-egress harness. Covers the three claims the
  * reader's Scaladoc makes: a plain scan round-trips rows, a partitioned
  * read issues bounded per-partition queries without duplicating or losing
  * rows, and filters are pushed into the remote query rather than applied
  * post-scan.
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE hist (ds DATE NOT NULL, branch VARCHAR(8) NOT NULL, " +
          "move_type VARCHAR(16) NOT NULL, cnt DOUBLE NOT NULL, id BIGINT NOT NULL)")
      val ins = conn.prepareStatement("INSERT INTO hist VALUES (?, ?, ?, ?, ?)")
      (0 until 100).foreach { i =>
        ins.setDate(1, java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d"))
        ins.setString(2, s"B${i % 5}")
        ins.setString(3, if (i % 2 == 0) "click" else "view")
        ins.setDouble(4, 1.0)
        ins.setLong(5, i.toLong)
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()
  }

  test("plain JDBC scan round-trips rows and schema") {
    seeded
    val df = Tables.jdbcTable(spark, url, "hist", props = props)
    assert(df.count() === 100)
    assert(df.columns.map(_.toLowerCase).sorted === Array("branch", "cnt", "ds", "id", "move_type"))
    val byBranch = df.groupBy(col("BRANCH")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBranch === Map("B0" -> 20L, "B1" -> 20L, "B2" -> 20L, "B3" -> 20L, "B4" -> 20L))
  }

  test("range-partitioned read covers all rows exactly once") {
    seeded
    val df = Tables.jdbcTable(
      spark, url, "hist",
      partitionColumn = Some(("id", 0L, 100L, 4)),
      props = props)
    assert(df.rdd.getNumPartitions === 4)
    // partition predicates must tile the range: no dups, no gaps
    assert(df.count() === 100)
    assert(df.select(countDistinct(col("ID"))).head().getLong(0) === 100)
  }

  test("filters are pushed into the remote query") {
    seeded
    val df = Tables.jdbcTable(spark, url, "hist", props = props)
      .filter(col("MOVE_TYPE") === "click")
    assert(df.count() === 50)
    val scan = df.queryExecution.executedPlan.toString
    // The v1 JDBC scan prints its pushed predicates; the filter must reach
    // the database instead of running post-scan in Spark.
    assert(scan.contains("PushedFilters") && scan.contains("MOVE_TYPE"),
      s"expected MOVE_TYPE filter pushed to JDBC, plan was:\n$scan")
  }
}
