package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Proof that bucketed layout removes the join shuffle: both sides
  * bucketed by the join key => the executed plan has NO shuffle exchange
  * feeding the join (only bucketed scans).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("join of two tables bucketed on the key runs without a shuffle") {
    val facts = spark.range(0, 10000)
      .select((col("id") % 97).as("k"), col("id").as("v"))
    val dim = spark.range(0, 97).select(col("id").as("k"), concat(lit("n"), col("id")).as("name"))
    Skew.writeBucketed(facts, "bkt_facts", 8, Seq("k"))
    Skew.writeBucketed(dim, "bkt_dim", 8, Seq("k"))
    try {
      val joined = spark.table("bkt_facts")
        .join(spark.table("bkt_dim").hint("shuffle_merge"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(
        !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      // and it is still correct
      assert(joined.count() === 10000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dim")
    }
  }
}
