package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps
import graft.sources.Tables

class TextOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("approx token distribution tracks the exact one within 5% (the 100 TB path)") {
    val docs = Tables.documents(spark, sf)
    val exact = TextOps.tokenDistribution(docs).head()
    val approx = TextOps.tokenDistributionApprox(docs).head()
    assert(approx.getAs[Long]("n_docs") === exact.getAs[Long]("n_docs"))
    assert(approx.getAs[Long]("min_tokens") === exact.getAs[Long]("min_tokens"))
    assert(approx.getAs[Long]("max_tokens") === exact.getAs[Long]("max_tokens"))
    Seq("p25", "p50", "p75", "p95").foreach { q =>
      val e = exact.getAs[Double](q)
      val a = approx.getAs[Number](q).doubleValue()
      assert(math.abs(a - e) <= math.max(1.0, 0.05 * e),
        s"$q: approx $a vs exact $e drifted past 5%")
    }
  }
}
