package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Fixed-iteration PageRank: hand-computed ranks on a path graph,
  * mass conservation, symmetry, and partitioning invariance.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def ranksOf(pairs: Seq[(String, String)], iters: Int): Map[String, Double] =
    Graph.pageRank(pairs.toDF("u", "v"), "u", "v", iterations = iters)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap

  test("one iteration on the path a-b-c matches the hand-computed update") {
    val got = ranksOf(Seq(("a", "b"), ("b", "c")), iters = 1)
    // N=3, r0=1/3, deg(a)=deg(c)=1, deg(b)=2:
    //   r1(a) = 0.15/3 + 0.85 * (1/3)/2 = 0.19166667
    //   r1(b) = 0.15/3 + 0.85 * ((1/3) + (1/3)) = 0.61666667
    assert(math.abs(got("a") - 0.19166667) < 1e-8)
    assert(math.abs(got("c") - 0.19166667) < 1e-8)
    assert(math.abs(got("b") - 0.61666667) < 1e-8)
  }

  test("mass is conserved and endpoints stay symmetric over many iterations") {
    val got = ranksOf(Seq(("a", "b"), ("b", "c")), iters = 10)
    assert(math.abs(got.values.sum - 1.0) < 1e-6) // per-iteration 8-dp rounding drift only
    assert(got("a") === got("c"))                 // graph symmetry survives the float path
    assert(got("b") > got("a"))                   // the cut vertex is the most central
  }

  test("ranks are invariant to the input partitioning") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"), ("d", "e"))
    val one = Graph.pageRank(pairs.toDF("u", "v").coalesce(1), "u", "v", 5)
      .orderBy("node").collect().toSeq
    val many = Graph.pageRank(pairs.toDF("u", "v").repartition(7), "u", "v", 5)
      .orderBy("node").collect().toSeq
    assert(one === many)
  }

  test("invalid parameters are refused") {
    val df = Seq(("a", "b")).toDF("u", "v")
    intercept[IllegalArgumentException](Graph.pageRank(df, "u", "v", iterations = 0))
    intercept[IllegalArgumentException](Graph.pageRank(df, "u", "v", 5, damping = 1.0))
  }
}
