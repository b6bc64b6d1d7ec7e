package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.VersionedTable

/** The binary-ANN SERVING layout (round-11 verdict ask #1): the packed
  * sign-bit limbs must be the AT-REST layout, not a per-query derivation —
  * buildBinaryIndex commits (vec_id, bits, embedding) as a VersionedTable
  * snapshot, appendBinaryIndex ingests batches O(batch), and
  * binaryTopKIndexed serves the Hamming scan from the STORED bits.
  * Three pins:
  *   - layout invariance: indexed == in-flight binaryTopK, bit-for-bit
  *     (floats round-trip parquet exactly; same orderings) — the x29/x29b
  *     convention that lets ONE oracle gate both layouts;
  *   - append == one-shot: a build+append index serves the same rows as a
  *     single commit of the whole corpus;
  *   - the ReadSchema pin: the corpus-scale Hamming scan reads
  *     (vec_id, bits) ONLY — the float column never appears in that scan's
  *     pushed projection (the 32× IO claim, checked in the executed plan,
  *     not asserted in prose).
  */
class BinaryIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def corpus(n: Int, dim: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (1L to n.toLong).map(id =>
      (id, Seq.fill(dim)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
  }

  private def probesOf(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") <= 4L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  private def tmpTable(prefix: String): VersionedTable =
    VersionedTable(
      java.nio.file.Files.createTempDirectory(prefix).toString + "/idx")

  test("layout invariance: indexed serve == in-flight binaryTopK, bit-for-bit") {
    val emb = corpus(50, 16, seed = 11)
    val vt = tmpTable("graft_binidx_")
    Similarity.buildBinaryIndex(emb, vt)
    val probes = probesOf(emb)
    val indexed = Similarity.binaryTopKIndexed(probes, vt.read(spark), k = 4, rerank = 10)
      .orderBy("q_id", "rank").collect().toSeq
    val inflight = Similarity.binaryTopK(probes, emb, k = 4, rerank = 10)
      .orderBy("q_id", "rank").collect().toSeq
    assert(indexed === inflight) // includes the double `sim` — bit equality
    intercept[IllegalArgumentException](
      Similarity.binaryTopKIndexed(probes, vt.read(spark), 5, rerank = 3))
  }

  test("append path: build + append serves the same rows as a one-shot commit") {
    val emb = corpus(60, 16, seed = 23)
    val oneShot = tmpTable("graft_binidx_one_")
    Similarity.buildBinaryIndex(emb, oneShot)
    val staged = tmpTable("graft_binidx_app_")
    Similarity.buildBinaryIndex(emb.filter(col("vec_id") <= 30L), staged)
    Similarity.appendBinaryIndex(emb.filter(col("vec_id") > 30L), staged)
    val a = staged.read(spark).orderBy("vec_id").collect().toSeq
    val b = oneShot.read(spark).orderBy("vec_id").collect().toSeq
    assert(a === b)
    // and the served result is identical through either snapshot
    val probes = probesOf(emb)
    val viaStaged = Similarity.binaryTopKIndexed(probes, staged.read(spark), 3, 12)
      .orderBy("q_id", "rank").collect().toSeq
    val viaOne = Similarity.binaryTopKIndexed(probes, oneShot.read(spark), 3, 12)
      .orderBy("q_id", "rank").collect().toSeq
    assert(viaStaged === viaOne)
  }

  test("ReadSchema pin: the Hamming scan reads (vec_id, bits) — never the float column") {
    val emb = corpus(40, 16, seed = 31)
    val vt = tmpTable("graft_binidx_plan_")
    Similarity.buildBinaryIndex(emb, vt)
    val served = Similarity.binaryTopKIndexed(probesOf(emb), vt.read(spark), k = 3, rerank = 8)
    served.collect() // materialize so AQE's final plan is what we read
    // AdaptiveSparkPlan.toString appends an "== Initial Plan ==" section
    // that repeats every scan — keep only the final plan
    val plan = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(schemas.nonEmpty, s"no file scans found in:\n${plan.take(2000)}")
    // exactly one scan carries the bit limbs, and that scan must not also
    // read the float embedding — parquet column pruning is the 32× claim
    val bitScans = schemas.filter(_.contains("bits"))
    assert(bitScans.size === 1,
      s"expected exactly one bits scan, got $schemas")
    assert(!bitScans.head.contains("embedding"),
      s"Hamming scan reads the float column — pruning lost: ${bitScans.head}")
    // the float column is touched by exactly one scan: the pool-bounded
    // rerank fetch (probes here are an in-memory frame, not a file scan)
    assert(schemas.count(_.contains("embedding")) === 1,
      s"expected exactly one float-reading scan (the rerank fetch): $schemas")
  }
}
