package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: golden bit-weave, exact quantization endpoints, and
  * the measurable pruning contract — a z-ordered table prunes file
  * scans on BOTH dimensions where a linearly sorted one prunes only on
  * its own sort column.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("interleave: golden bit weave, dimension 0 takes the high bit of each pair") {
    // qu = 0b101, qt = 0b011 at 3 bits: qu's bits land at positions
    // 1,3,5 and qt's at 0,2,4 -> (1<<1)+(1<<5) | (1<<0)+(1<<2) = 39
    val got = Seq((5L, 3L)).toDF("qu", "qt")
      .select(Layout.interleave(Seq(col("qu"), col("qt")), 3).as("z"))
      .head().getLong(0)
    assert(got === 39L)
  }

  test("zOrderKey: exact quantization endpoints, constant dims, layout invariance") {
    val df = (0L to 9L).map(x => (x, 7L)).toDF("x", "y")
    val z = Layout.zOrderKey(df, Seq("x", "y"), 2)
      .select("x", "zval").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // qx = x*4 DIV 10 (0,0,0,1,1,1,2,2,3,3); constant y quantizes to 0;
    // x's bits sit at odd positions -> zval = bit-spread of qx
    def spread(q: Long): Long =
      (0 until 2).map(i => ((q >> i) & 1L) << (2 * i + 1)).sum
    for (x <- 0L to 9L) assert(z(x) === spread(x * 4 / 10), s"x=$x")
    // value at hi lands on the top level
    assert(z(9L) === spread(3L))
    // deterministic under partition layout (the sweep contract)
    val re = Layout.zOrderKey(df.repartition(7), Seq("x", "y"), 2)
      .select("x", "zval").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === z)
  }

  test("z-order prunes on both dimensions; a linear sort only on its own") {
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft_zord").toString + "/z"
    val lDir = java.nio.file.Files.createTempDirectory("graft_zord").toString + "/l"
    Layout.writeZOrdered(df, zDir, Seq("x", "y"), 6, numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(lDir)
    // the planner's file-pruning test: which files' [min,max] boxes
    // intersect a predicate that constrains ONLY the second dimension?
    def hits(dir: String, cond: org.apache.spark.sql.Column): Long =
      Layout.fileStats(spark.read.parquet(dir), Seq("x", "y")).filter(cond).count()
    val yBand = col("y_lo") <= 7 && col("y_hi") >= 0
    val zHitsY = hits(zDir, yBand)
    val lHitsY = hits(lDir, yBand)
    assert(lHitsY === 16, "x-sorted files all span the full y range")
    assert(zHitsY <= 8, s"z-order should prune most files on y (hit $zHitsY/16)")
    // and the FIRST dimension still prunes under z-order too (balanced)
    val xBand = col("x_lo") <= 7 && col("x_hi") >= 0
    assert(hits(zDir, xBand) <= 8)
    assert(hits(lDir, xBand) <= 4)
    // layout changed nothing about the rows
    assert(spark.read.parquet(zDir).count() === 4096)
    assert(
      spark.read.parquet(zDir).agg(sum("x"), sum("y")).head() ===
        df.agg(sum("x"), sum("y")).head())
  }
}
