package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-commit pins for the Scala-side hash references the oracle SQL
  * emission constant-folds and mirrors (XxHash64Sql.hashLong is pinned in
  * SplitsSpec next to its consumer; this spec pins the Murmur3 side). A
  * Spark upgrade that changes either hash family fails HERE at build
  * time instead of surfacing as a red driver oracle a round later; the
  * SQL emission itself is gated every round by x58 (XXH64, every length
  * class) and x35 (Murmur3 bloom positions, false positives included).
  */
class HashMirrorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("Murmur3Sql.hashLongRef reproduces Spark's hash() over longs bit-for-bit") {
    val keys = Seq(0L, 1L, -1L, 7L, -42L, 123456789012345L, Long.MaxValue, Long.MinValue)
    val fromSpark = keys.toDF("k")
      .select(col("k"), hash(col("k")).as("h")) // Murmur3_x86_32.hashLong, seed 42
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    fromSpark.foreach { case (k, h) =>
      assert(Murmur3Sql.hashLongRef(k, 42) === h, s"hash of $k")
    }
  }

  test("the chained-seed form matches the bloom pair construction") {
    // the bloom pair is h1 = hashLong(item, 0), h2 = hashLong(item, h1):
    // the second call's seed is the SIGNED int — feeding it back through
    // the reference must be self-consistent for negative h1 values too
    val items = Seq(3L, -17L, 987654321L, Long.MinValue + 5)
    items.foreach { item =>
      val h1 = Murmur3Sql.hashLongRef(item, 0)
      val h2 = Murmur3Sql.hashLongRef(item, h1)
      // deterministic, and the pair is distinct for these fixtures
      assert(h2 === Murmur3Sql.hashLongRef(item, h1))
      assert(h1 != h2)
    }
  }
}
