package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Splits

class SplitsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def docs = (1L to 5000L).toDF("doc_id")

  test("every row gets exactly one fold; fractions track the weights") {
    val out = Splits
      .splitByHash(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .cache()
    assert(out.filter(col("fold").isNull).count() === 0)
    val byFold = out.groupBy("fold").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFold.keySet === Set("train", "val", "test"))
    assert(byFold.values.sum === 5000L)
    // hash uniformity at n=5000: expect within a few percent of the weights
    assert(math.abs(byFold("train") / 5000.0 - 0.8) < 0.03)
    assert(math.abs(byFold("val") / 5000.0 - 0.1) < 0.03)
    assert(math.abs(byFold("test") / 5000.0 - 0.1) < 0.03)
  }

  test("assignment is deterministic and partitioning-independent") {
    val folds = Seq("a" -> 0.5, "b" -> 0.5)
    val once = Splits.splitByHash(docs, "doc_id", folds)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val repartitioned = Splits.splitByHash(docs.repartition(17), "doc_id", folds)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once === repartitioned)
  }

  test("shards: every row in exactly one shard, balanced, stable under repartitioning") {
    val sized = docs.withColumn("n_chars", col("doc_id") % 100)
    val bal = Splits.shardBalance(sized, "doc_id", "n_chars", hexChars = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bal.keySet.subsetOf(('0' to '9').map(_.toString).toSet ++ ('a' to 'f').map(_.toString)))
    assert(bal.values.sum === 5000L)
    // md5 uniformity: every 16th-shard within ~35% of the expected 312.5
    bal.values.foreach(n => assert(math.abs(n - 312.5) < 110.0, s"skewed shard: $bal"))
    // layout is a pure function of the keys — partitioning can't move rows
    val re = Splits.shardBalance(sized.repartition(17), "doc_id", "n_chars", hexChars = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(re === bal)
  }

  test("writeShards: one directory per shard, rows inside in md5 order") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val sized = docs.limit(200).withColumn("n_chars", col("doc_id") % 100)
    Splits.writeShards(sized, "doc_id", hexChars = 1, out)
    // cast: hive-style partition dirs ("shard=0"... "shard=f") could infer
    // a surprising type for the partition column on digit-only samples
    val back = spark.read.parquet(out).withColumn("shard", col("shard").cast("string"))
    assert(back.count() === 200)
    // every key present exactly once, shard column matches shardOf
    val mismatched = back.withColumn(
      "expect", Splits.shardOf(col("doc_id"), 1))
      .filter(col("shard") =!= col("expect"))
    assert(mismatched.count() === 0)
    // within one shard file, rows are in md5 order (deterministic shuffle)
    val shard0 = back.filter(col("shard") === "0")
      .withColumn("h", md5(col("doc_id").cast("string")))
    val inOrder = shard0.orderBy("h").select("doc_id").collect().map(_.getLong(0))
    // re-read WITHOUT sorting: parquet preserves row order within the file
    val asWritten = shard0.select("doc_id", "h").collect().map(_.getLong(0))
    assert(asWritten.toSeq === inOrder.toSeq)
  }

  test("same key lands in the same fold across different tables") {
    val folds = Seq("train" -> 0.9, "test" -> 0.1)
    val a = Splits.splitByHash(docs, "doc_id", folds)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val other = (1L to 5000L).map(i => (i, s"payload $i")).toDF("doc_id", "text")
    val b = Splits.splitByHash(other, "doc_id", folds)
      .select("doc_id", "fold")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("different seeds shuffle the assignment") {
    val folds = Seq("a" -> 0.5, "b" -> 0.5)
    val s1 = Splits.splitByHash(docs, "doc_id", folds, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Splits.splitByHash(docs, "doc_id", folds, seed = 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 !== s2)
  }

  test("weights that do not sum to 1 normalize") {
    val out = Splits.splitByHash(docs, "doc_id", Seq("x" -> 3.0, "y" -> 1.0)).cache()
    val byFold = out.groupBy("fold").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byFold("x") / 5000.0 - 0.75) < 0.03)
  }

  test("packSequences: offsets tile each shard exactly; sequence ids match the cuts") {
    val texts = (1L to 300L).map(i => (i, ("w " * (1 + (i % 37).toInt)).trim))
    val packed = Splits.packSequences(texts.toDF("doc_id", "text"), seqLen = 64).cache()
    assert(packed.count() === 300L)
    val byShard = packed
      .select("shard", "doc_id", "n_tokens", "tok_offset", "seq_first", "seq_last")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .groupBy(_._1)
    byShard.foreach { case (shard, rows) =>
      // within a shard, docs ordered by md5(doc_id) tile the token stream
      // with no gaps or overlaps, starting at offset 0
      val ordered = rows.sortBy { case (_, id, _, _, _, _) =>
        (org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString), id)
      }
      var expect = 0L
      ordered.foreach { case (_, id, n, ofs, first, last) =>
        assert(ofs === expect, s"shard $shard doc $id: offset $ofs, expected $expect")
        assert(first === ofs / 64, s"doc $id seq_first")
        assert(last === (ofs + n - 1) / 64, s"doc $id seq_last")
        assert(first <= last)
        expect += n
      }
    }
    // documents longer than the straddle boundary really span sequences
    assert(packed.filter(col("seq_last") > col("seq_first")).count() > 0)
    packed.unpersist()
  }

  test("packSequences: layout is a pure function of keys — stable under repartitioning") {
    val texts = (1L to 300L).map(i => (i, ("w " * (1 + (i % 37).toInt)).trim))
    def run(df: org.apache.spark.sql.DataFrame) =
      Splits.packSequences(df, seqLen = 64)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    val a = run(texts.toDF("doc_id", "text").repartition(3))
    val b = run(texts.toDF("doc_id", "text").repartition(17))
    assert(a === b)
  }

  test("weightedSample: k per group, deterministic across widths and runs, keys match a brute-force recompute") {
    val rows = (1L to 400L).map(i => (i, s"g${i % 4}", 0.5 + (i % 10) * 0.1))
      .toDF("doc_id", "grp", "w")
    val out = Splits.weightedSample(rows, "grp", "doc_id", "w", k = 5, seed = 7L).cache()
    val perGroup = out.groupBy("grp").count().collect().map(r => r.getLong(1)).toSeq
    assert(perGroup === Seq.fill(4)(5L))
    // partitioning-independent (the A-ES key is hash-derived, not rand())
    val re = Splits.weightedSample(rows.repartition(13), "grp", "doc_id", "w", k = 5, seed = 7L)
    assert(
      out.orderBy("grp", "rank").collect().map(_.toString).toSeq ===
        re.orderBy("grp", "rank").collect().map(_.toString).toSeq)
    // the sample key is exactly ln((bucket+1)/(Buckets+1))/w — recompute
    // via the engine's own hash column and compare bit-for-bit
    val check = rows
      .withColumn("b", pmod(xxhash64(lit(7L), col("doc_id")), lit(Splits.Buckets)))
      .withColumn("expect", log((col("b") + lit(1.0)) / lit(Splits.Buckets + 1.0)) / col("w"))
      .select(col("doc_id"), col("expect"))
    val joined = out.join(check, "doc_id")
      .select(col("samp_key"), col("expect")).collect()
    joined.foreach(r => assert(
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
    out.unpersist()
    // weight monotonicity (statistical): make one id's weight enormous —
    // it must always be sampled (its key ln(u)/w -> ~0, the maximum)
    val skewed = rows.withColumn(
      "w", when(col("doc_id") === 42L, lit(1e9)).otherwise(col("w")))
    val picked = Splits.weightedSample(skewed, "grp", "doc_id", "w", k = 5)
      .filter(col("doc_id") === 42L)
    assert(picked.count() === 1L)
  }

  test("XxHash64Sql.hashLong reproduces Spark's xxhash64 chain bit-for-bit") {
    // the Scala reference that constant-folds literal children in the x20
    // oracle's SQL chain must equal the engine's own expression — on
    // negative keys, 0, and values whose hash lands >= 2^63 (where the
    // signed-pmod reinterpretation matters)
    val keys = Seq(0L, 1L, 7L, -1L, -42L, Long.MaxValue, Long.MinValue, 999999999999L)
    val fromSpark = keys.toDF("k")
      .select(col("k"), xxhash64(lit(42L), col("k")).as("h"), pmod(xxhash64(lit(42L), col("k")), lit(Splits.Buckets)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val seed = XxHash64Sql.hashLong(XxHash64Sql.toU64(42L), BigInt(42))
    fromSpark.foreach { case (k, h, b) =>
      val u = XxHash64Sql.hashLong(XxHash64Sql.toU64(k), seed)
      assert(u === XxHash64Sql.toU64(h), s"hash of $k")
      val signed = u.toLong // BigInt.toLong keeps the low-64 bit pattern
      assert(((signed % Splits.Buckets) + Splits.Buckets) % Splits.Buckets === b, s"pmod of $k")
    }
  }

  test("upperBounds: exact boundaries, last forced to Buckets, weights needn't sum to 1") {
    assert(Splits.upperBounds(Seq("a" -> 0.8, "b" -> 0.1, "c" -> 0.1)) ===
      Seq(800000L, 900000L, Splits.Buckets))
    assert(Splits.upperBounds(Seq("a" -> 2.0, "b" -> 2.0)) === Seq(500000L, Splits.Buckets))
    assertThrows[IllegalArgumentException](Splits.upperBounds(Seq("a" -> 0.0)))
  }

  test("tokenBudgetDraw: quotas met by the crossing doc, prefix-closed, deterministic") {
    // two sources, 40 docs each, 10 tokens per doc -> 400 tokens/source;
    // equal sizes -> equal quotas of floor(0.5 * budget)
    val corpus = (1L to 80L).map { i =>
      (if (i <= 40) "a" else "b", i, Seq.fill(10)("w").mkString(" "))
    }.toDF("source", "doc_id", "text")
    val out = Splits.tokenBudgetDraw(corpus, budgetTokens = 300L, alpha = 0.5)
      .cache()
    val rows = out.collect()
    // quota = floor(0.5 * 300) = 150 tokens -> 15 docs of 10 tokens each,
    // and the 15th is the crossing doc (cum 150, cum_before 140 < 150)
    val bysrc = rows.groupBy(_.getString(0))
    assert(bysrc.keySet === Set("a", "b"))
    bysrc.foreach { case (s, rs) =>
      assert(rs.length === 15, s"source $s drew ${rs.length} docs")
      assert(rs.map(_.getLong(2)).sum === 150L, s"source $s token volume")
      assert(rs.forall(_.getLong(4) === 150L))
    }
    // prefix-closed in the md5 order: every kept doc's cum_before < quota,
    // and max cum >= quota (the budget is actually met)
    assert(rows.forall(r => r.getLong(3) - r.getLong(2) < r.getLong(4)))
    assert(bysrc.values.forall(rs => rs.map(_.getLong(3)).max >= 150L))
    // pure function of the keys: stable under repartitioning
    val again = Splits.tokenBudgetDraw(corpus.repartition(7), 300L, 0.5)
    assert(again.exceptAll(out).count() === 0 && out.exceptAll(again).count() === 0)
    // a bigger budget than the corpus keeps everything
    val all = Splits.tokenBudgetDraw(corpus, budgetTokens = 10000L, alpha = 0.5)
    assert(all.count() === 80L)
  }

  test("stratifiedSplit: every stratum hits its fold counts EXACTLY (ceil boundaries)") {
    import spark.implicits._
    // strata of deliberately awkward sizes: 10 (clean multiples),
    // 7 (nothing divides), 1 (everything lands in the first fold)
    val df = ((1L to 10L).map(i => (i, "a")) ++ (11L to 17L).map(i => (i, "b")) ++
      Seq((18L, "c"))).toDF("id", "stratum")
    val folds = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Splits.stratifiedSplit(df, "id", "stratum", folds)
      .groupBy("stratum", "fold").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // n=10: ceil(.8*10)=8, ceil(.9*10)=9 → 8/1/1
    assert(got(("a", "train")) === 8L)
    assert(got(("a", "val")) === 1L)
    assert(got(("a", "test")) === 1L)
    // n=7: ceil(5.6)=6, ceil(6.3)=7 → 6/1/0 (test absent)
    assert(got(("b", "train")) === 6L)
    assert(got(("b", "val")) === 1L)
    assert(!got.contains(("b", "test")))
    // n=1: ceil(.8)=1 → the single row is train
    assert(got(("c", "train")) === 1L)
    // every row assigned exactly once
    assert(got.values.sum === 18L)
  }

  test("stratifiedSplit: assignment is a pure function of (key, stratum) — stable under repartitioning") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, if (i % 3 == 0) "x" else "y")).toDF("id", "stratum")
    val folds = Seq("train" -> 0.8, "val" -> 0.2)
    def assign(d: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
      Splits.stratifiedSplit(d, "id", "stratum", folds)
        .select("id", "fold").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(assign(df.coalesce(1)) === assign(df.repartition(13)))
  }

  test("stratifiedSplit: a 0.9-boundary at an exact multiple stays integer-exact") {
    import spark.implicits._
    // n=500 in one stratum: float cums would put the val boundary at
    // ceil(0.9000000000000001 * 500) = 451; the fixed-point integer cut
    // must give exactly 450 — the cross-engine off-by-one this operator's
    // boundary math exists to prevent
    val df = (1L to 500L).map(i => (i, "s")).toDF("id", "stratum")
    val got = Splits.stratifiedSplit(
      df, "id", "stratum", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("fold").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("train" -> 400L, "val" -> 50L, "test" -> 50L))
  }
}
