package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Skew}

/** Tests for the SQL-surface function registration and the skew-salting
  * utility.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("minhash_sig is callable from SQL and matches the DataFrame path") {
    GraftExtensions.register(spark)
    val docs = Seq((1L, "a b c d e f g h"), (2L, "x y z w v u t s")).toDF("doc_id", "text")
    Dedup.gramHashFrame(docs).createOrReplaceTempView("gram_hashes")
    val sqlSigs = spark.sql("SELECT doc_id, minhash_sig(hs) AS sig FROM gram_hashes")
    val dfSigs = Dedup.minhashSignaturesRowwise(docs)
    assert(sqlSigs.exceptAll(dfSigs).count() === 0 && dfSigs.exceptAll(sqlSigs).count() === 0)
    // explicit numHashes arg
    val h8 = spark.sql("SELECT size(minhash_sig(hs, 8)) AS n FROM gram_hashes")
      .as[Int].collect().toSet
    assert(h8 === Set(8))
  }

  test("bloom_filter_agg / might_contain are callable from SQL") {
    GraftExtensions.register(spark)
    Seq(1L, 2L, 3L).toDF("v").createOrReplaceTempView("bloom_vals")
    val hits = spark.sql(
      """SELECT v, might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(v), 10L, 1000L) FROM bloom_vals),
        |  xxhash64(v)) AS hit
        |FROM (VALUES (1L), (2L), (99L)) t(v)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // bloom guarantee: members ALWAYS hit
    assert(hits(1L) && hits(2L))
    // a non-member misses at 1000 bits over 3 items (deterministic hash —
    // this is a fixed fact about these values, not a probabilistic flake)
    assert(!hits(99L))
  }

  test("bpe_apply is callable from SQL and matches the trained segmenter") {
    GraftExtensions.register(spark)
    // merges trained on the classic corpus: (e,s) then (es,t)
    val out = spark.sql(
      """SELECT bpe_apply('newest', array('e', 'es'), array('s', 't')) AS segs""")
      .head().getSeq[String](0)
    assert(out === Seq("n", "e", "w", "est"))
    // same result as the DataFrame path over the same merge list
    import graft.operators.TextOps
    val merges = Seq(TextOps.BpeMerge(0, "e", "s", 9), TextOps.BpeMerge(1, "es", "t", 9))
    val viaDf = TextOps.bpeSegments(Seq((1L, "newest")).toDF("doc_id", "text"), merges)
      .head().getSeq[String](3)
    assert(viaDf === out)
    // non-literal merge arrays are rejected with a clear message
    val e = intercept[Exception] {
      spark.sql("SELECT bpe_apply(t, array(t), array(t)) FROM (SELECT 'x' AS t)").collect()
    }
    assert(e.getMessage.contains("bpe_apply"))
  }

  test("saltedJoin equals the plain join on skewed data (inner and left)") {
    // skew: 90% of fact rows share one key
    val fact = spark.range(0, 2000)
      .select(
        when(col("id") % 10 === 0, col("id") % 5).otherwise(lit(99L)).as("k"),
        col("id").as("v"))
    val dim = Seq((0L, "a"), (1L, "b"), (99L, "hot"), (123L, "orphan")).toDF("k", "name")
    for (jt <- Seq("inner", "left")) {
      val plain = fact.join(dim, Seq("k"), jt)
      val salted = Skew.saltedJoin(fact, dim, Seq("k"), buckets = 8, joinType = jt)
      assert(salted.columns.toSeq === plain.columns.toSeq)
      assert(
        salted.exceptAll(plain).count() === 0 && plain.exceptAll(salted).count() === 0,
        s"salted $jt join diverges from plain join")
      // hot/cold split form: only key 99 (1800 rows) crosses the
      // threshold and salts; the cold keys join unsalted — results must
      // still be exactly the plain join
      val skewed = Skew.saltedJoinSkewed(
        fact, dim, Seq("k"), buckets = 8, hotThreshold = 500L, joinType = jt)
      assert(skewed.columns.toSeq === plain.columns.toSeq)
      assert(
        skewed.exceptAll(plain).count() === 0 && plain.exceptAll(skewed).count() === 0,
        s"hot/cold salted $jt join diverges from plain join")
    }
  }

  test("saltedJoin rejects join types where replication would corrupt results") {
    val df = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, Seq("k"), 4, joinType = "right")
    }
  }

  test("graft_table TVF: SQL snapshot reads with version/timestamp selection and file pruning") {
    GraftExtensions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_tvf").toString + "/t"
    val t = graft.sources.VersionedTable(root)
    val before = java.time.Instant.now().minusSeconds(60)
    t.commit(
      (0L until 100L).map(i => (i, s"s${i % 4}")).toDF("id", "s")
        .repartitionByRange(4, col("id")),
      statsColumns = Seq("id"))
    Thread.sleep(5)
    val mid = java.time.Instant.now()
    Thread.sleep(5)
    t.appendCommit((100L until 150L).map(i => (i, s"s${i % 4}")).toDF("id", "s"))
    // head read
    assert(spark.sql(s"SELECT * FROM graft_table('$root')").count() === 150)
    // pinned version
    assert(spark.sql(s"SELECT * FROM graft_table('$root', 0)").count() === 100)
    // timestamp time travel resolves the snapshot live at `mid` — the
    // literal is rendered in UTC because that is the session time zone
    // (Timestamp.toString would use the JVM default zone instead)
    def utc(i: java.time.Instant): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC).format(i)
    assert(
      spark.sql(s"SELECT * FROM graft_table('$root', TIMESTAMP '${utc(mid)}')").count() === 100)
    // the SQL WHERE clause is pushed into the SnapshotFileIndex: the
    // range prunes the range-partitioned files of the pinned version
    val pruned = spark.sql(
      s"SELECT id FROM graft_table('$root', 0) WHERE id BETWEEN 10 AND 30")
    pruned.collect()
    val scans = pruned.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    assert(scans.map(_.metrics("numFiles").value).sum < 4,
      "SQL-pushed range did not prune files through the TVF relation")
    assert(pruned.count() === 21)
    // a timestamp before any publish errors like a never-committed table
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table('$root', TIMESTAMP '${utc(before)}')").collect()
    }
    // non-literal path: refused with a named contract
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_table(concat('a', 'b'))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.toLowerCase.contains("graft_table"))
  }

  test("graft_table TVF: partitioned snapshots read through the index with partition pruning") {
    GraftExtensions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_tvf_part").toString + "/t"
    val t = graft.sources.VersionedTable(root)
    t.commit(
      (0L until 90L).map(i => (i, s"b${i % 3}")).toDF("id", "branch"),
      partitionBy = Seq("branch"))
    t.appendCommit((90L until 120L).map(i => (i, s"b${i % 3}")).toDF("id", "branch"))
    // the SQL face serves the hive-partitioned cross-directory chain,
    // partition column included
    val all = spark.sql(s"SELECT * FROM graft_table('$root')")
    assert(all.count() === 120)
    assert(all.columns.toSeq.sorted === Seq("branch", "id"))
    // a WHERE on the partition column prunes at plan time through the
    // pushed partitionFilters
    val byPart = spark.sql(
      s"SELECT id FROM graft_table('$root') WHERE branch = 'b1'")
    byPart.collect()
    val total = t.manifest(t.latestVersion().get).get.size
    val scanned = byPart.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }.map(_.metrics("numFiles").value).sum
    assert(scanned < total, "SQL partition filter pruned nothing")
    assert(byPart.count() === 40)
  }

  test("graft_table_changes TVF: the SQL change feed equals the Scala diffVersions") {
    GraftExtensions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_tvf_cdc").toString + "/t"
    val t = graft.sources.VersionedTable(root)
    t.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    t.appendCommit(Seq((4L, "d")).toDF("id", "s"))
    t.deleteWhere(spark, col("id") === 2L)
    val viaSql = spark.sql(
      s"SELECT change, id, s FROM graft_table_changes('$root', 0, 2) ORDER BY change, id")
    val viaScala = t.diffVersions(spark, 0L, 2L)
      .select(col("change"), col("id"), col("s")).orderBy("change", "id")
    assert(viaSql.collect().toSeq === viaScala.collect().toSeq)
    val rows = viaSql.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSet === Set(("insert", 4L), ("delete", 2L)))
    // non-literal versions: refused with a named contract
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table_changes('$root', 0, 1 + 1)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.toLowerCase.contains("graft_table_changes"))
  }
}
