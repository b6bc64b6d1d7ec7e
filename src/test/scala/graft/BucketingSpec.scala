package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextOps}
import graft.sources.{Bucketed, Tables}

/** Proof that bucketed LAYOUT removes corpus-side exchanges: joins of
  * co-bucketed tables run shuffle-free, the incremental-dedup postings
  * window runs exchange-free on a table bucketed by shingle (and pays a
  * full corpus shuffle without it), appends preserve the contract, and
  * the bucketed path is row-identical to the layout-oblivious one.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_bkt_$tag").toString + "/t"

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("join of two tables bucketed on the key runs without a shuffle") {
    val facts = spark.range(0, 10000)
      .select((col("id") % 97).as("k"), col("id").as("v"))
    val dim = spark.range(0, 97).select(col("id").as("k"), concat(lit("n"), col("id")).as("name"))
    Bucketed.save(facts, "bkt_facts", tmp("facts"), Seq("k"), 8)
    Bucketed.save(dim, "bkt_dim", tmp("dim"), Seq("k"), 8)
    try {
      val joined = spark.table("bkt_facts")
        .join(spark.table("bkt_dim").hint("shuffle_merge"), Seq("k"))
      assert(
        exchanges(joined) === 0,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan.toString.take(1500)}")
      // and it is still correct
      assert(joined.count() === 10000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dim")
    }
  }

  test("postings df-window: exchange-free on the bucketed table, one corpus shuffle without it") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val postings = TextOps.shingles(docs.filter(col("doc_id") >= 100), 3)
    val plainPath = tmp("plain")
    postings.write.mode("overwrite").parquet(plainPath)
    Bucketed.save(postings, "bkt_postings", tmp("post"), Seq("shingle"), 8)
    try {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("shingle")
      val onBucketed = Bucketed.table(spark, "bkt_postings")
        .withColumn("df", count(lit(1)).over(w))
      val onPlain = spark.read.parquet(plainPath)
        .withColumn("df", count(lit(1)).over(w))
      assert(
        exchanges(onBucketed) === 0,
        s"bucketed window still shuffles:\n${onBucketed.queryExecution.executedPlan.toString.take(1500)}")
      assert(exchanges(onPlain) >= 1, "plain-parquet control should pay the shuffle")
      // identical df annotations either way
      val a = onBucketed.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val b = onPlain.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(a === b)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_postings")
  }

  test("incremental near-dups over bucketed postings: row-identical to the layout-oblivious path") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val batch = docs.filter(col("doc_id") < 100)
    val corpus = docs.filter(col("doc_id") >= 100)
    Bucketed.save(TextOps.shingles(corpus, 3), "bkt_corpus", tmp("corpus"), Seq("shingle"), 8)
    try {
      def key(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val direct = key(Dedup.jaccardNearDupsAgainst(batch, corpus))
      val bucketed = key(
        Dedup.jaccardNearDupsAgainstPostings(batch, Bucketed.table(spark, "bkt_corpus")))
      assert(direct.nonEmpty, "fixture should produce near-dup pairs")
      assert(bucketed === direct)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_corpus")
  }

  test("append keeps the bucket contract: layout still exchange-free, rows complete") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val all = TextOps.shingles(docs.filter(col("doc_id") >= 100), 3)
    Bucketed.save(
      all.filter(col("doc_id") < 300), "bkt_grow", tmp("grow"), Seq("shingle"), 8)
    Bucketed.append(all.filter(col("doc_id") >= 300), "bkt_grow", Seq("shingle"), 8)
    try {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("shingle")
      val win = Bucketed.table(spark, "bkt_grow").withColumn("df", count(lit(1)).over(w))
      assert(exchanges(win) === 0, "append must not break the bucketed layout")
      assert(Bucketed.table(spark, "bkt_grow").count() === all.count())
    } finally spark.sql("DROP TABLE IF EXISTS bkt_grow")
  }

  test("compact: fewer files, same rows, layout still exchange-free after the swap") {
    def parquetFiles(path: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).count(_.getName.endsWith(".parquet"))
    }
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val all = TextOps.shingles(docs.filter(col("doc_id") >= 100), 3)
    val growPath = tmp("cgrow")
    val compactPath = tmp("ccomp")
    Bucketed.save(all.filter(col("doc_id") < 200), "bkt_cmp", growPath, Seq("shingle"), 4)
    Bucketed.append(
      all.filter(col("doc_id") >= 200 && col("doc_id") < 350), "bkt_cmp", Seq("shingle"), 4)
    Bucketed.append(all.filter(col("doc_id") >= 350), "bkt_cmp", Seq("shingle"), 4)
    try {
      val before = parquetFiles(growPath)
      val n = Bucketed.table(spark, "bkt_cmp").count()
      Bucketed.compact(spark, "bkt_cmp", compactPath, Seq("shingle"), 4)
      val after = parquetFiles(compactPath)
      assert(after < before, s"compaction should shrink the file count ($before -> $after)")
      assert(Bucketed.table(spark, "bkt_cmp").count() === n)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("shingle")
      val win = Bucketed.table(spark, "bkt_cmp").withColumn("df", count(lit(1)).over(w))
      assert(exchanges(win) === 0, "compacted table must keep the bucketed layout")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_cmp")
      spark.sql("DROP TABLE IF EXISTS bkt_cmp__compacting")
    }
  }
}
