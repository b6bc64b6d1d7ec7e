package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Avro

/** Avro interchange (sources/Avro.scala): round-trip fidelity across the
  * supported type subset (scalars, arrays, binary, nulls), one container
  * file per partition, name-resolved reads (reordered/missing fields),
  * and the loud unsupported-type refusal. (x119 additionally hash-gates
  * the documents corpus against the parquet rows at oracle scale.)
  */
class AvroSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_avro_$tag").toString + "/d"

  test("round-trip: scalars, nulls, unicode, arrays of floats, binary") {
    val dir = tmp("rt")
    val df = Seq(
      (1L, Option("plain ascii"), Option(1.5), Option(Seq(1.0f, -2.5f)), Option(Array[Byte](1, 2, 3))),
      (2L, Option("unicode é中😀 newline \n tab \t"), Option(-0.0),
        Option(Seq.empty[Float]), Option(Array.empty[Byte])),
      (3L, None, None, None, None))
      .toDF("id", "text", "score", "emb", "payload")
    Avro.writeAvro(df, dir)
    val got = Avro.avro(spark, dir, df.schema).orderBy("id").collect()
    val want = df.orderBy("id").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) === w.getLong(0))
      assert(Option(g.getString(1)) === Option(w.getString(1)))
      assert(Option(g.get(2)) === Option(w.get(2)))
      assert(Option(g.get(3)).map(_.asInstanceOf[scala.collection.Seq[Float]].toSeq) ===
        Option(w.get(3)).map(_.asInstanceOf[scala.collection.Seq[Float]].toSeq))
      assert(Option(g.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq) ===
        Option(w.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq))
    }
  }

  test("one container file per partition; read schedules one task per file") {
    val dir = tmp("parts")
    val df = spark.range(100).select(col("id"), concat(lit("t"), col("id")).as("text"))
      .repartition(4)
    Avro.writeAvro(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length === 4)
    val schema = new StructType().add("id", LongType).add("text", StringType)
    val back = Avro.avro(spark, dir, schema)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 100)
    assert(back.agg(sum("id")).head().getLong(0) === 4950L)
  }

  test("fields resolve by NAME: a reordered read schema round-trips; a missing field reads null") {
    val dir = tmp("names")
    Avro.writeAvro(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), dir)
    val reordered = new StructType()
      .add("text", StringType).add("id", LongType).add("never_written", DoubleType)
    val got = Avro.avro(spark, dir, reordered).orderBy("id").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), Option(r.get(2)))).toSeq ===
      Seq(("a", 1L, None), ("b", 2L, None)))
  }

  test("split reads: sync-bounded ranges read every block exactly once") {
    val dir = tmp("splits")
    // ONE container file, many blocks: a tiny sync interval forces a
    // block boundary every ~256 uncompressed bytes, so the single file
    // carries dozens of sync markers for the ranges to land between
    val df = spark.range(2000)
      .select(col("id"), concat(lit("text-"), col("id"), lit("-" + "x" * 40)).as("text"))
      .coalesce(1)
    Avro.writeAvro(df, dir, syncInterval = 256)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length === 1)
    val fileLen = files.head.length()
    val schema = new StructType().add("id", LongType).add("text", StringType)
    // force many ranges over the one file
    val splitBytes = math.max(1L, fileLen / 8)
    val split = Avro.avro(spark, dir, schema, maxSplitBytes = splitBytes)
    assert(split.rdd.getNumPartitions >= 8, "one file must fan out to multiple tasks")
    // exactly-once: total count AND per-key uniqueness AND full parity
    // with the whole-file read (and the source frame)
    assert(split.count() === 2000)
    assert(split.select("id").distinct().count() === 2000)
    val whole = Avro.avro(spark, dir, schema, maxSplitBytes = Long.MaxValue)
    assert(whole.rdd.getNumPartitions === 1)
    assert(split.exceptAll(whole).isEmpty && whole.exceptAll(split).isEmpty)
    assert(split.exceptAll(df).isEmpty && df.exceptAll(split).isEmpty)
    // rows actually distribute across ranges — no single range slurped
    // the file while the rest read nothing (the sync/pastSync contract)
    val perPart = split.rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(perPart.count(_ > 0) >= 4, s"rows concentrated: ${perPart.mkString(",")}")
  }

  test("an empty range past the last sync marker reads zero rows, not an error") {
    val dir = tmp("tail")
    Avro.writeAvro(Seq((1L, "a")).toDF("id", "text"), dir)
    val schema = new StructType().add("id", LongType).add("text", StringType)
    // 1-byte splits: nearly all ranges hold no leading sync marker and
    // must come back empty; the union must still be exactly the file
    val got = Avro.avro(spark, dir, schema, maxSplitBytes = 64)
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "a")))
  }

  test("unsupported types refuse loudly at write time") {
    val df = Seq((1L, java.sql.Date.valueOf("2024-01-01"))).toDF("id", "d")
    val e = intercept[IllegalArgumentException](Avro.avroSchema(df.schema))
    assert(e.getMessage.contains("unsupported Avro interchange type"))
  }
}
