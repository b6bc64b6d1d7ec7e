package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Formats

/** Interchange-format sources: explicit-schema reads, PERMISSIVE
  * corrupt-record quarantine, CSV embedded-newline round-trip, ORC
  * round-trip. (x70-x72 additionally hash-gate all three against the
  * parquet rows at oracle scale.)
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("text", StringType)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fmt_$tag").toString + "/d"

  test("jsonl: round-trip, and a malformed line lands in the corrupt column, not a crash") {
    val dir = tmp("jsonl")
    Seq((1L, "plain"), (2L, "quote \" backslash \\ newline \n tab \t")).toDF("id", "text")
      .write.mode("overwrite").json(dir)
    // plant one malformed line next to the good ones
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-corrupt.json"),
      "{\"id\": 3, \"text\": unterminated\n".getBytes("UTF-8"))
    val got = Formats.jsonl(spark, dir, schema, corruptCol = Some("_bad"))
    val rows = got.collect().map(r =>
      (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(rows.exists { case (id, t, bad) =>
      id === Some(2L) && t === Some("quote \" backslash \\ newline \n tab \t") && bad.isEmpty
    })
    // the bad line survives as data with null fields + the raw record
    assert(rows.exists { case (id, _, bad) =>
      id.isEmpty && bad.exists(_.toString.contains("unterminated"))
    })
    assert(got.count() === 3)
  }

  test("csv: embedded newlines and quotes round-trip under multiLine") {
    val dir = tmp("csv")
    val data = Seq(
      (1L, "one line"),
      (2L, "two\nlines with \"quotes\" and, commas"),
      (3L, "back\\slash"))
    data.toDF("id", "text").repartition(2).write
      .mode("overwrite").option("header", "true").csv(dir)
    val got = Formats.csv(spark, dir, schema, multiLine = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === data.toMap)
  }

  test("orc: round-trip with the explicit schema") {
    val dir = tmp("orc")
    val data = Seq((1L, "a"), (2L, "βüñ non-ascii"), (3L, null.asInstanceOf[String]))
    data.toDF("id", "text").write.mode("overwrite").orc(dir)
    val got = Formats.orc(spark, dir, schema)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === data.map { case (k, v) => k -> Option(v) }.toMap)
  }

  test("explicit schema is enforced: a type-mismatched jsonl field nulls, never reinfers") {
    val dir = tmp("schema")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "rows.json"),
      "{\"id\": \"not-a-number\", \"text\": \"x\"}\n{\"id\": 7, \"text\": \"y\"}\n"
        .getBytes("UTF-8"))
    val got = Formats.jsonl(spark, dir, schema)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(got.contains((Some(7L), Some("y"))))
    // the string "not-a-number" cannot silently widen id to string —
    // the row degrades to nulls under the DECLARED long type
    assert(got.exists { case (id, _) => id.isEmpty })
  }
}
