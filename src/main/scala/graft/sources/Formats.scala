package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange-format sources/sinks beyond parquet + JDBC: JSONL (the
  * crawl-dump lingua franca every LLM-data pipeline ingests), CSV, and
  * ORC. Three rules, applied uniformly:
  *
  *   - **Explicit schema, never inference.** Schema inference scans the
  *     data an extra time and silently drifts types between ingests
  *     (yesterday's all-integer column reads today as string); a 100 TB
  *     ingest can afford neither. Every reader here REQUIRES the
  *     schema.
  *   - **Malformed rows are data, not crashes.** Reads run PERMISSIVE
  *     with an optional corrupt-record column the caller routes to a
  *     quarantine sink — a crawl dump with one bad line out of 10^9
  *     must not kill the job (FAILFAST is one option flag away when
  *     the contract really is all-or-nothing).
  *   - **Splittability is a format property, stated where it bites.**
  *     JSONL and ORC scans split per line/stripe; CSV with embedded
  *     newlines needs `multiLine`, which parses whole files and
  *     forfeits input splitting — fine for dimension-sized uploads,
  *     wrong for corpus-scale text (prefer JSONL there; x71 documents
  *     the cost by carrying exactly that option).
  *
  * x70/x71/x72 gate all three round-trips byte-for-byte: the documents
  * corpus is written to each format and read back with these readers,
  * and the oracle compares against the PARQUET rows — format
  * invariance, the x29b convention applied to sources.
  */
object Formats {

  /** One JSON document per line. Spark's json writer emits JSONL
    * natively; the reader is line-splittable, so corpus-scale scans
    * parallelize per line, not per file.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def jsonl(
      spark: SparkSession,
      path: String,
      schema: StructType,
      corruptCol: Option[String] = None): DataFrame = {
    corruptCol.foreach(c => require(
      !schema.fieldNames.contains(c),
      s"corrupt-record column '$c' collides with a schema field"))
    val base = corruptCol match {
      case Some(c) =>
        spark.read
          .schema(schema.add(c, org.apache.spark.sql.types.StringType))
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", c)
      case None => spark.read.schema(schema).option("mode", "PERMISSIVE")
    }
    base.json(path)
  }

  /** CSV with header. `multiLine` must be true when any field can
    * embed a newline (quoted-field parsing then spans lines and each
    * FILE becomes one split — the documented splittability cost);
    * escape matches the writer's default so quotes round-trip.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def csv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      multiLine: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("multiLine", multiLine.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** ORC — the columnar interchange peer of parquet (stripe-splittable,
    * predicate pushdown and column pruning work the same way through
    * the same DataSource API).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
