package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * Designed for a real multi-executor cluster (AQE, sensible shuffle
  * parallelism, UTC determinism); tested on `local[N]`. The same conf keys
  * are what you would pass to spark-submit on a 1000-executor deployment —
  * only `master` and the sizing numbers change.
  */
object GraftSession {

  /** Default shuffle parallelism for the local harness (matches core count,
    * per the driver contract). On a production cluster this is overridden to
    * ~2-3x total executor cores, and AQE coalesces from there.
    */
  val LocalShufflePartitions = 32

  def builder(master: String = "local[32]"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", LocalShufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Testdata `events.ts` is parquet TIMESTAMP(NANOS); Spark reads it as
      // LongType under this flag and Tables.events converts explicitly.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Write timestamps as INT64 micros, not the deprecated INT96 Spark
      // still defaults to for Hive compat: INT96 chunks carry NO usable
      // footer statistics, which silently turns the snapshot store's
      // timestamp file-skipping (readBetweenTimestamps and the
      // SnapshotFileIndex's TIMESTAMP translation, both built on the
      // INT64-micros `l` rows) into keep-everything. Micros is what
      // Delta/Iceberg write and every modern reader (and DuckDB) speaks.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  def getOrCreate(master: String = "local[32]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
