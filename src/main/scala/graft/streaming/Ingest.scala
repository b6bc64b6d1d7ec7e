package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Streaming ingest (SURVEY.md §2.7): the reference has no streaming path —
  * new facts arrive by unspecified batch loads. The engine adds the
  * Structured-Streaming ingest the `events` table implies: move events →
  * watermarked tumbling daily windows → the same `forecasting_data` shape
  * the batch pipeline consumes.
  *
  * The SAME transform runs in both batch and streaming (Structured
  * Streaming's unified Dataset model): batch mode answers the oracle-
  * verified s01 query; streaming mode runs incrementally with a 1-day
  * watermark bounding state. At scale: state is keyed by
  * (day-window, branch) — bounded by |branches| per day, trivially small;
  * the shuffle is the same partial-aggregated groupBy as batch.
  */
object Ingest {

  /** Raw events → the moves-fact shape, keeping the event-time timestamp
    * (FIXTURES.md §3 mapping with `ts` preserved for windowing).
    */
  def eventsToMoves(events: DataFrame): DataFrame =
    events.select(
      col("ts"),
      concat(lit("B"), pmod(col("user_id"), lit(Tables.BranchCount.toLong)).cast("string"))
        .as("branch"),
      col("event_type").as("move_type"),
      lit(1.0).as("cnt"))

  /** Tumbling daily counts per branch. Streaming inputs get a 1-day
    * watermark (late events beyond it are dropped and state is reclaimed);
    * batch inputs run the identical aggregation.
    */
  def dailyCounts(moves: DataFrame): DataFrame = {
    val src = if (moves.isStreaming) moves.withWatermark("ts", "1 day") else moves
    src
      .groupBy(window(col("ts"), "1 day").as("w"), col("branch"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(to_date(col("w.start")).as("ds"), col("branch"), col("cnt"))
  }

  /** The ingest SINK: stream daily counts into the partitioned parquet
    * fact table the batch pipelines read. foreachBatch gives exactly-once
    * per micro-batch via the checkpoint; each batch OVERWRITES only the
    * day partitions it touches (dynamic partition overwrite), so a late
    * re-emit within the watermark replaces that day's row instead of
    * duplicating it — the streaming analog of the reference's upsert
    * (precompute_percentages.py:218-233).
    */
  def streamDailyCountsToTable(
      moves: org.apache.spark.sql.DataFrame,
      tablePath: String,
      checkpointPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    dailyCounts(moves).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ds")
          .parquet(tablePath)
      }
      .start()

  /** Read side of the streamed table, in the forecasting_data shape. */
  def readDailyCountsTable(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String): DataFrame =
    spark.read.parquet(tablePath)
      .select(col("ds").cast("date").as("ds"), col("branch"), col("cnt"))

  /** Per-(branch, move_type) daily counts — the `historical_data` shape. */
  def dailyCountsByType(moves: DataFrame): DataFrame = {
    val src = if (moves.isStreaming) moves.withWatermark("ts", "1 day") else moves
    src
      .groupBy(window(col("ts"), "1 day").as("w"), col("branch"), col("move_type"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(to_date(col("w.start")).as("ds"), col("branch"), col("move_type"), col("cnt"))
  }
}
