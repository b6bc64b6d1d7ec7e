package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark-native bucketed table layouts — the CO-LOCATED JOIN storage
  * contract for keys that are joined or windowed every single run.
  *
  * A plain parquet round-trip forgets its partitioning: every batch run
  * against a stored corpus table then re-shuffles the CORPUS side (the
  * 100 TB side) before any shingle-keyed window or join can start. A
  * bucketed table persists `HashPartitioning(key, buckets)` as catalog
  * metadata, so a scan satisfies ClusteredDistribution(key) directly:
  *
  *   - `count() over (partition by key)` windows run exchange-free on
  *     the stored side (the df-annotation pass of
  *     [[graft.operators.Dedup.jaccardNearDupsAgainstPostings]]);
  *   - equi-joins on the key shuffle ONLY the other (batch-sized) side —
  *     the asymmetric ideal of incremental ingest: daily-batch work
  *     scales with the batch, never with the corpus;
  *   - `sortBy` pre-sorts within buckets, so sort-merge reads skip their
  *     sort as well.
  *
  * Posture notes for a real cluster:
  *   - bucket count is a LAYOUT contract like [[graft.operators.Splits
  *     .shardOf]]'s hexChars: pick it for target-scale parallelism
  *     (corpus-bytes / executor-memory-sized buckets), not today's; a
  *     re-bucket is a full rewrite.
  *   - `saveAsTable` registers in the session catalog. Under the default
  *     in-memory catalog the DATA (parquet under `path`) survives the
  *     session but the bucketing METADATA does not — production deploys
  *     point `spark.sql.catalogImplementation` at a shared metastore,
  *     exactly as they would for any other table contract. Everything
  *     else here is catalog-agnostic.
  *   - appends preserve the layout: each `append` writes its rows into
  *     per-bucket files of the SAME hash spec, so the incremental-corpus
  *     pattern (append each accepted batch's postings) keeps every later
  *     run exchange-free. File counts grow per append — compact on the
  *     usual cadence (read table, save to a fresh bucketed table, swap).
  */
object Bucketed {

  /** Save as a bucketed, in-bucket-sorted external table at `path`.
    * Overwrites both data and catalog entry (drop-first keeps a repeated
    * save from tripping the "table already exists" analyzer check with a
    * stale location).
    */
  def save(
      df: DataFrame,
      table: String,
      path: String,
      keys: Seq[String],
      buckets: Int): Unit = {
    require(buckets > 0, "bucket count must be positive")
    require(keys.nonEmpty, "bucketing needs at least one key column")
    val spark = df.sparkSession
    if (spark.catalog.tableExists(table)) spark.sql(s"DROP TABLE `$table`")
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Append rows into an existing bucketed table — the daily-ingest
    * commit. The spec must repeat the table's (keys, buckets) — Spark
    * validates it against the catalog entry and rejects a mismatch, which
    * is exactly the contract check an ingest job wants — and the writer
    * re-hashes the new rows into that spec, so the layout (and every
    * downstream exchange elimination) holds across appends.
    */
  def append(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write
      .mode("append")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** The bucketed scan. Exchange elimination needs
    * `spark.sql.sources.bucketing.enabled` (default true) — reading via
    * `spark.table`, not the path, is what carries the bucket metadata
    * into the plan.
    */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Rewrite the table into a fresh layout at `newPath` and swap the
    * catalog name — the compaction cadence [[append]]'s per-batch file
    * growth calls for. The rewrite is staged COMPLETELY (written
    * bucketed under a staging name) before the original drops, so a
    * crash leaves the old table or both, never neither; the name swap
    * itself is not atomic under the in-memory catalog (a production
    * metastore commits the rename), so racing readers should pin paths,
    * the same contract VersionedTable solves with version dirs.
    */
  def compact(
      spark: SparkSession,
      table: String,
      newPath: String,
      keys: Seq[String],
      buckets: Int): Unit = {
    val staging = table + "__compacting"
    // capture the OLD external location before the catalog entry drops:
    // DROP TABLE on an external table removes only metadata, so without
    // an explicit delete every compaction would leak the previous path's
    // parquet files on disk (round-8 ADVICE finding)
    val oldLoc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location
    save(spark.table(table), staging, newPath, keys, buckets)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
    // reclaim the superseded data only AFTER the swap committed, and only
    // if the caller really moved the table (same-path compaction would
    // have already overwritten in place via save's mode("overwrite"))
    val newLoc = new org.apache.hadoop.fs.Path(newPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(new org.apache.hadoop.fs.Path(newPath)).toUri
    if (oldLoc != newLoc) {
      val p = new org.apache.hadoop.fs.Path(oldLoc)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
