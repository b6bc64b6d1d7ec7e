package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-isolated parquet table: immutable version directories plus an
  * atomically-swapped pointer file — the same commit protocol Iceberg/Delta
  * build on (write new files, then publish with one atomic metadata swap),
  * restated on plain parquet for this dependency-closed environment.
  *
  * Why it exists: `Percentages.upsertPercentages` overwrites partitions in
  * place, which is correct single-writer but NOT safe against concurrent
  * readers — a reader that lists files mid-commit sees a half-deleted
  * partition. The reference's Postgres upsert
  * (precompute_percentages.py:218-233) is transactional; this is the
  * engine's equivalent reader-safe write path.
  *
  * Layout:
  * {{{
  *   table/
  *     _latest          <- text file holding the published version number
  *     v=3/...parquet   <- immutable snapshot directories
  *     v=4/...parquet
  * }}}
  *
  * Protocol:
  *   - `commit(df)`: write the full snapshot to `v=(latest+1)` (invisible
  *     to readers — nobody points at it yet), then publish by writing the
  *     pointer to a temp file and atomically renaming it over `_latest`.
  *     A reader either sees the old pointer (old snapshot, still fully on
  *     disk) or the new one (new snapshot, fully written before publish) —
  *     never a torn state. A crash before the rename leaves an orphan
  *     directory and an untouched table; the next commit numbers PAST the
  *     orphan (version = max over directories on disk, not the pointer)
  *     and vacuum eventually reclaims it.
  *   - `read`: resolve `_latest`, read that one directory. In-flight
  *     queries keep reading the snapshot they resolved even if a commit
  *     lands mid-query, because published directories are never mutated.
  *   - `vacuum(keep)`: drop all but the newest `keep` snapshots — run it
  *     only after in-flight readers of older snapshots have drained (the
  *     same contract as Delta's VACUUM retention window).
  *
  * Concurrency contract: single writer (matching the reference's one cron
  * job), any number of readers. Scale caveat: `Files.move` is atomic on
  * POSIX and HDFS; object stores without atomic rename (S3) need the
  * pointer swap delegated to a catalog/metastore CAS — the protocol is
  * unchanged, only the final swap primitive moves. Reads do NOT depend on
  * directory listings: each snapshot carries a `_manifest` of its data
  * files (written before publish), so eventually-consistent LISTs never
  * hide a freshly-committed file and stray files are never silently read.
  */
final class VersionedTable(val root: String) {
  import VersionedTable.DefaultBloomBits

  private def rootPath: Path = Paths.get(root)
  private def pointer: Path = rootPath.resolve("_latest")
  private def versionDir(v: Long): Path = rootPath.resolve(s"v=$v")

  /** Published version, or None for a never-committed table. */
  def latestVersion(): Option[Long] =
    if (Files.exists(pointer))
      Some(new String(Files.readAllBytes(pointer), StandardCharsets.UTF_8).trim.toLong)
    else None

  /** All snapshot versions present on disk (published or orphaned). */
  def versions(): Seq[Long] =
    if (!Files.exists(rootPath)) Nil
    else {
      val s = Files.list(rootPath)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .map(_.getFileName.toString)
          .collect { case n if n.startsWith("v=") => n.stripPrefix("v=").toLong }
          .toSeq.sorted
      } finally s.close()
    }

  /** Write `df` as the next snapshot and atomically publish it. Returns the
    * published version. `partitionBy` columns keep partition pruning inside
    * the snapshot directory.
    */
  def commit(
      df: DataFrame,
      partitionBy: Seq[String] = Nil,
      tag: Option[String] = None,
      statsColumns: Seq[String] = Nil,
      bloomColumns: Seq[String] = Nil,
      bloomBits: Int = DefaultBloomBits): Long = {
    // next version from ALL directories on disk, not just the published
    // pointer: a crash between write and publish leaves an orphan v=N dir,
    // and computing next from the pointer alone would collide with it on
    // every subsequent commit (errorifexists) — bricking the table
    val next = (versions() ++ latestVersion()).foldLeft(-1L)(math.max) + 1L
    val writer = df.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(versionDir(next).toString)
    writeManifest(next)
    if (statsColumns.nonEmpty || bloomColumns.nonEmpty)
      writeStats(
        next,
        harvestStats(manifest(next).get, statsColumns.toSet) ++
          harvestBloom(df.sparkSession, manifest(next).get, bloomColumns.toSet, bloomBits))
    tag.foreach(t =>
      Files.write(versionDir(next).resolve("_tag"), t.getBytes(StandardCharsets.UTF_8)))
    // publish: temp file + atomic rename — the one-instruction commit
    publish(next)
    next
  }

  /** Append-only commit: write ONLY `df`'s rows as new files and publish
    * a snapshot whose manifest references them PLUS every file of the
    * previous published snapshot — O(batch) bytes written instead of
    * O(corpus), the move that makes a continuously-growing 100 TB corpus
    * committable per micro-batch (a full [[commit]] would rewrite the
    * whole table every time). The snapshot semantics are unchanged:
    * readers of the new version see previous-rows-plus-batch, readers
    * pinned to an old version see exactly what they resolved, and the
    * pointer swap is the same single atomic rename.
    *
    * Hive-partitioned previous snapshots append too (round-13 ask #2 —
    * partitioning is exactly how a 100 TB table is laid out): the
    * partition keys are derived from the previous manifest's own paths,
    * the batch (which must carry the partition columns as data columns,
    * enforced by the schema contract below) writes under the same
    * `partitionBy`, and the snapshot records its FULL schema — data AND
    * partition columns — in the `_schema` sidecar, because no single
    * hive `basePath` can span version directories: reads re-assemble
    * the snapshot as one per-directory-basePath read per owning version
    * directory, unioned under that recorded schema, so partition column
    * TYPES are pinned by the sidecar instead of re-inferred per read
    * (the first partitioned append pays one inference of the base
    * snapshot for the contract check; everything after reads the
    * sidecar). Partition pruning survives: each branch of the union is
    * an ordinary hive layout under its own basePath.
    *
    * Schema EVOLUTION stays refused on partitioned chains (fail-fast,
    * even with `allowEvolution=true`): widening interacts with the
    * derived partition-key set and with per-directory layouts in ways
    * this store deliberately does not model — rewrite with [[commit]]
    * to evolve a partitioned table. (The explicit decision round-13
    * ask #2 requires; evolving a PARTITION column is thereby refused a
    * fortiori.)
    *
    * Vacuum interaction: an appended snapshot keeps old version
    * directories ALIVE (their files are referenced), so [[vacuum]]
    * deletes a directory only when no retained manifest references it.
    *
    * @param tag opaque idempotence token, readable back via
    *             [[latestTag]] — written INSIDE the version directory
    *             before the pointer swap, so a committed-tag check and
    *             the data it vouches for cannot be observed out of order.
    *             An exactly-once producer (a streaming foreachBatch that
    *             can replay its last batch after a crash) tags each
    *             commit with its batch id and skips when the published
    *             tag already matches.
    */
  def appendCommit(
      df: DataFrame,
      tag: Option[String] = None,
      statsColumns: Seq[String] = Nil,
      bloomColumns: Seq[String] = Nil,
      bloomBits: Int = DefaultBloomBits,
      allowEvolution: Boolean = false): Long = {
    val prevVersion = latestVersion()
    val prev = prevVersion.map(v =>
      manifest(v).getOrElse(throw new IllegalStateException(
        s"appendCommit needs a manifest-bearing previous snapshot under $root " +
          "(pre-manifest snapshots predate the append path — rewrite once with commit())")))
      .getOrElse(Nil)
    // hive partition keys derived from the previous manifest's own paths
    // (empty for unpartitioned chains); the batch writes under the same
    // keys and the snapshot records its full schema — see the scaladoc
    val partKeys = partitionKeysOf(prev)
    // SCHEMA CONTRACT (fail fast, never publish a snapshot that reads
    // wrong): without this check a batch whose schema drifted — a lost
    // column, a retyped column, a silently-added one — would commit
    // fine, and the plain parquet read would then seed its schema from
    // whichever file it lists first: the other files' extra columns
    // VANISH or read as nulls depending on list order. That is silent
    // corruption, the worst failure class a table format can have.
    // Shared columns must keep their exact type; dropping a previous
    // column is always refused (appended files would hole the history);
    // ADDING columns is the one legal evolution and requires the
    // explicit opt-in — the evolved snapshot then records its unified
    // schema in a `_schema` sidecar, and every read of a schema-bearing
    // snapshot goes through spark.read.schema(...), which fills the
    // column with NULL for pre-evolution files deterministically.
    val evolved: Option[org.apache.spark.sql.types.StructType] =
      prevVersion.flatMap { pv =>
        val prevSchema = schemaOf(df.sparkSession, pv)
        // a fileless previous snapshot (empty commit) contracts nothing
        if (prevSchema.fields.isEmpty) None
        else {
        // catalogString, not DataType equality: nullability (top-level
        // and NESTED — ArrayType.containsNull, struct field nullability)
        // flips freely across parquet round-trips and query lineages,
        // and is not a type change; catalogString renders the type
        // without any nullability, which is exactly the contract here
        val prevByName = prevSchema.fields.map(f => f.name -> f.dataType.catalogString).toMap
        val batchByName = df.schema.fields.map(f => f.name -> f.dataType.catalogString).toMap
        val missing = prevByName.keySet -- batchByName.keySet
        if (missing.nonEmpty) throw new IllegalArgumentException(
          s"appendCommit batch is missing previous snapshot column(s) " +
            s"${missing.toSeq.sorted.mkString(", ")} under $root — an append may " +
            "ADD columns (allowEvolution=true), never drop them")
        val retyped = prevByName.keySet.intersect(batchByName.keySet)
          .filter(c => prevByName(c) != batchByName(c))
        if (retyped.nonEmpty) throw new IllegalArgumentException(
          s"appendCommit batch retypes column(s) " +
            retyped.toSeq.sorted.map(c => s"$c: ${prevByName(c)} -> ${batchByName(c)}")
              .mkString(", ") + s" under $root — types are immutable across appends")
        val added = batchByName.keySet -- prevByName.keySet
        if (added.nonEmpty && partKeys.nonEmpty) throw new IllegalArgumentException(
          s"appendCommit batch adds column(s) ${added.toSeq.sorted.mkString(", ")} to a " +
            s"hive-partitioned chain under $root — schema evolution is refused on " +
            "partitioned chains (rewrite with commit() to evolve); partition columns " +
            "can therefore never evolve either")
        if (added.nonEmpty && !allowEvolution) throw new IllegalArgumentException(
          s"appendCommit batch adds column(s) ${added.toSeq.sorted.mkString(", ")} " +
            s"under $root — pass allowEvolution=true to widen the table schema")
        // carry a _schema forward once the chain has ever evolved — and
        // ALWAYS on partitioned chains, whose cross-directory reads need
        // the recorded FULL schema (data + partition columns) to pin
        // partition column types across per-directory basePath reads
        if (added.nonEmpty || partKeys.nonEmpty || Files.exists(schemaPath(pv)))
          Some(df.schema)
        else None
        }
      }
    val next = (versions() ++ latestVersion()).foldLeft(-1L)(math.max) + 1L
    val appendWriter = df.write.mode("errorifexists")
    (if (partKeys.nonEmpty) appendWriter.partitionBy(partKeys: _*) else appendWriter)
      .parquet(versionDir(next).toString)
    writeManifest(next, carried = prev)
    evolved.foreach(s => writeSchema(next, s))
    if (statsColumns.nonEmpty || bloomColumns.nonEmpty) {
      // O(batch) stats work, like the data write itself: new files'
      // footers are harvested, carried files' rows COPY from the
      // previous _stats (keys are root-relative, so they stay valid
      // across version directories; a carried file with no previous
      // stats row simply stays unprunable — never silently skipped).
      // EVOLUTION INTERACTION (round-13 ask #4): when the widened
      // batch's ADDED column is itself in statsColumns/bloomColumns,
      // only the NEW files get rows for it — pre-evolution files have
      // none (their footers never saw the column; they read as
      // all-NULL) and therefore fall under pruneBy's no-stats-row
      // default: KEPT. A prune on an added column can thus never drop
      // a pre-evolution file, which is required for correctness — its
      // rows surface with NULL in that column, and NULL never matches
      // a range/point predicate, but IS NULL / downstream consumers
      // still need the rows present (spec-pinned).
      val ownFiles = manifest(next).get.filterNot(prev.toSet)
      val carriedStats = prevVersion.map(readStatsLines).getOrElse(Nil)
      writeStats(
        next,
        carriedStats ++ harvestStats(ownFiles, statsColumns.toSet) ++
          harvestBloom(df.sparkSession, ownFiles, bloomColumns.toSet, bloomBits))
    }
    tag.foreach(t =>
      Files.write(versionDir(next).resolve("_tag"), t.getBytes(StandardCharsets.UTF_8)))
    publish(next)
    next
  }

  /** Targeted row deletion — the right-to-be-forgotten commit every
    * data-retention pipeline eventually owes. File-granular, not
    * table-granular: one scan finds WHICH data files contain matching
    * rows, only those files rewrite (minus the victims) into the new
    * version directory, and every untouched file is carried into the
    * new snapshot by manifest reference — zero read, write, or copy
    * cost for the (at 100 TB, overwhelming) majority of the table that
    * never held the victim's rows. Old snapshots still serve the
    * pre-delete data (time travel is the audit trail); reclaiming the
    * deleted bytes themselves is [[vacuum]]'s job once retention allows
    * — a compliance deadline means "commit the delete now, vacuum by
    * day N".
    *
    * Rows where `cond` evaluates NULL are KEPT — a delete predicate
    * must be provably true to destroy data. A predicate matching
    * nothing is a no-op: the published version is returned unchanged,
    * no empty commit. Hive-partitioned snapshots delete too (round-13
    * ask #2): the predicate may reference partition columns (restored
    * by the per-directory reads), hit files rewrite under the SAME
    * partition keys, and the new snapshot records its full schema so
    * the cross-directory carried read stays type-stable — the same
    * contract as a partitioned [[appendCommit]].
    */
  def deleteWhere(spark: SparkSession, cond: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{coalesce, input_file_name, lit, not}
    val v = latestVersion().getOrElse(
      throw new IllegalStateException(s"deleteWhere on a never-committed table at $root"))
    val files = manifest(v).getOrElse(throw new IllegalStateException(
      s"deleteWhere needs a manifest-bearing snapshot under $root " +
        "(pre-manifest snapshots predate the targeted-delete path — rewrite once with commit())"))
    val partKeys = partitionKeysOf(files)
    def canon(p: String): String =
      try Paths.get(new java.net.URI(p)).toString catch { case _: Exception => p }
    // schema-aware reads (readFiles): on an EVOLVED snapshot a plain
    // multi-file read seeds its schema from an arbitrary file — the
    // delete predicate could then reference a vanished column, and the
    // rewrite would silently write files missing it; the unified-schema
    // read fills pre-evolution files' added columns with NULL and the
    // rewrite re-materializes them, keeping the chain homogeneous-izing
    val full = readFiles(spark, v, files)
    val hit = full
      .filter(cond)
      .select(input_file_name().as("f")).distinct()
      .collect().map(r => canon(r.getString(0))).toSet // bounded by |files|
    if (hit.isEmpty) return v
    val (rewrite, carry) = files.partition(f => hit.contains(canon(f)))
    val next = (versions() ++ latestVersion()).foldLeft(-1L)(math.max) + 1L
    val delWriter = readFiles(spark, v, rewrite)
      .filter(not(coalesce(cond, lit(false))))
      .write.mode("errorifexists")
    (if (partKeys.nonEmpty) delWriter.partitionBy(partKeys: _*) else delWriter)
      .parquet(versionDir(next).toString)
    writeManifest(next, carried = carry)
    // evolution carries forward; a partitioned chain that never recorded
    // one (a plain partitioned commit) records its full read schema NOW —
    // the rewritten snapshot spans version directories from here on
    readSchema(v).orElse(if (partKeys.nonEmpty) Some(full.schema) else None)
      .foreach(s => writeSchema(next, s))
    propagateStats(spark, next, v, carry)
    publish(next)
    next
  }

  /** Small-file compaction — the maintenance commit every appendCommit
    * chain eventually owes. Per-micro-batch appends leave one file per
    * batch, and a reader of the head snapshot pays open + footer +
    * seek PER FILE — at 100 TB the small-file tax dwarfs the data
    * bytes (a day of 30-second micro-batches is ~3k files; a year is
    * a million). This pass rewrites every data file smaller than
    * `smallBytes` into ~`targetBytes`-sized files and carries every
    * file already at weight into the new snapshot by manifest
    * reference — the same file-granular economics as [[deleteWhere]]:
    * zero read/write/copy for the bulk of a mature table, cost
    * proportional to the fragmented tail. Content is bag-identical by
    * construction (rows are only re-binned between files), and the
    * rewrite is a `coalesce`, never a shuffle — compaction at scale is
    * IO-bound and must not pay a corpus exchange on top.
    *
    * Fewer than two qualifying files → no-op: the published version is
    * returned unchanged (merging one file with nothing buys nothing —
    * same no-empty-commit contract as deleteWhere's no-match path).
    * Old snapshots keep referencing the small files (time travel
    * unaffected); [[vacuum]] reclaims them once no retained snapshot
    * does. Hive-partitioned snapshots compact too (round-13 ask #2):
    * the rewrite re-bins under the SAME partition keys (still a
    * coalesce — each output task writes one file per partition value it
    * holds) and the snapshot records its full schema for the
    * cross-directory carried read, the partitioned-appendCommit
    * contract.
    */
  def compactFiles(
      spark: SparkSession,
      smallBytes: Long = 32L << 20,
      targetBytes: Long = 128L << 20): Long = {
    require(smallBytes > 0 && targetBytes > 0, "byte thresholds must be positive")
    val v = latestVersion().getOrElse(
      throw new IllegalStateException(s"compactFiles on a never-committed table at $root"))
    val files = manifest(v).getOrElse(throw new IllegalStateException(
      s"compactFiles needs a manifest-bearing snapshot under $root " +
        "(pre-manifest snapshots predate the maintenance path — rewrite once with commit())"))
    val partKeys = partitionKeysOf(files)
    def canon(p: String): String =
      try Paths.get(new java.net.URI(p)).toString catch { case _: Exception => p }
    // File.length() returns 0 for a missing entry, which would silently
    // classify a vanished file as "small" and feed it to the rewrite —
    // the later parquet read fails, but pointing at the READ instead of
    // the real problem. A manifest referencing a missing file is table
    // corruption (a vacuum raced this snapshot, or external deletion):
    // name it loudly here.
    val missing = files.filterNot(f => Files.exists(Paths.get(canon(f))))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"snapshot v=$v manifest references missing file(s) under $root — " +
          s"table is corrupt (vacuumed under a reader, or externally deleted): " +
          missing.take(3).mkString(", ") +
          (if (missing.size > 3) s" (+${missing.size - 3} more)" else ""))
    val sized = files.map(f => f -> new java.io.File(canon(f)).length())
    val (small, carry) = sized.partition(_._2 < smallBytes)
    if (small.size < 2) return v
    val next = (versions() ++ latestVersion()).foldLeft(-1L)(math.max) + 1L
    // bin count from ON-DISK bytes (what the reader's open/seek cost is
    // proportional to); coalesce concatenates input partitions without
    // an exchange, so each output file is a pure byte-merge of inputs
    val bins = math.max(1L,
      math.ceil(small.map(_._2).sum.toDouble / targetBytes).toLong).toInt
    val smallFrame = readFiles(spark, v, small.map(_._1)) // schema-aware: see deleteWhere
    val cmpWriter = smallFrame.coalesce(bins).write.mode("errorifexists")
    (if (partKeys.nonEmpty) cmpWriter.partitionBy(partKeys: _*) else cmpWriter)
      .parquet(versionDir(next).toString)
    writeManifest(next, carried = carry.map(_._1))
    // evolution carries forward; a partitioned chain records its full
    // read schema from the first maintenance commit on (see deleteWhere)
    // — the schema of the WHOLE snapshot, not the rewritten subset,
    // so partition type inference sees every partition value
    readSchema(v).orElse(
      if (partKeys.nonEmpty) Some(readFiles(spark, v, files).schema) else None)
      .foreach(s => writeSchema(next, s))
    propagateStats(spark, next, v, carry.map(_._1))
    publish(next)
    next
  }

  /** Stats continuity for the maintenance commits: a snapshot produced
    * by [[deleteWhere]]/[[compactFiles]] keeps data skipping ON instead
    * of silently reverting to full scans until the next stats-bearing
    * full commit (the round-12 "maintenance-blind" gap: compaction — the
    * operation run to HELP reads — used to turn pruning off). Carried
    * files keep their previous `_stats` rows verbatim (root-relative
    * keys stay valid across version directories); rewritten output files
    * are re-harvested from their fresh footers over the SAME column set
    * the previous sidecar tracked — the sidecar itself is the durable
    * record of which columns the table's committer opted into. A
    * previous snapshot with no sidecar propagates nothing (stats were
    * never requested). O(rewritten files) footer reads, in keeping with
    * the maintenance paths' file-granular economics.
    */
  private def propagateStats(
      spark: SparkSession, next: Long, prevV: Long, carriedAbs: Seq[String]): Unit = {
    val prevLines = readStatsLines(prevV)
    if (prevLines.nonEmpty) {
      // split the column opt-ins by row KIND: min/max rows (l/d/s) re-harvest
      // from footers, bloom rows (b) re-harvest with the previous rows' own
      // bit width — the sidecar is the durable record of both choices
      val tagged = prevLines.flatMap(_.split("\t") match {
        case Array(_, c, t, _, mx) => Some((c, t, mx))
        case _ => None
      })
      val minmaxCols = tagged.collect { case (c, t, _) if t != "b" => c }.toSet
      val bloomCols = tagged.collect { case (c, "b", _) => c }.toSet
      val bloomWidth = tagged.collectFirst { case (_, "b", mx) =>
        scala.util.Try(mx.split(":")(0).toInt).getOrElse(DefaultBloomBits)
      }.getOrElse(DefaultBloomBits)
      val carriedRel = carriedAbs
        .map(a => rootPath.relativize(Paths.get(a)).toString).toSet
      val carriedLines = prevLines.filter(l => l.split("\t").headOption.exists(carriedRel))
      val own = manifest(next).get.filterNot(carriedAbs.toSet)
      writeStats(
        next,
        carriedLines ++ harvestStats(own, minmaxCols) ++
          harvestBloom(spark, own, bloomCols, bloomWidth))
    }
  }

  /** Row-level change feed between two committed snapshots — the CDC
    * read every downstream incremental consumer (index refresher,
    * replica, cache invalidator) wants instead of a full re-sync.
    * Returns the snapshot delta as rows tagged `change` ∈
    * {'insert','delete'}: inserts are rows of `v2` absent from `v1`,
    * deletes the reverse (an update surfaces as delete + insert of the
    * changed row — this store has no row identity beyond the row's
    * values, so that IS the change).
    *
    * Cost shape: `exceptAll` both ways — two shuffles over the two
    * snapshots' files. For APPEND-only version chains the manifest
    * makes it cheaper still: files shared by both manifests cannot
    * contribute deltas, so only the differing files are read
    * (the same file-granular pruning [[deleteWhere]] writes with).
    */
  def diffVersions(spark: SparkSession, v1: Long, v2: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val (m1, m2) = (manifest(v1), manifest(v2))
    val f1 = m1.getOrElse(Seq(versionDir(v1).toString))
    val f2 = m2.getOrElse(Seq(versionDir(v2).toString))
    // drop the files both versions share — carried-by-reference files are
    // path-identical and delta-free — but ONLY when both file sets are
    // manifest-proven: across a manifest/pre-manifest boundary one side is
    // a directory path, and pruning nothing is correct (just unoptimized),
    // whereas the old version-dir-only fallback silently LOST the carried
    // files of the manifest side and reported their rows as deltas
    val shared: Set[String] =
      if (m1.isDefined && m2.isDefined) f1.toSet intersect f2.toSet
      else Set.empty
    val (only1, only2) = (f1.filterNot(shared), f2.filterNot(shared))
    // Reading EXPLICIT file paths skips hive partition inference, so a
    // partitioned snapshot compared that way would drop its partition
    // columns and rows differing only in the partition value would compare
    // equal — wrong CDC with no error. readSubset restores partition
    // columns on every layout: own-dir manifests read under one basePath,
    // partitioned CROSS-directory chains (partitioned appends/maintenance)
    // read per owning directory under the recorded full schema, unioned.
    // Across an evolution boundary BOTH sides read through the newer
    // side's unified schema (falling back to the older side's): a
    // pre-evolution row then carries NULL in the added column on both
    // sides, so rows equal in their original columns produce no
    // spurious deltas, and genuinely-new rows diff with the column
    // attached. Without this the two sides' column sets differ and the
    // exceptAll is a hard error.
    // FALLBACK GUARD (round-13 ADVICE): v1's _schema may only stand in
    // for a schema-less v2 when it COVERS v2's actual file schema — a
    // LATER full commit over an evolved v1 carries no _schema, and
    // reading it through the OLDER schema would silently project away
    // columns that exist only in v2 (rows differing only there would
    // produce no delta — worse than the loud column-set mismatch this
    // fallback replaced). Cover check = one footer read of v2's first
    // file: every v2 field present in v1's schema under the same
    // catalogString type; anything else reads plain and lets the
    // mismatch surface in exceptAll.
    val unified = readSchema(v2).orElse(readSchema(v1).filter { s1 =>
      f2.headOption.exists { f =>
        scala.util.Try(spark.read.parquet(f).schema).toOption.exists(_.fields.forall(fld =>
          s1.fields.exists(g =>
            g.name == fld.name && g.dataType.catalogString == fld.dataType.catalogString)))
      }
    })
    // each side falls back to its OWN recorded schema when no unified
    // schema stands: an evolved side must never degrade to a plain
    // mixed-schema read (the arbitrary-seed corruption class) just
    // because the OTHER side failed the cover check — the column-set
    // mismatch then surfaces loudly in exceptAll, which is the point
    def schemaFor(v: Long) = unified.orElse(readSchema(v))
    def readSide(v: Long, fs: Seq[String]): Option[DataFrame] = {
      val dir = versionDir(v).toString
      if (fs.isEmpty) None
      else if (fs == Seq(dir))
        Some(schemaFor(v).map(spark.read.schema).getOrElse(spark.read).parquet(dir))
      else Some(readSubset(spark, schemaFor(v), fs))
    }
    (readSide(v2, only2), readSide(v1, only1)) match {
      case (None, None) =>
        // identical manifests — an empty frame in the snapshot's schema
        val base = readVersion(spark, v2)
        base.filter(lit(false)).withColumn("change", lit(""))
      case (ins, del) =>
        val inserts = (ins, del) match {
          case (Some(a), Some(b)) => Some(a.exceptAll(b))
          case (Some(a), None)    => Some(a)
          case _                  => None
        }
        val deletes = (del, ins) match {
          case (Some(a), Some(b)) => Some(a.exceptAll(b))
          case (Some(a), None)    => Some(a)
          case _                  => None
        }
        val tagged = Seq(
          inserts.map(_.withColumn("change", lit("insert"))),
          deletes.map(_.withColumn("change", lit("delete")))).flatten
        tagged.reduce(_ unionByName _)
    }
  }

  /** Hive partition keys of a file set, parsed from the path segments
    * between each file's owning version directory and its file name
    * (`v=3/lang=en/part-….parquet` → `lang`). Every file must carry the
    * SAME key sequence (or none): mixed layouts inside one snapshot are
    * table corruption and are named loudly rather than read wrong.
    */
  private def partitionKeysOf(files: Seq[String]): Seq[String] = {
    val keySeqs = files.map { abs =>
      val rel = rootPath.relativize(Paths.get(abs)).toString
      rel.split('/').drop(1).dropRight(1).toSeq.map { seg =>
        val i = seg.indexOf('=')
        require(i > 0,
          s"non-hive intermediate directory '$seg' in manifest path '$rel' under $root")
        seg.take(i)
      }
    }.distinct
    require(
      keySeqs.size <= 1,
      s"mixed partition layouts in one snapshot under $root: " +
        keySeqs.map(_.mkString("/")).mkString(" vs "))
    keySeqs.headOption.getOrElse(Nil)
  }

  /** The version directory a manifest file belongs to — its own
    * snapshot's for fresh files, an older snapshot's for carried ones.
    */
  private def owningVersionDir(abs: String): String =
    rootPath.resolve(
      rootPath.relativize(Paths.get(abs)).toString.split('/').head).toString

  /** The idempotence tag of the published snapshot, if its committer set
    * one — see [[appendCommit]]'s `tag` parameter.
    */
  def latestTag(): Option[String] = latestVersion().flatMap(tagOf)

  /** ALL idempotence tags among retained versions. A replay guard must
    * check this set, not just [[latestTag]]: any interleaved commit by
    * another writer (the nightly full-rewrite pass, a compaction) takes
    * over the head and would hide the replayed batch's tag. Vacuum drops
    * a version's tag with its directory — replay detection therefore
    * assumes the replayed commit is within the retention window, which a
    * promptly-restarted stream always is.
    */
  def committedTags(): Set[String] =
    (versions() ++ latestVersion()).distinct.flatMap(tagOf).toSet

  /** Incremental view of [[committedTags]] for per-batch replay guards:
    * a long-running stream calling [[committedTags]] every micro-batch
    * re-reads a `_tag` file from EVERY retained version directory, an
    * I/O cost that grows with retained versions until vacuum runs. The
    * cursor reads each version's tag once and afterwards only the
    * versions that appeared since the last call — O(new commits) file
    * reads per batch. Tags of since-vacuumed versions stay cached; for a
    * replay guard that is strictly safer than the fresh scan (a replayed
    * batch whose commit was already vacuumed is still skipped, not
    * double-committed).
    */
  final class TagCursor {
    private var seenVersions = Set.empty[Long]
    private var cached = Set.empty[String]
    def committedTags(): Set[String] = {
      val fresh = (versions() ++ latestVersion()).distinct.filterNot(seenVersions)
      cached ++= fresh.flatMap(tagOf)
      seenVersions ++= fresh
      cached
    }
  }

  def tagCursor(): TagCursor = new TagCursor

  private def tagOf(v: Long): Option[String] = {
    val p = versionDir(v).resolve("_tag")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    else None
  }

  /** Atomic pointer swap publishing version `v`. */
  private def publish(v: Long): Unit = {
    // History-support markers FIRST (round-16, closing the round-15
    // ADVICE residual): `_history_base` records the first version this
    // table published WITH history support, and the empty `_history` is
    // created before any `_commit_ts` exists that could orphan. Order
    // matters — base, then history, then ts: a crash after base alone
    // leaves publishedHistory()=None (cap-at-head guard, safe); once
    // `_history` exists, every version >= base must prove membership, so
    // a first-commit orphan (crash between the ts write below and the
    // swap) can never ride the "below first record = legacy" clause —
    // the exact hole when base was inferred from h.min (0 < h.min=1
    // after the next successful commit). Tables upgraded mid-life get
    // base = their first post-upgrade version; versions below keep
    // legacy semantics, as before.
    if (!Files.exists(historyPath)) {
      if (!Files.exists(historyBasePath))
        Files.write(historyBasePath, v.toString.getBytes(StandardCharsets.UTF_8))
      Files.write(historyPath, Array.emptyByteArray,
        java.nio.file.StandardOpenOption.CREATE)
    }
    // publish wall time recorded INSIDE the version directory before the
    // pointer swap (the _tag ordering discipline), so timestamp time
    // travel ([[readAsOf]]) never observes a version without its clock.
    // An explicit file, not directory mtime: mtimes do not survive
    // copies/restores and some filesystems coarsen them.
    Files.write(
      versionDir(v).resolve("_commit_ts"),
      System.currentTimeMillis().toString.getBytes(StandardCharsets.UTF_8))
    val tmp = rootPath.resolve(s"_latest.tmp.$v")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // Durable PUBLICATION record, appended strictly AFTER the swap (the
    // round-14 ADVICE medium): `_commit_ts` alone cannot distinguish a
    // published version from an orphan of a crash BETWEEN the ts write
    // and the swap — once a later commit moves the head past the orphan,
    // the "cap at latestVersion" guard no longer excludes it and
    // timestamp time travel would serve a snapshot that was never the
    // table's published state. A version appears in `_history` only if
    // its swap completed, so [[readAsOf]] resolving from this record can
    // never serve an orphan. The inverse crash window (swap done, append
    // lost) degrades safely: that version is merely skipped by TIMESTAMP
    // travel — the same documented class as pre-`_commit_ts` snapshots —
    // while version-pinned and latest reads see it normally.
    Files.write(
      historyPath, s"$v\n".getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  private def historyPath: Path = rootPath.resolve("_history")
  private def historyBasePath: Path = rootPath.resolve("_history_base")

  /** Versions with a post-swap publication record, or None for a table
    * created before `_history` existed (legacy: fall back to the
    * cap-at-head guard alone). Robust to a torn write (round-15 ADVICE
    * low): an unparseable line is dropped rather than failing every
    * readAsOf, and an empty parse degrades to None — a table whose
    * history proves nothing keeps the cap-at-head guard instead of
    * rejecting genuinely published snapshots. (With `_history_base`
    * present, [[readAsOf]] still refuses versions at/above the base that
    * lack a record, so the degradation never re-opens the orphan hole
    * for history-era versions.)
    */
  private def publishedHistory(): Option[Set[Long]] =
    if (!Files.exists(historyPath)) None
    else {
      val parsed =
        new String(Files.readAllBytes(historyPath), StandardCharsets.UTF_8)
          .linesIterator.map(_.trim).filter(_.nonEmpty)
          .flatMap(l => scala.util.Try(l.toLong).toOption).toSet
      if (parsed.isEmpty && historyBase().isEmpty) None else Some(parsed)
    }

  /** First version published with `_history` support (see [[publish]]);
    * None for tables that predate the base marker.
    */
  private def historyBase(): Option[Long] =
    if (!Files.exists(historyBasePath)) None
    else scala.util.Try(
      new String(Files.readAllBytes(historyBasePath), StandardCharsets.UTF_8)
        .trim.toLong).toOption

  /** Publish wall time of snapshot `v` (epoch millis), when recorded —
    * snapshots published before the `_commit_ts` sidecar existed have
    * none and are excluded from timestamp time travel.
    */
  def commitTimestamp(v: Long): Option[Long] = {
    val p = versionDir(v).resolve("_commit_ts")
    if (!Files.exists(p)) None
    else scala.util.Try(
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong).toOption
  }

  /** Timestamp time travel: read the newest snapshot published at or
    * before `ts` — "the table as the 03:00 report saw it", Delta's
    * `timestampAsOf` / Iceberg's `as-of-timestamp`. Resolution is the
    * publish wall clock (single-writer contract, so publish order and
    * version order agree); errors when no snapshot is that old, like
    * reading a never-committed table.
    *
    * RETENTION CAVEAT (same as Delta's): the resolution is over RETAINED
    * snapshots — if [[vacuum]] reclaimed the version that was live at
    * `ts`, this returns the nearest OLDER retained snapshot, not an
    * error (the reclaimed directory is gone; there is nothing to detect
    * it by). Time-travel consumers own the retention window: only
    * vacuum past the oldest timestamp any report still replays.
    *
    * ORPHAN GUARD (round-13 ADVICE, completed round-15 per the round-14
    * ADVICE medium): `_commit_ts` is written BEFORE the pointer swap, so
    * a crash between the two leaves an orphan version directory bearing
    * a commit timestamp that was never published. Capping candidates at
    * [[latestVersion]] closes only the orphan-ABOVE-head case; once a
    * LATER commit succeeds (next version is computed from all on-disk
    * dirs), the orphan sits below the new head and the cap no longer
    * excludes it. Candidates are therefore resolved from the `_history`
    * publication record — appended strictly AFTER each pointer swap, so
    * membership proves the version really was the published state —
    * with `_history_base` (round 16) pinning where history support
    * began: below the base is legacy-published by definition, at/above
    * it membership is required, so even a FIRST-commit orphan (crash
    * before the first swap, then a later successful commit) cannot ride
    * a "below the oldest record" inference. Residual exposure, stated
    * honestly: tables predating `_history` entirely (no file) keep only
    * the cap-at-head guard, and a table upgraded mid-life cannot prove
    * anything about versions below its base.
    */
  def readAsOf(spark: SparkSession, ts: java.time.Instant): DataFrame = {
    val cutoff = ts.toEpochMilli
    val published = latestVersion().getOrElse(throw new IllegalStateException(
      s"no published version under $root"))
    val history = publishedHistory()
    val base = historyBase()
    def provenPublished(v: Long): Boolean = history match {
      case None => true // legacy table: cap-at-head below is the only guard
      // versions below the recorded base predate history support on this
      // table (legacy-published by definition); at/above it, membership is
      // the proof. Without a base marker (a table whose _history predates
      // the marker), fall back to inferring the base from the oldest
      // record — which cannot distinguish a first-commit orphan below it
      // (the round-15 ADVICE residual; new tables always carry the base).
      case Some(h) => h.contains(v) || base.fold(h.nonEmpty && v < h.min)(v < _)
    }
    val candidates = versions().filter(v => v <= published && provenPublished(v))
      .flatMap(v => commitTimestamp(v).filter(_ <= cutoff).map(_ => v))
    if (candidates.isEmpty) throw new IllegalStateException(
      s"no snapshot published at or before $ts under $root")
    readVersion(spark, candidates.max)
  }

  private def manifestPath(v: Long): Path = versionDir(v).resolve("_manifest")

  // -------------------------------------------------------------------
  // Schema sidecar (evolution support): a snapshot whose manifest mixes
  // pre- and post-evolution files records its UNIFIED schema in a
  // `_schema` file (StructType JSON — lossless round-trip), written
  // before publish like every other sidecar. Readers of a
  // schema-bearing snapshot pass it as the explicit read schema:
  // Spark's parquet source fills columns absent from a file with NULL
  // deterministically, where a schema-less multi-file read would seed
  // from an arbitrary file and silently drop the others' extra columns.
  // Homogeneous snapshots carry no sidecar and read exactly as before.
  // -------------------------------------------------------------------

  private def schemaPath(v: Long): Path = versionDir(v).resolve("_schema")

  /** Recorded schemas are forced fully NULLABLE (top-level and nested):
    * pre-evolution files read the added columns as all-NULL, so a
    * non-null marking inherited from the evolving batch's lineage would
    * hand the reader a promise the data breaks. Nullability was never
    * part of the append contract anyway (see the catalogString compare).
    */
  private def allNullable(
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = allNullable(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(allNullable(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(allNullable(m.keyType), allNullable(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  private def writeSchema(v: Long, s: org.apache.spark.sql.types.StructType): Unit =
    Files.write(
      schemaPath(v),
      allNullable(s).asInstanceOf[org.apache.spark.sql.types.StructType]
        .json.getBytes(StandardCharsets.UTF_8))

  private def readSchema(v: Long): Option[org.apache.spark.sql.types.StructType] =
    if (!Files.exists(schemaPath(v))) None
    else Some(org.apache.spark.sql.types.DataType
      .fromJson(new String(Files.readAllBytes(schemaPath(v)), StandardCharsets.UTF_8))
      .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** The schema snapshot `v` serves: its `_schema` sidecar when present,
    * else the (homogeneous) schema of its first data file's footer —
    * except hive-partitioned snapshots, whose partition columns live in
    * paths, not footers: those pay one inferred read (the price of the
    * FIRST partitioned append's contract check; every later snapshot in
    * the chain carries `_schema`).
    */
  private def schemaOf(spark: SparkSession, v: Long): org.apache.spark.sql.types.StructType =
    readSchema(v).getOrElse {
      val files = manifest(v).getOrElse(Nil)
      if (files.isEmpty) new org.apache.spark.sql.types.StructType()
      // readSubset, NOT readVersion: the indexed read path calls back
      // into schemaOf for its relation schema — going through
      // readVersion here would recurse
      else if (partitionKeysOf(files).nonEmpty) readSubset(spark, None, files).schema
      else spark.read.parquet(files.head).schema
    }

  /** Per-snapshot file manifest, written BEFORE the pointer swap: the
    * exact relative paths of the snapshot's data files, one per line.
    * Readers resolve files from the manifest instead of LISTing the
    * directory, so a fresh commit is readable even on object stores with
    * eventually-consistent listings (the writer enumerates its own files
    * while its view is consistent; readers only need GET on the small
    * manifest) — and stray files that leak into the directory are never
    * silently read. The same manifest-over-listing move Iceberg/Delta
    * make; `_manifest` starts with '_' so Spark's parquet reader ignores
    * it as a metadata file on the fallback listing path.
    */
  /** Manifest entries are either relative to the snapshot's own directory
    * (files this version wrote) or, prefixed `~/`, relative to the table
    * ROOT (files carried over from an earlier snapshot by
    * [[appendCommit]] — the prefix keeps the two namespaces unambiguous,
    * since a dir-relative hive path like `branch=x/part.parquet` also
    * contains slashes).
    */
  private def writeManifest(v: Long, carried: Seq[String] = Nil): Unit = {
    val dir = versionDir(v)
    val s = Files.walk(dir)
    val rel =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
          .map(p => dir.relativize(p).toString)
          .toSeq.sorted
      } finally s.close()
    val carriedRel = carried.map(abs => "~/" + rootPath.relativize(Paths.get(abs)).toString).sorted
    Files.write(
      manifestPath(v),
      (carriedRel ++ rel).mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  /** Data-file paths of one snapshot per its manifest (pre-manifest
    * snapshots return None and fall back to directory listing).
    */
  def manifest(v: Long): Option[Seq[String]] =
    if (!Files.exists(manifestPath(v))) None
    else Some(
      new String(Files.readAllBytes(manifestPath(v)), StandardCharsets.UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty)
        .map {
          case rootRel if rootRel.startsWith("~/") =>
            rootPath.resolve(rootRel.stripPrefix("~/")).toString
          case rel => versionDir(v).resolve(rel).toString
        })

  // -------------------------------------------------------------------
  // File-level data skipping: per-file column min/max harvested from the
  // parquet FOOTERS at commit time (no data scan — the footer already
  // carries per-row-group statistics; this folds them per file) and
  // stored in a `_stats` sidecar next to the manifest. A range read then
  // drops whole files whose [min, max] cannot intersect the predicate —
  // the scan lever that matters most at 100 TB: partition pruning cuts
  // directories, z-order cuts row groups INSIDE a file (x64), this cuts
  // FILES through the snapshot manifest, exactly Delta/Iceberg's
  // min/max data skipping. Pruning is an OPTIMIZATION, never semantics:
  // the exact filter always applies to the surviving files, a file with
  // no stats row is always kept, and a range predicate never matches
  // NULL — so all-null chunks (which carry no min/max) cannot cause a
  // wrong skip. Stats rows are keyed ROOT-relative, so appendCommit
  // carries them across version directories at O(batch) cost, and the
  // maintenance commits (deleteWhere/compactFiles) stay stats-bearing:
  // carried files keep their rows, rewritten files re-harvest
  // (propagateStats). Covered types: integral `l` (incl. DATE = INT32
  // days and TIMESTAMP = INT64 micros), floating `d` (NaN-guarded),
  // string `s` (unsigned UTF-8 order, whole-value bounds only), and the
  // opt-in per-file Bloom rows `b` for point predicates (below).
  // -------------------------------------------------------------------

  private def statsPath(v: Long): Path = versionDir(v).resolve("_stats")

  /** One stats row per (file, column): root-relative path, column name,
    * type tag (l = integral, d = floating, compared exactly / in double),
    * URL-encoded min and max. Columns whose parquet type has no ordered
    * stats (or files that never wrote a non-null value) emit no row.
    *
    * Plus, independently of the ordered-stats rows, one NULL-COUNT row
    * (tag `n`: min field = the file's null count for the column, max
    * field = the file's row count) whenever every chunk's footer has
    * its null count set — the rung that serves `IS NULL` / `IS NOT
    * NULL` predicates, which min/max cannot (an all-null file has no
    * ordered bounds at all, so before this rung it was maximally
    * UNPRUNABLE exactly when it provably holds nothing a non-null
    * predicate wants). Catalyst infers IsNotNull for every filtered
    * column, so this rung also composes silently under ordinary
    * filters. Same degradation contract: no row (or a corrupt one) →
    * keep; readers that predate the tag keep via the permits default.
    */
  private def harvestStats(files: Seq[String], cols: Set[String]): Seq[String] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    // a bare Configuration is DELIBERATE here, unlike the Avro source's
    // broadcast-driver-conf fix: this class is java.nio/POSIX-scoped end
    // to end (see the class doc's object-store caveat — the pointer swap
    // itself needs a catalog CAS off POSIX), footer reads run on the
    // DRIVER, and the paths are the table's own local files; when the
    // table grows an object-store backend, the conf plumbing moves with
    // the rest of the IO layer, not before
    val conf = new org.apache.hadoop.conf.Configuration()
    def enc(s: String): String =
      java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
    files.flatMap { abs =>
      val rel = rootPath.relativize(Paths.get(abs)).toString
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(abs), conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val fileRows = blocks.map(_.getRowCount).sum
        cols.toSeq.sorted.flatMap { c =>
          val chunks = blocks.flatMap(_.getColumns.asScala)
            .filter(ch => ch.getPath.toDotString == c)
          val stats = chunks.map(_.getStatistics)
          // the null-count row stands on its own: it exists even (and
          // especially) for all-null files, which carry no ordered bounds
          val nullRow =
            if (chunks.isEmpty || stats.exists(s => s == null || !s.isNumNullsSet)) None
            else Some(
              s"$rel\t$c\tn\t${enc(stats.map(_.getNumNulls).sum.toString)}\t${enc(fileRows.toString)}")
          val boundsRow =
          if (chunks.isEmpty || stats.exists(s => s == null || !s.hasNonNullValue)) None
          else chunks.head.getPrimitiveType.getPrimitiveTypeName match {
            case INT32 | INT64 =>
              val mn = stats.map(_.genericGetMin.asInstanceOf[java.lang.Number].longValue()).min
              val mx = stats.map(_.genericGetMax.asInstanceOf[java.lang.Number].longValue()).max
              Some(s"$rel\t$c\tl\t${enc(mn.toString)}\t${enc(mx.toString)}")
            case FLOAT | DOUBLE =>
              val mn = stats.map(_.genericGetMin.asInstanceOf[java.lang.Number].doubleValue()).min
              val mx = stats.map(_.genericGetMax.asInstanceOf[java.lang.Number].doubleValue()).max
              // NaN guard (Iceberg's nan_value_counts hazard): parquet-mr's
              // double comparator orders NaN greatest, so a chunk containing
              // NaN can surface min or max of NaN — and pruneFiles would then
              // evaluate `NaN >= lo` as false and WRONGLY skip a file whose
              // non-NaN rows are in range. A NaN bound means the footer
              // cannot bound the file: emit no row, keep it unprunable.
              // Signed zero needs no such guard: the stored bounds are
              // compared with IEEE >=/<= in pruneFiles, where -0.0 == +0.0,
              // so a file whose max harvested as -0.0 still survives a
              // lo = 0 predicate.
              if (mn.isNaN || mx.isNaN) None
              else Some(s"$rel\t$c\td\t${enc(mn.toString)}\t${enc(mx.toString)}")
            case BINARY =>
              // String columns (tag `s`) — the most common real-world
              // predicate class (categories, ids, ISO dates-as-strings).
              // Ordering discipline: these stats come from files THIS
              // table wrote (Spark/parquet-mr), whose string sort order
              // is UNSIGNED byte-wise over UTF-8 — identical to Spark's
              // UTF8String comparison — so footer bounds and the engine's
              // own `>=`/`<=` agree and a skip can never drop a matching
              // row. Truncation discipline: parquet-mr chunk statistics
              // are whole values or ABSENT (dropped above the 4 KB stats
              // cap), never silently truncated, so a present bound is the
              // true bound; belt-and-braces, bounds longer than 192 bytes
              // (or not UTF-8-round-trippable) emit no row — the file
              // just stays unprunable, and the sidecar stays small.
              val mnB = stats.map(_.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary])
                .min(binaryOrd).getBytes
              val mxB = stats.map(_.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary])
                .max(binaryOrd).getBytes
              def utf8Whole(b: Array[Byte]): Option[String] = {
                val s = new String(b, StandardCharsets.UTF_8)
                if (b.length <= 192 && java.util.Arrays.equals(s.getBytes(StandardCharsets.UTF_8), b))
                  Some(s)
                else None
              }
              for { mn <- utf8Whole(mnB); mx <- utf8Whole(mxB) }
                yield s"$rel\t$c\ts\t${enc(mn)}\t${enc(mx)}"
            case _ => None // int96/fixed/boolean ranges: kept unprunable
          }
          nullRow.toSeq ++ boundsRow.toSeq
        }
      } finally reader.close()
    }
  }

  /** Unsigned byte-wise UTF-8 comparison — the ONE ordering shared by
    * parquet's string statistics and Spark's UTF8String comparisons, so
    * footer bounds and the engine's exact filter can never disagree.
    * (Java's String.compareTo orders UTF-16 code units, which diverges
    * from UTF-8 byte order for supplementary characters — using it here
    * would make pruning silently lossy exactly on emoji/CJK-extension
    * content.)
    */
  private def cmpUtf8(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  /** Unsigned lexicographic order over raw parquet Binary stats values
    * (Binary.compareTo's own ordering went through signed-byte eras in
    * parquet-mr's history — depend on the bytes, not the class).
    */
  private val binaryOrd: Ordering[org.apache.parquet.io.api.Binary] =
    (x, y) => java.util.Arrays.compareUnsigned(x.getBytes, y.getBytes)

  // -------------------------------------------------------------------
  // File-level BLOOM skipping (tag `b`) — the pruning rung min/max
  // cannot supply: a point lookup (`column IN (…)`) on a column the
  // table is NOT laid out by finds every file's [min, max] spanning the
  // whole domain, so the range rung keeps everything. A per-file Bloom
  // filter answers "can this file contain value x?" regardless of
  // layout — Delta's bloom-filter index / Iceberg's puffin blobs,
  // restated through the same `_stats` sidecar. One row per (file,
  // column): base64 bitset in the min field, "bits:k" params in the max
  // field, so the existing parse/degrade discipline applies verbatim
  // (corrupt payload → keep the file; unknown tag in an old reader →
  // keep). False positives cost only IO (file read, exact filter still
  // applies); false negatives are impossible by construction — every
  // value written sets its k bits, and both sides compute positions
  // with the SAME hash (Spark's XXH64, seed 42, LONG input) and the
  // same mod-first arithmetic, so executor harvest and driver probe
  // cannot disagree (mod-first also keeps every +/× far below overflow,
  // which matters under ANSI arithmetic).
  //
  // Harvest cost is one column-pruned distributed scan of the NEW files
  // per commit — deliberately more than the footer-only min/max harvest
  // (a bloom needs the values), which is why it is a separate opt-in.
  // v1 covers integral columns (hashed as longs); the per-file bitset
  // is bits/8 bytes (default 8 KiB), bounded driver state like the
  // manifest itself.
  // -------------------------------------------------------------------

  /** Bloom probe count for rows THIS writer harvests. With the default
    * 2^16 bits, k=7 holds the false-positive rate under 1% up to ~6.5k
    * distinct values per file and degrades gracefully past it (worse
    * pruning, never wrong). Write-side only: the probe side always uses
    * the k RECORDED in the row being probed ([[bloomPositions]]), so
    * rows written under a different k stay correct.
    */
  private val BloomK = 7

  /** One `b` stats row per (new file, column): ONE distributed harvest
    * job for ALL opted-in columns (round-13 ADVICE: the per-column form
    * launched one scan per column, multiplying commit-time cost for
    * multi-column opt-ins). The single column-pruned scan computes, per
    * column, the k Kirsch–Mitzenmacher positions pos_i = (h1 + i·h2)
    * mod bits per value with h1/h2 pre-reduced mod bits, TAGS them into
    * one shared position stream as colIndex·bits + pos (far under Long
    * range at the 2^28 bits cap), folds per-(file, column) position
    * sets map-side (collect_set), and — round-14 ADVICE — converts each
    * set to its Base64 BITSET BYTES executor-side before anything
    * reaches the driver: the collect ships |files| × |cols| rows of
    * ~bits/6 Base64 chars each (bits/8 bytes inflated 4/3), never the
    * boxed-Long position sets (~16 B per position × |cols|), so a wide
    * multi-column opt-in at large bloomBits can no longer multiply peak
    * driver memory. The bitset build is a Scala UDF, deliberately: it
    * runs once per (file, column) AFTER the aggregate — commit-time
    * catalog work over manifest-bounded rows, not a per-value hot path
    * (the per-value math stays in codegen expressions). Integral
    * columns hash as longs (kind tag `l` in the params), string columns
    * as their UTF-8 bytes (kind `s`); other or absent column types emit
    * no row (unprunable, never wrong); a file all-null in one column
    * contributes no positions for that tag, so that (file, column)
    * emits no row — exactly the per-column scan's behavior, and the
    * bitsets are bit-identical to it (same hash, same arithmetic).
    */
  private def harvestBloom(
      spark: SparkSession, files: Seq[String], cols: Set[String], bits: Int): Seq[String] = {
    require(bits > 0 && bits <= (1 << 28), s"bloomBits out of range: $bits")
    if (files.isEmpty || cols.isEmpty) return Nil
    import org.apache.spark.sql.functions._
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    val schema = spark.read.parquet(files: _*).schema
    def enc(s: String): String =
      java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
    val kinds: Seq[(String, String)] = cols.toSeq.sorted.flatMap { c =>
      schema.fields.find(_.name == c).map(_.dataType) match {
        case Some(t) if integral.contains(t) => Some(c -> "l")
        case Some(org.apache.spark.sql.types.StringType) => Some(c -> "s")
        case _ => None
      }
    }
    if (kinds.isEmpty) return Nil
    val m = lit(bits.toLong)
    val posCols = kinds.zipWithIndex.map { case ((c, k), idx) =>
      val v = if (k == "l") col(c).cast("long") else col(c)
      when(v.isNotNull, transform(
        sequence(lit(0L), lit((BloomK - 1).toLong)),
        i => pmod(pmod(xxhash64(v), m) + i * pmod(xxhash64(lit(1L), v), m), m)
          + lit(idx.toLong * bits)))
        .otherwise(array().cast("array<bigint>"))
    }
    val bitsLocal = bits
    val toBitsetB64 = udf { (ps: Seq[Long]) =>
      val bs = new java.util.BitSet(bitsLocal)
      ps.foreach(p => bs.set(p.toInt))
      java.util.Base64.getEncoder.encodeToString(bs.toByteArray)
    }
    spark.read.parquet(files: _*)
      .select(
        input_file_name().as("__f"),
        explode(concat(posCols: _*)).as("__p"))
      .groupBy(col("__f"), expr(s"__p DIV ${bits.toLong}").cast("int").as("__c"))
      .agg(collect_set(pmod(col("__p"), m)).as("__ps"))
      .select(col("__f"), col("__c"), toBitsetB64(col("__ps")).as("__b64"))
      .collect().toSeq
      .flatMap { r =>
        val abs = try Paths.get(new java.net.URI(r.getString(0))).toString
          catch { case _: Exception => r.getString(0) }
        val rel = rootPath.relativize(Paths.get(abs)).toString
        kinds.lift(r.getInt(1)).map { case (c, k) =>
          s"$rel\t$c\tb\t${enc(r.getString(2))}\t${enc(s"$bits:$BloomK:$k")}"
        }
      }
  }

  /** Driver-side mirror of the harvest job's bit positions — the SAME
    * hash (Spark's XXH64Function, seed 42; h2 seeded by hashing the
    * literal 1L first, exactly the two-child xxhash64 column) and the
    * same mod-first arithmetic, so probe and harvest agree bit for bit.
    * Long values hash as LongType, strings as their UTF8String bytes —
    * matching what the executor-side xxhash64 saw for each column kind.
    * `k` is the probe count RECORDED IN THE ROW being probed, never the
    * writer constant: a row written with a different k (a future or
    * foreign writer, or a configurable-k era) probed at this writer's
    * k would test positions its writer never set — a FALSE NEGATIVE,
    * i.e. a wrongly-pruned file, the exact failure class the
    * degrade-to-keep contract exists to prevent (round-13 ADVICE).
    */
  private def bloomPositions(value: Either[Long, String], bits: Int, k: Int): Array[Int] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{LongType, StringType}
    def h(seed: Long): Long = value match {
      case Left(l) => XxHash64Function.hash(l, LongType, seed)
      case Right(s) => XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType, seed)
    }
    val h1 = Math.floorMod(h(42L), bits.toLong)
    val h2 = Math.floorMod(
      h(XxHash64Function.hash(1L, LongType, 42L)), bits.toLong)
    Array.tabulate(k)(i => Math.floorMod(h1 + i.toLong * h2, bits.toLong).toInt)
  }

  /** Bloom membership for the prune walk: true (keep) unless the row
    * parses cleanly — bits AND the row's own probe count k AND its hash
    * kind — the kind matches the probe's, and every probed value
    * misses. Any parse/shape/kind problem (absent, nonpositive, or
    * unparseable k included) degrades to keep — the standing "pruning
    * is an optimization, never semantics" contract.
    */
  private def bloomAdmits(
      payload: String, params: String, values: Seq[Either[Long, String]]): Boolean =
    (for {
      parts <- scala.util.Try(params.split(":")).toOption
      bits <- scala.util.Try(parts(0).toInt).toOption
      if bits > 0
      k <- parts.lift(1).flatMap(s => scala.util.Try(s.toInt).toOption)
      if k > 0
      kind <- parts.lift(2)
      if values.forall(v => (kind == "l") == v.isLeft)
      bytes <- scala.util.Try(java.util.Base64.getDecoder.decode(payload)).toOption
    } yield {
      val bs = java.util.BitSet.valueOf(bytes)
      values.exists(x => bloomPositions(x, bits, k).forall(bs.get))
    }).getOrElse(true)

  private def writeStats(v: Long, lines: Seq[String]): Unit =
    Files.write(statsPath(v), lines.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))

  private def readStatsLines(v: Long): Seq[String] =
    if (!Files.exists(statsPath(v))) Nil
    else new String(Files.readAllBytes(statsPath(v)), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)

  /** The manifest files of snapshot `v` that can hold a row with
    * `column` in [lo, hi], per the `_stats` sidecar — plus the total
    * file count, so callers (and the spec) can SEE the pruning rate. A
    * file without a stats row for `column` is always kept.
    */
  def pruneFiles(v: Long, column: String, lo: Long, hi: Long): (Seq[String], Int) =
    pruneBy(v, column) {
      case ("l", mn, mx) => mx.toLong >= lo && mn.toLong <= hi
      case ("d", mn, mx) => mx.toDouble >= lo && mn.toDouble <= hi
      case _ => true // string-tagged stats can't serve a numeric range
    }

  /** String-range variant of [[pruneFiles]]: keeps the files that can
    * hold `column BETWEEN lo AND hi` under unsigned UTF-8 byte order —
    * the ordering Spark's own string comparison uses, see [[cmpUtf8]].
    */
  def pruneFilesString(v: Long, column: String, lo: String, hi: String): (Seq[String], Int) =
    pruneBy(v, column) {
      case ("s", mn, mx) => cmpUtf8(mx, lo) >= 0 && cmpUtf8(mn, hi) <= 0
      case _ => true // numeric-tagged stats can't serve a string range
    }

  /** Point-set variant of [[pruneFiles]]: keeps the files whose [min,
    * max] admits AT LEAST ONE of `values` — the routing shape (IVF cell
    * probes, shard picks) where the predicate is `column IN (…)` rather
    * than a range. With the table laid out range-partitioned on
    * `column`, a handful of probed values keeps a handful of files.
    */
  def pruneFilesIn(v: Long, column: String, values: Seq[Long]): (Seq[String], Int) =
    pruneBy(v, column) {
      case ("l", mn, mx) =>
        val (lo, hi) = (mn.toLong, mx.toLong); values.exists(x => x >= lo && x <= hi)
      case ("d", mn, mx) =>
        val (lo, hi) = (mn.toDouble, mx.toDouble)
        values.exists(x => x.toDouble >= lo && x.toDouble <= hi)
      // bloom rows serve point predicates directly: a file is kept iff at
      // least one probed value hits all k bits. When BOTH an `l` and a `b`
      // row exist for the column, pruneBy's forall intersects them — the
      // range rung and the bloom rung compose.
      case ("b", payload, params) => bloomAdmits(payload, params, values.map(Left(_)))
      case _ => true
    }

  /** String-point-set variant of [[pruneFilesIn]]: `s` min/max rows
    * bound membership under unsigned UTF-8 order, string-kind bloom
    * rows probe directly; numeric hints keep (cannot serve strings).
    */
  def pruneFilesInStrings(v: Long, column: String, values: Seq[String]): (Seq[String], Int) =
    pruneBy(v, column) {
      case ("s", mn, mx) =>
        values.exists(x => cmpUtf8(x, mn) >= 0 && cmpUtf8(x, mx) <= 0)
      case ("b", payload, params) => bloomAdmits(payload, params, values.map(Right(_)))
      case _ => true
    }

  /** Null rung, non-null side: keeps the files that can hold at least
    * one NON-NULL value of `column` per their `n` (nullCount:rowCount)
    * stats rows — an all-null file is provably useless to any
    * `IS NOT NULL` consumer (and, since Catalyst infers IsNotNull for
    * every filtered column, to most ordinary filters too). A file
    * without an `n` row is kept, the standing degradation contract.
    */
  def pruneFilesNotNull(v: Long, column: String): (Seq[String], Int) =
    pruneBy(v, column) {
      case ("n", nulls, rows) => nulls.toLong < rows.toLong
      case _ => true
    }

  /** Null rung, null side: keeps the files whose `n` rows admit at
    * least one NULL of `column` — serving `IS NULL` audits (the
    * validation scans every quality pipeline runs) without reading the
    * files that provably contain none.
    */
  def pruneFilesNull(v: Long, column: String): (Seq[String], Int) =
    pruneBy(v, column) {
      case ("n", nulls, _) => nulls.toLong > 0
      case _ => true
    }

  /** [[readIn]] for string point sets — min/max and bloom hints
    * intersect, the exact IN filter applies to the survivors.
    */
  def readInStrings(spark: SparkSession, column: String, values: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    readPruned(spark, col(column).isin(values: _*))(pruneFilesInStrings(_, column, values))
  }

  /** [[readBetween]]'s point-set sibling: prune via [[pruneFilesIn]],
    * then apply the exact `column IN (values)` filter to the survivors.
    */
  def readIn(spark: SparkSession, column: String, values: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.functions.col
    readPruned(spark, col(column).isin(values: _*))(pruneFilesIn(_, column, values))
  }

  /** Shared prune walk: `permits(tag, min, max)` decides survival per
    * stats row. Degradation discipline ("pruning is an optimization,
    * never semantics"): a file with no stats row for `column` is kept;
    * an UNKNOWN tag (future writer) is kept via the permits default; and
    * a stats row whose min/max fail to PARSE (corrupt sidecar line) is
    * kept too — a malformed optimization hint must degrade to an
    * unpruned read, not fail it with a NumberFormatException.
    */
  private def pruneBy(v: Long, column: String)(
      permits: (String, String, String) => Boolean): (Seq[String], Int) = {
    val files = manifest(v).getOrElse(
      throw new IllegalStateException(s"pruneFiles needs a manifest-bearing snapshot under $root"))
    def dec(s: String): String = java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)
    // line-level Try: a malformed sidecar line (bad %-escape, wrong field
    // count) contributes no entry, so its file is KEPT — same degradation
    // contract as the comparison below
    // a file may carry SEVERAL hint rows for one column (min/max `l` plus
    // bloom `b`) — it survives only if EVERY row permits it: each hint is
    // an independent proof of absence, so the prunable set is their union
    val byFile: Map[String, Seq[(String, String, String)]] = readStatsLines(v).flatMap { line =>
      scala.util.Try {
        line.split("\t") match {
          case Array(rel, c, tag, mn, mx) if c == column =>
            Some(rootPath.resolve(rel).toString -> ((tag, dec(mn), dec(mx))))
          case _ => None
        }
      }.toOption.flatten
    }.groupMap(_._1)(_._2)
    val kept = files.filter { f =>
      byFile.getOrElse(f, Nil).forall { case (tag, mn, mx) =>
        scala.util.Try(permits(tag, mn, mx)).getOrElse(true)
      } // no stats rows: never skip
    }
    (kept, files.size)
  }

  /** Range read with file-level data skipping: resolve the published
    * snapshot, drop manifest files whose stats exclude
    * `column BETWEEN lo AND hi` (inclusive), and apply the EXACT filter
    * to the survivors — identical results to an unpruned filtered read,
    * minus the IO for files that provably hold no match.
    */
  def readBetween(spark: SparkSession, column: String, lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    readPruned(spark, col(column) >= lit(lo) && col(column) <= lit(hi))(
      pruneFiles(_, column, lo, hi))
  }

  /** [[readBetween]] for string ranges — prunes on the `s` stats rows
    * under unsigned UTF-8 order, then applies the exact string filter.
    */
  def readBetweenStrings(
      spark: SparkSession, column: String, lo: String, hi: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    readPruned(spark, col(column) >= lit(lo) && col(column) <= lit(hi))(
      pruneFilesString(_, column, lo, hi))
  }

  /** [[readBetween]] for DATE columns. No new stats machinery: parquet
    * stores dates as INT32 days-since-epoch, so a date column already
    * harvests as an ordinary `l` row — this entry point just speaks
    * LocalDate at the API and prunes on epoch days.
    */
  def readBetweenDates(
      spark: SparkSession,
      column: String,
      lo: java.time.LocalDate,
      hi: java.time.LocalDate): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    readPruned(
      spark,
      col(column) >= lit(java.sql.Date.valueOf(lo)) &&
        col(column) <= lit(java.sql.Date.valueOf(hi)))(
      pruneFiles(_, column, lo.toEpochDay, hi.toEpochDay))
  }

  /** [[readBetween]] for TIMESTAMP columns — INT64 micros-since-epoch in
    * parquet (GraftSession sets outputTimestampType=TIMESTAMP_MICROS;
    * Spark's out-of-the-box INT96 default writes NO usable footer stats,
    * so tables written under it simply stay unprunable on timestamps —
    * degrade-to-keep, never wrong), pruned via the `l` rows.
    */
  def readBetweenTimestamps(
      spark: SparkSession,
      column: String,
      lo: java.time.Instant,
      hi: java.time.Instant): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    def micros(t: java.time.Instant): Long =
      math.multiplyExact(t.getEpochSecond, 1000000L) + t.getNano / 1000L
    readPruned(
      spark,
      col(column) >= lit(java.sql.Timestamp.from(lo)) &&
        col(column) <= lit(java.sql.Timestamp.from(hi)))(
      pruneFiles(_, column, micros(lo), micros(hi)))
  }

  /** Shared tail of every pruned read: resolve the published snapshot,
    * prune its manifest, apply the EXACT predicate to the survivors —
    * identical results to an unpruned filtered read by construction.
    */
  private def readPruned(spark: SparkSession, cond: org.apache.spark.sql.Column)(
      prune: Long => (Seq[String], Int)): DataFrame = {
    val v = latestVersion()
      .getOrElse(throw new IllegalStateException(s"no published version under $root"))
    val (kept, _) = prune(v)
    if (kept.isEmpty) readVersion(spark, v).filter(cond).limit(0)
    else readFiles(spark, v, kept).filter(cond)
  }

  // an evolved snapshot reads through its recorded unified schema —
  // pre-evolution files fill the added columns with NULL; without it a
  // mixed-schema read seeds from an arbitrary file (see appendCommit)
  private def readFiles(spark: SparkSession, v: Long, files: Seq[String]): DataFrame =
    readSubset(spark, readSchema(v), files)

  /** Read an arbitrary manifest-file subset under an optional explicit
    * schema, restoring hive partition columns whatever version
    * directories the files live in: a single-owner subset reads under
    * its owning directory's basePath (ordinary hive inference); an
    * unpartitioned multi-directory subset reads flat (no partition
    * columns to restore); a PARTITIONED multi-directory subset — the
    * partitioned append/maintenance chains of round-13 ask #2 — reads
    * one per-directory basePath group at a time, unioned under the
    * snapshot's recorded full schema, which pins partition column types
    * so per-group inference can never flicker between directories.
    * Filters on partition columns still prune: each branch of the union
    * is an ordinary hive layout under its own basePath.
    */
  private def readSubset(
      spark: SparkSession,
      schemaOpt: Option[org.apache.spark.sql.types.StructType],
      files: Seq[String]): DataFrame = {
    def rd = schemaOpt.map(spark.read.schema).getOrElse(spark.read)
    val groups = files.groupBy(owningVersionDir).toSeq.sortBy(_._1)
    if (files.isEmpty) rd.parquet(files: _*) // degenerate: same error shape as before
    else if (groups.size == 1)
      rd.option("basePath", groups.head._1).parquet(files: _*)
    else if (partitionKeysOf(files).isEmpty)
      rd.parquet(files: _*)
    else {
      val s = schemaOpt.getOrElse(throw new IllegalStateException(
        s"partitioned file subset spans version directories under $root but no full " +
          "schema is recorded — table corrupt (partitioned appends always write _schema)"))
      groups.map { case (dir, fs) =>
        spark.read.schema(s).option("basePath", dir).parquet(fs: _*)
      }.reduce(_ unionByName _)
    }
  }

  /** Read the published snapshot (errors on a never-committed table, like
    * reading a missing path).
    */
  def read(spark: SparkSession): DataFrame = readVersion(spark, latestVersion()
    .getOrElse(throw new IllegalStateException(s"no published version under $root")))

  /** Read one pinned snapshot — time travel over retained versions.
    * Manifest-backed when available (no directory LIST on the read path;
    * `basePath` keeps hive-style partition columns inferable from the
    * explicit file paths); pre-manifest snapshots fall back to listing.
    */
  def readVersion(spark: SparkSession, v: Long): DataFrame = manifest(v) match {
    // manifest snapshots — partitioned or not — read through the
    // INTEGRATED skipping relation (round-13 ask #1): a
    // SnapshotFileIndex under a stock parquet HadoopFsRelation, so a
    // plain read().filter() prunes files through the _stats sidecar
    // exactly like the dedicated readBetween/readIn entry points —
    // without the caller knowing the API — and hive partition pruning
    // evaluates against per-file path-parsed values in the SAME
    // listing, composing with the stats walk (one scan even when a
    // partitioned chain spans version directories). Evolution still
    // holds: the relation's dataSchema is the recorded unified schema,
    // so pre-evolution files NULL-fill.
    case Some(files) if files.nonEmpty => readIndexed(spark, v, files)
    case Some(files) => readFiles(spark, v, files)
    case None => spark.read.parquet(versionDir(v).toString)
  }

  /** The integrated-skipping relation behind [[readVersion]]: a
    * [[SnapshotFileIndex]] (which receives the query's pushed partition
    * AND data filters and runs partition pruning plus the min/max +
    * point-set + Bloom prune walk before task planning) under a stock
    * parquet HadoopFsRelation — Spark executes the survivors with its
    * ordinary vectorized/codegen scan. A snapshot whose partition
    * values the index cannot type (exotic partition column types —
    * see SnapshotFileIndex.partValuesOf) falls back to the
    * per-directory hive read: integration is an optimization, never
    * semantics.
    */
  private def readIndexed(spark: SparkSession, v: Long, files: Seq[String]): DataFrame = {
    val fullSchema = schemaOf(spark, v)
    val partKeys = partitionKeysOf(files)
    val partSchema = org.apache.spark.sql.types.StructType(partKeys.map(k =>
      fullSchema.fields.find(_.name == k).getOrElse(throw new IllegalStateException(
        s"partition column '$k' missing from snapshot v=$v's schema under $root"))))
    val dataSchema = org.apache.spark.sql.types.StructType(
      fullSchema.fields.filterNot(f => partKeys.contains(f.name)))
    scala.util.Try(new SnapshotFileIndex(this, v, files, partSchema)) match {
      case scala.util.Success(index) =>
        val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
          location = index,
          partitionSchema = partSchema,
          dataSchema = dataSchema,
          bucketSpec = None,
          fileFormat =
            new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
          options = Map.empty)(spark)
        spark.baseRelationToDataFrame(relation)
      case scala.util.Failure(_) => readFiles(spark, v, files)
    }
  }

  /** Drop all but the newest `keep` snapshots (never the published one,
    * and never a directory whose files a RETAINED snapshot still
    * references through its manifest — append-committed snapshots carry
    * files from older version directories, and deleting those would
    * corrupt the live table, the same reason Delta's VACUUM walks the
    * retained transaction log before deleting). Callers own the retention
    * contract: only vacuum past the oldest snapshot an in-flight reader
    * may still hold.
    */
  def vacuum(keep: Int = 2): Unit =
    reclaim(versions().sorted.reverse.drop(math.max(keep, 1)))

  /** Retention-window vacuum — the enforcement half of [[readAsOf]]'s
    * caveat ("only vacuum past the oldest timestamp any report still
    * replays"): drop snapshots PUBLISHED before `cutoff`, always
    * keeping the newest `keep` regardless of age, never the published
    * head, and never a directory a retained manifest still references.
    * Versions without a recorded publish time (pre-`_commit_ts`
    * snapshots, and orphans) count as older than any cutoff — they
    * cannot serve timestamp time travel anyway.
    */
  def vacuumOlderThan(cutoff: java.time.Instant, keep: Int = 1): Unit = {
    val ms = cutoff.toEpochMilli
    reclaim(versions().sorted.reverse.drop(math.max(keep, 1))
      .filter(v => commitTimestamp(v).forall(_ < ms)))
  }

  /** Shared vacuum tail: delete the candidate version directories that
    * are neither published nor referenced by any RETAINED snapshot's
    * manifest (append chains keep their ancestors' directories alive —
    * the same walk Delta's VACUUM does over the retained log).
    */
  private def reclaim(candidates: Seq[Long]): Unit = {
    val published = latestVersion().toSeq
    val drop0 = candidates.filterNot(published.contains)
    val retained = versions().filterNot(drop0.contains)
    val referenced: Set[String] = retained.toSet[Long]
      .flatMap(v => manifest(v).getOrElse(Nil))
    def isReferenced(v: Long): Boolean = {
      val prefix = versionDir(v).toString + java.io.File.separator
      referenced.exists(_.startsWith(prefix))
    }
    drop0.filterNot(isReferenced).foreach { v =>
      val dir = versionDir(v)
      import scala.jdk.CollectionConverters._
      val all = Files.walk(dir)
      try all.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally all.close()
    }
  }
}

object VersionedTable {
  def apply(root: String): VersionedTable = new VersionedTable(root)

  /** Default per-file Bloom width: 2^16 bits = 8 KiB per (file, column)
    * row — at 7 probes that keeps the false-positive rate under 1% to
    * ~6.5k distinct values per file, and a miss only costs the IO the
    * prune would have saved.
    */
  val DefaultBloomBits: Int = 1 << 16

  /** Materialize a corpus-scale intermediate frame once for its multiple
    * consumers: into `sink` as a committed snapshot when given — the
    * 100 TB path (fault-tolerant, resumable, inspectable, survives the
    * job) — else an in-memory `localCheckpoint` (the single-job path;
    * executor-local blocks, lost with the job). Both return a frame whose
    * downstream plans read materialized rows instead of recomputing the
    * lineage. The table path re-reads through parquet, so physical
    * partitioning from the producing plan is NOT carried over (a
    * downstream join re-establishes it with one exchange); the
    * checkpoint path preserves it.
    */
  def materialize(frame: DataFrame, sink: Option[VersionedTable]): DataFrame =
    sink match {
      // pin the read to the version just committed — read() re-resolves
      // latestVersion(), so a concurrent committer (or a re-evaluated
      // query lambda) between commit and read would silently swap in a
      // DIFFERENT snapshot than the one this frame produced
      case Some(vt) =>
        val v = vt.commit(frame)
        vt.readVersion(frame.sparkSession, v)
      case None => frame.localCheckpoint(eager = false)
    }
}
