package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Avro container-file interchange — the row-oriented peer of the
  * Formats JSONL/CSV/ORC trio and the fourth leg of the format-invariance
  * gate (x119). The environment's jar set carries avro-core/avro-mapred
  * but NOT the spark-avro connector, so this is a self-contained
  * source/sink built directly on the public Avro library: the writer
  * emits one container file per input partition, the reader schedules
  * one task per container file.
  *
  * The Formats rules apply unchanged:
  *   - **Explicit schema, never inference**: the reader REQUIRES the
  *     Spark schema and converts records to exactly it; the writer
  *     derives the Avro schema from the frame (every field a
  *     `union(null, T)` — Spark columns are nullable by default).
  *   - **Block-splittable reads** (round-11 verdict ask #7): Avro blocks
  *     carry 16-byte sync markers, so container files are splittable at
  *     block boundaries. The reader carves each file into byte ranges of
  *     `maxSplitBytes` (default: the session's
  *     `spark.sql.files.maxPartitionBytes`, the same knob parquet scans
  *     obey) and each task seeks to the first sync marker after its
  *     range start (`DataFileReader.sync`) and stops once past the first
  *     marker after its range end (`pastSync`) — the classic
  *     avro-mapred split contract: every block is read by EXACTLY the
  *     split its leading sync falls in, so read parallelism no longer
  *     tracks writer layout (a single 10 GB container file fans out to
  *     ~80 tasks at the default 128 MB split). Files smaller than one
  *     split (every fixture file) stay one-task-per-file — byte-parity
  *     with the pre-split reader is pinned by AvroSpec both ways.
  *   - Malformed handling differs from the text formats BY the format:
  *     Avro blocks are length-prefixed and schema'd, so corruption
  *     surfaces as a loud reader exception (the FAILFAST analogue), not
  *     a quietly mis-parsed row — there is no meaningful PERMISSIVE
  *     per-record recovery inside a torn binary block.
  *
  * Type subset: the scalar types the engine's tables use (long, int,
  * double, float, boolean, string, binary) plus arrays of them —
  * embeddings (`array<float>`) included. Timestamps are carried as
  * micros-since-epoch longs by the CALLER (the engine's events table
  * already reads nanos as long — converting in the projection keeps this
  * source free of timezone policy).
  *
  * I/O goes through the Hadoop FileSystem API on both sides (FsInput /
  * FSDataOutputStream), so the same code paths serve file://, hdfs://
  * and any store with a Hadoop connector — the 100 TB posture; nothing
  * here assumes a local filesystem.
  */
object Avro {

  /** Spark → Avro schema for the supported subset; every field is
    * union(null, T) (record name fixed so files diff cleanly).
    */
  def avroSchema(schema: StructType): Schema = {
    def scalar(dt: DataType): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"unsupported Avro interchange type: $other " +
          "(supported: long/int/double/float/boolean/string/binary + arrays)")
    }
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case ArrayType(el, _) => Schema.createArray(scalar(el))
        case dt => scalar(dt)
      }
      new Schema.Field(
        f.name,
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord("graft_row", null, "graft.sources.avro", false,
      java.util.List.of(fields: _*))
  }

  /** Write `df` as Avro container files under `path` (one file per
    * partition, `part-NNNNN.avro`), replacing the directory. Returns the
    * file count. Deflate-compressed blocks — the container-level codec
    * every Avro reader understands.
    */
  def writeAvro(df: DataFrame, path: String, syncInterval: Int = 0): Int = {
    val schema = df.schema
    val avroJson = avroSchema(schema).toString // Schema is not serializable pre-1.9; ship JSON
    // clean slate (mirror of DataFrameWriter overwrite semantics)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val dir = new HPath(path)
    val fs = dir.getFileSystem(conf)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    val n = df.rdd.getNumPartitions
    // ship the DRIVER's Hadoop conf to the tasks: a bare new Configuration()
    // on the executor resolves only classpath site files and drops any
    // runtime settings (object-store credentials/endpoints set on
    // sparkContext.hadoopConfiguration) — which would contradict the class
    // doc's hdfs://-and-connector-stores claim. SerializableConfiguration
    // is Spark's own wrapper for exactly this.
    val bcConf = df.sparkSession.sparkContext.broadcast(new SerializableConfiguration(conf))
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val avro = new Schema.Parser().parse(avroJson)
      val out = new HPath(s"$path/part-${"%05d".format(pid)}.avro")
      val fsx = out.getFileSystem(bcConf.value.value)
      val stream = fsx.create(out, true)
      val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avro))
      writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      // sync interval = target uncompressed block size = split granularity
      // on the read side; 0 keeps the library default (~64 KB). The spec
      // uses a small value to force multi-block files at fixture scale.
      if (syncInterval > 0) writer.setSyncInterval(syncInterval)
      writer.create(avro, stream)
      var written = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(avro)
        var i = 0
        while (i < row.length) {
          rec.put(i, toAvro(row.get(i)))
          i += 1
        }
        writer.append(rec)
        written += 1
      }
      writer.close() // closes the stream; flushes the final block + sync
      Iterator.single(written)
    }.count().toInt
    n
  }

  private def toAvro(v: Any): Any = v match {
    case null => null
    case s: String => s
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case seq: scala.collection.Seq[_] =>
      val l = new java.util.ArrayList[Any](seq.length)
      seq.foreach(x => l.add(toAvro(x)))
      l
    case other => other // long/int/double/float/boolean pass through
  }

  /** Read Avro container files under `path` into exactly `schema` —
    * explicit schema, no inference (the Formats rule). Files are carved
    * into `maxSplitBytes` byte ranges and each task reads the blocks
    * whose leading sync marker falls inside its range (see the class
    * doc); `maxSplitBytes <= 0` (the default) takes the session's
    * `spark.sql.files.maxPartitionBytes`.
    */
  def avro(
      spark: SparkSession,
      path: String,
      schema: StructType,
      maxSplitBytes: Long = 0L): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new HPath(path)
    val fs = dir.getFileSystem(conf)
    val files = fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.endsWith(".avro"))
      .sortBy(_.getPath.toString)
    require(files.nonEmpty, s"no .avro files under $path")
    val splitBytes = math.max(
      1L,
      if (maxSplitBytes > 0) maxSplitBytes
      else spark.sessionState.conf.filesMaxPartitionBytes)
    // (file, rangeStart, rangeEnd): a block belongs to the range its
    // LEADING sync marker falls in — sync(start) + pastSync(end) below
    // give each block to exactly one split (the avro-mapred contract)
    val splits: Seq[(String, Long, Long)] = files.flatMap { st =>
      val f = st.getPath.toString
      val len = st.getLen
      (0L until math.max(len, 1L) by splitBytes).map { s =>
        (f, s, math.min(s + splitBytes, len))
      }
    }
    // (name, type) pairs — fields resolve BY NAME against each record's
    // writer schema, so a reordered writer still round-trips; a field the
    // file never wrote reads as null (the jsonl PERMISSIVE analogue of
    // the explicit-schema contract)
    val fields = schema.fields.map(f => (f.name, f.dataType)).toSeq
    val bcConf = spark.sparkContext.broadcast(
      new SerializableConfiguration(conf)) // driver conf, not classpath defaults
    val rdd = spark.sparkContext
      .parallelize(splits, splits.size)
      .flatMap { case (f, start, end) =>
        val in = new FsInput(new HPath(f), bcConf.value.value)
        val reader = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; reader.close() }
        // a task that stops consuming early (limit/take/downstream failure)
        // never drains the iterator — the completion/failure listeners keep
        // the file handle + FsInput from leaking until GC in that case;
        // drain-time close stays the fast path
        Option(TaskContext.get()).foreach { tc =>
          tc.addTaskCompletionListener[Unit](_ => closeOnce())
          tc.addTaskFailureListener((_, _) => closeOnce())
        }
        val hasField: Map[String, Boolean] = fields.map { case (n, _) =>
          n -> (reader.getSchema.getField(n) != null)
        }.toMap
        // seek to the first sync marker at/after the range start (start=0
        // lands on the first block past the header); stop once the reader
        // moves past the first sync after the range end — blocks straddling
        // `end` belong to THIS split, blocks starting past it to the next
        reader.sync(start)
        // iterator is consumed lazily per task; wrap so close() runs at end
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = !closed && reader.hasNext && !reader.pastSync(end)
            if (!h) closeOnce()
            h
          }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(fields.map { case (n, dt) =>
              if (hasField(n)) fromAvro(rec.get(n), dt) else null
            })
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (l: java.util.List[_], ArrayType(el, _)) =>
      l.asScala.map(fromAvro(_, el)).toSeq
    case (other, _) => other
  }
}
