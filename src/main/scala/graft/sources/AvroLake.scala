package graft.sources

import java.util

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for Avro CONTAINER files, built directly on
  * the public `org.apache.avro` core library (the environment ships
  * avro-1.12 but not the spark-avro DataSource module — this closes
  * that format gap with a first-class source instead of a stub).
  *
  * Read: `spark.read.format("graft.sources.AvroSource").load(dir)` —
  * schema inferred from the first container's writer schema; SPLITTABLE
  * at Avro sync-marker boundaries (one partition per `split_bytes`
  * byte range, default 128 MB — a fat container cannot cap parallelism
  * at one task). COLUMN PRUNING is real: the scan implements
  * `SupportsPushDownRequiredColumns` and hands Avro a projected READER
  * schema, so schema resolution skips non-requested fields instead of
  * materializing them (`.explain` shows the pruned ReadSchema like any
  * built-in format).
  *
  * Write: a full DataSource V2 `BatchWrite` —
  * `df.write.format("graft.sources.AvroSource").mode("append"|"overwrite")
  * .save(dir)` — with the staged-commit protocol a distributed sink
  * needs: each task writes a `.avro.staged` container named by
  * (partition, task attempt, query id) into a per-query
  * `.staging-<queryId>/` subdirectory and reports it in its commit
  * message; the DRIVER publishes (rename into the table dir as
  * `.avro`) only the committed attempts at job commit, so a failed,
  * speculative, or zombie task attempt can never surface a file
  * (readers list only `.avro`); job abort sweeps this query's staging
  * dir, and orphaned staging dirs of CRASHED queries are reclaimed via
  * a heartbeat-touched liveness marker (never wall-clock file age —
  * a live slow writer's staging is safe no matter how old). `overwrite`
  * is `SupportsTruncate`: prior containers are deleted at commit time,
  * after every new container staged successfully — never before.
  * Executor-side encoding rides the schema's JSON (Avro `Schema`
  * objects never enter task closures). [[AvroFiles.write]] remains the
  * plain-helper twin (one rename per partition, no commit protocol);
  * the spec pins both paths read back identically.
  *
  * Type mapping (both directions): boolean/int/long/float/double/
  * string/bytes, `union[null, T]` ⇔ nullable T, logical
  * `timestamp-micros` ⇔ TimestampType and `date` ⇔ DateType (both are
  * integer epochs on both sides, so round-trips are bit-exact).
  * Anything else fails LOUDLY at schema mapping — silent coercion is
  * how a lake rots. */
class AvroSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = AvroLake.listContainers(options.get("path"))
    require(files.nonEmpty, s"no .avro containers under ${options.get("path")}")
    AvroLake.toStruct(AvroLake.writerSchema(files.head._2))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] class AvroTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  require(path != null, "avro source requires a path")

  override def name(): String = s"avro($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AvroBatchWrite(
          path, info.schema(), info.queryId(), truncateFirst)
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns {
      private var required: StructType = tableSchema
      private val splitBytes: Long =
        Option(options.get("split_bytes")).map(_.toLong)
          .getOrElse(128L << 20)

      override def pruneColumns(requiredSchema: StructType): Unit =
        // Spark hands the pruned struct in table-column order; empty
        // (count(*)-style) scans still decode row boundaries only
        required = requiredSchema

      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this

      /** SPLITTABLE read: a container bigger than `split_bytes` (option;
        * default 128 MB) becomes one partition per byte range, aligned
        * at runtime by the Avro SYNC MARKERS — `reader.sync(start)`
        * seeks to the first block after the range start and
        * `pastSync(end)` stops after the last block beginning inside
        * the range, so every block is read by exactly one partition
        * (the classic Avro InputFormat recipe). Without this, one fat
        * container caps parallelism at one task regardless of cluster
        * size. */
      override def planInputPartitions(): Array[InputPartition] =
        AvroLake.listContainers(path).flatMap { case (_, abs) =>
          val len = new java.io.File(abs).length()
          val nSplits = math.max(1L, (len + splitBytes - 1) / splitBytes)
          (0L until nSplits).map { i =>
            AvroPartition(abs, i * splitBytes,
              math.min(splitBytes, len - i * splitBytes),
              required.json): InputPartition
          }
        }

      override def createReaderFactory(): PartitionReaderFactory =
        AvroLake.readerFactory
    }
}

private[sources] case class AvroPartition(
    file: String, start: Long, length: Long, requiredJson: String)
  extends InputPartition

/** A task attempt's staged container (absolute path) — or `null` for an
  * empty partition, which stages nothing. */
private[sources] case class AvroCommit(staged: String)
  extends WriterCommitMessage

/** Driver side of the staged-commit protocol (see [[AvroSource]]'s
  * scaladoc). Commit order is PUBLISH-then-TRUNCATE: every staged
  * container renames to `.avro` first, and only then are the
  * pre-existing containers (captured before any task ran) deleted —
  * so no failure point inside commit can lose data. An exception
  * mid-commit triggers abort, which UNDOES the publishes (their names
  * ride the commit messages) and sweeps this query's staged files,
  * restoring the directory to its pre-job state exactly; a hard driver
  * crash mid-commit leaves old+new DUPLICATION (recoverable — new
  * files carry the query id), never a torn half-truncate. A successful
  * commit also sweeps leftover staged files of this query, so a zombie
  * task attempt (executor death skips DataWriter.abort) cannot leak
  * disk on either path. */
private[sources] class AvroBatchWrite(
    path: String, schema: StructType, queryId: String, truncateFirst: Boolean)
  extends BatchWrite {

  // captured on the driver BEFORE any task stages a file: exactly the
  // containers an overwrite must replace
  private val preExisting: Array[String] =
    if (truncateFirst)
      new java.io.File(path).listFiles() match {
        case null => Array.empty
        case fs => fs.map(_.getName).filter(_.endsWith(".avro"))
      }
    else Array.empty

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    new java.io.File(path).mkdirs()
    AvroWriterFactory(path,
      AvroLake.toAvro(schema, "row").toString, schema.json, queryId)
  }

  // Staging is ISOLATED per query in `<path>/.staging-<queryId>/`
  // (invisible to readers: listContainers keeps only `*.avro`). A
  // crashed driver never reaches commit/abort, so its staging dir has
  // no owner left to sweep it — orphan reclamation is gated on a
  // LIVENESS marker, not wall-clock file age: this driver touches its
  // `.inprogress` marker every 60 s while the write is live, so a
  // concurrent writer that staged files hours ago is still provably
  // alive, while a dead query's marker goes stale within a minute of
  // the crash. (r13 swept any `*.avro.staged` older than 1 h, which
  // could delete a LIVE slow query's staging and fail its commit-time
  // rename — age is a heuristic, a heartbeat is a guarantee.) The 1 h
  // grace on top of the stale marker absorbs pathological pauses
  // (SIGSTOP'd or GC-wedged JVMs whose heartbeat fell behind).
  private val OrphanGraceMs = 3600L * 1000
  private val stagingDir = AvroLake.stagingDirFor(path, queryId)
  private val marker = new java.io.File(stagingDir, ".inprogress")
  stagingDir.mkdirs()
  marker.createNewFile()
  @volatile private var live = true
  private val heartbeat = new Thread(() => {
    while (live) {
      marker.setLastModified(System.currentTimeMillis())
      try Thread.sleep(60000L)
      catch { case _: InterruptedException => () }
    }
  }, s"avro-staging-heartbeat-$queryId")
  heartbeat.setDaemon(true)
  heartbeat.start()

  private def sweepStaging(): Unit = {
    live = false
    heartbeat.interrupt()
    AvroLake.deleteRecursively(stagingDir) // zombie attempts included
    new java.io.File(path).listFiles() match {
      case null =>
      case fs =>
        fs.filter(d => d.isDirectory &&
            d.getName.startsWith(AvroLake.StagingPrefix) &&
            d.getName != stagingDir.getName)
          .foreach { d =>
            val m = new java.io.File(d, ".inprogress")
            val beat = if (m.exists()) m.lastModified() else d.lastModified()
            if (beat < System.currentTimeMillis() - OrphanGraceMs)
              AvroLake.deleteRecursively(d)
          }
        // legacy sweep (r15 ADVICE): pre-r14 crashed queries staged FLAT
        // `*.avro.staged` files in the table dir itself; the directory
        // sweep above never reclaims them, so an old lake keeps that
        // dead disk forever. They are invisible to readers and no
        // current writer produces them, so any one older than the grace
        // period is provably orphaned.
        fs.filter(f => f.isFile && f.getName.endsWith(".avro.staged") &&
            f.lastModified() < System.currentTimeMillis() - OrphanGraceMs)
          .foreach(_.delete())
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case AvroCommit(staged) if staged != null =>
        val src = new java.io.File(staged)
        // publish = move from the staging dir into the table dir (same
        // filesystem — an atomic rename, like the flat layout's)
        val dst = new java.io.File(path,
          src.getName.stripSuffix(".staged"))
        if (!src.renameTo(dst))
          throw new java.io.IOException(s"cannot publish $dst")
      case _ =>
    }
    preExisting.foreach { name =>
      val f = new java.io.File(path, name)
      if (f.exists() && !f.delete())
        throw new java.io.IOException(s"truncate failed: $f")
    }
    sweepStaging() // zombie attempts' staging must not outlive success
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // undo any publish that happened before commit threw — the old
    // containers are still on disk (truncation runs last), so deleting
    // the new names restores the pre-job state exactly
    messages.foreach {
      case AvroCommit(staged) if staged != null =>
        new java.io.File(path,
          new java.io.File(staged).getName.stripSuffix(".staged")).delete()
      case _ =>
    }
    sweepStaging()
  }
}

private[sources] case class AvroWriterFactory(
    path: String, avroJson: String, schemaJson: String, queryId: String)
  extends DataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(path, avroJson,
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      queryId, partitionId, taskId)
}

/** Executor side: lazily opens one container per non-empty partition,
  * named by (partition, task attempt, query id) so retried and
  * speculative attempts never collide; `commit` closes and reports the
  * staged path, `abort` deletes it. */
private[sources] class AvroDataWriter(
    path: String, avroJson: String, schema: StructType,
    queryId: String, partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private var avro: Schema = _
  private var rec: GenericData.Record = _
  private var out: DataFileWriter[GenericRecord] = _
  private var staged: java.io.File = _

  // one converter per field, resolved ONCE from the fixed schema — the
  // innermost sink loop must not re-match DataType per row per column
  private val getters: Array[(InternalRow, Int) => Any] =
    schema.fields.map(_.dataType match {
      case BooleanType => (r: InternalRow, i: Int) => r.getBoolean(i)
      case IntegerType | DateType => (r: InternalRow, i: Int) => r.getInt(i)
      case LongType | TimestampType => (r: InternalRow, i: Int) => r.getLong(i)
      case FloatType => (r: InternalRow, i: Int) => r.getFloat(i)
      case DoubleType => (r: InternalRow, i: Int) => r.getDouble(i)
      case StringType =>
        (r: InternalRow, i: Int) => r.getUTF8String(i).toString
      case BinaryType =>
        (r: InternalRow, i: Int) => java.nio.ByteBuffer.wrap(r.getBinary(i))
      case other => throw new IllegalArgumentException(
        s"avro writer: unsupported type ${other.simpleString}")
    })

  override def write(row: InternalRow): Unit = {
    if (out == null) {
      avro = new Schema.Parser().parse(avroJson)
      rec = new GenericData.Record(avro)
      val dir = AvroLake.stagingDirFor(path, queryId)
      dir.mkdirs() // idempotent; the driver pre-creates it with a marker
      staged = new java.io.File(dir,
        f"part-$partitionId%05d-$taskId-$queryId.avro.staged")
      out = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avro))
      out.create(avro, staged)
    }
    var i = 0
    while (i < getters.length) {
      rec.put(i, if (row.isNullAt(i)) null else getters(i)(row, i))
      i += 1
    }
    out.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) { out.close(); out = null }
    AvroCommit(if (staged == null) null else staged.getAbsolutePath)
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); out = null }
    if (staged != null) staged.delete()
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}

private[sources] object AvroLake {

  /** Per-query staging subdirectory prefix — dot-named so nothing that
    * globs `*.avro` (or lists containers below) ever sees staging. */
  private[sources] val StagingPrefix = ".staging-"

  private[sources] def stagingDirFor(path: String, queryId: String)
      : java.io.File =
    new java.io.File(path, StagingPrefix + queryId)

  private[sources] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  def listContainers(path: String): Array[(String, String)] = {
    val dir = new java.io.File(path)
    if (dir.isDirectory)
      dir.listFiles().filter(_.getName.endsWith(".avro"))
        .map(f => (f.getName, f.getAbsolutePath)).sortBy(_._1)
    else if (dir.isFile) Array((dir.getName, dir.getAbsolutePath))
    else throw new java.io.FileNotFoundException(s"avro path: $path")
  }

  def writerSchema(file: String): Schema = {
    val r = new DataFileReader[GenericRecord](
      new java.io.File(file), new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** Avro writer schema → Spark struct. Loud failure on any shape this
    * connector does not map. */
  def toStruct(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"top-level must be a record: $s")
    StructType(s.getFields.toArray(Array.empty[Schema.Field]).map { f =>
      val (dt, nullable) = toSpark(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private def toSpark(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.toArray(Array.empty[Schema])
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(branches.length == 2 && nonNull.length == 1,
        s"only union[null, T] is supported: $s")
      (toSpark(nonNull.head)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date")
        (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType != null &&
          s.getLogicalType.getName == "timestamp-micros")
        (TimestampType, false)
      else (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case other =>
      throw new IllegalArgumentException(
        s"avro type not mapped by this connector: $other in $s")
  }

  /** Spark struct → Avro record schema (nullable → union[null, T]). */
  def toAvro(struct: StructType, name: String): Schema = {
    val rec = Schema.createRecord(name, null, "graft.avro", false)
    val fields = struct.fields.map { f =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case DateType =>
          org.apache.avro.LogicalTypes.date()
            .addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType =>
          org.apache.avro.LogicalTypes.timestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
        case other => throw new IllegalArgumentException(
          s"spark type not mapped by this connector: $other")
      }
      val fs =
        if (f.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      new Schema.Field(f.name, fs, null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  val readerFactory: PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val ap = p.asInstanceOf[AvroPartition]
      new AvroContainerReader(ap.file, ap.start, ap.start + ap.length,
        DataType.fromJson(ap.requiredJson).asInstanceOf[StructType])
    }
  }
}

/** Reader for one container byte range [start, end): `sync(start)`
  * aligns to the first block boundary after `start`, `pastSync(end)`
  * stops after the last block that BEGINS inside the range. Avro
  * schema RESOLUTION does the column pruning — the reader schema is
  * the projected subset, so unrequested fields are skipped, not
  * materialized. */
private[sources] class AvroContainerReader(
    file: String, start: Long, end: Long, required: StructType)
    extends PartitionReader[InternalRow] {

  private val writer = AvroLake.writerSchema(file)
  private val readerSchema: Schema = {
    // project the writer schema to the required fields BY NAME, keeping
    // the writer's field schemas so resolution is a pure skip
    val fields = required.fields.map { f =>
      val wf = writer.getField(f.name)
      require(wf != null, s"required column ${f.name} absent in $file")
      new Schema.Field(wf.name(), wf.schema(), null, wf.defaultVal())
    }
    val rec = Schema.createRecord(writer.getName, null, "graft.avro", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }
  private val reader = new DataFileReader[GenericRecord](
    new java.io.File(file),
    new GenericDatumReader[GenericRecord](writer, readerSchema))
  reader.sync(start)
  private var current: GenericRecord = _

  override def next(): Boolean =
    if (reader.hasNext && !reader.pastSync(end)) {
      current = reader.next(current); true
    } else false

  override def get(): InternalRow = {
    val out = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      out.update(i, toCatalyst(current.get(i), required.fields(i).dataType))
      i += 1
    }
    out
  }

  private def toCatalyst(v: Any, dt: DataType): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 =>
      UTF8String.fromBytes(u.getBytes, 0, u.getByteLength)
    case s: String => UTF8String.fromString(s)
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case other => other // int/long/float/double/boolean + integer epochs
  }

  override def close(): Unit = reader.close()
}

/** Writer helper: one `.avro` container per input partition,
  * temp-then-rename publication. Schemas travel as JSON strings; every
  * row encodes through one reused GenericRecord. */
object AvroFiles {

  def write(df: DataFrame, dir: String, recordName: String = "row"): Unit = {
    val schema = df.schema
    val avroJson = AvroLake.toAvro(schema, recordName).toString
    new java.io.File(dir).mkdirs()
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val avro = new Schema.Parser().parse(avroJson)
        val tmp = new java.io.File(dir, f"part-$pid%05d.avro.tmp")
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avro))
        w.create(avro, tmp)
        try {
          rows.foreach { row =>
            val rec = new GenericData.Record(avro)
            var i = 0
            while (i < schema.length) {
              rec.put(i, toAvroValue(row.get(i), schema.fields(i).dataType))
              i += 1
            }
            w.append(rec)
          }
        } finally w.close()
        val dst = new java.io.File(dir, f"part-$pid%05d.avro")
        if (!tmp.renameTo(dst))
          throw new java.io.IOException(s"cannot publish $dst")
        Iterator.single(1)
      }
    }.count()
  }

  private def toAvroValue(v: Any, dt: DataType): Any = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos / 1000) % 1000L
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case other => other // numbers, booleans, strings
  }

  /** Round-trip registry query: the customer dimension through the
    * Avro container path (write once per session dir into the
    * warehouse, read back through the DSv2 source), aggregated to a
    * per-segment census — exact cents, so the DuckDB oracle (which
    * reads the original parquet) proves encode+decode byte-fidelity.
    * The projection (3 of 5 columns) exercises the pruned reader
    * schema on the oracle-gated path. */
  def qAvroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // the warehouse conf is a URI ("file:/tmp/..."): resolve it to a
    // filesystem path, or java.io.File would treat the whole URI as a
    // RELATIVE path and create a literal "file:" directory under cwd
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/")
    val whPath =
      if (wh.startsWith("file:"))
        new java.io.File(new java.net.URI(wh)).getAbsolutePath
      else wh
    val out =
      whPath + "/graft_avro_customer_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
    AvroLake.synchronized {
      // through the V2 BatchWrite (staged-commit) path, so the commit
      // protocol itself sits under this query's DuckDB oracle
      if (!new java.io.File(out).isDirectory)
        graft.relational.Tables.load(spark, dir, "customer")
          .write.format("graft.sources.AvroSource").mode("append").save(out)
    }
    spark.read.format("graft.sources.AvroSource").load(out)
      .select(col("c_mktsegment"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"), sum("cents").as("bal_cents"))
  }
}
