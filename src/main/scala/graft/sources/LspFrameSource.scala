package graft.sources

import java.io.{DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lsp.LspWire

/** DataSource V2 batch source for the reference's wire format as a lake
  * format: files of length-prefixed protobuf `LSPMessage` frames
  * (`lsp.proto:2-6`; framing = 4-byte big-endian length + frame bytes, the
  * standard pattern for persisting datagram captures). No built-in format
  * can read this — the genuine DSv2 case (SURVEY §2.1 S3/S4): a custom
  * binary layout that must still scan in parallel.
  *
  * Parallelism = one input partition per file (a capture file ≅ one
  * datagram stream); schema is fixed `(connid, seqnum, payload)` exactly
  * as `lspmessage__unpack` produces. Malformed frames decode to null rows
  * and are SKIPPED, matching the reference's drop-don't-crash handling of
  * undecodable datagrams (`lsp_server.c:218-224`).
  *
  * Usage: `spark.read.format("graft.sources.LspFrameSource")
  * .load("/path/to/captures")`; [[LspFrameFiles.write]] produces capture
  * files from a DataFrame.
  */
class LspFrameSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LspWire.decodedSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LspFrameTable(properties.get("path"),
      properties.getOrDefault("offsets", "watermark"))

  override def supportsExternalMetadata(): Boolean = false
}

private[sources] class LspFrameTable(path: String, offsetMode: String = "watermark")
    extends Table with SupportsRead {
  require(path != null, "lspframe source requires a path")
  require(offsetMode == "watermark" || offsetMode == "seen",
    s"offsets must be 'watermark' or 'seen', got '$offsetMode'")

  override def name(): String = s"lspframes($path)"
  override def schema(): StructType = LspWire.decodedSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = LspWire.decodedSchema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] =
        LspFrameTable.listCaptures(path)
          .map { case (_, abs) => LspFramePartition(abs): InputPartition }

      override def createReaderFactory(): PartitionReaderFactory =
        LspFrameTable.readerFactory

      /** Streaming over a GROWING capture directory. The offset is a
        * lexicographic NAME watermark, not a file count: each micro-batch
        * reads files with `watermark < name <= latest`, so a straggler
        * file that sorts below the watermark is skipped (and logged by
        * omission) rather than silently SHIFTING count-based slices onto
        * the wrong files. Contract (same as Spark's FileStreamSource plus
        * monotone naming): a capture file APPEARS ATOMICALLY with its
        * final content (standalone files: write to a non-`.lsp` temp
        * name, then rename; writer batches: every part plus a final
        * commit marker, which [[LspFrameFiles.write]] publishes last so
        * the batch is all-or-nothing), is never modified after
        * appearing, and names are monotone in arrival order (e.g.
        * zero-padded batch+part counters). A capture dir must use ONE
        * naming scheme for its lifetime — mixing schemes can place new
        * files below an old watermark, where they are (by design)
        * skipped. Offsets are name-based and not compatible with
        * checkpoints from pre-release builds of this source. A missing
        * directory reads as empty so the stream can start before its
        * producer.
        *
        * `.option("offsets", "seen")` switches to SEEN-FILE-SET offsets
        * (what Spark's own FileStreamSource keeps): the offset carries
        * every processed file name, so files may appear in ANY name
        * order — a straggler below the newest name is still picked up.
        * The trade is offset size: O(files) per checkpointed offset
        * versus the watermark's O(1), which is why the monotone-name
        * watermark stays the default for well-behaved writers. */
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        if (offsetMode == "seen") new MicroBatchStream {
          // Names ever LISTED or RESTORED from a checkpoint. latestOffset
          // folds each fresh listing into this set instead of rebuilding
          // the offset from the listing alone, so the offset is MONOTONE:
          // deleting a processed file (retention, compaction) cannot
          // shrink it, and a file later re-created under the same name is
          // not read a second time — the exactly-once-per-name property
          // the seen set exists to provide. Restart offsets are folded in
          // by deserializeOffset, which Spark calls before planning.
          @volatile private var known: Set[String] = Set.empty
          override def initialOffset(): Offset = LspSeenOffset(Set.empty)
          override def latestOffset(): Offset = {
            known ++= LspFrameTable.listCaptures(path, tolerateMissing = true)
              .map(_._1)
            LspSeenOffset(known)
          }
          override def deserializeOffset(json: String): Offset = {
            val o = LspSeenOffset.parse(json)
            known ++= o.names
            o
          }
          override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
            val done = start.asInstanceOf[LspSeenOffset].names
            val upTo = end.asInstanceOf[LspSeenOffset].names
            LspFrameTable.listCaptures(path, tolerateMissing = true)
              .filter { case (name, _) => upTo.contains(name) && !done.contains(name) }
              .map { case (_, abs) => LspFramePartition(abs): InputPartition }
          }
          override def createReaderFactory(): PartitionReaderFactory =
            LspFrameTable.readerFactory
          override def commit(end: Offset): Unit = ()
          override def stop(): Unit = ()
        } else new MicroBatchStream {
          override def initialOffset(): Offset = LspNameOffset("")
          override def latestOffset(): Offset = {
            val names = LspFrameTable.listCaptures(path, tolerateMissing = true)
            LspNameOffset(if (names.isEmpty) "" else names.last._1)
          }
          override def deserializeOffset(json: String): Offset =
            LspNameOffset(json)
          override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
            val (s, e) = (start.asInstanceOf[LspNameOffset].name,
              end.asInstanceOf[LspNameOffset].name)
            LspFrameTable.listCaptures(path, tolerateMissing = true)
              .filter { case (name, _) => name > s && name <= e }
              .map { case (_, abs) => LspFramePartition(abs): InputPartition }
          }
          override def createReaderFactory(): PartitionReaderFactory =
            LspFrameTable.readerFactory
          override def commit(end: Offset): Unit = ()
          override def stop(): Unit = ()
        }
    }
}

private[sources] object LspFrameTable {

  /** Part files of a writer batch: visible ONLY once their batch's commit
    * marker exists (the marker is the single atomic step that publishes
    * the whole batch — see [[LspFrameFiles.write]]). Any other `.lsp`
    * file (hand-made captures, external producers) is standalone and
    * visible as soon as it appears. */
  private[sources] val BatchPart = "^(batch-\\d{5})-part-\\d{5}\\.lsp$".r

  /** Capture files under `path` as (fileName, absolutePath), sorted by
    * NAME — the watermark compares names only, so a checkpoint stays
    * valid when the same directory is reached via a different path
    * spelling (relative cwd, symlink, remount). `tolerateMissing` lets
    * the streaming path start before the producer created the dir. */
  def listCaptures(
      path: String, tolerateMissing: Boolean = false): Array[(String, String)] = {
    val dir = new java.io.File(path)
    if (dir.isDirectory) {
      val listed = dir.listFiles() // null on race/permission failure
      if (listed == null)
        throw new java.io.IOException(s"cannot list capture dir $path")
      // one listing decides both data files and commit markers, so a
      // reader never sees a part whose marker it did not also see
      val committed = listed.map(_.getName)
        .collect { case n if n.endsWith(".commit") => n.stripSuffix(".commit") }
        .toSet
      listed.filter { f =>
        f.getName.endsWith(".lsp") && (f.getName match {
          case BatchPart(b) => committed.contains(b)
          case _ => true
        })
      }.map(f => (f.getName, f.getAbsolutePath)).sortBy(_._1)
    } else if (dir.isFile) Array((dir.getName, dir.getAbsolutePath))
    else if (tolerateMissing) Array.empty
    else throw new java.io.FileNotFoundException(
      s"lspframe path does not exist: $path")
  }

  val readerFactory: PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      new LspFrameReader(p.asInstanceOf[LspFramePartition].file)
  }
}

/** Offset = lexicographic watermark: the greatest processed file NAME. */
private[sources] case class LspNameOffset(name: String) extends Offset {
  override def json(): String = name
}

/** Offset = the full set of processed file names (FileStreamSource-style):
  * tolerates arbitrary arrival order at O(files) offset size. Serialized
  * as a SINGLE-LINE JSON array of sorted names: Spark's OffsetSeqLog
  * stores exactly one offset per line of the checkpoint file, so a
  * newline anywhere in `json()` would corrupt the log and break
  * restart-from-checkpoint — the guarantee this offset exists to
  * provide. Sorted, so equal sets serialize identically (Spark compares
  * offsets by serialized form to decide whether a batch is due). */
private[sources] case class LspSeenOffset(names: Set[String]) extends Offset {
  override def json(): String =
    names.toSeq.sorted.map(graft.JsonText.quote).mkString("[", ",", "]")
}

private[sources] object LspSeenOffset {
  /** Minimal parser for the array-of-strings form [[graft.JsonText.quote]]
    * emits (names come from the filesystem; the escapes cover quotes,
    * backslashes, and control characters). */
  def parse(json: String): LspSeenOffset = {
    val t = json.trim
    require(t.startsWith("[") && t.endsWith("]"), s"bad seen-offset: $json")
    val names = scala.collection.mutable.Set.empty[String]
    val sb = new StringBuilder
    var i = 1
    var inStr = false
    while (i < t.length - 1) {
      val c = t.charAt(i)
      if (!inStr) {
        if (c == '"') { inStr = true; sb.clear() }
        // commas/whitespace between strings are skipped
        i += 1
      } else c match {
        case '"' => names += sb.toString; inStr = false; i += 1
        case '\\' =>
          t.charAt(i + 1) match {
            case 'u' =>
              sb += Integer.parseInt(t.substring(i + 2, i + 6), 16).toChar
              i += 6
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case e => sb += e; i += 2 // \" and \\
          }
        case c2 => sb += c2; i += 1
      }
    }
    require(!inStr, s"bad seen-offset: $json")
    LspSeenOffset(names.toSet)
  }
}

private[sources] case class LspFramePartition(file: String) extends InputPartition

/** Sequential frame reader for one capture file: 4-byte BE length prefix,
  * then the protobuf frame; undecodable frames are skipped. */
private[sources] class LspFrameReader(file: String)
    extends PartitionReader[InternalRow] {

  private val in = new DataInputStream(
    new java.io.BufferedInputStream(new FileInputStream(file)))
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null) {
      val lenBytes = in.readNBytes(4)
      if (lenBytes.length < 4) return false
      val len = java.nio.ByteBuffer.wrap(lenBytes).getInt
      if (len < 0) return false
      val frame = in.readNBytes(len)
      if (frame.length < len) return false
      current = LspWire.decode(frame) // null on malformed → skip
    }
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

/** Writer-side helper: persist `(connid, seqnum, payload)` rows as
  * length-prefixed capture files, one per input partition, honoring the
  * streaming contract: monotone batch numbering (repeated writes into
  * the same dir continue the sequence instead of clobbering), and the
  * whole BATCH appears atomically — parts are invisible to
  * [[LspFrameTable.listCaptures]] until the batch's single commit marker
  * lands, so a concurrent reader can never consume half a batch. */
object LspFrameFiles {

  /** Clear abandoned debris (temps + uncommitted parts — readers never
    * saw either) and return the next batch number. Markers count toward
    * the sequence too, so a crashed-after-commit batch number is never
    * reused. Single-writer contract. */
  private def prepareNextBatch(d: java.io.File): Int = {
    d.mkdirs()
    val listed0 = Option(d.listFiles()).getOrElse(Array.empty)
    val committed0 = listed0.map(_.getName)
      .collect { case n if n.endsWith(".commit") => n.stripSuffix(".commit") }
      .toSet
    listed0.filter { f =>
      f.getName.endsWith(".lsp.tmp") || (f.getName match {
        case LspFrameTable.BatchPart(b) => !committed0.contains(b)
        case _ => false
      })
    }.foreach(_.delete())
    val existing = Option(d.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(n => n.endsWith(".lsp") || n.endsWith(".commit"))
    existing
      .flatMap(n => "batch-(\\d{5})".r.findFirstMatchIn(n).map(_.group(1).toInt))
      .foldLeft(-1)(math.max) + 1
  }

  /** Marker-last publish: renamed parts stay INVISIBLE to readers (they
    * match the batch-part pattern and have no commit marker yet), so the
    * whole batch appears atomically when the single marker file lands.
    * A failure anywhere before the marker leaves nothing visible — no
    * reader can have consumed a part that a retry would re-write, which
    * is what makes the retry-under-next-batch-number duplicate-free even
    * with a concurrent micro-batch stream on the directory. */
  private def publishBatch(dir: String, batch: Int, parts: Seq[String]): Unit =
    try {
      parts.sorted.foreach { name =>
        val tmp = new java.io.File(dir, name + ".tmp")
        val dst = new java.io.File(dir, name)
        if (!tmp.renameTo(dst))
          throw new java.io.IOException(s"cannot finalize capture $name")
      }
      val marker = new java.io.File(dir, f"batch-$batch%05d.commit")
      if (!marker.createNewFile())
        throw new java.io.IOException(s"cannot commit capture batch $batch")
    } catch {
      case e: Throwable =>
        // best-effort cleanup of the (invisible) debris; the next write
        // clears whatever survives a crash here
        parts.foreach { n =>
          new java.io.File(dir, n).delete()
          new java.io.File(dir, n + ".tmp").delete()
        }
        throw e
    }

  def write(df: org.apache.spark.sql.DataFrame, dir: String): Unit = {
    val batch = prepareNextBatch(new java.io.File(dir))
    // two-phase: tasks write temp files in parallel; the DRIVER renames
    // them in ASCENDING order once the job is done. Task-side renames
    // would appear in arbitrary completion order, letting a concurrent
    // stream's name watermark advance past not-yet-visible lower parts
    // and permanently skip them.
    val parts = df.select("connid", "seqnum", "payload").rdd
      .mapPartitionsWithIndex { case (idx, rows) =>
        val name = f"batch-$batch%05d-part-$idx%05d.lsp"
        val tmp = new java.io.File(dir, name + ".tmp")
        val out = new DataOutputStream(
          new java.io.BufferedOutputStream(new FileOutputStream(tmp)))
        try {
          rows.foreach { r =>
            val frame = LspWire.encode(r.getLong(0), r.getLong(1),
              r.getAs[Array[Byte]](2))
            out.writeInt(frame.length)
            out.write(frame)
          }
        } finally out.close()
        Iterator.single(name)
      }
      .collect()
    publishBatch(dir, batch, parts.toSeq)
  }

  /** Local (non-Spark) batch writer for ALREADY-ENCODED frames — the
    * ingestion half of [[LspSocketBridge]]: one part file, same numbering
    * and commit-marker atomicity as [[write]], so a running micro-batch
    * stream sees each flush as one all-or-nothing batch. */
  def writeFramesLocal(frames: Seq[Array[Byte]], dir: String): Unit = {
    if (frames.isEmpty) return
    val batch = prepareNextBatch(new java.io.File(dir))
    val name = f"batch-$batch%05d-part-00000.lsp"
    val tmp = new java.io.File(dir, name + ".tmp")
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(new FileOutputStream(tmp)))
    try {
      frames.foreach { frame =>
        out.writeInt(frame.length)
        out.write(frame)
      }
    } finally out.close()
    publishBatch(dir, batch, Seq(name))
  }
}

/** Live S3 ingestion: drains a UDP socket into atomic capture batches,
  * bridging the reference's blocking `recvfrom` loop
  * (`lsp_common.c:54-95`) onto the micro-batch DSv2 source — a running
  * `readStream` on the capture dir sees live traffic end-to-end, each
  * datagram exactly once.
  *
  * One datagram = one LSP wire frame (exactly the reference's transport
  * granularity); payloads are stored RAW — the scan-side decoder already
  * skips malformed frames, so the bridge never needs to parse, and a
  * corrupt datagram costs a scan-side skip instead of an ingest crash.
  * Frames are buffered and flushed as a commit-marked batch every
  * `flushCount` datagrams or `flushMillis` of quiet, whichever first —
  * the latency/file-size dial. Single bridge per directory (the writer
  * contract); scale-out is one bridge+directory per listening port, with
  * the stream reading the union. */
final class LspSocketBridge(
    dir: String, port: Int = 0, flushCount: Int = 256, flushMillis: Long = 200L,
    recvBufferBytes: Int = 1 << 22) {

  private val socket = new java.net.DatagramSocket(port)
  // the kernel buffer must absorb the burst a producer emits during one
  // capture-flush pause (the receive loop is blocked on disk for a few
  // ms); a request above net.core.rmem_max is silently capped — a sizing
  // hint, not a guarantee, exactly like the reference's socket setup
  socket.setReceiveBufferSize(recvBufferBytes)
  @volatile private var running = false
  @volatile private var error: Throwable = _
  private var thread: Thread = _

  /** Bound UDP port (useful when constructed with the ephemeral port 0). */
  def localPort: Int = socket.getLocalPort

  /** The failure that stopped ingestion, if any — a bridge whose writer
    * path failed must be OBSERVABLY dead, not silently dropping
    * datagrams (its whole contract is exactly-once delivery). */
  def failure: Option[Throwable] = Option(error)

  def start(): this.type = synchronized {
    require(thread == null, "bridge already started")
    running = true
    thread = new Thread(() => loop(), s"lsp-socket-bridge-$localPort")
    thread.setDaemon(true)
    thread.start()
    this
  }

  /** Stop receiving, flush buffered frames, close the socket. Rethrows
    * the ingestion failure if the receive loop died early — callers must
    * not mistake a crashed bridge for a clean drain. */
  def stop(): Unit = synchronized {
    running = false
    if (thread != null) { thread.join(10000); thread = null }
    socket.close()
    if (error != null) throw new java.io.IOException(
      "socket bridge failed while ingesting; frames after the failure were dropped",
      error)
  }

  private def loop(): Unit = {
    val buf = new Array[Byte](65535) // max UDP payload; frames are small
    val pending = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var lastFlush = System.nanoTime()
    socket.setSoTimeout(20)
    def flush(): Unit = if (pending.nonEmpty) {
      LspFrameFiles.writeFramesLocal(pending.toSeq, dir)
      pending.clear()
      lastFlush = System.nanoTime()
    }
    try {
      while (running) {
        val packet = new java.net.DatagramPacket(buf, buf.length)
        try {
          socket.receive(packet)
          pending += java.util.Arrays.copyOfRange(buf, 0, packet.getLength)
        } catch {
          case _: java.net.SocketTimeoutException => // idle tick → check flush
        }
        if (pending.size >= flushCount ||
          (pending.nonEmpty &&
            (System.nanoTime() - lastFlush) / 1000000L >= flushMillis))
          flush()
      }
      flush() // drain the tail on stop
    } catch {
      case t: Throwable => error = t // surfaced by failure/stop()
    }
  }
}
