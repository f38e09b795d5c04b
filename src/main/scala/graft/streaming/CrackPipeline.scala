package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, Encoders}

import graft.keyspace.Keyspace
import graft.streaming.CrackService.{CrackReply, PartitionVerdict}

/** The complete reference dataflow as ONE streaming job (SURVEY.md §3):
  * crack-request stream → range-partitioned worker scans → first-found /
  * all-exhausted verdict fold → reply stream.
  *
  * - request intake ≅ `handle_crack_req` (`server.c:229-241`)
  * - tiling ≅ `assign_one_req` (`server.c:333-438`; exact, no overshoot)
  * - [[scanTile]] ≅ the worker loop (`worker.c:58-108`) — with in-place
  *   successor (no per-candidate malloc, `worker.c:27,98-100`) and
  *   early exit on first hit (L3)
  * - verdict fold ≅ `check_req_status` (`server.c:243-331`) via
  *   [[CrackService.replyStream]]
  */
object CrackPipeline {

  /** One crack request (≅ `"c <hash> <lower> <upper>"` over the full
    * domain, `request.c:40-69`). */
  final case class CrackJob(reqId: Long, hashHex: String, len: Int, nParts: Int)

  /** Internal fan-out unit (one worker assignment). Not `private` — the
    * encoder's generated code must reference the class. */
  final case class TileTask(
      reqId: Long, hashHex: String, len: Int, partId: Int, nParts: Int,
      lo: Long, hi: Long)

  /** Sequential scan of ordinals `[lo, hi]` for the first sha1 preimage —
    * the worker inner loop, re-expressed without the reference's
    * per-candidate allocation (bytes buffer mutated in place via base-26
    * successor; target hex decoded ONCE to raw digest bytes, so the loop
    * compares 20 bytes fail-fast instead of hex-encoding every candidate)
    * and without its all-`z` UB (bounds are ordinals). */
  def scanTile(hashHex: String, len: Int, lo: Long, hi: Long): Option[String] = {
    val target = hexToBytes(hashHex.toLowerCase)
    val md = MessageDigest.getInstance("SHA-1")
    val buf = Keyspace.numToPassBytes(lo, len, wrap = false)
    var ord = lo
    while (ord <= hi) {
      if (java.util.Arrays.equals(md.digest(buf), target))
        return Some(new String(buf, java.nio.charset.StandardCharsets.US_ASCII))
      // in-place lexicographic successor with carry (z→a), worker.c:21-39
      var p = len - 1
      while (p >= 0 && buf(p) == 'z') { buf(p) = 'a'; p -= 1 }
      if (p >= 0) buf(p) = (buf(p) + 1).toByte
      ord += 1
    }
    None
  }

  private def hexToBytes(hex: String): Array[Byte] = {
    require(hex.length == 40, s"expected 40-hex sha1, got ${hex.length} chars")
    val out = new Array[Byte](20)
    var i = 0
    while (i < 20) {
      out(i) = ((Character.digit(hex.charAt(2 * i), 16) << 4) |
        Character.digit(hex.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    out
  }

  /** Request stream → tile-task stream (the fan-out of
    * `server.c:333-438`), spread by (reqId, partId) — partitioning by
    * partId alone would co-locate tile i of every concurrent request. */
  private def tileStream(jobs: Dataset[CrackJob]): Dataset[TileTask] = {
    implicit val tileEnc = Encoders.product[TileTask]
    jobs
      .flatMap { job =>
        // malformed requests are dropped silently, mirroring the reference
        // server's handling of unknown/invalid messages (server.c:103-128
        // UNKNOWN → ignored) — a poison request must never fail the
        // long-lived stream for everyone else
        if (job.len < 1 || job.len > Keyspace.MaxLen || job.nParts < 1 ||
          job.hashHex == null || job.hashHex.length != 40) {
          Seq.empty[TileTask]
        } else {
          val (lo, hi) = Keyspace.fullRange(job.len)
          val tiles = Keyspace.tile(lo, hi, job.nParts)
          // nParts = tiles.size, the ACTUAL verdict count foldVerdicts
          // will see — never re-derive the tiler's clamp formula
          tiles.zipWithIndex.map { case ((s, e), i) =>
            TileTask(job.reqId, job.hashHex, job.len, i, tiles.size, s, e)
          }
        }
      }
      .repartition(org.apache.spark.sql.functions.col("reqId"),
        org.apache.spark.sql.functions.col("partId"))
  }

  /** Request stream → per-partition verdict stream (the fan-out/scan/fan-in
    * of `server.c:333-438` + `worker.c`). */
  def verdictStream(jobs: Dataset[CrackJob]): Dataset[PartitionVerdict] = {
    implicit val verdictEnc = Encoders.product[PartitionVerdict]
    tileStream(jobs).map { t =>
      val hit = scanTile(t.hashHex, t.len, t.lo, t.hi)
      PartitionVerdict(t.reqId, t.partId, t.nParts,
        found = hit.isDefined, hit.orNull)
    }
  }

  /** Verdicts carrying the job spec — the recovery-capable fan-in input
    * ([[CrackService.replyStreamRecovering]] rescans overdue tiles from
    * these fields). */
  def jobVerdictStream(jobs: Dataset[CrackJob]): Dataset[CrackService.JobVerdict] = {
    implicit val verdictEnc = Encoders.product[CrackService.JobVerdict]
    tileStream(jobs).map { t =>
      val hit = scanTile(t.hashHex, t.len, t.lo, t.hi)
      CrackService.JobVerdict(t.reqId, t.partId, t.nParts, t.hashHex, t.len,
        found = hit.isDefined, hit.orNull)
    }
  }

  /** Full pipeline: requests in, replies out. */
  def replyStream(jobs: Dataset[CrackJob]): Dataset[CrackReply] =
    CrackService.replyStream(verdictStream(jobs))

  /** Full pipeline with straggler recovery: a request whose worker
    * verdicts stall for `timeoutMs` of processing time has its unheard
    * tiles rescanned in the fan-in, completing the reply the reference's
    * stub rescheduler (`server.c:440-447`) never could. */
  def replyStreamRecovering(
      jobs: Dataset[CrackJob], timeoutMs: Long): Dataset[CrackReply] =
    CrackService.replyStreamRecovering(jobVerdictStream(jobs), timeoutMs)
}
