package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, Encoders}

/** Streaming re-expression of the coordinator's crack-job state machine
  * (T8, SURVEY.md §2.10): request status 0→1→2 (`server.c:37`), first-found
  * and all-exhausted verdict aggregation (A1/A2, `server.c:243-331`).
  *
  * Input: a stream of per-partition verdicts (each worker's `"f <pass>"` /
  * `"x"` reply, `worker.c:85-107`). Output: at most ONE reply per request:
  *   - `f <pass>` as soon as any partition reports found — the reference's
  *     eager reply without waiting for stragglers (`server.c:251-256`);
  *   - `x` only after ALL partitions report not-found (`server.c:257-263`).
  *
  * Deliberate deltas from the reference: a duplicate `found` does NOT
  * overwrite the stored pass (the reference overwrites unconditionally,
  * `server.c:291` — benign there, idempotent here), and request state is
  * freed exactly when the outstanding-partition count hits zero
  * (`server.c:264-272`).
  */
object CrackService {

  /** One worker partition's verdict for a request (X3 fan-in). */
  final case class PartitionVerdict(
      reqId: Long, partId: Int, nParts: Int, found: Boolean, pass: String)

  /** Coordinator-side per-request state (`struct request_s`,
    * `server.c:31-40`): outstanding partitions ≅ `req_worker_list`
    * membership (A3), found flag + result buffer (A1). */
  final case class CrackState(
      remaining: Int, found: Boolean, pass: String, replied: Boolean)

  /** The reply the requester sees (`request.c:78-80`): status `f` or `x`. */
  final case class CrackReply(reqId: Long, status: String, pass: String)

  def foldVerdicts(
      reqId: Long,
      verdicts: Iterator[PartitionVerdict],
      state: GroupState[CrackState]): Iterator[CrackReply] = {
    var st = state.getOption.getOrElse(CrackState(-1, found = false, null, replied = false))
    val replies = Seq.newBuilder[CrackReply]
    verdicts.foreach { v =>
      if (st.remaining < 0) st = st.copy(remaining = v.nParts)
      st = st.copy(remaining = st.remaining - 1)
      if (v.found && !st.found)
        st = st.copy(found = true, pass = v.pass)
      // eager reply on first found (server.c:251-256); exhausted reply only
      // when the last partition reports (server.c:257-263)
      if (st.found && !st.replied) {
        replies += CrackReply(reqId, "f", st.pass)
        st = st.copy(replied = true)
      } else if (st.remaining == 0 && !st.found && !st.replied) {
        replies += CrackReply(reqId, "x", null)
        st = st.copy(replied = true)
      }
    }
    if (st.remaining == 0) state.remove() // free request (server.c:264-272)
    else state.update(st)
    replies.result().iterator
  }

  /** Verdict stream → reply stream (append mode, unbounded state keyed by
    * request id, freed on completion). */
  def replyStream(verdicts: Dataset[PartitionVerdict]): Dataset[CrackReply] = {
    implicit val stateEnc = Encoders.product[CrackState]
    implicit val outEnc = Encoders.product[CrackReply]
    implicit val keyEnc = Encoders.scalaLong
    verdicts
      .groupByKey(_.reqId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        foldVerdicts _)
  }
}
