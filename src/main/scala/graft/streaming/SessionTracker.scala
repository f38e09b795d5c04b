package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, Encoders}

/** Streaming re-expression of the LSP connection layer's stateful semantics
  * (SURVEY.md §2.10):
  *   - F5/T5 in-order delivery + retransmit dedup: accept a DATA_SEND iff
  *     `seqnum == expected` (`lsp_server.c:241-249`); duplicates and
  *     out-of-window packets are dropped silently — here they surface as
  *     observable DROP events instead of silence.
  *   - T2 liveness: a connection with no traffic for `epochLen × epochCnt`
  *     (reference defaults 2 s × 5, `lsp_server.c:9-10`) is evicted on a
  *     processing-time timeout (`lsp_server.c:31-35`).
  */
object SessionTracker {

  final case class LspPacket(connid: Long, seqnum: Long, payloadLen: Int)

  /** `struct lsp_conn_desc` reduced to what delivery needs
    * (`api.h:73-84`): the next expected sequence number. */
  final case class ConnState(expectedNext: Long)

  /** Observable connection event (the reference logs-and-drops; we emit). */
  final case class ConnEvent(connid: Long, event: String, seqnum: Long)

  val Delivered = "DELIVERED"
  val DupDropped = "DUP_DROPPED"          // T5: retransmit of an acked seqnum
  val OutOfOrderDropped = "OOO_DROPPED"   // F5: future seqnum (stop-and-wait ⇒ protocol violation)
  val TimedOut = "TIMEOUT_CLOSED"         // T2: epoch eviction

  def trackConn(epochTimeoutMs: Long)(
      connid: Long,
      packets: Iterator[LspPacket],
      state: GroupState[ConnState]): Iterator[ConnEvent] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.single(ConnEvent(connid, TimedOut, -1L))
    }
    var st = state.getOption.getOrElse(ConnState(1L))
    val out = Seq.newBuilder[ConnEvent]
    // within a batch, process in seqnum order (the network may reorder;
    // the reference's single-threaded read loop serializes arrival)
    packets.toSeq.sortBy(_.seqnum).foreach { p =>
      if (p.seqnum == st.expectedNext) {
        out += ConnEvent(connid, Delivered, p.seqnum)
        st = ConnState(st.expectedNext + 1)
      } else if (p.seqnum < st.expectedNext) {
        out += ConnEvent(connid, DupDropped, p.seqnum)
      } else {
        out += ConnEvent(connid, OutOfOrderDropped, p.seqnum)
      }
    }
    state.update(st)
    if (epochTimeoutMs > 0) state.setTimeoutDuration(epochTimeoutMs)
    out.result().iterator
  }

  /** Packet stream → delivery/drop/timeout event stream.
    * `epochLenMs * epochCnt` mirrors the reference's ~10 s liveness horizon.
    * `epochCnt = 0` disables eviction (NoTimeout) — ProcessingTimeTimeout
    * makes the micro-batch loop spin on timer-only batches, which tests
    * must avoid; the timeout branch is unit-tested via `TestGroupState`. */
  def eventStream(
      packets: Dataset[LspPacket],
      epochLenMs: Long = 2000L,
      epochCnt: Int = 5): Dataset[ConnEvent] = {
    implicit val stateEnc = Encoders.product[ConnState]
    implicit val outEnc = Encoders.product[ConnEvent]
    implicit val keyEnc = Encoders.scalaLong
    val timeout =
      if (epochCnt > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    packets
      .groupByKey(_.connid)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        trackConn(epochLenMs * epochCnt))
  }

  /** T5 as a declarative op: event-time watermarked dedup of retransmits
    * on (connid, seqnum) — the `dropDuplicatesWithinWatermark` form for
    * pipelines that only need dedup, not full session state. */
  def dedupRetransmits[T](
      packets: Dataset[T], tsCol: String, watermark: String): Dataset[T] =
    packets
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("connid", "seqnum")
}
