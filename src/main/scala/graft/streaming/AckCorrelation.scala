package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STREAM correlation of DATA_SENDs with their ACKs — the LSP
  * round-trip (`lsp_common.c:97-137`: a data frame is acked by an empty
  * frame with the same connid+seqnum) as a watermarked two-stream join,
  * the one Structured Streaming join shape the session trackers don't
  * cover. The reference measures nothing here (its epoch loop only
  * retransmits); the generalization every transport pipeline wants is
  * per-message RTT and, via the outer join, the unacked sends an epoch
  * handler would retransmit.
  *
  * State bounding — the part that matters at scale: BOTH sides carry a
  * watermark and the join condition carries the ack horizon
  * (`ack_ts ∈ [send_ts, send_ts + horizon]`), so each side's buffered
  * state is bounded by its watermark delay plus the horizon, not by
  * stream length. Without the time-range bound Spark would have to hold
  * every send forever — exactly the unbounded-state mistake the
  * watermarked formulation exists to prevent.
  *
  * The same function runs on batch frames (watermarks optimize away),
  * which is how `q_ack_rtt` carries a DuckDB oracle for the join
  * relation; StreamingSpec drives the incremental semantics (eager inner
  * emission, outer null-padding only after the watermark passes) through
  * MemoryStreams.
  *
  * Expected schemas: sends `(connid, seqnum, send_ts)`, acks
  * `(connid, seqnum, ack_ts)`.
  */
object AckCorrelation {

  /** Join sends with acks on (connid, seqnum) within `ackHorizon`.
    * `joinType` "inner" emits matched round-trips with their RTT;
    * "left_outer" additionally emits never-acked (or acked-too-late)
    * sends with NULL ack columns once the watermark proves no ack can
    * arrive — the retransmission-needed signal. */
  def correlateAcks(
      sends: DataFrame, acks: DataFrame,
      ackHorizon: String = "4 seconds",
      watermark: String = "10 seconds",
      joinType: String = "inner"): DataFrame = {
    val s = sends.withWatermark("send_ts", watermark).alias("s")
    val a = acks.withWatermark("ack_ts", watermark).alias("a")
    s.join(a,
        col("s.connid") === col("a.connid") &&
          col("s.seqnum") === col("a.seqnum") &&
          col("a.ack_ts") >= col("s.send_ts") &&
          col("a.ack_ts") <= col("s.send_ts") + expr(s"INTERVAL $ackHorizon"),
        joinType)
      .select(col("s.connid").as("connid"), col("s.seqnum").as("seqnum"),
        col("s.send_ts").as("send_ts"), col("a.ack_ts").as("ack_ts"),
        (unix_millis(col("a.ack_ts")) - unix_millis(col("s.send_ts")))
          .as("rtt_ms"))
  }
}
