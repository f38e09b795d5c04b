package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Event-time windowed counts with watermarking — the §2.10 event-time
  * surface of the streaming layer. The stateful trackers
  * ([[SessionTracker]]) are processing-time, faithful to the reference's
  * epoch loop (`lsp_server.c:9-10`); a pipeline's ingest metrics want the
  * event-time form: tumbling/sliding counts whose STATE IS BOUNDED by the
  * watermark horizon (windows older than `watermark` finalize and emit;
  * rows later than it are dropped — the generalized T7 late/stale rule).
  *
  * The same functions run on BOTH streaming and batch frames: on a batch
  * frame Catalyst's `EliminateEventTimeWatermark` removes the watermark
  * node, leaving the exact batch equivalent of the streaming plan — which
  * is how `q_window_tumbling`/`q_window_sliding` carry DuckDB oracles for
  * the streaming query's window semantics (StreamingSpec drives the same
  * function through MemoryStream + watermark for the late-drop behavior
  * an oracle can't see).
  *
  * At scale: one shuffle on (window, keys); since the window is derived
  * from the timestamp by arithmetic (epoch-aligned buckets), partial
  * aggregation combines map-side, and streaming state is
  * O(active windows × keys), not O(events).
  */
object EventTimeWindows {

  /** Tumbling event-time counts per key: one row per (window, keys),
    * windows epoch-aligned with width `width`. */
  def tumblingCounts(
      events: DataFrame, tsCol: String, width: String,
      watermark: String, keys: Seq[String]): DataFrame =
    windowedCounts(events, tsCol, window(col(tsCol), width), watermark, keys)

  /** Sliding event-time counts: each event lands in `width / slide`
    * overlapping windows (`slide` must divide `width` for gapless
    * coverage). */
  def slidingCounts(
      events: DataFrame, tsCol: String, width: String, slide: String,
      watermark: String, keys: Seq[String]): DataFrame =
    windowedCounts(
      events, tsCol, window(col(tsCol), width, slide), watermark, keys)

  private def windowedCounts(
      events: DataFrame, tsCol: String, win: Column,
      watermark: String, keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(win.as("win") +: keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(Seq(col("win.start").as("win_start"),
        col("win.end").as("win_end")) ++
        keys.map(col) :+ col("n_events"): _*)

  /** NATIVE session windows (`session_window`): per-key sessions that
    * extend while consecutive events arrive within `gap` of each other —
    * INCLUSIVE at the boundary: an event exactly `gap` later still
    * extends the session (pinned against a MemoryStream in
    * StreamingSpec; the reported end is `last + gap`, but merging treats
    * that edge as inside). Unlike the gaps-and-islands batch formulation
    * ([[graft.relational.EventQueries.qEventsSessionize]]), this one
    * RUNS ON A STREAM:
    * state is merged session ranges per key, finalized and emitted once
    * the watermark passes a session's end — O(open sessions), not
    * O(events). Same function serves the oracled batch twin
    * (`q_session_window`); timestamps exit as epoch micros per the
    * determinism contract. */
  def sessionCounts(
      events: DataFrame, tsCol: String, gap: String,
      watermark: String, keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("win") +: keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(keys.map(col) ++ Seq(
        unix_micros(col("win.start")).as("sess_start_us"),
        unix_micros(col("win.end")).as("sess_end_us"),
        col("n_events")): _*)
}
