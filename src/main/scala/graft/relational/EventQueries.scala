package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Event-time analytics over the `events` table — the batch (event-time)
  * generalization of the reference LSP layer's processing-time semantics
  * (SURVEY.md §2.10). Streaming twins live in `graft.streaming`.
  */
object EventQueries {

  import Tables.load

  /** `events.ts` arrives as a raw long of nanos (see [[Tables.load]]).
    * Exact integer micros since epoch — integer `div` keeps it in long
    * arithmetic (a double division would lose precision above 2^53 ns). */
  private[graft] def tsMicros: Column = expr("ts div 1000")
  /** µs → session-TZ timestamp (sessions run UTC, matching a naive oracle). */
  private[graft] def tsUtc: Column = timestamp_micros(tsMicros)

  /** Tumbling 1-hour windows per event type (event-time windowed agg). */
  def qEventsHourly(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", tsUtc), "yyyy-MM-dd HH:mm:ss")
          .as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))

  /** Sessionization (gaps-and-islands): a session breaks after 30 min of
    * per-user silence — the batch analog of the reference's epoch-based
    * liveness eviction (T2: `lsp_server.c:18-42`, 2s × 5 epochs). */
  def qEventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), tsMicros.as("ts_us"))
      .withColumn("prev_us", lag("ts_us", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull, 1)
          .when(col("ts_us") - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_session").over(byUser))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("event_id").as("first_event"),
        max("event_id").as("last_event"))
  }

  /** JSON payload extraction + aggregation (`props` is a JSON string). */
  def qEventsJson(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))

  /** Exact dedup with a deterministic keeper (first event per
    * (user, type) — T5's retransmit-dedup as a batch op). */
  def qEventsDedup(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(min("event_id").as("keep_event"),
        count(lit(1)).as("n_duplicates"))
}
