package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Event-time analytics over the `events` table — the batch (event-time)
  * generalization of the reference LSP layer's processing-time semantics
  * (SURVEY.md §2.10). Streaming twins live in `graft.streaming`.
  */
object EventQueries {

  /** Z-order locality census: events keyed by the Morton interleave of
    * (user_id, floor(value)), grouped into z-buckets. The point the
    * numbers make: within one z-bucket BOTH dimensions are
    * range-bounded, which is exactly the property that lets parquet
    * min/max stats prune a 2-D range predicate after a z-sort — a
    * single-column sort bounds only its leading key (ZOrderSpec measures
    * the row-group skip rate difference against real footers). */
  def qZorderStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      // EXPLICIT 16-bit non-negative quantization: the oracle
      // hand-interleaves 16 bits, so the query clamps to that domain
      // rather than assuming the data never grows past it
      .select(
        col("user_id").bitwiseAND(lit(65535L)).as("user_id"),
        greatest(floor(col("value")).cast("long"), lit(0L))
          .bitwiseAND(lit(65535L)).as("qv"))
      .withColumn("z",
        graft.functions.z_order(col("user_id"), col("qv")))
      .withColumn("zbucket", shiftright(col("z"), 10))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"),
        min("user_id").as("u_min"), max("user_id").as("u_max"),
        min("qv").as("v_min"), max("qv").as("v_max"))

  /** Hilbert locality census — [[qZorderStats]]'s twin on the
    * Hilbert-curve index ([[graft.functions.hilbert_index]]): same
    * 16-bit quantization, same bucket width, same per-bucket bounding
    * boxes. The two censuses together quantify WHY a lake would pick
    * Hilbert clustering: consecutive Hilbert indices are always
    * adjacent cells, so the same-size bucket bounds a tighter rectangle
    * (ZOrderSpec measures both and pins the comparison). */
  def qHilbertStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(
        col("user_id").bitwiseAND(lit(65535L)).as("user_id"),
        greatest(floor(col("value")).cast("long"), lit(0L))
          .bitwiseAND(lit(65535L)).as("qv"))
      .withColumn("h",
        graft.functions.hilbert_index(col("user_id"), col("qv")))
      .withColumn("hbucket", shiftright(col("h"), 10))
      .groupBy("hbucket")
      .agg(count(lit(1)).as("n"),
        min("user_id").as("u_min"), max("user_id").as("u_max"),
        min("qv").as("v_min"), max("qv").as("v_max"))


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

  /** Tumbling 15-minute event-time windows through the STREAMING layer's
    * [[graft.streaming.EventTimeWindows.tumblingCounts]] — on this batch
    * frame the watermark node is optimized away, so the DuckDB oracle
    * checks the exact relation the streaming query emits once its
    * watermark passes (the late-drop behavior itself is covered by
    * StreamingSpec on a MemoryStream). */
  def qWindowTumbling(spark: SparkSession, dir: String): DataFrame =
    formatWindow(graft.streaming.EventTimeWindows.tumblingCounts(
      load(spark, dir, "events")
        .select(col("event_type"), tsUtc.as("ets")),
      "ets", "15 minutes", "30 minutes", Seq("event_type")))

  /** Sliding 30-minute windows every 15 minutes — each event contributes
    * to exactly 2 windows; same streaming-function-on-batch pattern as
    * [[qWindowTumbling]]. */
  def qWindowSliding(spark: SparkSession, dir: String): DataFrame =
    formatWindow(graft.streaming.EventTimeWindows.slidingCounts(
      load(spark, dir, "events")
        .select(col("event_type"), tsUtc.as("ets")),
      "ets", "30 minutes", "15 minutes", "30 minutes", Seq("event_type")))

  /** NATIVE session windows (`session_window`) through the streaming
    * layer's [[graft.streaming.EventTimeWindows.sessionCounts]] — 30-min
    * gap per user, batch twin of the streaming query. The oracle pins
    * the MERGE semantics Spark implements, measured on a MemoryStream in
    * StreamingSpec: an event EXACTLY `gap` after the previous one still
    * EXTENDS the session (the reported end is `last + gap`, but merging
    * treats that boundary as inclusive) — i.e. `> gap` breaks, the same
    * convention as [[qEventsSessionize]]'s window-function formulation.
    * What this query adds over that one is the operator itself: the
    * session assignment runs on a live stream with watermark-bounded
    * state, which lag()-over-window cannot. */
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventTimeWindows.sessionCounts(
      load(spark, dir, "events").select(col("user_id"), tsUtc.as("ets")),
      "ets", "30 minutes", "30 minutes", Seq("user_id"))

  /** Batch twin of the stream-stream ACK correlation
    * ([[graft.streaming.AckCorrelation.correlateAcks]]): a deterministic
    * send/ack fixture derived from `events` — every message is "sent" at
    * its event time; its ack arrives `event_id % 5 + 1` seconds later
    * except every 11th message, which is never acked. With a 4-second
    * horizon the delay-5 acks fall outside the window, so the oracle
    * exercises the time-range bound, the equi keys, and the missing-ack
    * case in one relation. Output is integer milliseconds only
    * (timestamps never leave a query raw). */
  def qAckRtt(spark: SparkSession, dir: String): DataFrame = {
    val byConn = Window.partitionBy("connid").orderBy("ts", "event_id")
    val log = load(spark, dir, "events")
      .select(col("event_id"), col("user_id").as("connid"), col("ts"))
      .withColumn("seqnum", row_number().over(byConn).cast("long"))
    val sends = log.select(col("connid"), col("seqnum"),
      tsUtc.as("send_ts"))
    val acks = log.filter(col("event_id") % 11 =!= 0)
      .select(col("connid"), col("seqnum"),
        timestamp_micros(tsMicros +
          (col("event_id") % 5 + 1) * 1000000L).as("ack_ts"))
    graft.streaming.AckCorrelation
      .correlateAcks(sends, acks, ackHorizon = "4 seconds")
      .select(col("connid"), col("seqnum"), col("rtt_ms"))
  }

  /** Window bounds exit as formatted strings (oracle comparability rule:
    * timestamps never leave a query raw). */
  private def formatWindow(df: DataFrame): DataFrame =
    df.select(
      date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
      date_format(col("win_end"), "yyyy-MM-dd HH:mm:ss").as("win_end"),
      col("event_type"), col("n_events"))

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

  /** AS-OF join via the union + running-last trick: for each `purchase`,
    * the most recent `click` by the same user at or before it.
    *
    * Spark has no native as-of join; the naive formulation (range join +
    * per-row max) explodes to O(left × right) per user. This plan instead
    * interleaves both sides in ONE shuffle on `user_id`, sorts by time
    * within the partition, and carries the latest right-side row forward
    * with `last(_, ignoreNulls)` — O(n log n) per partition, no pair
    * blowup, and AQE-friendly. Right rows sort before left rows at equal
    * timestamps, giving ASOF `>=` (inclusive) semantics.
    *
    * PRECONDITION for oracle parity: at most one click per `(user_id,
    * ts)` (asserted on the test data in RelationalSpec). With ties, this
    * implementation deterministically keeps the max `src_id` (the sort
    * carries `src_id` ascending and `last` wins), but SQL ASOF JOIN
    * leaves the tie choice unspecified, so equal-timestamp clicks could
    * legitimately differ from a given oracle engine. */
  /** Winsorization (robust clipping) — the outlier-tail cleanup a feature
    * pipeline runs before normalization: per event_type, find the EXACT
    * p01/p99 order statistics and census how much mass clipping moves.
    *
    * Exactness without a global sort: ranks select values, they never do
    * arithmetic on them, so the quantiles are bit-identical in any
    * engine; the clipped sum is fixed-point cents. The k-th order
    * statistic comes from a cumulative count over the per-type DISTINCT
    * value histogram — the window runs over distinct values (bounded by
    * value cardinality), not rows, which is the classic exact-quantile
    * shape that survives a 100 TB group where `sort the group in one
    * task` does not. Rank formula: k_p = (n−1)·p div 100 + 1 (1-based,
    * integer arithmetic only). */
  /** Exact decile binning (quantile discretization — the featurization
    * step that turns a continuous column into categorical bins): per
    * event type, the 9 interior decile boundaries are rank-SELECTED raw
    * values over the distinct-value histogram (the [[qValueClip]]
    * machinery — no corpus-wide sort, no interpolation arithmetic), and
    * each row's bin is the count of boundaries ≤ its value — a pure
    * integer derived from selected raw doubles, so the census oracles
    * exactly. Output is the per-(type, bin) census a feature pipeline
    * logs: row count and the bin's observed value range. */
  def qQuantileBins(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events").select(col("event_type"), col("value"))
    val freq = ev.groupBy("event_type", "value").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = freq.withColumn("cumn", sum("c").over(w))
    val bounds = cum
      .groupBy("event_type").agg(sum("c").as("n"))
      .join(cum, "event_type")
      .groupBy(col("event_type"), col("n"))
      .agg(
        min(when(col("cumn") >= expr(s"(n - 1) * 10 div 100 + 1"),
          col("value"))).as("b1"),
        (2 to 9).map(k =>
          min(when(col("cumn") >= expr(s"(n - 1) * ${k * 10} div 100 + 1"),
            col("value"))).as(s"b$k")): _*)
    val bin = (1 to 9)
      .map(k => when(col("value") >= col(s"b$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    ev.join(broadcast(bounds), "event_type")
      .withColumn("bin", bin)
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n_rows"),
        min("value").as("v_min"), max("value").as("v_max"))
  }

  /** Exact 10%-trimmed mean of order totals per priority — the robust
    * location estimate that DROPS the tails ([[qValueClip]] winsorizes
    * — clips them to the fence — so the two disagree exactly where
    * outliers live). Rank bounds come from the cents-value histogram
    * walk (the qConformal order-statistic discipline — never a corpus
    * sort): a distinct value with cumulative range (cum−c, cum]
    * contributes `min(cum, hi) − max(cum−c, lo)` kept rows to the
    * middle (lo, hi] = (⌊n/10⌋, n−⌊n/10⌋], and the trimmed mean is one
    * truncating division of exact kept sums. Per-group windows run
    * over the bounded distinct-cents histogram. */
  def qTrimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val cents = load(spark, dir, "orders")
      .select(col("o_orderpriority").as("grp"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("v"))
    val hist = cents.groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum("c").over(Window.partitionBy("grp").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("c").over(Window.partitionBy("grp")))
    cum
      .withColumn("lo", expr("n div 10"))
      .withColumn("hi", expr("n - n div 10"))
      .withColumn("kept", expr(
        "greatest(0, least(cum, hi) - greatest(cum - c, lo))"))
      .groupBy("grp")
      .agg(first("n").as("n_rows"),
        sum("kept").as("n_kept"),
        sum(expr("cast(v as decimal(38,0)) * kept")).as("kept_sum"))
      .select(col("grp"), col("n_rows"), col("n_kept"),
        expr("cast(kept_sum div n_kept as bigint)")
          .as("trimmed_mean_cents"))
  }

  def qValueClip(
      spark: SparkSession, dir: String,
      loPct: Int = 1, hiPct: Int = 99): DataFrame = {
    val ev = load(spark, dir, "events").select(col("event_type"), col("value"))
    val freq = ev.groupBy("event_type", "value").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = freq.withColumn("cumn", sum("c").over(w))
    val bounds = cum
      .groupBy("event_type").agg(sum("c").as("n"))
      .join(cum, "event_type")
      .groupBy(col("event_type"), col("n"))
      .agg(
        min(when(col("cumn") >= expr(s"(n - 1) * $loPct div 100 + 1"),
          col("value"))).as("p_lo"),
        min(when(col("cumn") >= expr(s"(n - 1) * $hiPct div 100 + 1"),
          col("value"))).as("p_hi"))
    ev.join(broadcast(bounds), "event_type")
      .groupBy("event_type")
      // the quantiles are SELECTED raw doubles (no arithmetic, no
      // rounding): the stored bits are what both engines output
      .agg(first("n").as("n"),
        first("p_lo").as("p_lo"),
        first("p_hi").as("p_hi"),
        sum(when(col("value") < col("p_lo"), 1L).otherwise(0L))
          .as("n_clip_lo"),
        sum(when(col("value") > col("p_hi"), 1L).otherwise(0L))
          .as("n_clip_hi"),
        sum(floor(greatest(least(col("value"), col("p_hi")), col("p_lo"))
          * 100 + 0.5).cast("long")).as("clipped_sum_cents"))
  }

  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsMicros.as("ts_us"))
    // side 0 = right (click), 1 = left (purchase): right first at ties
    val tagged = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), lit(0).as("side"),
        col("event_id").as("src_id"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), lit(1).as("side"),
          col("event_id").as("src_id")))
    val w = Window.partitionBy("user_id")
      .orderBy("ts_us", "side", "src_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click",
        last(when(col("side") === 0,
          struct(col("ts_us"), col("src_id"))), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("src_id").as("event_id"), col("user_id"),
        col("last_click.src_id").as("click_event_id"),
        (col("ts_us") - col("last_click.ts_us")).as("us_since_click"))
  }

  /** Session-path mining: the census of session-OPENING event-type
    * trigrams (`t1>t2>t3` of each ≥3-event session) — the "how do
    * journeys start" product query, and the n-gram generalization of
    * the Markov transition census ([[qEventTransitions]] models one
    * step; paths capture order-3 structure).
    *
    * Derivation is [[qEventsSessionize]]'s gaps-and-islands pass plus a
    * per-session rank; the trigram pivots out via three conditional
    * `max`es (no ordered `collect_list` — aggregation order is not a
    * contract anywhere). Path space is bounded by |event types|³. */
  def qSessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val sess = load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsMicros.as("ts_us"))
      .withColumn("prev_us", lag("ts_us", 1).over(byUser))
      .withColumn("ns",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum("ns").over(byUser))
    val bySess = Window.partitionBy("user_id", "sid")
      .orderBy("ts_us", "event_id")
    sess.withColumn("rn", row_number().over(bySess))
      .filter(col("rn") <= 3)
      .groupBy("user_id", "sid")
      .agg(
        max(when(col("rn") === 1, col("event_type"))).as("t1"),
        max(when(col("rn") === 2, col("event_type"))).as("t2"),
        max(when(col("rn") === 3, col("event_type"))).as("t3"))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("t1"), col("t2"), col("t3")).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
  }

  /** A/B conversion test: users split into two deterministic variants
    * (`user_id % 2`), conversion = "has at least one purchase", and the
    * 2×2 independence test reported as the chi-square statistic
    * `N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))` — the experiment-analysis
    * query every product pipeline runs.
    *
    * All four cells are exact integer counts; the statistic is ONE IEEE
    * division of exact decimal(38,0) operands (the q_embedding_cov
    * discipline — `(ad−bc)²·N` outgrows a long at real user counts), so
    * the oracle is bit-exact. One aggregation per user, one 4-cell
    * census — nothing here scales with events beyond the first pass. */
  def qAbTest(spark: SparkSession, dir: String): DataFrame = {
    // conversion = a HIGH-VALUE purchase: on this lake every user makes
    // SOME purchase (a constant-true outcome zeroes two margins and the
    // statistic is undefined), so the tested outcome is the rarer one a
    // real experiment would gate on
    val perUser = load(spark, dir, "events")
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 120.0, 1L).otherwise(0L))
        .as("converted"))
      .select(pmod(col("user_id"), lit(2)).as("variant"), col("converted"))
    val cells = perUser.groupBy("variant")
      .agg(sum("converted").as("conv"),
        (count(lit(1)) - sum("converted")).as("nonconv"))
    val wide = cells.agg(
      sum(when(col("variant") === 0, col("conv")).otherwise(0L)).as("a"),
      sum(when(col("variant") === 0, col("nonconv")).otherwise(0L)).as("b"),
      sum(when(col("variant") === 1, col("conv")).otherwise(0L)).as("c"),
      sum(when(col("variant") === 1, col("nonconv")).otherwise(0L)).as("d"))
    wide.select(col("a"), col("b"), col("c"), col("d"),
      // a zero margin means the outcome or variant is constant — no
      // information, statistic defined as 0 (mirrored in the oracle)
      expr("""case when cast(a + b as decimal(38,0)) * (c + d)
              * (a + c) * (b + d) = 0 then cast(0.0 as double)
        else cast(
          cast(a + b + c + d as decimal(38,0)) *
          (cast(a as decimal(38,0)) * d - cast(b as decimal(38,0)) * c) *
          (cast(a as decimal(38,0)) * d - cast(b as decimal(38,0)) * c)
        as double) /
        cast(
          cast(a + b as decimal(38,0)) * (c + d) * (a + c) * (b + d)
        as double) end""").as("chi2"))
  }

  /** Population-stability drift census (PSI, per bucket): value deciles
    * fit on the EARLIER half of the event stream (by global median µs —
    * the "training snapshot"), then both halves' per-bucket shares in
    * integer ppm, plus the per-bucket PSI contribution
    * `(p−q)·ln(p/q)` — the model-monitoring drift report.
    *
    * Determinism: bucket boundaries are rank-selected raw values (the
    * q_value_clip machinery) on the early half; shares are exact
    * integer ppm; each PSI term is a PER-ROW expression over two exact
    * integers (one ln, one multiply — no cross-row IEEE accumulation,
    * which is why the report is per-bucket and the total is left to the
    * reader). Add-one smoothing on both shares keeps ln finite when a
    * bucket empties in one half. */
  def qDriftPsi(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(expr("(ts div 1000) div 3600000000").as("hour"),
        // cents quantization bounds BOTH histograms' cardinality (the
        // decile-fit window below runs over distinct cents, not raw
        // doubles — the difference between a value-domain-sized and a
        // row-count-sized window input at 100 TB)
        floor(col("value") * 100 + 0.5).cast("long").as("value"))
    // split at the median HOUR — the rank selection runs over the
    // per-hour histogram (cardinality = time range in hours, bounded),
    // never a window over raw event timestamps
    val n = ev.agg(count(lit(1)).as("n"))
    val freq = ev.groupBy("hour").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cutoff = freq.withColumn("cumn", sum("c").over(w))
      .crossJoin(broadcast(n))
      .agg(min(when(col("cumn") >= expr("(n - 1) * 50 div 100 + 1"),
        col("hour"))).as("cut_hour"))
    val tagged = ev.crossJoin(broadcast(cutoff))
      .select(col("value"),
        when(col("hour") <= col("cut_hour"), lit("early"))
          .otherwise(lit("late")).as("half"))
    // decile bounds on the EARLY half only (the reference snapshot);
    // this window also runs over a distinct-VALUE histogram
    val early = tagged.filter(col("half") === "early").select("value")
    val efreq = early.groupBy("value").agg(count(lit(1)).as("c"))
    val ew = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ecum = efreq.withColumn("cumn", sum("c").over(ew))
    val bounds = ecum.agg(sum("c").as("n")).crossJoin(ecum)
      .groupBy("n")
      .agg(
        min(when(col("cumn") >= expr(s"(n - 1) * 10 div 100 + 1"),
          col("value"))).as("b1"),
        (2 to 9).map(k =>
          min(when(col("cumn") >= expr(s"(n - 1) * ${k * 10} div 100 + 1"),
            col("value"))).as(s"b$k")): _*)
    val bin = (1 to 9)
      .map(k => when(col("value") >= col(s"b$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    val counts = tagged.crossJoin(broadcast(bounds))
      .withColumn("bucket", bin)
      .groupBy("bucket")
      .agg(sum(when(col("half") === "early", 1L).otherwise(0L)).as("ne"),
        sum(when(col("half") === "late", 1L).otherwise(0L)).as("nl"))
    val totals = counts.agg(sum("ne").as("te"), sum("nl").as("tl"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("ne"), col("nl"),
        expr("(ne + 1) * 1000000 div (te + 10)").as("p_ppm"),
        expr("(nl + 1) * 1000000 div (tl + 10)").as("q_ppm"))
      .withColumn("psi_term",
        round((col("p_ppm") - col("q_ppm")).cast("double") / 1e6 *
          log(col("p_ppm").cast("double") / col("q_ppm").cast("double")),
          6))
  }

  /** First-order Markov transition census over per-user event streams:
    * for each (prev_type → next_type) pair, the transition count and its
    * probability in integer ppm of the prev-type's outgoing total — the
    * behavioral model behind next-event prediction and anomaly scoring
    * (a transition with tiny ppm IS the anomaly signal).
    *
    * One lag window per user (bounded partitions), one map-side
    * aggregation on the 25-cell pair space, one broadcast join for the
    * denominators; ppm is exact integer division. */
  def qEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val tr = load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsMicros.as("ts_us"))
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
    val outTotals = tr.groupBy("prev_type").agg(sum("n").as("out_n"))
    tr.join(broadcast(outTotals), "prev_type")
      .select(col("prev_type"), col("event_type").as("next_type"),
        col("n"),
        expr("n * 1000000 div out_n").as("p_ppm"))
  }

  /** Rolling z-score anomaly detection: an event is flagged when its
    * value sits more than 3σ from the mean of the preceding `win` events
    * of its type — the streaming-shaped outlier monitor, run batch.
    *
    * The 3σ test is EXACT integer arithmetic on cents: |x−μ| > 3σ over
    * the window's (n, Σc, Σc²) cross-multiplies to
    * `(n·c − S)² > 9·(n·SS − S²)` — no division, no sqrt, no IEEE
    * anywhere, so the flagged set oracles bit-exact. One window pass
    * computes all three sums; partitions are bounded by event-type
    * cardinality × time, the same profile as any sessionization. */
  def qRollingOutliers(spark: SparkSession, dir: String,
      win: Int = 50, minN: Int = 20): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(col("event_type"), col("event_id"), tsMicros.as("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
      .rowsBetween(-win, -1)
    val dev = col("win_n") * col("cents") - col("win_sum")
    ev
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("win_sum", sum("cents").over(w))
      .withColumn("win_sumsq", sum(col("cents") * col("cents")).over(w))
      .filter(col("win_n") >= minN &&
        dev * dev > lit(9L) *
          (col("win_n") * col("win_sumsq") - col("win_sum") * col("win_sum")))
      .select("event_type", "event_id", "cents", "win_n", "win_sum",
        "win_sumsq")
  }

  /** Fixed-point EWMA per user (α = 1/8): `ewma ← (7·ewma + c) div 8`
    * folded left over the user's time-ordered cents — the smoothed-value
    * feature a monitoring/engagement pipeline keeps per entity. A
    * recurrence is not window-expressible; per-user event sequences are
    * bounded (the grouped-list + HOF-fold shape, same contract as the
    * chunking ops), and the integer fold replays exactly in any engine
    * (all values positive, so truncating and flooring division agree). */
  def qEwma(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .select(col("user_id"), tsMicros.as("ts_us"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col("ts_us"), col("event_id"),
          col("cents")))).as("seq"))
      .select(col("user_id"), col("n_events"),
        expr("aggregate(slice(transform(seq, x -> x.cents), 2," +
          " size(seq) - 1), seq[0].cents," +
          " (acc, x) -> (acc * 7 + x) div 8)").as("ewma_cents"))

  /** Ordered funnel analysis (view → click → purchase): per user, the
    * first `view`, the first `click` strictly after it, and the first
    * `purchase` strictly after that — the product-analytics conversion
    * query, and the batch analog of a CEP sequence match.
    *
    * Scale shape: each stage is a per-user `min` aggregation joined to
    * the previous stage's (already user-unique) frame — all three joins
    * co-partition on `user_id` and every stage frame is at most one row
    * per user, shrinking monotonically down the funnel. No window over
    * the full event log, no self-join of raw events. Gaps are exact
    * integer µs sums, so the census oracles bit-exact. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), tsMicros.as("ts_us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts_us") > col("t1"))
      .groupBy("user_id").agg(min("ts_us").as("t2"), min("t1").as("t1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c.select("user_id", "t2"), "user_id")
      .filter(col("ts_us") > col("t2"))
      .groupBy("user_id").agg(min("ts_us").as("t3"), min("t2").as("t2"))
    val s1 = v.agg(count(lit(1)).as("n_users")).select(
      lit(1L).as("stage"), lit("view").as("stage_name"),
      col("n_users"), lit(0L).as("sum_gap_us"))
    val s2 = c.agg(count(lit(1)).as("n_users"),
      coalesce(sum(col("t2") - col("t1")), lit(0L)).as("sum_gap_us"))
      .select(lit(2L).as("stage"), lit("click").as("stage_name"),
        col("n_users"), col("sum_gap_us"))
    val s3 = p.agg(count(lit(1)).as("n_users"),
      coalesce(sum(col("t3") - col("t2")), lit(0L)).as("sum_gap_us"))
      .select(lit(3L).as("stage"), lit("purchase").as("stage_name"),
        col("n_users"), col("sum_gap_us"))
    s1.unionByName(s2).unionByName(s3)
  }

  /** Cohort retention: users bucketed by the week of their FIRST event
    * (cohort), counted once per (cohort, weeks-since-cohort) in which
    * they were active — the triangular retention matrix.
    *
    * Weeks are pure day arithmetic (`days-since-epoch div 7`), never an
    * engine's `date_trunc('week')` (week-start conventions differ across
    * engines and locales). One aggregation finds each user's first day,
    * one distinct pass the active days; the join co-partitions on
    * `user_id` and the output is bounded by cohorts × weeks, not rows. */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(col("user_id"),
        expr("date(timestamp_micros(ts div 1000))").as("d"))
    val firstSeen = ev.groupBy("user_id").agg(min("d").as("d0"))
    ev.distinct()
      .join(firstSeen, "user_id")
      .select(col("user_id"),
        expr("cast(datediff(d0, date '1970-01-01') div 7 as bigint)")
          .as("cohort_week"),
        expr("cast(datediff(d, d0) div 7 as bigint)").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
  }

  /** Cohort lifetime-value curves — [[qRetention]]'s revenue sibling:
    * per (signup-week cohort, weeks-since-signup age), the cohort's
    * cumulative spend and the per-user LTV at that age. The curve a
    * growth model reads ("how much has a week-N cohort spent by age
    * k"). Weeks are epoch-day div 7 arithmetic (never an engine
    * week-truncation — conventions differ); cents are exact; the
    * cumulative walk runs in per-cohort windows over the
    * calendar-bounded age axis; ltv is one truncating division by the
    * cohort's user count. One events aggregation to the (cohort, age)
    * census — map-side combinable at any scale. */
  def qCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(col("user_id"),
        expr("ts div 1000 div 86400000000").as("day"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
    val firstSeen = ev.groupBy("user_id").agg(min("day").as("d0"))
    val cells = ev.join(firstSeen, "user_id")
      .select(expr("d0 div 7").as("cohort_week"),
        expr("(day - d0) div 7").as("age_week"),
        col("user_id"), col("cents"))
    val cohortN = cells.select("cohort_week", "user_id").distinct()
      .groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
    cells
      .groupBy("cohort_week", "age_week")
      .agg(sum("cents").as("cents"))
      .withColumn("cum_cents", sum("cents").over(
        Window.partitionBy("cohort_week").orderBy("age_week")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(cohortN), "cohort_week")
      .select(col("cohort_week"), col("age_week"), col("n_users"),
        col("cum_cents"),
        expr("cum_cents div n_users").as("ltv_cents"))
  }

  /** Kaplan-Meier survival over inter-event waiting times — "how long
    * until a user's NEXT event", with right-censoring done properly:
    * each event contributes one observation — the gap to the same
    * user's next event (an OBSERVED arrival), or, for a user's last
    * event, the gap to the corpus horizon (CENSORED: the true wait is
    * ≥ observed, not equal, so it leaves the risk set without counting
    * as an arrival — the distinction naive mean-gap estimates get
    * wrong, biasing wait times low).
    *
    * Per hour bucket k: n_risk (observations whose wait reached k),
    * arrival/censor exits, the KM hazard d_k/n_risk_k in truncating
    * ppm, and the survival curve S_k = Π_{j≤k}(1 − h_j) under the
    * integer recurrence S_k = S_{k−1}·(1e6 − h_k) div 1e6 — S_k is
    * P(next event takes > k hours).
    *
    * Scale shape: the heavy work — the per-user lead() ordering and the
    * hour census — is distributed (user-partitioned window, map-side
    * combinable agg); the hour table is CALENDAR-BOUNDED (≤ horizon
    * span in hours — 8.8k/year), so the non-associative survival fold
    * runs on the driver over a collected kilobyte census, the same
    * bounded-collect posture as the codebook publishes. The horizon
    * rides as a one-row broadcast; (ts, event_id) ordering makes ties
    * deterministic cross-engine. */
  def qSurvival(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), tsMicros.as("ts_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    val horizon = ev.agg(max("ts_us").as("hz"))
    val census = ev
      .withColumn("next_us", lead("ts_us", 1).over(w))
      .crossJoin(broadcast(horizon))
      .select(
        (coalesce(col("next_us"), col("hz")) - col("ts_us"))
          .as("gap_us"),
        col("next_us").isNotNull.cast("long").as("arrived"))
      .groupBy(expr("gap_us div 3600000000").as("hour"))
      .agg(sum("arrived").as("d"), sum(lit(1L) - col("arrived")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    if (census.isEmpty)
      return Seq.empty[(Long, Long, Long, Long, Long, Long)]
        .toDF("hour", "n_risk", "n_arrived", "n_censored", "hazard_ppm",
          "survival_ppm")
    val byHour = census.map(t => t._1 -> ((t._2, t._3))).toMap
    var risk = census.map(t => t._2 + t._3).sum
    var surv = 1000000L
    val rows = (0L to census.map(_._1).max).map { k =>
      val (d, c) = byHour.getOrElse(k, (0L, 0L))
      val h = if (risk > 0) 1000000L * d / risk else 0L
      surv = surv * (1000000L - h) / 1000000L
      val row = (k, risk, d, c, h, surv)
      risk -= d + c
      row
    }
    rows.toDF("hour", "n_risk", "n_arrived", "n_censored", "hazard_ppm",
      "survival_ppm")
  }

  /** Interval (range) join via time-bucket banding: events following an
    * `error` by the same user within `windowUs`.
    *
    * The scale-safe plan: both sides get an equi-joinable bucket key
    * `floor(ts / windowUs)`; the error side fans out to its own and the
    * next bucket (any in-window follower lands in one of the two), so the
    * executor-side work is an EQUI-join on `(user_id, bucket)` + a cheap
    * residual range filter — never the unbounded theta-join a plain
    * `BETWEEN` condition degenerates to (Spark would run that as
    * broadcast-nested-loop or a per-user cross product). */
  def qIntervalJoin(
      spark: SparkSession, dir: String,
      windowUs: Long = 6L * 3600 * 1000000): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsMicros.as("ts_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_event_id"),
        col("ts_us").as("err_us"),
        explode(array(
          expr(s"ts_us div ${windowUs}L"),
          expr(s"ts_us div ${windowUs}L") + 1)).as("bucket"))
    val followers = ev
      .select(col("user_id"), col("event_id").as("next_event_id"),
        col("event_type").as("next_type"), col("ts_us").as("next_us"),
        expr(s"ts_us div ${windowUs}L").as("bucket"))
    errors.join(followers, Seq("user_id", "bucket"))
      .filter(col("next_us") > col("err_us") &&
        col("next_us") <= col("err_us") + windowUs)
      .select(col("error_event_id"), col("next_event_id"), col("next_type"),
        (col("next_us") - col("err_us")).as("gap_us"))
  }

  /** Exact two-sample Kolmogorov–Smirnov distance between every pair
    * of event types' value distributions — the nonparametric "did the
    * distribution shift" test PSI's binning approximates. D =
    * max_v |F₁(v) − F₂(v)| evaluated on the UNION support in the
    * cross-multiplied integer form |cum₁·n₂ − cum₂·n₁| (never a
    * division until the final ppm), so the supremum is an integer max
    * and the oracle is bit-exact. Shapes: per-type value histograms
    * (distinct-value discipline), a broadcast pair spine, one
    * (pair, cents) aggregation, one ordered-window cumulation per pair
    * — the fact table is scanned once. */
  def qKsTest(spark: SparkSession, dir: String): DataFrame = {
    val h = load(spark, dir, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
    val sizes = h.groupBy("event_type").agg(sum("cnt").as("n"))
    val pairs = sizes.select(col("event_type").as("ta"), col("n").as("n1"))
      .crossJoin(sizes.select(col("event_type").as("tb"), col("n").as("n2")))
      .filter(col("ta") < col("tb"))
    val merged = broadcast(pairs)
      .join(h, col("event_type") === col("ta") ||
        col("event_type") === col("tb"))
      .groupBy("ta", "tb", "n1", "n2", "cents")
      .agg(
        sum(when(col("event_type") === col("ta"), col("cnt"))
          .otherwise(0L)).as("ca"),
        sum(when(col("event_type") === col("tb"), col("cnt"))
          .otherwise(0L)).as("cb"))
    val w = Window.partitionBy("ta", "tb").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("cuma", sum("ca").over(w))
      .withColumn("cumb", sum("cb").over(w))
      .groupBy("ta", "tb", "n1", "n2")
      // decimal(38,0) for every cross-multiplied product (the
      // qCorrMatrix discipline): cum·n reaches n1·n2 and the ppm
      // scaling multiplies by 1e6 on top — raw long arithmetic would
      // silently wrap once a type pair passes ~3M rows per side
      .agg(max(abs(expr(
        "cast(cuma as decimal(38,0)) * n2 - cast(cumb as decimal(38,0)) * n1")))
        .as("d_dec"))
      .select(col("ta"), col("tb"), col("n1"), col("n2"),
        col("d_dec").cast("long").as("d_num"),
        expr("cast((d_dec * 1000000) div (cast(n1 as decimal(38,0)) * n2)" +
          " as bigint)").as("d_ppm"))
  }

  /** Mann–Whitney U (rank-sum) between every pair of event types —
    * KS asks "do the distributions differ anywhere"; U asks the
    * stochastic-dominance question "does one tend to exceed the
    * other". U₁ = Σ_v cb_less(v)·ca(v) + ties/2 computed directly from
    * the shared value histogram in DOUBLED integer units (2·U absorbs
    * the tie half-ranks, so everything stays exact): for each distinct
    * value, pairs won = ca·(cumb below), pairs tied = ca·cb. The
    * effect size ships as integer ppm of n₁·n₂ (P(X>Y) + ½P(X=Y), the
    * common-language effect size). Same single-scan shape as
    * [[qKsTest]]: histograms, broadcast pair spine, one window. */
  def qMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val h = load(spark, dir, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
    val sizes = h.groupBy("event_type").agg(sum("cnt").as("n"))
    val pairs = sizes.select(col("event_type").as("ta"), col("n").as("n1"))
      .crossJoin(sizes.select(col("event_type").as("tb"), col("n").as("n2")))
      .filter(col("ta") < col("tb"))
    val merged = broadcast(pairs)
      .join(h, col("event_type") === col("ta") ||
        col("event_type") === col("tb"))
      .groupBy("ta", "tb", "n1", "n2", "cents")
      .agg(
        sum(when(col("event_type") === col("ta"), col("cnt"))
          .otherwise(0L)).as("ca"),
        sum(when(col("event_type") === col("tb"), col("cnt"))
          .otherwise(0L)).as("cb"))
    val w = Window.partitionBy("ta", "tb").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    merged
      .withColumn("cumb_below",
        coalesce(sum("cb").over(w), lit(0L)))
      .groupBy("ta", "tb", "n1", "n2")
      // 2·U1 = 2·Σ ca·(b strictly below) + Σ ca·cb (ties count half);
      // decimal(38,0) per-term (qCorrMatrix discipline) — ca·cumb_below
      // reaches per-value-count·n2 and 2·U1 itself reaches 2·n1·n2,
      // which wraps a raw long past ~3M rows per side
      .agg(sum(expr(
        "2 * cast(ca as decimal(38,0)) * cumb_below" +
          " + cast(ca as decimal(38,0)) * cb")).as("u1_dec"))
      .select(col("ta"), col("tb"), col("n1"), col("n2"),
        col("u1_dec").cast("long").as("u1_x2"),
        expr("cast((u1_dec * 500000) div (cast(n1 as decimal(38,0)) * n2)" +
          " as bigint)").as("cles_ppm"))
  }

  /** CUSUM changepoint detector over the daily revenue series — the
    * sequential drift monitor (Page 1954): accumulate positive
    * deviations beyond a slack `k` and alarm when the accumulation
    * crosses `h`. The textbook recurrence `C_t = max(0, C_{t−1} + d_t)`
    * looks inherently sequential, but it has the closed form
    * `C_t = S_t − min(0, min_{j≤t} S_j)` (running sum minus running
    * minimum), so the whole trajectory is TWO ordered-window aggregates
    * — no fold, no recursion, engine-exact in integers. Slack and
    * threshold derive from each type's own mean daily cents (k = μ/20,
    * h = μ/5, integer division). */
  /** Exact daily cent totals per event type — the one shared series
    * every trend statistic (CUSUM, OLS fit, Theil-Sen/Mann-Kendall,
    * streaks) consumes; defined once so day bucketing and cents
    * rounding can never silently diverge between them and their
    * oracles. */
  private def dailyRevenue(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .select(expr("ts div 86400000000000").as("day"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").as("y"))

  def qCusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenue(spark, dir)
    val mu = daily.groupBy("event_type")
      .agg(expr("sum(y) div count(1)").as("mu"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(mu), "event_type")
      .withColumn("d", col("y") - col("mu") - expr("mu div 20"))
      .withColumn("s", sum("d").over(w))
      .withColumn("cusum", col("s") - least(lit(0L), min("s").over(w)))
      .select(col("event_type"), col("day"), col("y"), col("cusum"),
        (col("cusum") > expr("mu div 5")).as("alarm"))
  }

  /** Time-weighted average value (TWAP) per event type — the right
    * mean when observations arrive irregularly: each value holds until
    * the NEXT observation of the same type, so it weighs by its holding
    * interval (a plain average over-weights bursts). Intervals come
    * from one `lead()` pass (the last observation of a type holds until
    * the global horizon end); the weighted mean is an exact decimal
    * Σ cents·Δt divided once — µs intervals × cents can reach 10²⁰,
    * past a long. One window exchange on type; horizon is a broadcast
    * scalar. */
  def qTwap(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(col("event_type"), col("event_id"), tsMicros.as("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val horizon = ev.agg(max("ts_us").as("t_end"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("ts_us"), col("event_id"))
    ev
      .withColumn("t_next", lead("ts_us", 1).over(w))
      .crossJoin(broadcast(horizon))
      .withColumn("dt_us", coalesce(col("t_next"), col("t_end")) - col("ts_us"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("dt_us").as("held_us"),
        expr("cast(sum(cast(cents as decimal(38,0)) * dt_us)" +
          " div sum(dt_us) as bigint)").as("twap_cents"),
        expr("sum(cents) div count(1)").as("mean_cents"))
  }

  /** Median-absolute-deviation outlier census — the ROBUST twin of the
    * 3σ monitors ([[qRollingOutliers]]): mean/stddev move with the very
    * outliers they are meant to flag, while the median and MAD are
    * 50%-breakdown estimators. Both medians are exact integer rank
    * selections (smallest value whose rank reaches ⌈n/2⌉, computed over
    * the per-type DISTINCT-value histogram — the q_value_clip shape, so
    * no corpus-wide sort); the flag is the integer cross-multiplied
    * form of |x − med| > 3·1.4826·mad, i.e. 10000·|x−med| > 44478·mad.
    * Zero IEEE anywhere ⇒ exact oracle. */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    def medianOf(df: DataFrame, valueCol: String): DataFrame = {
      // rank window over the distinct-value histogram, never raw rows
      val hist = df.groupBy("event_type", valueCol)
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy(valueCol)
      hist
        .withColumn("cum", sum("cnt").over(w))
        .withColumn("n", sum("cnt").over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(min(when(col("cum") * 2 >= col("n"), col(valueCol)))
          .as("med"))
    }
    val med = medianOf(ev, "cents")
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), col("cents"),
        abs(col("cents") - col("med")).as("adev"))
    val mad = medianOf(dev.select(col("event_type"),
      col("adev").as("cents")), "cents")
      .withColumnRenamed("med", "mad")
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        max("cents").as("max_cents"),
        sum(when(col("adev") * 10000 > col("mad") * 44478, 1L)
          .otherwise(0L)).as("n_outliers"))
      .join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .select("event_type", "n", "med", "mad", "n_outliers", "max_cents")
  }

  /** Dense hourly gap-fill with forward fill — telemetry series have
    * holes, and every downstream window/trend query silently skips them
    * unless the spine is densified first. The hour spine generates from
    * the OBSERVED global range (`sequence()` + explode — rows appear
    * without existing anywhere), left-joins the per-(type, hour)
    * aggregate, zero-fills counts, and forward-fills the last seen
    * hourly total per type (`last(_, ignoreNulls)` over an unbounded
    * preceding frame). Spine × types is bounded by the time range, not
    * the fact table; the fill window is one exchange on type. */
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = load(spark, dir, "events")
      .select(expr("ts div 3600000000000").as("hr"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("cents"))
    val bounds = hourly.agg(min("hr").as("lo"), max("hr").as("hi"))
    val spine = bounds
      .select(explode(expr("sequence(lo, hi)")).as("hr"))
      .crossJoin(broadcast(hourly.select("event_type").distinct()))
    val w = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "hr"), "left_outer")
      .select(col("event_type"), col("hr"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("cents"))
      .withColumn("cents_ffill",
        coalesce(last("cents", ignoreNulls = true).over(w), lit(0L)))
      .drop("cents")
  }

  /** Trailing 6-hour totals per event via a RANGE window frame — the
    * time-based frame ROWS windows cannot express (each row's window is
    * defined by a VALUE interval on the ordering key, so rows at a
    * burst share a frame regardless of how many there are). Ordering is
    * epoch micros (a long), making the frame bound exact integer
    * arithmetic in any engine; ties inside the frame don't matter
    * because aggregates, not ranks, are computed. One exchange on the
    * partition key — the same cost as any keyed window. */
  def qWindowRange(spark: SparkSession, dir: String,
      windowUs: Long = 6L * 3600 * 1000000): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("ts_us")
      .rangeBetween(-windowUs, Window.currentRow)
    load(spark, dir, "events")
      .select(col("event_type"), col("event_id"), tsMicros.as("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("n_6h", count(lit(1)).over(w))
      .withColumn("cents_6h", sum("cents").over(w))
      .select("event_type", "event_id", "ts_us", "cents", "n_6h", "cents_6h")
  }

  /** Leave-one-out smoothed target encoding of the customer market
    * segment against order value — the categorical-feature prep step a
    * training pipeline runs before fitting anything, with the part that
    * actually matters done right: each row's encoding EXCLUDES its own
    * target (in-fold means leak the label and inflate offline metrics),
    * and a Laplace prior (m=100 pseudo-rows at the global mean) shrinks
    * rare categories toward the prior. All integer cents:
    * enc_i = (S_g − y_i + m·prior) div (n_g − 1 + m), prior = S div n —
    * exact in any engine. One broadcast dim join + one segment-keyed
    * window; no per-category shuffle of the fact table. */
  def qTargetEncode(spark: SparkSession, dir: String,
      m: Int = 100): DataFrame = {
    val rows = load(spark, dir, "orders")
      .join(broadcast(load(spark, dir, "customer")
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    // per-segment sums as a TINY aggregate broadcast back (a segment
    // window would funnel the fact table through one partition per
    // category — low-cardinality windows are the skew trap); the
    // global prior is the q22 broadcast-scalar pattern
    val prior = rows.agg(
      expr("sum(cents) div count(1)").as("prior_cents"))
    val segStats = rows.groupBy("c_mktsegment")
      .agg(sum("cents").as("sg"), count(lit(1)).as("ng"))
    rows
      .join(broadcast(segStats), "c_mktsegment")
      .crossJoin(broadcast(prior))
      .select(col("o_orderkey"), col("c_mktsegment"), col("cents"),
        expr(s"(sg - cents + $m * prior_cents)" +
          s" div (ng - 1 + $m)").as("loo_enc_cents"))
  }

  /** Per-type linear trend (OLS of daily revenue cents on the day
    * index) — the metric-trend detector, same exact-moment discipline
    * as [[qCorrMatrix]]: Sx/Sxx over day indexes and Sxy/Sy over daily
    * cent totals are integer aggregates, the slope and intercept
    * numerators/denominators assemble decimal-exact, and only the final
    * two divisions are IEEE (rounded to 4) — so the fit is bit-identical
    * cross-engine, unlike a streaming `regr_slope` accumulation.
    * Slope sign × magnitude is the alert; day 0 = the lake's first day. */
  def qLinregTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenue(spark, dir)
    val day0 = daily.agg(min("day").as("day0"))
    val indexed = daily.crossJoin(broadcast(day0))
      .withColumn("x", col("day") - col("day0"))
    indexed.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum(expr("x * x")).as("sxx"),
        sum("y").as("sy"), sum(expr("x * y")).as("sxy"))
      .withColumn("slope_num", expr(
        "cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy"))
      .withColumn("slope_den", expr(
        "cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx"))
      .select(col("event_type"), col("n").cast("long").as("n_days"),
        round(expr("cast(slope_num as double) / cast(slope_den as double)"), 4)
          .as("slope_cents_per_day"),
        // intercept = (Sy − slope·Sx)/n with slope in exact rational
        // form: (Sy·den − num·Sx) / (n·den)
        round(expr("cast(cast(sy as decimal(38,0)) * slope_den" +
          " - slope_num * sx as double)" +
          " / cast(cast(n as decimal(38,0)) * slope_den as double)"), 4)
          .as("intercept_cents"))
  }

  /** SLO error-budget burn rate — the multi-window alert rule (the
    * SRE-workbook shape): per hour, the error fraction over a FAST
    * (1 h) and SLOW (6 h trailing) window, both as exact integer ppm
    * against the corpus-wide budget (the overall error rate); an alert
    * fires only when BOTH windows burn above `mult`× budget — the fast
    * window for responsiveness, the slow one to keep one bad minute
    * from paging. The hourly frame is DENSIFIED over the observed
    * min..max hour spine first (the qGapFill discipline): a ROWS
    * window over observed hours alone would silently stretch "6 h
    * trailing" across outage gaps — diluting slow_ppm exactly when a
    * burn rule should fire. Empty hours carry null ppm (no traffic =
    * no rate), and the alert coalesces to false. Rolling sums are
    * integer windows over the calendar-bounded spine; every ratio
    * cross-multiplies in decimal(38,0), no IEEE op anywhere. */
  def qSloBurn(spark: SparkSession, dir: String,
      mult: Int = 2): DataFrame = {
    val hourly = load(spark, dir, "events")
      .groupBy(expr("ts div 3600000000000").as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_err"))
    val spine = hourly.agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("hour"))
    val dense = spine.join(hourly, Seq("hour"), "left_outer")
      .select(col("hour"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_err"), lit(0L)).as("n_err"))
    val w6 = Window.orderBy("hour").rowsBetween(-5, 0)
    // global window over the HOURLY spine — calendar-bounded, the
    // qEventsHourly defense
    val rolled = dense
      .withColumn("n6", sum("n").over(w6))
      .withColumn("e6", sum("n_err").over(w6))
    rolled
      .crossJoin(broadcast(hourly.agg(
        sum("n").as("nt"), sum("n_err").as("et"))))
      .select(col("hour"), col("n"), col("n_err"),
        expr("case when n > 0 then cast(cast(n_err as decimal(38,0))" +
          " * 1000000 div n as bigint) end").as("fast_ppm"),
        expr("case when n6 > 0 then cast(cast(e6 as decimal(38,0))" +
          " * 1000000 div n6 as bigint) end").as("slow_ppm"),
        expr("cast(cast(et as decimal(38,0)) * 1000000 div nt as bigint)")
          .as("budget_ppm"))
      .withColumn("alert",
        coalesce(expr(s"fast_ppm > budget_ppm * $mult") &&
          expr(s"slow_ppm > budget_ppm * $mult"), lit(false)))
  }

  /** Last-touch revenue attribution — every purchase credits the most
    * recent preceding NON-purchase event of the same user (the
    * marketing-channel question session path counts can't answer:
    * which touchpoint closed the revenue). The carry-forward is
    * `last(touch, ignoreNulls)` over a ROWS window ordered by
    * (time, event_id) — a total order, so credit can never flip
    * between engines; purchases with no prior touch credit 'direct'.
    * One per-user window pass (user-bounded partitions), one bounded
    * census aggregation; revenue is exact cents. */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsMicros.as("us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum("cents").as("revenue_cents"))
  }

  /** Longest strictly-increasing daily-revenue streak per event type —
    * the gaps-and-islands technique (the one classic window pattern
    * the battery lacked): mark each OBSERVED day `up` iff it beats the
    * previous observed day, form island ids as the running count of
    * non-up days (every island of consecutive ups shares the id minted
    * by the down-day that opened it), then the longest island per type
    * with its first and last up-days (earliest first breaks length
    * ties). "Previous" means previous day WITH events — a type that
    * skips calendar days streaks across the gap, which is the contract
    * a sparse series needs (the dense-calendar variant would compose
    * with [[qGapFill]]'s spine).
    *
    * All integers: daily totals in exact cents, `up` from a long
    * comparison, island ids from a running sum — the per-type windows
    * run over calendar-bounded daily rows. */
  def qStreaks(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Window.partitionBy("event_type").orderBy("day")
    val daily = dailyRevenue(spark, dir)
    val flagged = daily
      .withColumn("up",
        when(col("y") > lag(col("y"), 1).over(byDay), 1L).otherwise(0L))
      .withColumn("island",
        sum(lit(1L) - col("up"))
          .over(byDay.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
    flagged.filter(col("up") === 1L)
      .groupBy("event_type", "island")
      .agg(count(lit(1)).as("len"),
        min("day").as("first_up_day"), max("day").as("last_up_day"))
      .groupBy("event_type")
      .agg(max(struct(col("len"), (-col("first_up_day")).as("ns"),
        col("last_up_day"))).as("m"))
      .select(col("event_type"), col("m.len").as("streak_days"),
        (-col("m.ns")).as("first_up_day"),
        col("m.last_up_day").as("last_up_day"))
  }

  /** Bot/automation detection by inter-arrival dispersion — the
    * timing-regularity signal crawl-data pipelines gate on before text
    * ever reaches a corpus: human traffic is bursty (cv² ≈ 1 for
    * Poisson, higher with sessions), schedulers and scripts tick
    * (cv² → 0). Per user with ≥ `minGaps` consecutive-event gaps:
    * squared coefficient of variation in ppm, flagged below
    * `botCv2Ppm`.
    *
    * Exactness: gaps are integer µs from a per-user lag window; the
    * sufficient statistics (n, Σg, Σg²) aggregate as decimal(38,0)
    * (a µs gap squared is ~10²⁶ at day scale); cv² = n·Σg²/(Σg)² − 1
    * cross-multiplies entirely in decimal and exits as integer ppm —
    * no IEEE op anywhere. Per-user windows are bounded by per-user
    * event counts (the sessionize posture). */
  def qBotDetect(spark: SparkSession, dir: String,
      minGaps: Int = 20, botCv2Ppm: Long = 100000L): DataFrame =
    botDetect(load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), tsMicros.as("us")),
      minGaps, botCv2Ppm)

  /** [[qBotDetect]]'s core over any `(user_id, event_id, us)` frame
    * (spec feeds it metronome/bursty fixtures the human-like synthetic
    * lake cannot produce). */
  private[graft] def botDetect(events: DataFrame,
      minGaps: Int, botCv2Ppm: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val gaps = events
      .withColumn("prev", lag(col("us"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), (col("us") - col("prev")).as("g"))
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("g").cast("decimal(38,0)")).as("sg"),
        sum(expr("cast(g as decimal(38,0)) * g")).as("sg2"))
      .filter(col("n_gaps") >= minGaps && expr("sg > 0"))
      .select(col("user_id"), col("n_gaps"),
        expr("cast(sg div n_gaps as bigint)").as("mean_gap_us"),
        expr("cast(cast(n_gaps as decimal(38,0)) * sg2 * 1000000" +
          " div (sg * sg) - 1000000 as bigint)").as("cv2_ppm"))
      .withColumn("is_bot", col("cv2_ppm") < botCv2Ppm)
  }

  /** Funnel conversion latency — per user, seconds from the FIRST view
    * to the first purchase strictly after it, with exact rank-selected
    * p50/p90/p99 over the converting population and the conversion
    * rate in ppm. The time-to-convert distribution is the product
    * metric the step-count funnel ([[qFunnel]]-style) cannot show.
    *
    * Quantiles follow the [[qValueClip]] discipline: cumulative counts
    * over the DISTINCT-latency histogram (bounded by distinct seconds
    * values, never a population sort), `min(when(cum ≥ rank))`
    * selection with the same `(n−1)·q div 100 + 1` rank, and the
    * selected values are raw longs — no arithmetic after selection.
    * Two passes over events (first-view, first-qualifying-purchase),
    * both map-side-combinable min aggregations on user_id. */
  def qFunnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), tsMicros.as("us"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("v_us"))
    val latency = ev.filter(col("event_type") === "purchase")
      .join(firstView, "user_id")
      .filter(col("us") > col("v_us"))
      .groupBy("user_id", "v_us").agg(min("us").as("p_us"))
      .select(col("user_id"),
        expr("(p_us - v_us) div 1000000").as("lat_s"))
    val freq = latency.groupBy("lat_s").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("lat_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // global window over the DISTINCT-seconds histogram — the bounded-
    // cardinality defense every rank-select quantile in the repo uses
    val cum = freq.withColumn("cumn", sum("c").over(w))
    val q = cum.crossJoin(broadcast(cum.agg(sum("c").as("nc"))))
      .agg(first("nc").as("n_converted"),
        min(when(col("cumn") >= expr("(nc - 1) * 50 div 100 + 1"),
          col("lat_s"))).as("p50_s"),
        min(when(col("cumn") >= expr("(nc - 1) * 90 div 100 + 1"),
          col("lat_s"))).as("p90_s"),
        min(when(col("cumn") >= expr("(nc - 1) * 99 div 100 + 1"),
          col("lat_s"))).as("p99_s"))
    q.crossJoin(broadcast(firstView.agg(count(lit(1)).as("n_viewers"))))
      .select(col("n_viewers"), col("n_converted"),
        expr("cast(cast(n_converted as decimal(38,0)) * 1000000" +
          " div n_viewers as bigint)").as("conversion_ppm"),
        col("p50_s"), col("p90_s"), col("p99_s"))
  }

  /** χ² contingency test over the full r×c table (event type ×
    * day-of-week) with Cramér's V — the categorical-association census
    * generalizing [[qAbTest]]'s 2×2: does traffic mix shift by weekday,
    * and how strongly? Every cell term is the exact rational
    * (O·N − R·C)²/(R·C·N) with the numerator assembled in
    * decimal(38,0) ((O·N)² outgrows a long at real row counts); ONE
    * IEEE division per cell, the ~35-cell sum rounds at 6 (ulp noise
    * ~1e-13 against a 5e-7 rounding step — the qBigramLm envelope).
    * Zero-observed cells still contribute (their term is R·C/N), so
    * the margins CROSS-join and the observed counts LEFT-join on —
    * dropping empty cells understates χ² exactly when association is
    * strongest. Bounded by types × 7 cells; everything before the
    * cell table is one pass of map-side-combinable counting. */
  def qContingency(spark: SparkSession, dir: String): DataFrame = {
    val obs = load(spark, dir, "events")
      .select(col("event_type"),
        expr("(ts div 86400000000000 + 4) % 7").as("dow"))
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("o"))
    val rowM = obs.groupBy("event_type").agg(sum("o").as("r"))
    val colM = obs.groupBy("dow").agg(sum("o").as("c"))
    val tot = obs.agg(sum("o").as("n"),
      countDistinct("event_type").as("nr"), countDistinct("dow").as("nc"))
    val cells = rowM.crossJoin(broadcast(colM))
      .join(obs, Seq("event_type", "dow"), "left_outer")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
    cells
      .select(col("nr"), col("nc"), col("n"),
        expr("""cast(cast(
            (cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)
            * (cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)
          as double)
          / cast(cast(r as decimal(38,0)) * c * n as double) as double)""")
          .as("term"))
      .groupBy("nr", "nc", "n")
      .agg(count(lit(1)).as("n_cells"), round(sum("term"), 6).as("chi2"))
      .select(col("n_cells"), col("n").as("n_events"),
        col("chi2"),
        round(sqrt(col("chi2") /
          (col("n") * (least(col("nr"), col("nc")) - 1))), 6)
          .as("cramers_v"))
  }

  /** Mutual information between event type and hour-of-day, with
    * marginal entropies and normalized MI — the dependency measure a
    * feature-selection pass ranks categorical columns by (χ² asks "is
    * there association"; MI says how many nats it carries).
    * MI = Σ (n_xy/N)·ln(n_xy·N/(n_x·n_y)) over OBSERVED cells (empty
    * cells contribute exactly 0 to MI, unlike χ²). Each term is one
    * IEEE expression over exact integer counts (products ≤ N² stay
    * under 2⁵³), cell sums round at 6; NMI = MI/√(H_X·H_Y) is derived
    * from the rounded sums so both engines divide identical values. */
  def qMutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val xy = load(spark, dir, "events")
      .select(col("event_type").as("x"),
        expr("(ts div 3600000000000) % 24").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("nxy"))
    val mx = xy.groupBy("x").agg(sum("nxy").as("nx"))
    val my = xy.groupBy("y").agg(sum("nxy").as("ny"))
    val tot = xy.agg(sum("nxy").as("n"))
    val mi = xy.join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(tot))
      // the log argument multiplies as doubles: n_xy·N as longs wraps
      // once N passes ~3·10⁹ rows; the IEEE products are identical in
      // both engines and the ratio is what the log sees anyway
      .select((col("nxy") / col("n") *
        log(col("nxy").cast("double") * col("n") /
          (col("nx").cast("double") * col("ny")))).as("term"))
      .agg(round(sum("term"), 6).as("mi"))
    val hx = mx.crossJoin(broadcast(tot))
      .select((-col("nx") / col("n") * log(col("nx") / col("n"))).as("t"))
      .agg(round(sum("t"), 6).as("h_x"))
    val hy = my.crossJoin(broadcast(tot))
      .select((-col("ny") / col("n") * log(col("ny") / col("n"))).as("t"))
      .agg(round(sum("t"), 6).as("h_y"))
    mi.crossJoin(hx).crossJoin(hy)
      .select(col("mi"), col("h_x"), col("h_y"),
        round(col("mi") / sqrt(col("h_x") * col("h_y")), 6).as("nmi"))
  }

  /** Theil-Sen robust slope + Mann-Kendall trend test per event type —
    * the 29%-breakdown companion to [[qLinregTrend]]'s OLS fit: one
    * wild day cannot drag the median of pairwise slopes the way it
    * drags a least-squares line, and the Mann-Kendall S statistic
    * (Σ sign(yⱼ−yᵢ) over ordered day pairs) tests monotone trend with
    * no distributional assumption — the standard pairing in
    * environmental/SLO monitoring.
    *
    * Exactness: slopes are FLOOR-divided micro-cents/day computed from
    * truncating primitives both engines share
    * (`(a − ((a%b)+b)%b) div b` — plain `div`/`//` disagree on
    * negative slopes between Spark (toward zero) and DuckDB (floor));
    * the median is a rank-SELECTED element ((n+1) div 2, (di, dj)
    * tiebreak), never an interpolation. `dy·10⁶` must fit a long —
    * holds while a type's daily cent total stays under ~9·10¹²; widen
    * to decimal(38,0) past that.
    *
    * Scale shape: pairs explode C(days, 2) per type — bounded by the
    * CALENDAR squared, not the corpus (the per-row-bounded-explode
    * rule); the rank window partitions by type over those bounded
    * pairs. */
  def qTheilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenue(spark, dir)
    val pairs = daily
      .select(col("event_type"), col("day").as("di"), col("y").as("yi"))
      .join(daily.select(col("event_type"), col("day").as("dj"),
        col("y").as("yj")), Seq("event_type"))
      .filter(col("di") < col("dj"))
      .select(col("event_type"), col("di"), col("dj"),
        ((col("yj") - col("yi")) * 1000000L).as("dy1m"),
        (col("dj") - col("di")).as("dx"),
        signum(col("yj") - col("yi")).cast("long").as("sgn"))
      .withColumn("slope_u",
        expr("(dy1m - ((dy1m % dx) + dx) % dx) div dx"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("slope_u"), col("di"), col("dj"))
    val medians = pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("event_type"), col("slope_u").as("median_slope_u"))
    pairs.groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"), sum("sgn").as("s_stat"))
      .join(daily.groupBy("event_type").agg(count(lit(1)).as("n_days")),
        "event_type")
      .join(medians, "event_type")
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("s_stat"), col("median_slope_u"))
  }

  /** Pairwise Pearson correlation between event types over their hourly
    * count series — the metric-correlation census an observability
    * pipeline runs across thousands of series. Spark's `corr` (and any
    * streaming-moment formula) accumulates doubles in partition order,
    * so its low bits are layout-dependent; here every moment (Sx, Sxx,
    * Sxy, and the hour universe H) is an exact INTEGER aggregate of
    * counts — missing hours contribute zero to every sum, so the inner
    * join on hours loses nothing — and the correlation is assembled at
    * the end from decimal-exact variance/covariance numerators with one
    * IEEE division and one correctly-rounded sqrt. Bit-identical in any
    * engine; the exact integer covariance numerator ships alongside as
    * the hash anchor. Shuffles: one (hr, type) aggregation, one
    * hour-keyed pair join of the 720-row series, broadcast moments. */
  def qCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val hourly = load(spark, dir, "events")
      .select(expr("ts div 3600000000000").as("hr"), col("event_type"))
      .groupBy("hr", "event_type").agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy("event_type")
      .agg(sum("n").as("sx"), sum(col("n") * col("n")).as("sxx"))
    val hours = hourly.agg(countDistinct("hr").as("h"))
    val pairs = hourly.select(col("hr"), col("event_type").as("type_a"),
        col("n").as("na"))
      .join(hourly.select(col("hr"), col("event_type").as("type_b"),
        col("n").as("nb")), Seq("hr"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(sum(col("na") * col("nb")).as("sxy"))
    pairs
      .join(broadcast(stats.select(col("event_type").as("type_a"),
        col("sx").as("sxa"), col("sxx").as("sxxa"))), Seq("type_a"))
      .join(broadcast(stats.select(col("event_type").as("type_b"),
        col("sx").as("sxb"), col("sxx").as("sxxb"))), Seq("type_b"))
      .crossJoin(broadcast(hours))
      // decimal-exact numerators: cov = H·Sxy − Sx·Sy, var = H·Sxx − Sx²
      .withColumn("cov_num", expr(
        "cast(h as decimal(38,0)) * sxy - cast(sxa as decimal(38,0)) * sxb"))
      .withColumn("var_a", expr(
        "cast(h as decimal(38,0)) * sxxa - cast(sxa as decimal(38,0)) * sxa"))
      .withColumn("var_b", expr(
        "cast(h as decimal(38,0)) * sxxb - cast(sxb as decimal(38,0)) * sxb"))
      .select(col("type_a"), col("type_b"),
        col("h").cast("long").as("n_hours"),
        col("cov_num").cast("long").as("cov_num"),
        round(expr("cast(cov_num as double)" +
          " / sqrt(cast(var_a * var_b as double))"), 6).as("corr"))
  }

  /** Daily revenue in whole DOLLARS (`y div 100`) — the deliberately
    * coarsened series the parametric two-sample statistics run on: their
    * cross-multiplied moment products (S², n·SS, and the Satterthwaite
    * numerator's fourth-order terms) must fit decimal(38,0), and cents
    * would spend 4 of those digits per squared factor for no inferential
    * gain. The `div` is part of the operator's input CONTRACT (both
    * engines floor identically on the non-negative cents), not a lossy
    * shortcut. */
  private def dailyDollars(spark: SparkSession, dir: String): DataFrame =
    dailyRevenue(spark, dir)
      .select(col("event_type"), col("day"), expr("y div 100").as("y"))

  /** Welch's unequal-variance t-test between every pair of event types
    * over their daily-dollar revenue series — the workhorse "did the
    * mean shift" test (KS asks about the whole distribution, Welch asks
    * about the mean without assuming equal variances). Everything is
    * exact integer algebra until the final floor divisions: with
    * V_i = n_i·SS_i − S_i² (the n²·variance·(n−1) numerator),
    * and a_i = V_i·n_j²(n_j−1) (so the bracket s₁²/n₁ + s₂²/n₂ is
    * (a₁+a₂) over the common denominator n₁²n₂²(n₁−1)(n₂−1)),
    *   t² = (S₁n₂ − S₂n₁)²·(n₁−1)(n₂−1) / (a₁ + a₂)
    * ships as ppm, and the Satterthwaite df
    *   ν = (a₁+a₂)²(n₁−1)(n₂−1) / (a₁²(n₂−1) + a₂²(n₁−1))
    * ships in deci units. All products bounded by the daily-dollar
    * scale (a_i² ≈ 1e33 at sf0.1 — the reason [[dailyDollars]] exists).
    * Scale shape: the series is one bounded aggregation; moments are one
    * map-side-combinable pass; the pair spine is k² rows for k types. */
  def qWelchTtest(spark: SparkSession, dir: String): DataFrame = {
    val m = dailyDollars(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("s"),
        sum(expr("y * y")).as("ss"))
      .withColumn("v", expr(
        "cast(n as decimal(38,0)) * ss - cast(s as decimal(38,0)) * s"))
    m.select(col("event_type").as("ta"), col("n").as("n1"),
        col("s").as("s1"), col("v").as("v1"))
      .crossJoin(m.select(col("event_type").as("tb"), col("n").as("n2"),
        col("s").as("s2"), col("v").as("v2")))
      .filter(col("ta") < col("tb"))
      .withColumn("md_num", expr(
        "cast(s1 as decimal(38,0)) * n2 - cast(s2 as decimal(38,0)) * n1"))
      .withColumn("a1", expr(
        "v1 * cast(n2 as decimal(38,0)) * n2 * (n2 - 1)"))
      .withColumn("a2", expr(
        "v2 * cast(n1 as decimal(38,0)) * n1 * (n1 - 1)"))
      .select(col("ta"), col("tb"), col("n1"), col("n2"),
        expr("cast(md_num * md_num * (n1 - 1) * (n2 - 1) * 1000000" +
          " div (a1 + a2) as bigint)")
          .as("t2_ppm"),
        expr("cast((a1 + a2) * (a1 + a2) * (n1 - 1) * (n2 - 1) * 10" +
          " div (a1 * a1 * (n2 - 1) + a2 * a2 * (n1 - 1)) as bigint)")
          .as("nu_deci"))
  }

  /** One-way ANOVA across ALL event types over the daily-dollar series —
    * the k-sample generalization of [[qWelchTtest]]: does ANY type's
    * mean daily revenue differ. Exact rational assembly: with group
    * sums S_i, sizes n_i, grand sum T over N days, both sums of squares
    * are scaled by the common denominator P = Πn_i (k ≈ 5 groups of
    * ~30 days keeps P ≈ 2e7 and every product inside decimal(38,0)):
    *   SSB·N·P = N·Σ S_i²·(P/n_i) − T²·P
    *   SST·N·P = (N·ΣSS − T²)·P
    * so F = (SSB/(k−1)) / (SSW/(N−k)) ships exactly as
    * `ssb_np·(N−k)·1e6 div ((sst_np − ssb_np)·(k−1))` ppm. The P/n_i
    * per-group co-factor is itself exact (P is the product OF the n_i).
    * One scan to the daily series, one k-row collect-free aggregate,
    * one broadcast of the k-row moment table. */
  def qAnova(spark: SparkSession, dir: String): DataFrame = {
    val g = dailyDollars(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("s"),
        sum(expr("y * y")).as("ss"))
    // k-row global moments, assembled in-plan (no driver collect):
    // P = Πn_i via exp/ln would be IEEE — aggregate the product exactly
    // with a decimal product fold instead (k is tiny, the fold is one
    // combine of k rows)
    val tot = g.agg(
      count(lit(1)).as("k"), sum("n").as("nn"), sum("s").as("t"),
      sum("ss").as("sstot"),
      // exact integer product of the group sizes: product = exp(Σ ln n)
      // misrounds, so fold multiplicatively via aggregate() over the
      // collected-to-array sizes (k rows — bounded by the type universe)
      expr("aggregate(collect_list(cast(n as decimal(38,0)))," +
        " cast(1 as decimal(38,0)), (acc, x) -> acc * x)").as("p"))
    val ssb = g.crossJoin(broadcast(tot))
      .select(expr("cast(s as decimal(38,0)) * s * (p div n)").as("term"),
        col("k"), col("nn"), col("t"), col("sstot"), col("p"))
      .groupBy("k", "nn", "t", "sstot", "p")
      .agg(sum("term").as("sum_s2pn"))
    ssb.select(
        col("k").cast("long").as("k"),
        col("nn").cast("long").as("n_days"),
        expr("cast(nn * sum_s2pn - cast(t as decimal(38,0)) * t * p" +
          " as decimal(38,0))").as("ssb_np"),
        expr("cast((cast(nn as decimal(38,0)) * sstot -" +
          " cast(t as decimal(38,0)) * t) * p as decimal(38,0))")
          .as("sst_np"))
      .select(col("k"), col("n_days"),
        expr("cast(ssb_np * 1000000 div sst_np as bigint)")
          .as("eta2_ppm"),
        expr("cast(ssb_np * (n_days - k) * 1000000" +
          " div ((sst_np - ssb_np) * (k - 1)) as bigint)").as("f_ppm"))
  }

  /** Day-of-week seasonality census per event type — the first
    * decomposition any revenue series gets. Weekday from pure epoch-day
    * arithmetic `(day+4) % 7` (0=Sunday; engine `dayofweek` numbering
    * conventions differ — the [[graft.sources.PartitionedLake]] lesson),
    * seasonal index as the cross-multiplied exact ratio of dow-mean to
    * overall-mean daily cents:
    *   index_ppm = (dow_total · n_days_all · 1e6)
    *               div (all_total · n_days_dow).
    * Integer end-to-end; one bounded (type, dow) aggregation joined to
    * the k-row per-type totals. */
  def qSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenue(spark, dir)
      .withColumn("dow", expr("(day + 4) % 7"))
    val byDow = daily.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"), sum("y").as("cents"))
    val byType = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days_all"), sum("y").as("cents_all"))
    byDow.join(byType, "event_type")
      .select(col("event_type"), col("dow"), col("n_days"), col("cents"),
        expr("cents * 1000000 div cents_all").as("share_ppm"),
        expr("cast(cast(cents as decimal(38,0)) * n_days_all * 1000000" +
          " div (cast(cents_all as decimal(38,0)) * n_days) as bigint)")
          .as("index_ppm"))
  }

  /** Holt double-exponential smoothing (level + trend) over each type's
    * daily-cents series, in pure integer fixed point — the forecasting
    * twin of [[qEwma]]'s level-only fold. Recurrence with α = β = ¼ and
    * the b₀ = 0 convention:
    *   l_t = ⌊(y_t + 3(l_{t−1} + b_{t−1})) / 4⌋
    *   b_t = ⌊(3·b_{t−1} + (l_t − l_{t−1})) / 4⌋
    * The divisions TRUNCATE toward zero by definition: the trend goes
    * negative on declining series, and truncation is the semantics
    * Spark's `div`, DuckDB's `//` (verified: −7 // 4 = −1) and Java's
    * `/` all share natively — a floor convention would need the
    * Theil-Sen mod-trick on every engine instead of none. The DuckDB
    * oracle replays the recurrence with a recursive CTE. The one-step
    * absolute forecast errors accumulate
    * in the same fold (MAE is the honest fit gauge). Per-type series are
    * calendar-bounded (the defended bounded-collect posture), so the
    * fold is a per-group array aggregate, not a driver loop. */
  def qHoltWinters(spark: SparkSession, dir: String): DataFrame = {
    // SQL lambdas can't bind intermediates, so l_t is interpolated into
    // the b_t update textually
    val lNew = "(y + 3 * (a.l + a.b)) div 4"
    val bNew = s"(3 * a.b + ($lNew) - a.l) div 4"
    val fold =
      s"""aggregate(
         |  slice(ys, 2, size(ys) - 1),
         |  named_struct('l', ys[0], 'b', 0L, 'sae', 0L),
         |  (a, y) -> named_struct(
         |    'l', $lNew,
         |    'b', $bNew,
         |    'sae', a.sae + abs(y - (a.l + a.b))))""".stripMargin
        .replace("\n", " ")
    dailyRevenue(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        expr("transform(array_sort(collect_list(struct(day, y)))," +
          " s -> s.y)").as("ys"))
      .filter(col("n_days") >= 2)
      .withColumn("hw", expr(fold))
      .select(col("event_type"), col("n_days"),
        col("hw.l").as("level"), col("hw.b").as("trend"),
        (col("hw.l") + col("hw.b") * 7).as("forecast_7d"),
        expr("hw.sae div (n_days - 1)").as("mae"))
  }

  /** Offline least-squares changepoint (binary segmentation, depth 1)
    * over each type's daily-DOLLAR series ([[dailyDollars]] — the ×2²⁰
    * argmax pre-scale on squared CENT sums would overflow the bigint
    * output columns at sf0.1 already) — CUSUM's retrospective
    * counterpart: WHERE did the level shift, not just whether it drifted.
    * Minimizing SSE_left(k) + SSE_right(k) is equivalent to maximizing
    *   g(k) = S_k²/k + (S_n−S_k)²/(n−k),
    * and the argmax is taken over the EXACT scaled integers
    *   g_scaled(k) = (S_k²·(n−k) + (S_n−S_k)²·k) · 2²⁰ div (k·(n−k))
    * (floor division is identical in both engines, and the ×2²⁰
    * pre-scale keeps the floor from collapsing distinct g's; ties break
    * on smaller k). Gain over the no-split fit ships as
    * `(g_best·n − S_n²·2²⁰) div n` in the same scaled units — positive
    * iff splitting helps at all. Everything flows from ONE cumulative
    * window over the per-type day series (bounded: days per type), then
    * a per-type argmax window over n−1 split candidates. */
  def qChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyDollars(spark, dir)
    val cum = daily
      .withColumn("kk", row_number().over(
        Window.partitionBy("event_type").orderBy("day")))
      .withColumn("sk", sum("y").over(
        Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("sn", sum("y").over(Window.partitionBy("event_type")))
    val scored = cum.filter(col("kk") < col("n"))
      .withColumn("g_scaled", expr(
        "cast((cast(sk as decimal(38,0)) * sk * (n - kk) +" +
          " cast(sn - sk as decimal(38,0)) * (sn - sk) * kk) * 1048576" +
          " div (cast(kk as decimal(38,0)) * (n - kk)) as decimal(38,0))"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("g_scaled").desc, col("kk").asc)))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n").as("n_days"),
        col("kk").cast("long").as("split_k"), col("day").as("split_day"),
        expr("sk div kk").as("mean_left"),
        expr("(sn - sk) div (n - kk)").as("mean_right"),
        // subtract two NON-NEGATIVE divisions rather than dividing the
        // (possibly slightly negative, from g_scaled's own floor)
        // difference — keeps every div on non-negative operands, where
        // floor and truncation coincide and no engine convention matters
        expr("cast(g_scaled as bigint)" +
          " - cast(cast(sn as decimal(38,0)) * sn * 1048576 div n" +
          " as bigint)").as("gain_scaled"))
  }
}
