package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the events/time-series family (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object EventsOracles {
  val sql: Map[String, String] = Map(
    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_window_tumbling" ->
      """WITH e AS (SELECT event_type, (epoch_us(ts) // 900000000) * 900000000 AS start_us FROM events)
        |SELECT strftime(make_timestamp(start_us), '%Y-%m-%d %H:%M:%S') AS win_start,
        |  strftime(make_timestamp(start_us + 900000000), '%Y-%m-%d %H:%M:%S') AS win_end,
        |  event_type, count(*) AS n_events
        |FROM e GROUP BY 1, 2, 3""".stripMargin,
    // integer-µs replay of the watermarked interval join: equi keys,
    // ack ∈ [send, send+4s] horizon, every-11th message never acked
    "q_ack_rtt" ->
      """WITH log AS (
        |  SELECT event_id, user_id AS connid,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seqnum,
        |    epoch_us(ts) AS us
        |  FROM events),
        |sends AS (SELECT connid, seqnum, us AS send_us FROM log),
        |acks AS (SELECT connid, seqnum, us + (event_id % 5 + 1) * 1000000 AS ack_us
        |         FROM log WHERE event_id % 11 <> 0)
        |SELECT s.connid, s.seqnum,
        |  CAST((a.ack_us // 1000) - (s.send_us // 1000) AS BIGINT) AS rtt_ms
        |FROM sends s JOIN acks a
        |  ON s.connid = a.connid AND s.seqnum = a.seqnum
        | AND a.ack_us >= s.send_us AND a.ack_us <= s.send_us + 4000000""".stripMargin,
    "q_window_sliding" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |w AS (SELECT event_type,
        |        (us // 900000000) * 900000000 - k.k * 900000000 AS start_us
        |      FROM e CROSS JOIN (VALUES (0), (1)) k(k))
        |SELECT strftime(make_timestamp(start_us), '%Y-%m-%d %H:%M:%S') AS win_start,
        |  strftime(make_timestamp(start_us + 1800000000), '%Y-%m-%d %H:%M:%S') AS win_end,
        |  event_type, count(*) AS n_events
        |FROM w GROUP BY 1, 2, 3""".stripMargin,
    "q_events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |f AS (SELECT user_id, event_id, ts_us,
        |        lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |g AS (SELECT user_id, event_id, ts_us,
        |        CASE WHEN prev_us IS NULL THEN 1
        |             WHEN ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM f),
        |h AS (SELECT user_id, event_id,
        |        CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_id FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM h GROUP BY 1, 2""".stripMargin,
    "q_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |f AS (SELECT user_id, ts_us,
        |        lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev_us FROM e),
        |g AS (SELECT user_id, ts_us,
        |        CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |             THEN 1 ELSE 0 END AS ns FROM f),
        |h AS (SELECT user_id, ts_us,
        |        CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us) AS BIGINT) AS sid FROM g)
        |SELECT user_id, min(ts_us) AS sess_start_us,
        |  max(ts_us) + 1800000000 AS sess_end_us, count(*) AS n_events
        |FROM h GROUP BY user_id, sid""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS n_events, CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY 1""".stripMargin,
    // oracle uses DuckDB's NATIVE ASOF JOIN — a fully independent
    // implementation of the same semantics as the union+running-last plan
    "q_asof_join" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events)
        |SELECT p.event_id, p.user_id, c.event_id AS click_event_id,
        |  p.ts_us - c.ts_us AS us_since_click
        |FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us""".stripMargin,
    "q_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |        epoch_us(ts) AS ts_us FROM events),
        |f AS (SELECT user_id, event_id, event_type, ts_us,
        |        lag(ts_us) OVER (PARTITION BY user_id
        |          ORDER BY ts_us, event_id) AS prev_us FROM e),
        |g AS (SELECT user_id, event_id, event_type, ts_us,
        |        CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |          THEN 1 ELSE 0 END AS ns FROM f),
        |h AS (SELECT user_id, event_id, event_type, ts_us,
        |        sum(ns) OVER (PARTITION BY user_id
        |          ORDER BY ts_us, event_id) AS sid FROM g),
        |r AS (SELECT user_id, sid, event_type,
        |        row_number() OVER (PARTITION BY user_id, sid
        |          ORDER BY ts_us, event_id) AS rn FROM h),
        |p AS (SELECT user_id, sid,
        |        max(CASE WHEN rn = 1 THEN event_type END) AS t1,
        |        max(CASE WHEN rn = 2 THEN event_type END) AS t2,
        |        max(CASE WHEN rn = 3 THEN event_type END) AS t3
        |      FROM r WHERE rn <= 3 GROUP BY 1, 2)
        |SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n_sessions
        |FROM p WHERE t3 IS NOT NULL GROUP BY 1""".stripMargin,
    // chi2 = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)): exact HUGEINT operands,
    // one IEEE division (the q_embedding_cov discipline)
    "q_ab_test" ->
      """WITH u AS (SELECT user_id,
        |        max(CASE WHEN event_type = 'purchase' AND value > 120.0
        |          THEN 1 ELSE 0 END) AS conv
        |      FROM events GROUP BY 1),
        |v AS (SELECT user_id % 2 AS variant, conv FROM u),
        |cell AS (SELECT
        |    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 - conv ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 - conv ELSE 0 END) AS BIGINT) AS d
        |  FROM v)
        |SELECT a, b, c, d,
        |  CASE WHEN CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d) = 0
        |    THEN 0.0
        |  ELSE
        |    CAST(CAST(a + b + c + d AS HUGEINT)
        |        * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
        |        * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c) AS DOUBLE)
        |    / CAST(CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d) AS DOUBLE)
        |  END AS chi2
        |FROM cell""".stripMargin,
    // per-bucket PSI terms only — no cross-row IEEE sum; shares are
    // add-one-smoothed integer ppm, deciles fit on the early half
    "q_drift_psi" -> {
      val bs = (1 to 9).map(k =>
        s"min(CASE WHEN cumn >= (n - 1) * ${k * 10} // 100 + 1 THEN value END) AS b$k")
        .mkString(",\n    ")
      val bin = (1 to 9)
        .map(k => s"CASE WHEN value >= b$k THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH ev AS (SELECT (epoch_us(ts) // 3600000000) AS hr,
         |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS value FROM events),
         |n AS (SELECT count(*) AS n FROM ev),
         |freq AS (SELECT hr, count(*) AS c FROM ev GROUP BY 1),
         |cum AS (SELECT hr, sum(c) OVER (ORDER BY hr
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn
         |        FROM freq),
         |cutoff AS (SELECT min(CASE WHEN cumn >= (n - 1) * 50 // 100 + 1
         |             THEN hr END) AS cut_hr
         |           FROM cum CROSS JOIN n),
         |tagged AS MATERIALIZED (SELECT value,
         |             CASE WHEN hr <= cut_hr THEN 'early' ELSE 'late' END AS half
         |           FROM ev CROSS JOIN cutoff),
         |efreq AS (SELECT value, count(*) AS c FROM tagged
         |          WHERE half = 'early' GROUP BY 1),
         |ecum AS (SELECT value, sum(c) OVER (ORDER BY value
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn
         |         FROM efreq),
         |en AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM efreq),
         |bounds AS (SELECT
         |    $bs
         |  FROM ecum CROSS JOIN en),
         |counts AS (SELECT bucket,
         |    CAST(sum(CASE WHEN half = 'early' THEN 1 ELSE 0 END) AS BIGINT) AS ne,
         |    CAST(sum(CASE WHEN half = 'late' THEN 1 ELSE 0 END) AS BIGINT) AS nl
         |  FROM (SELECT half, CAST($bin AS BIGINT) AS bucket
         |        FROM tagged CROSS JOIN bounds)
         |  GROUP BY 1),
         |tot AS (SELECT CAST(sum(ne) AS BIGINT) AS te,
         |          CAST(sum(nl) AS BIGINT) AS tl FROM counts),
         |shares AS (SELECT bucket, ne, nl,
         |    CAST((ne + 1) * 1000000 // (te + 10) AS BIGINT) AS p_ppm,
         |    CAST((nl + 1) * 1000000 // (tl + 10) AS BIGINT) AS q_ppm
         |  FROM counts CROSS JOIN tot)
         |SELECT bucket, ne, nl, p_ppm, q_ppm,
         |  round(CAST(p_ppm - q_ppm AS DOUBLE) / 1e6
         |    * ln(CAST(p_ppm AS DOUBLE) / q_ppm), 6) AS psi_term
         |FROM shares""".stripMargin
    },
    "q_event_transitions" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |        epoch_us(ts) AS ts_us FROM events),
        |t AS (SELECT user_id, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |          ORDER BY ts_us, event_id) AS prev_type
        |      FROM ev),
        |tr AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |       FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |o AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS out_n
        |      FROM tr GROUP BY 1)
        |SELECT tr.prev_type, tr.next_type, tr.n,
        |  CAST(tr.n * 1000000 // o.out_n AS BIGINT) AS p_ppm
        |FROM tr JOIN o ON tr.prev_type = o.prev_type""".stripMargin,
    // |x−μ|>3σ cross-multiplied to integers: (n·c−S)² > 9·(n·SS−S²)
    "q_rolling_outliers" ->
      """WITH ev AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us,
        |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |w AS (SELECT event_type, event_id, cents,
        |        CAST(count(*) OVER win AS BIGINT) AS win_n,
        |        CAST(sum(cents) OVER win AS BIGINT) AS win_sum,
        |        CAST(sum(cents * cents) OVER win AS BIGINT) AS win_sumsq
        |      FROM ev WINDOW win AS (PARTITION BY event_type
        |        ORDER BY ts_us, event_id
        |        ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, event_id, cents, win_n, win_sum, win_sumsq
        |FROM w WHERE win_n >= 20
        |  AND (win_n * cents - win_sum) * (win_n * cents - win_sum)
        |      > 9 * (win_n * win_sumsq - win_sum * win_sum)""".stripMargin,
    // list_reduce seeds with the first element and folds left — exactly
    // ewma₀ = c₀ then (7·acc + c) // 8; all cents positive, so floor
    // and truncating integer division agree across engines
    "q_ewma" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |s AS (SELECT user_id, count(*) AS n_events,
        |        list(cents ORDER BY ts_us, event_id) AS l
        |      FROM ev GROUP BY 1)
        |SELECT user_id, n_events,
        |  CAST(list_reduce(l, (acc, x) -> (acc * 7 + x) // 8) AS BIGINT)
        |    AS ewma_cents
        |FROM s""".stripMargin,
    "q_mann_whitney" ->
      """WITH h AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |sz AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
        |pr AS (SELECT a.event_type AS ta, a.n AS n1, b.event_type AS tb, b.n AS n2
        |  FROM sz a JOIN sz b ON a.event_type < b.event_type),
        |m AS (SELECT pr.ta, pr.tb, pr.n1, pr.n2, h.cents,
        |    CAST(sum(CASE WHEN h.event_type = pr.ta THEN h.cnt ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN h.event_type = pr.tb THEN h.cnt ELSE 0 END) AS BIGINT) AS cb
        |  FROM pr JOIN h ON h.event_type = pr.ta OR h.event_type = pr.tb
        |  GROUP BY 1, 2, 3, 4, 5),
        |c AS (SELECT ta, tb, n1, n2, ca, cb,
        |    COALESCE(sum(cb) OVER (PARTITION BY ta, tb ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb_below
        |  FROM m)
        |SELECT ta, tb, n1, n2,
        |  CAST(sum(2 * ca * cumb_below + ca * cb) AS BIGINT) AS u1_x2,
        |  CAST((sum(2 * ca * cumb_below + ca * cb) * 500000) // (n1 * n2) AS BIGINT)
        |    AS cles_ppm
        |FROM c GROUP BY 1, 2, 3, 4""".stripMargin,
    "q_welch_ttest" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100 AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS ss
        |  FROM daily GROUP BY 1),
        |v AS (SELECT event_type, n, s, n::HUGEINT * ss - s::HUGEINT * s AS v FROM m),
        |pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |    a.n AS n1, b.n AS n2,
        |    a.s::HUGEINT * b.n - b.s::HUGEINT * a.n AS md_num,
        |    a.v * b.n::HUGEINT * b.n * (b.n - 1) AS a1,
        |    b.v * a.n::HUGEINT * a.n * (a.n - 1) AS a2
        |  FROM v a JOIN v b ON a.event_type < b.event_type)
        |SELECT ta, tb, n1, n2,
        |  CAST(md_num * md_num * (n1 - 1) * (n2 - 1) * 1000000
        |    // (a1 + a2) AS BIGINT) AS t2_ppm,
        |  CAST((a1 + a2) * (a1 + a2) * (n1 - 1) * (n2 - 1) * 10
        |    // (a1 * a1 * (n2 - 1) + a2 * a2 * (n1 - 1)) AS BIGINT) AS nu_deci
        |FROM pr""".stripMargin,
    "q_anova" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100 AS y
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS ss
        |  FROM daily GROUP BY 1),
        |-- product() returns DOUBLE, exact below 2^53 (sizes are ~30 each)
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(s) AS BIGINT) AS t, CAST(sum(ss) AS BIGINT) AS sstot,
        |    CAST(product(n) AS HUGEINT) AS p
        |  FROM g),
        |terms AS (SELECT t2.k, t2.nn, t2.t, t2.sstot, t2.p,
        |    sum(g.s::HUGEINT * g.s * (t2.p // g.n)) AS sum_s2pn
        |  FROM g CROSS JOIN tot t2 GROUP BY 1, 2, 3, 4, 5),
        |np AS (SELECT k, nn,
        |    nn::HUGEINT * sum_s2pn - t::HUGEINT * t * p AS ssb_np,
        |    (nn::HUGEINT * sstot - t::HUGEINT * t) * p AS sst_np
        |  FROM terms)
        |SELECT k, nn AS n_days,
        |  CAST(ssb_np * 1000000 // sst_np AS BIGINT) AS eta2_ppm,
        |  CAST(ssb_np * (nn - k) * 1000000
        |    // ((sst_np - ssb_np) * (k - 1)) AS BIGINT) AS f_ppm
        |FROM np""".stripMargin,
    "q_seasonality" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |bd AS (SELECT event_type, (day + 4) % 7 AS dow,
        |    CAST(count(*) AS BIGINT) AS n_days, CAST(sum(y) AS BIGINT) AS cents
        |  FROM daily GROUP BY 1, 2),
        |bt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days_all,
        |    CAST(sum(y) AS BIGINT) AS cents_all
        |  FROM daily GROUP BY 1)
        |SELECT bd.event_type, bd.dow, bd.n_days, bd.cents,
        |  CAST(bd.cents * 1000000 // bt.cents_all AS BIGINT) AS share_ppm,
        |  CAST(bd.cents::HUGEINT * bt.n_days_all * 1000000
        |    // (bt.cents_all::HUGEINT * bd.n_days) AS BIGINT) AS index_ppm
        |FROM bd JOIN bt USING (event_type)""".stripMargin,
    "q_changepoint" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) // 100 AS y
        |  FROM events GROUP BY 1, 2),
        |cum AS (SELECT event_type, day, y,
        |    CAST(row_number() OVER w AS BIGINT) AS kk,
        |    CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sk,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS sn
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |sc AS (SELECT *,
        |    (sk::HUGEINT * sk * (n - kk) + (sn - sk)::HUGEINT * (sn - sk) * kk)
        |      * 1048576 // (kk::HUGEINT * (n - kk)) AS g_scaled
        |  FROM cum WHERE kk < n),
        |best AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY g_scaled DESC, kk ASC) AS rn FROM sc)
        |SELECT event_type, n AS n_days, kk AS split_k, day AS split_day,
        |  sk // kk AS mean_left, (sn - sk) // (n - kk) AS mean_right,
        |  CAST(g_scaled AS BIGINT)
        |    - CAST(sn::HUGEINT * sn * 1048576 // n AS BIGINT) AS gain_scaled
        |FROM best WHERE rn = 1""".stripMargin,
    "q_ks_test" ->
      """WITH h AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |sz AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
        |pr AS (SELECT a.event_type AS ta, a.n AS n1, b.event_type AS tb, b.n AS n2
        |  FROM sz a JOIN sz b ON a.event_type < b.event_type),
        |m AS (SELECT pr.ta, pr.tb, pr.n1, pr.n2, h.cents,
        |    CAST(sum(CASE WHEN h.event_type = pr.ta THEN h.cnt ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN h.event_type = pr.tb THEN h.cnt ELSE 0 END) AS BIGINT) AS cb
        |  FROM pr JOIN h ON h.event_type = pr.ta OR h.event_type = pr.tb
        |  GROUP BY 1, 2, 3, 4, 5),
        |c AS (SELECT ta, tb, n1, n2,
        |    sum(ca) OVER (PARTITION BY ta, tb ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    sum(cb) OVER (PARTITION BY ta, tb ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
        |  FROM m)
        |SELECT ta, tb, n1, n2,
        |  CAST(max(abs(cuma * n2 - cumb * n1)) AS BIGINT) AS d_num,
        |  CAST((max(abs(cuma * n2 - cumb * n1)) * 1000000) // (n1 * n2) AS BIGINT) AS d_ppm
        |FROM c GROUP BY 1, 2, 3, 4""".stripMargin,
    "q_cusum" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |mu AS (SELECT event_type, sum(y) // count(*) AS mu
        |  FROM daily GROUP BY 1),
        |dd AS (SELECT d.event_type, d.day, d.y, m.mu,
        |    d.y - m.mu - m.mu // 20 AS dev
        |  FROM daily d JOIN mu m USING (event_type)),
        |s1 AS (SELECT event_type, day, y, mu,
        |    sum(dev) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM dd),
        |s2 AS (SELECT event_type, day, y, mu, s,
        |    min(s) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS smin
        |  FROM s1)
        |SELECT event_type, day, y,
        |  CAST(s - least(0, smin) AS BIGINT) AS cusum,
        |  (s - least(0, smin)) > mu // 5 AS alarm
        |FROM s2""".stripMargin,
    "q_twap" ->
      """WITH ev AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |hz AS (SELECT max(ts_us) AS t_end FROM ev),
        |iv AS (SELECT event_type, cents,
        |    COALESCE(lead(ts_us) OVER (PARTITION BY event_type
        |        ORDER BY ts_us, event_id), t_end) - ts_us AS dt_us
        |  FROM ev CROSS JOIN hz)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(dt_us) AS BIGINT) AS held_us,
        |  CAST(sum(cents::HUGEINT * dt_us) // sum(dt_us)::HUGEINT AS BIGINT)
        |    AS twap_cents,
        |  CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
        |FROM iv GROUP BY 1""".stripMargin,
    "q_mad_outliers" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |h1 AS (SELECT event_type, cents, count(*) AS cnt FROM ev GROUP BY 1, 2),
        |m1 AS (SELECT event_type,
        |    CAST(min(CASE WHEN cum * 2 >= n THEN cents END) AS BIGINT) AS med
        |  FROM (SELECT event_type, cents,
        |      sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
        |      sum(cnt) OVER (PARTITION BY event_type) AS n
        |    FROM h1)
        |  GROUP BY 1),
        |dv AS (SELECT e.event_type, e.cents, abs(e.cents - m.med) AS adev
        |  FROM ev e JOIN m1 m USING (event_type)),
        |h2 AS (SELECT event_type, adev, count(*) AS cnt FROM dv GROUP BY 1, 2),
        |m2 AS (SELECT event_type,
        |    CAST(min(CASE WHEN cum * 2 >= n THEN adev END) AS BIGINT) AS mad
        |  FROM (SELECT event_type, adev,
        |      sum(cnt) OVER (PARTITION BY event_type ORDER BY adev) AS cum,
        |      sum(cnt) OVER (PARTITION BY event_type) AS n
        |    FROM h2)
        |  GROUP BY 1)
        |SELECT d.event_type, count(*) AS n, m1.med, m2.mad,
        |  CAST(sum(CASE WHEN d.adev * 10000 > m2.mad * 44478 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  max(d.cents) AS max_cents
        |FROM dv d JOIN m1 USING (event_type) JOIN m2 USING (event_type)
        |GROUP BY 1, m1.med, m2.mad""".stripMargin,
    "q_gap_fill" ->
      """WITH hourly AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
        |    count(*) AS n_events,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM hourly),
        |spine AS (SELECT t.event_type, g.hr
        |  FROM (SELECT DISTINCT event_type FROM hourly) t
        |  CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS hr FROM b) g)
        |SELECT event_type, hr,
        |  CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
        |  CAST(COALESCE(last_value(cents IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT)
        |    AS cents_ffill
        |FROM spine LEFT JOIN hourly USING (event_type, hr)""".stripMargin,
    "q_window_range" ->
      """SELECT event_type, event_id, epoch_us(ts) AS ts_us,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |  count(*) OVER w AS n_6h,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS cents_6h
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_target_encode" ->
      """WITH rows_ AS (SELECT o_orderkey, c_mktsegment,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |pr AS (SELECT sum(cents) // count(*) AS prior_cents FROM rows_)
        |SELECT o_orderkey, c_mktsegment, cents,
        |  CAST((sum(cents) OVER (PARTITION BY c_mktsegment) - cents
        |      + 100 * prior_cents)
        |    // (count(*) OVER (PARTITION BY c_mktsegment) - 1 + 100) AS BIGINT)
        |    AS loo_enc_cents
        |FROM rows_ CROSS JOIN pr""".stripMargin,
    "q_slo_burn" ->
      """WITH hourly AS (SELECT epoch_us(ts) // 3600000000 AS hour,
        |    count(*) AS n,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_err
        |  FROM events GROUP BY 1),
        |spine AS (SELECT unnest(range(
        |    (SELECT min(hour) FROM hourly),
        |    (SELECT max(hour) FROM hourly) + 1)) AS hour),
        |dense AS (SELECT s.hour, coalesce(n, 0) AS n,
        |    coalesce(n_err, 0) AS n_err
        |  FROM spine s LEFT JOIN hourly USING (hour)),
        |r AS (SELECT hour, n, n_err,
        |    sum(n) OVER w AS n6, sum(n_err) OVER w AS e6
        |  FROM dense
        |  WINDOW w AS (ORDER BY hour
        |    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(sum(n_err) AS BIGINT) AS et FROM hourly),
        |o AS (SELECT hour, n, n_err,
        |    CASE WHEN n > 0
        |      THEN CAST(n_err::HUGEINT * 1000000 // n AS BIGINT) END AS fast_ppm,
        |    CASE WHEN n6 > 0
        |      THEN CAST(e6::HUGEINT * 1000000 // n6 AS BIGINT) END AS slow_ppm,
        |    CAST(et::HUGEINT * 1000000 // nt AS BIGINT) AS budget_ppm
        |  FROM r CROSS JOIN tot)
        |SELECT hour, n, n_err, fast_ppm, slow_ppm, budget_ppm,
        |  coalesce(fast_ppm > budget_ppm * 2 AND slow_ppm > budget_ppm * 2,
        |    false) AS alert
        |FROM o""".stripMargin,
    "q_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |t AS (SELECT event_type, cents,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch
        |  FROM ev)
        |SELECT coalesce(touch, 'direct') AS channel,
        |  count(*) AS n_purchases, CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM t WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,
    "q_streaks" ->
      """WITH daily AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |f AS (SELECT event_type, day,
        |    CASE WHEN y > lag(y) OVER (PARTITION BY event_type ORDER BY day)
        |      THEN 1 ELSE 0 END AS up
        |  FROM daily),
        |i AS (SELECT event_type, day, up,
        |    sum(1 - up) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f),
        |isl AS (SELECT event_type, island, count(*) AS len,
        |    CAST(min(day) AS BIGINT) AS first_up_day,
        |    CAST(max(day) AS BIGINT) AS last_up_day
        |  FROM i WHERE up = 1 GROUP BY 1, 2),
        |r AS (SELECT event_type, len, first_up_day, last_up_day,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY len DESC, first_up_day) AS rn
        |  FROM isl)
        |SELECT event_type, CAST(len AS BIGINT) AS streak_days,
        |  first_up_day, last_up_day
        |FROM r WHERE rn = 1""".stripMargin,
    "q_bot_detect" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, us - lag(us) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS g FROM ev),
        |s AS (SELECT user_id, count(*) AS n_gaps,
        |    sum(g::HUGEINT) AS sg, sum(g::HUGEINT * g) AS sg2
        |  FROM g WHERE g IS NOT NULL GROUP BY 1),
        |o AS (SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
        |    CAST(sg // n_gaps AS BIGINT) AS mean_gap_us,
        |    CAST(n_gaps::HUGEINT * sg2 * 1000000 // (sg * sg)
        |      - 1000000 AS BIGINT) AS cv2_ppm
        |  FROM s WHERE n_gaps >= 20 AND sg > 0)
        |SELECT user_id, n_gaps, mean_gap_us, cv2_ppm,
        |  cv2_ppm < 100000 AS is_bot
        |FROM o""".stripMargin,
    "q_funnel_latency" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    epoch_us(ts) AS us FROM events),
        |fv AS (SELECT user_id, min(us) AS v_us FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |lat AS (SELECT e.user_id,
        |    (min(e.us) - v_us) // 1000000 AS lat_s
        |  FROM ev e JOIN fv USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.us > fv.v_us
        |  GROUP BY 1, v_us),
        |freq AS (SELECT lat_s, count(*) AS c FROM lat GROUP BY 1),
        |cum AS (SELECT lat_s, c, sum(c) OVER (ORDER BY lat_s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn
        |  FROM freq),
        |nc AS (SELECT CAST(sum(c) AS BIGINT) AS nc FROM freq),
        |q AS (SELECT any_value(nc.nc) AS n_converted,
        |    min(CASE WHEN cumn >= (nc.nc - 1) * 50 // 100 + 1
        |      THEN lat_s END) AS p50_s,
        |    min(CASE WHEN cumn >= (nc.nc - 1) * 90 // 100 + 1
        |      THEN lat_s END) AS p90_s,
        |    min(CASE WHEN cumn >= (nc.nc - 1) * 99 // 100 + 1
        |      THEN lat_s END) AS p99_s
        |  FROM cum CROSS JOIN nc),
        |nv AS (SELECT count(*) AS n_viewers FROM fv)
        |SELECT n_viewers, n_converted,
        |  CAST(n_converted::HUGEINT * 1000000 // n_viewers AS BIGINT)
        |    AS conversion_ppm,
        |  p50_s, p90_s, p99_s
        |FROM q CROSS JOIN nv""".stripMargin,
    // zero-observed cells kept via the margin cross join (their term is
    // R*C/N); numerator assembled HUGEINT-exact like Spark's decimal
    "q_contingency" ->
      """WITH obs AS (SELECT event_type,
        |    (epoch_us(ts) // 86400000000 + 4) % 7 AS dow, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rm AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
        |cm AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    count(DISTINCT event_type) AS nr, count(DISTINCT dow) AS nc
        |  FROM obs),
        |cells AS (SELECT rm.event_type, cm.dow, rm.r, cm.c,
        |    coalesce(obs.o, 0) AS o
        |  FROM rm CROSS JOIN cm
        |  LEFT JOIN obs ON obs.event_type = rm.event_type AND obs.dow = cm.dow),
        |terms AS (SELECT
        |    CAST(CAST((o::HUGEINT * tot.n - r::HUGEINT * c)
        |        * (o::HUGEINT * tot.n - r::HUGEINT * c) AS DOUBLE)
        |      / CAST(r::HUGEINT * c * tot.n AS DOUBLE) AS DOUBLE) AS term,
        |    tot.n, tot.nr, tot.nc
        |  FROM cells CROSS JOIN tot),
        |s AS (SELECT count(*) AS n_cells, any_value(n) AS n_events,
        |    any_value(nr) AS nr, any_value(nc) AS nc,
        |    round(sum(term), 6) AS chi2 FROM terms)
        |SELECT n_cells, n_events, chi2,
        |  round(sqrt(chi2 / (n_events * (least(nr, nc) - 1))), 6) AS cramers_v
        |FROM s""".stripMargin,
    "q_mutual_info" ->
      """WITH xy AS (SELECT event_type AS x,
        |    (epoch_us(ts) // 3600000000) % 24 AS y, count(*) AS nxy
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM xy GROUP BY 1),
        |my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM xy GROUP BY 1),
        |tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM xy),
        |mi AS (SELECT round(sum(
        |    nxy / CAST(n AS DOUBLE) *
        |    ln(CAST(nxy AS DOUBLE) * n / (CAST(nx AS DOUBLE) * ny))), 6) AS mi
        |  FROM xy JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot),
        |hx AS (SELECT round(sum(
        |    -(nx / CAST(n AS DOUBLE)) * ln(nx / CAST(n AS DOUBLE))), 6) AS h_x
        |  FROM mx CROSS JOIN tot),
        |hy AS (SELECT round(sum(
        |    -(ny / CAST(n AS DOUBLE)) * ln(ny / CAST(n AS DOUBLE))), 6) AS h_y
        |  FROM my CROSS JOIN tot)
        |SELECT mi, h_x, h_y, round(mi / sqrt(h_x * h_y), 6) AS nmi
        |FROM mi CROSS JOIN hx CROSS JOIN hy""".stripMargin,
    // floor-division slope formula shared verbatim with the Spark side
    // (plain div/// disagree on negative slopes between the engines)
    "q_theil_sen" ->
      """WITH daily AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type, a.day AS di, b.day AS dj,
        |    (b.y - a.y) * 1000000 AS dy1m, b.day - a.day AS dx,
        |    CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |s AS (SELECT event_type, di, dj, sgn,
        |    (dy1m - ((dy1m % dx) + dx) % dx) // dx AS slope_u FROM p),
        |r AS (SELECT event_type, slope_u,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY slope_u, di, dj) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt FROM s),
        |m AS (SELECT event_type, slope_u AS median_slope_u FROM r
        |  WHERE rn = (cnt + 1) // 2),
        |agg AS (SELECT event_type, count(*) AS n_pairs,
        |    CAST(sum(sgn) AS BIGINT) AS s_stat FROM s GROUP BY 1),
        |nd AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1)
        |SELECT event_type, n_days, n_pairs, s_stat, median_slope_u
        |FROM nd JOIN agg USING (event_type) JOIN m USING (event_type)""".stripMargin,
    "q_linreg_trend" ->
      """WITH daily AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |dx AS (SELECT event_type, day - (SELECT min(day) FROM daily) AS x, y
        |  FROM daily),
        |m AS (SELECT event_type, count(*) AS n,
        |    sum(x) AS sx, sum(x * x) AS sxx, sum(y) AS sy, sum(x * y) AS sxy
        |  FROM dx GROUP BY 1),
        |f AS (SELECT event_type, n,
        |    n::HUGEINT * sxy - sx::HUGEINT * sy AS slope_num,
        |    n::HUGEINT * sxx - sx::HUGEINT * sx AS slope_den,
        |    sy::HUGEINT AS syh, sx::HUGEINT AS sxh
        |  FROM m)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  round(CAST(slope_num AS DOUBLE) / CAST(slope_den AS DOUBLE), 4)
        |    AS slope_cents_per_day,
        |  round(CAST(syh * slope_den - slope_num * sxh AS DOUBLE)
        |    / CAST(n::HUGEINT * slope_den AS DOUBLE), 4) AS intercept_cents
        |FROM f""".stripMargin,
    "q_corr_matrix" ->
      """WITH hourly AS (SELECT epoch_us(ts) // 3600000000 AS hr, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |stats AS (SELECT event_type, sum(n) AS sx, sum(n * n) AS sxx
        |  FROM hourly GROUP BY 1),
        |hrs AS (SELECT count(DISTINCT hr) AS h FROM hourly),
        |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    sum(a.n * b.n) AS sxy
        |  FROM hourly a JOIN hourly b
        |    ON a.hr = b.hr AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, CAST(h AS BIGINT) AS n_hours,
        |  CAST(h::HUGEINT * sxy - sa.sx::HUGEINT * sb.sx AS BIGINT) AS cov_num,
        |  round(CAST(h::HUGEINT * sxy - sa.sx::HUGEINT * sb.sx AS DOUBLE)
        |    / sqrt(CAST((h::HUGEINT * sa.sxx - sa.sx::HUGEINT * sa.sx)
        |      * (h::HUGEINT * sb.sxx - sb.sx::HUGEINT * sb.sx) AS DOUBLE)), 6)
        |    AS corr
        |FROM pairs
        |JOIN stats sa ON type_a = sa.event_type
        |JOIN stats sb ON type_b = sb.event_type
        |CROSS JOIN hrs""".stripMargin,
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t1 FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts_us) AS t2, min(v.t1) AS t1
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts_us > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts_us) AS t3, min(c.t2) AS t2
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts_us > c.t2 GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
        |  count(*) AS n_users, CAST(0 AS BIGINT) AS sum_gap_us FROM v
        |UNION ALL
        |SELECT 2, 'click', count(*), CAST(coalesce(sum(t2 - t1), 0) AS BIGINT) FROM c
        |UNION ALL
        |SELECT 3, 'purchase', count(*), CAST(coalesce(sum(t3 - t2), 0) AS BIGINT) FROM p""".stripMargin,
    "q_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS d0 FROM ev GROUP BY 1),
        |a AS (SELECT DISTINCT
        |        CAST(date_diff('day', DATE '1970-01-01', f.d0) // 7 AS BIGINT) AS cohort_week,
        |        CAST(date_diff('day', f.d0, e.d) // 7 AS BIGINT) AS week_offset,
        |        e.user_id
        |      FROM (SELECT DISTINCT user_id, d FROM ev) e
        |      JOIN f ON e.user_id = f.user_id)
        |SELECT cohort_week, week_offset, count(*) AS n_active
        |FROM a GROUP BY 1, 2""".stripMargin,
    "q_cohort_ltv" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS d0 FROM ev GROUP BY 1),
        |cells AS (SELECT f.d0 // 7 AS cohort_week,
        |    (ev.day - f.d0) // 7 AS age_week, ev.user_id, ev.cents
        |  FROM ev JOIN f ON ev.user_id = f.user_id),
        |cn AS (SELECT cohort_week, CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS n_users FROM cells GROUP BY 1),
        |agg AS (SELECT cohort_week, age_week,
        |    CAST(sum(cents) AS BIGINT) AS cents FROM cells GROUP BY 1, 2),
        |cum AS (SELECT cohort_week, age_week, cents,
        |    CAST(sum(cents) OVER (PARTITION BY cohort_week
        |      ORDER BY age_week) AS BIGINT) AS cum_cents FROM agg)
        |SELECT cum.cohort_week, cum.age_week, cn.n_users, cum.cum_cents,
        |  cum.cum_cents // cn.n_users AS ltv_cents
        |FROM cum JOIN cn ON cum.cohort_week = cn.cohort_week""".stripMargin,
    // KM over inter-event waits: the survival recurrence is a recursive
    // CTE over the calendar-bounded hour spine — same truncating
    // integer arithmetic as the Spark side's driver fold (sums CAST to
    // BIGINT: DuckDB's sum() would otherwise promote to HUGEINT)
    "q_survival" ->
      """WITH RECURSIVE ev AS (SELECT user_id, event_id,
        |  epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT ts_us, lead(ts_us) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id) AS next_us FROM ev),
        |hzn AS (SELECT max(ts_us) AS hz FROM ev),
        |o AS (SELECT (coalesce(next_us, hz) - ts_us) // 3600000000
        |        AS hour,
        |        CASE WHEN next_us IS NULL THEN 0 ELSE 1 END AS arrived
        |      FROM g CROSS JOIN hzn),
        |cnt AS (SELECT hour, CAST(sum(arrived) AS BIGINT) AS d,
        |          CAST(sum(1 - arrived) AS BIGINT) AS c
        |        FROM o GROUP BY 1),
        |spine AS (SELECT unnest(range(0, (SELECT max(hour) + 1 FROM cnt)))
        |            AS hour),
        |dense AS (SELECT s.hour, coalesce(cnt.d, 0) AS d,
        |            coalesce(cnt.c, 0) AS c
        |          FROM spine s LEFT JOIN cnt ON s.hour = cnt.hour),
        |risk AS (SELECT hour, d, c,
        |    CAST((SELECT count(*) FROM o)
        |      - coalesce(sum(d + c) OVER (ORDER BY hour
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk
        |  FROM dense),
        |hzd AS (SELECT hour, n_risk, d, c,
        |    CASE WHEN n_risk > 0 THEN (1000000 * d) // n_risk ELSE 0 END
        |      AS hp
        |  FROM risk),
        |s(hour, n_risk, d, c, hp, surv) AS (
        |  SELECT hour, n_risk, d, c, hp, CAST(1000000 - hp AS BIGINT)
        |  FROM hzd WHERE hour = 0
        |  UNION ALL
        |  SELECT h.hour, h.n_risk, h.d, h.c, h.hp,
        |    (s.surv * (1000000 - h.hp)) // 1000000
        |  FROM s JOIN hzd h ON h.hour = s.hour + 1)
        |SELECT hour, n_risk, d AS n_arrived, c AS n_censored,
        |  hp AS hazard_ppm, surv AS survival_ppm FROM s""".stripMargin,
    "q_interval_join" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events)
        |SELECT e.event_id AS error_event_id, f.event_id AS next_event_id,
        |  f.event_type AS next_type, f.ts_us - e.ts_us AS gap_us
        |FROM (SELECT * FROM ev WHERE event_type = 'error') e
        |JOIN ev f ON e.user_id = f.user_id
        |  AND f.ts_us > e.ts_us AND f.ts_us <= e.ts_us + 21600000000""".stripMargin,
    "q_holt_winters" ->
      """WITH RECURSIVE daily AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |ord AS (SELECT event_type, y,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS t,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM daily),
        |hw(event_type, t, n, l, b, sae) AS (
        |  SELECT event_type, t, n, y, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |  FROM ord WHERE t = 1
        |  UNION ALL
        |  SELECT o.event_type, o.t, o.n,
        |    (o.y + 3 * (h.l + h.b)) // 4,
        |    (3 * h.b + ((o.y + 3 * (h.l + h.b)) // 4) - h.l) // 4,
        |    h.sae + abs(o.y - (h.l + h.b))
        |  FROM hw h JOIN ord o
        |    ON o.event_type = h.event_type AND o.t = h.t + 1)
        |SELECT event_type, n AS n_days, l AS level, b AS trend,
        |  l + 7 * b AS forecast_7d, sae // (n - 1) AS mae
        |FROM hw WHERE t = n AND n >= 2""".stripMargin,
    "q_trimmed_mean" ->
      """WITH c AS (SELECT o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders),
        |h AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
        |  FROM c GROUP BY 1, 2),
        |cm AS (SELECT grp, v, c,
        |    CAST(sum(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS n FROM h),
        |k AS (SELECT grp, v, c, cum, n, n // 10 AS lo, n - n // 10 AS hi
        |  FROM cm),
        |kk AS (SELECT grp, n, v,
        |    greatest(0, least(cum, hi) - greatest(cum - c, lo)) AS kept
        |  FROM k)
        |SELECT grp, min(n) AS n_rows, CAST(sum(kept) AS BIGINT) AS n_kept,
        |  CAST(sum(CAST(v AS HUGEINT) * kept)
        |    // CAST(sum(kept) AS HUGEINT) AS BIGINT) AS trimmed_mean_cents
        |FROM kk GROUP BY 1""".stripMargin,
    "q_value_clip" ->
      """WITH freq AS (SELECT event_type, value, count(*) AS c
        |              FROM events GROUP BY 1, 2),
        |cum AS (SELECT event_type, value, c,
        |          sum(c) OVER (PARTITION BY event_type ORDER BY value
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn
        |        FROM freq),
        |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
        |        FROM freq GROUP BY 1),
        |bounds AS (SELECT event_type, n,
        |    min(CASE WHEN cumn >= (n - 1) * 1 // 100 + 1 THEN value END) AS p_lo,
        |    min(CASE WHEN cumn >= (n - 1) * 99 // 100 + 1 THEN value END) AS p_hi
        |  FROM cum JOIN tot USING (event_type) GROUP BY 1, 2)
        |SELECT event_type, min(n) AS n, min(p_lo) AS p_lo, min(p_hi) AS p_hi,
        |  CAST(sum(CASE WHEN value < p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |  CAST(sum(CASE WHEN value > p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |  CAST(sum(CAST(floor(greatest(least(value, p_hi), p_lo) * 100 + 0.5)
        |    AS BIGINT)) AS BIGINT) AS clipped_sum_cents
        |FROM events JOIN bounds USING (event_type)
        |GROUP BY 1""".stripMargin,
    "q_quantile_bins" -> {
      val bs = (1 to 9).map(k =>
        s"min(CASE WHEN cumn >= (n - 1) * ${k * 10} // 100 + 1 THEN value END) AS b$k")
        .mkString(",\n    ")
      val bin = (1 to 9)
        .map(k => s"CASE WHEN value >= b$k THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH freq AS (SELECT event_type, value, count(*) AS c
         |              FROM events GROUP BY 1, 2),
         |cum AS (SELECT event_type, value, c,
         |          sum(c) OVER (PARTITION BY event_type ORDER BY value
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn
         |        FROM freq),
         |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
         |        FROM freq GROUP BY 1),
         |bounds AS (SELECT event_type, n,
         |    $bs
         |  FROM cum JOIN tot USING (event_type) GROUP BY 1, 2)
         |SELECT event_type, CAST($bin AS BIGINT) AS bin,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  min(value) AS v_min, max(value) AS v_max
         |FROM events JOIN bounds USING (event_type)
         |GROUP BY 1, 2""".stripMargin
    },
    // the Morton interleave recomputed from shifts and masks (16 bits
    // per dimension suffice for this data; the kernel's upper bits are 0)
    "q_zorder_stats" ->
      """WITH q AS (SELECT user_id & 65535 AS user_id,
        |        greatest(CAST(floor(value) AS BIGINT), 0) & 65535 AS qv
        |      FROM events),
        |z AS (SELECT user_id, qv,
        |        ((((user_id >> 0) & 1) << 0) | (((qv >> 0) & 1) << 1) | (((user_id >> 1) & 1) << 2) | (((qv >> 1) & 1) << 3) | (((user_id >> 2) & 1) << 4) | (((qv >> 2) & 1) << 5) | (((user_id >> 3) & 1) << 6) | (((qv >> 3) & 1) << 7) | (((user_id >> 4) & 1) << 8) | (((qv >> 4) & 1) << 9) | (((user_id >> 5) & 1) << 10) | (((qv >> 5) & 1) << 11) | (((user_id >> 6) & 1) << 12) | (((qv >> 6) & 1) << 13) | (((user_id >> 7) & 1) << 14) | (((qv >> 7) & 1) << 15) | (((user_id >> 8) & 1) << 16) | (((qv >> 8) & 1) << 17) | (((user_id >> 9) & 1) << 18) | (((qv >> 9) & 1) << 19) | (((user_id >> 10) & 1) << 20) | (((qv >> 10) & 1) << 21) | (((user_id >> 11) & 1) << 22) | (((qv >> 11) & 1) << 23) | (((user_id >> 12) & 1) << 24) | (((qv >> 12) & 1) << 25) | (((user_id >> 13) & 1) << 26) | (((qv >> 13) & 1) << 27) | (((user_id >> 14) & 1) << 28) | (((qv >> 14) & 1) << 29) | (((user_id >> 15) & 1) << 30) | (((qv >> 15) & 1) << 31)) AS z
        |      FROM q)
        |SELECT z >> 10 AS zbucket, count(*) AS n,
        |  min(user_id) AS u_min, max(user_id) AS u_max,
        |  min(qv) AS v_min, max(qv) AS v_max
        |FROM z GROUP BY 1""".stripMargin,
    "q_hilbert_stats" -> hilbertSql,
  )
}
