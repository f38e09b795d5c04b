package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the sketch family (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object SketchOracles {
  val sql: Map[String, String] = Map(
    "q_hll_sliding" -> hllSlidingSql(3),
    "q_hll_distinct" ->
      """WITH r AS (SELECT event_type,
        |    CAST(('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 2))::UBIGINT AS INT) AS bucket,
        |    CAST(('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 3, 15))::UBIGINT AS BIGINT) AS v
        |  FROM events),
        |s1 AS (SELECT event_type, bucket, v | (v >> 1) AS x FROM r),
        |s2 AS (SELECT event_type, bucket, x | (x >> 2) AS x FROM s1),
        |s3 AS (SELECT event_type, bucket, x | (x >> 4) AS x FROM s2),
        |s4 AS (SELECT event_type, bucket, x | (x >> 8) AS x FROM s3),
        |s5 AS (SELECT event_type, bucket, x | (x >> 16) AS x FROM s4),
        |s6 AS (SELECT event_type, bucket, x | (x >> 32) AS x FROM s5),
        |b AS (SELECT event_type, bucket,
        |    max(61 - bit_count(x)) AS mj
        |  FROM s6 GROUP BY 1, 2),
        |z AS (SELECT event_type,
        |    sum((1::BIGINT << (61 - mj))::HUGEINT)
        |      + (256 - count(*))::HUGEINT * 2305843009213693952::HUGEINT AS zs,
        |    256 - count(*) AS v0
        |  FROM b GROUP BY 1),
        |e AS (SELECT event_type,
        |    CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE)/CAST(256.0 AS DOUBLE))
        |      * CAST(65536.0 AS DOUBLE) * CAST(2305843009213693952.0 AS DOUBLE)
        |      / CAST(zs AS DOUBLE) AS est_raw,
        |    v0 FROM z),
        |x AS (SELECT event_type,
        |    round(CASE WHEN est_raw <= 640.0 AND v0 > 0
        |          THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / v0)
        |          ELSE est_raw END, 2) AS hll_est
        |  FROM e),
        |d AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
        |  FROM events GROUP BY 1)
        |SELECT event_type, n_exact, hll_est FROM d JOIN x USING (event_type)""".stripMargin,
    // sparse-register replay of the blob algebra: same registers, same
    // estimate formula per scope (type, and pair-union), inclusion-
    // exclusion assembled in the same operation order
    "q_audience_overlap" ->
      """WITH r AS (SELECT event_type,
        |    CAST(('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 2))::UBIGINT AS INT) AS bucket,
        |    CAST(('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 3, 15))::UBIGINT AS BIGINT) AS v
        |  FROM events),
        |s1 AS (SELECT event_type, bucket, v | (v >> 1) AS x FROM r),
        |s2 AS (SELECT event_type, bucket, x | (x >> 2) AS x FROM s1),
        |s3 AS (SELECT event_type, bucket, x | (x >> 4) AS x FROM s2),
        |s4 AS (SELECT event_type, bucket, x | (x >> 8) AS x FROM s3),
        |s5 AS (SELECT event_type, bucket, x | (x >> 16) AS x FROM s4),
        |s6 AS (SELECT event_type, bucket, x | (x >> 32) AS x FROM s5),
        |b AS (SELECT event_type, bucket, max(61 - bit_count(x)) AS mj
        |  FROM s6 GROUP BY 1, 2),
        |tp AS (SELECT DISTINCT a.event_type AS type_a, c.event_type AS type_b
        |  FROM b a JOIN b c ON a.event_type < c.event_type),
        |ub AS (SELECT tp.type_a, tp.type_b, b.bucket, max(b.mj) AS mj
        |  FROM tp JOIN b ON b.event_type = tp.type_a OR b.event_type = tp.type_b
        |  GROUP BY 1, 2, 3),
        |z1 AS (SELECT event_type,
        |    sum((1::BIGINT << (61 - mj))::HUGEINT)
        |      + (256 - count(*))::HUGEINT * 2305843009213693952::HUGEINT AS zs,
        |    256 - count(*) AS v0
        |  FROM b GROUP BY 1),
        |e1 AS (SELECT event_type,
        |    CASE WHEN est_raw <= 640.0 AND v0 > 0
        |      THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / v0)
        |      ELSE est_raw END AS est
        |  FROM (SELECT event_type,
        |      CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE)/CAST(256.0 AS DOUBLE))
        |        * CAST(65536.0 AS DOUBLE) * CAST(2305843009213693952.0 AS DOUBLE)
        |        / CAST(zs AS DOUBLE) AS est_raw, v0
        |    FROM z1)),
        |zu AS (SELECT type_a, type_b,
        |    sum((1::BIGINT << (61 - mj))::HUGEINT)
        |      + (256 - count(*))::HUGEINT * 2305843009213693952::HUGEINT AS zs,
        |    256 - count(*) AS v0
        |  FROM ub GROUP BY 1, 2),
        |eu AS (SELECT type_a, type_b,
        |    CASE WHEN est_raw <= 640.0 AND v0 > 0
        |      THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / v0)
        |      ELSE est_raw END AS est
        |  FROM (SELECT type_a, type_b,
        |      CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE)/CAST(256.0 AS DOUBLE))
        |        * CAST(65536.0 AS DOUBLE) * CAST(2305843009213693952.0 AS DOUBLE)
        |        / CAST(zs AS DOUBLE) AS est_raw, v0
        |    FROM zu)),
        |du AS (SELECT DISTINCT event_type, user_id FROM events),
        |exact AS (SELECT a.event_type AS type_a, c.event_type AS type_b,
        |    count(*) AS n_both
        |  FROM du a JOIN du c
        |    ON a.user_id = c.user_id AND a.event_type < c.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b,
        |  CAST(COALESCE(exact.n_both, 0) AS BIGINT) AS n_both,
        |  round(eu.est, 2) AS union_est,
        |  round(ea.est + eb.est - eu.est, 2) AS inter_est
        |FROM eu
        |LEFT JOIN exact USING (type_a, type_b)
        |JOIN e1 ea ON ea.event_type = type_a
        |JOIN e1 eb ON eb.event_type = type_b""".stripMargin,
    "q_kmv_quantiles" ->
      """WITH ev AS (SELECT event_type, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    md5('kmv:' || CAST(event_id AS VARCHAR)) AS hk
        |  FROM events),
        |samp AS (SELECT event_type, event_id, cents FROM (
        |    SELECT event_type, event_id, cents,
        |      row_number() OVER (PARTITION BY event_type ORDER BY hk, event_id) AS hr
        |    FROM ev)
        |  WHERE hr <= 256),
        |ex AS (SELECT event_type,
        |    CAST(min(CASE WHEN r * 2 >= n THEN cents END) AS BIGINT) AS p50_cents,
        |    CAST(min(CASE WHEN r * 20 >= n * 19 THEN cents END) AS BIGINT) AS p95_cents,
        |    count(*) AS n
        |  FROM (SELECT event_type, cents,
        |      row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS r,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM ev)
        |  GROUP BY 1),
        |es AS (SELECT event_type,
        |    CAST(min(CASE WHEN r * 2 >= n THEN cents END) AS BIGINT) AS p50_est,
        |    CAST(min(CASE WHEN r * 20 >= n * 19 THEN cents END) AS BIGINT) AS p95_est,
        |    count(*) AS n_sample
        |  FROM (SELECT event_type, cents,
        |      row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS r,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM samp)
        |  GROUP BY 1)
        |SELECT event_type, n, n_sample,
        |  p50_cents, p50_est, p95_cents, p95_est
        |FROM ex JOIN es USING (event_type)""".stripMargin,
    "q_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tc AS (SELECT tok, count(*) AS n_exact FROM toks GROUP BY 1),
        |bk AS (SELECT tok, n_exact,
        |    ('0x' || substring(md5('cm0:' || tok), 1, 5))::UBIGINT % 1024 AS b0,
        |    ('0x' || substring(md5('cm1:' || tok), 1, 5))::UBIGINT % 1024 AS b1,
        |    ('0x' || substring(md5('cm2:' || tok), 1, 5))::UBIGINT % 1024 AS b2,
        |    ('0x' || substring(md5('cm3:' || tok), 1, 5))::UBIGINT % 1024 AS b3
        |  FROM tc),
        |st AS (SELECT n_exact, 0 AS i, b0 AS bucket FROM bk
        |  UNION ALL SELECT n_exact, 1, b1 FROM bk
        |  UNION ALL SELECT n_exact, 2, b2 FROM bk
        |  UNION ALL SELECT n_exact, 3, b3 FROM bk),
        |counters AS (SELECT i, bucket, CAST(sum(n_exact) AS BIGINT) AS cnt
        |  FROM st GROUP BY 1, 2),
        |top AS (SELECT * FROM bk ORDER BY n_exact DESC, tok LIMIT 20),
        |probe AS (SELECT tok, n_exact, 0 AS i, b0 AS bucket FROM top
        |  UNION ALL SELECT tok, n_exact, 1, b1 FROM top
        |  UNION ALL SELECT tok, n_exact, 2, b2 FROM top
        |  UNION ALL SELECT tok, n_exact, 3, b3 FROM top)
        |SELECT tok, n_exact, min(cnt) AS n_cms
        |FROM probe JOIN counters USING (i, bucket)
        |GROUP BY 1, 2""".stripMargin,
    "q_dyadic_quantiles" -> dyadicQuantilesSql(24, 3, 512),
    "q_f2_moment" -> {
      val rows = (0 until 5).map { i =>
        s"""SELECT cnt,
           |  ('0x' || substring(md5('f2b$i:' || CAST(l_partkey AS VARCHAR)), 1, 5))::UBIGINT % 1024 AS bucket,
           |  $i AS i,
           |  CASE WHEN ('0x' || substring(md5('f2s$i:' || CAST(l_partkey AS VARCHAR)), 1, 1))::UBIGINT % 2 = 0
           |    THEN cnt ELSE -cnt END AS sc
           |FROM cnt""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH cnt AS (SELECT l_partkey, count(*) AS cnt
         |  FROM lineitem GROUP BY 1),
         |st AS ($rows),
         |rows_ AS (SELECT i, sum(c * c) AS f2_row FROM (
         |    SELECT i, bucket, sum(sc)::HUGEINT AS c FROM st GROUP BY 1, 2)
         |  GROUP BY 1),
         |est AS (SELECT (list(f2_row ORDER BY f2_row))[3] AS est FROM rows_),
         |ex AS (SELECT sum(cnt::HUGEINT * cnt) AS exact_f2, count(*) AS n_keys
         |  FROM cnt)
         |SELECT n_keys, CAST(exact_f2 AS BIGINT) AS exact_f2,
         |  CAST(est AS BIGINT) AS est_f2
         |FROM ex CROSS JOIN est""".stripMargin
    },
    // Engine-independent sketch-accuracy assertions (see SqlQueries
    // .qSketchStats scaladoc): the oracle derives the exact columns and
    // the nominal values the rounded sketch checks must land on.
    "q_sketch_stats" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  CAST(1.0 AS DOUBLE) AS users_ratio,
        |  CAST(0.5 AS DOUBLE) AS p50_rank,
        |  CAST(0.95 AS DOUBLE) AS p95_rank
        |FROM events GROUP BY 1""".stripMargin,
  )
}
