package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the statistical-inference family (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object InferenceOracles {
  val sql: Map[String, String] = Map(
    "q_acf" ->
      """WITH h AS (SELECT event_type,
        |    epoch_us(ts) // 3600000000 AS hour FROM events),
        |c AS (SELECT event_type, hour, CAST(count(*) AS BIGINT) AS y
        |  FROM h GROUP BY 1, 2),
        |b AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM h),
        |sp AS (SELECT t.event_type, gs.hour
        |  FROM (SELECT DISTINCT event_type FROM c) t
        |  CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS hour
        |    FROM b) gs),
        |se AS (SELECT sp.event_type, sp.hour, coalesce(c.y, 0) AS y
        |  FROM sp LEFT JOIN c
        |    ON sp.event_type = c.event_type AND sp.hour = c.hour),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS s FROM se GROUP BY 1),
        |d AS (SELECT se.event_type, se.hour, st.n, st.s,
        |    st.n::HUGEINT * se.y - st.s AS dev,
        |    lag(se.y, 1) OVER w AS l1, lag(se.y, 2) OVER w AS l2,
        |    lag(se.y, 3) OVER w AS l3, lag(se.y, 4) OVER w AS l4,
        |    lag(se.y, 5) OVER w AS l5, lag(se.y, 6) OVER w AS l6
        |  FROM se JOIN st USING (event_type)
        |  WINDOW w AS (PARTITION BY se.event_type ORDER BY se.hour)),
        |sm AS (SELECT event_type, max(n) AS n, sum(dev * dev) AS den,
        |    sum(CASE WHEN l1 IS NOT NULL
        |      THEN dev * (n::HUGEINT * l1 - s) END) AS num1,
        |    sum(CASE WHEN l2 IS NOT NULL
        |      THEN dev * (n::HUGEINT * l2 - s) END) AS num2,
        |    sum(CASE WHEN l3 IS NOT NULL
        |      THEN dev * (n::HUGEINT * l3 - s) END) AS num3,
        |    sum(CASE WHEN l4 IS NOT NULL
        |      THEN dev * (n::HUGEINT * l4 - s) END) AS num4,
        |    sum(CASE WHEN l5 IS NOT NULL
        |      THEN dev * (n::HUGEINT * l5 - s) END) AS num5,
        |    sum(CASE WHEN l6 IS NOT NULL
        |      THEN dev * (n::HUGEINT * l6 - s) END) AS num6
        |  FROM d GROUP BY 1),
        |u AS (SELECT event_type, n, den, k.lag_k,
        |    CASE k.lag_k WHEN 1 THEN num1 WHEN 2 THEN num2 WHEN 3 THEN num3
        |      WHEN 4 THEN num4 WHEN 5 THEN num5 ELSE num6 END AS num
        |  FROM sm CROSS JOIN
        |    (VALUES (1), (2), (3), (4), (5), (6)) k(lag_k))
        |SELECT event_type, CAST(lag_k AS BIGINT) AS lag_k, n AS n_hours,
        |  CAST(CASE WHEN den = 0 THEN 0 ELSE
        |    (CASE WHEN num < 0 THEN -1 ELSE 1 END)
        |    * ((1000000 * abs(num)) // den) END AS BIGINT) AS acf_ppm
        |FROM u""".stripMargin,
    "q_wilson_ctr" ->
      """WITH cells AS (SELECT
        |    (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
        |    CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS s
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |w1 AS (SELECT *, 38416::HUGEINT
        |    * (10000::HUGEINT * s * (t - s) + 9604::HUGEINT * t) * t AS x
        |  FROM cells),
        |w2 AS (SELECT *, greatest(1::HUGEINT,
        |    CAST(sqrt(CAST(x AS DOUBLE)) AS HUGEINT) + 2) AS r0 FROM w1),
        |w3 AS (SELECT *, (r0 + x // r0) // 2 AS r1 FROM w2),
        |w4 AS (SELECT *, (r1 + x // r1) // 2 AS r2 FROM w3),
        |w5 AS (SELECT *, CASE WHEN r2 * r2 > x THEN r2 - 1 ELSE r2 END
        |  AS r3 FROM w4),
        |w6 AS (SELECT *, CASE WHEN (r3 + 1) * (r3 + 1) <= x THEN r3 + 1
        |  ELSE r3 END AS isq FROM w5),
        |o AS (SELECT hour_of_day, t, s,
        |    CAST((1000000::HUGEINT * s) // t AS BIGINT) AS rate_ppm,
        |    CAST((1000000::HUGEINT
        |        * (t::HUGEINT * (10000 * s + 19208) - isq))
        |      // (t::HUGEINT * (10000 * t + 38416)) AS BIGINT)
        |      AS wilson_lb_ppm
        |  FROM w6)
        |SELECT *, CAST(row_number()
        |    OVER (ORDER BY wilson_lb_ppm DESC, hour_of_day) AS BIGINT)
        |  AS rank_lb
        |FROM o""".stripMargin,
    "q_bootstrap_ci" ->
      """WITH ev AS (SELECT event_type, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |reps AS (SELECT event_type, event_id, cents,
        |    unnest(generate_series(0, 31)) AS rep FROM ev),
        |mm0 AS (SELECT event_type, rep, cents,
        |    ('0x' || substring(md5('boot:' || CAST(rep AS VARCHAR) || ':'
        |      || CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT AS u32
        |  FROM reps),
        |mm AS (SELECT event_type, rep, cents,
        |    CASE WHEN u32 < 1580030168 THEN 0 WHEN u32 < 3160060337 THEN 1
        |      WHEN u32 < 3950075421 THEN 2 WHEN u32 < 4213413783 THEN 3
        |      WHEN u32 < 4279248373 THEN 4 WHEN u32 < 4292415291 THEN 5
        |      WHEN u32 < 4294609777 THEN 6 WHEN u32 < 4294923276 THEN 7
        |      WHEN u32 < 4294962463 THEN 8 ELSE 9 END AS m
        |  FROM mm0),
        |rm AS (SELECT event_type, rep,
        |    CAST(sum(m * cents) AS BIGINT) AS sum_cents,
        |    CAST(sum(m) AS BIGINT) AS n_rep
        |  FROM mm GROUP BY 1, 2 HAVING sum(m) > 0),
        |means AS (SELECT event_type, rep,
        |    CAST((1000000::HUGEINT * sum_cents) // n_rep AS BIGINT)
        |      AS mean_microcents
        |  FROM rm),
        |rk AS (SELECT event_type, rep, mean_microcents, row_number()
        |    OVER (PARTITION BY event_type ORDER BY mean_microcents, rep)
        |    AS rk FROM means),
        |nr AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_reps
        |  FROM means GROUP BY 1),
        |ci AS (SELECT rk.event_type, nr.n_reps,
        |    min(CASE WHEN rk.rk * 20 >= nr.n_reps
        |      THEN mean_microcents END) AS ci_lo_microcents,
        |    min(CASE WHEN rk.rk * 20 >= 19 * nr.n_reps
        |      THEN mean_microcents END) AS ci_hi_microcents
        |  FROM rk JOIN nr USING (event_type) GROUP BY 1, 2),
        |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST((1000000::HUGEINT * sum(cents)) // count(*) AS BIGINT)
        |      AS mean_microcents
        |  FROM ev GROUP BY 1)
        |SELECT pt.event_type, pt.n, pt.mean_microcents, ci.n_reps,
        |  ci.ci_lo_microcents, ci.ci_hi_microcents
        |FROM pt JOIN ci USING (event_type)""".stripMargin,
    "q_permutation_test" ->
      """WITH pu AS (SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'purchase' AND value > 120.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS converted
        |  FROM events GROUP BY 1),
        |obs AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv0,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv1,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1
        |  FROM pu),
        |obs2 AS (SELECT *,
        |    abs(conv0::HUGEINT * n1 - conv1::HUGEINT * n0) AS stat_obs
        |  FROM obs),
        |pp AS (SELECT k.p, pu.user_id, pu.converted,
        |    CASE WHEN ('0x' || substring(md5('perm:' || CAST(k.p AS VARCHAR)
        |        || ':' || CAST(pu.user_id AS VARCHAR)), 1, 8))::UBIGINT
        |      < 2147483648 THEN 0 ELSE 1 END AS grp
        |  FROM pu CROSS JOIN
        |    (SELECT unnest(generate_series(1, 128)) AS p) k),
        |ps AS (SELECT p,
        |    abs(sum(CASE WHEN grp = 0 THEN converted ELSE 0 END)::HUGEINT
        |        * sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
        |      - sum(CASE WHEN grp = 1 THEN converted ELSE 0 END)::HUGEINT
        |        * sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)) AS stat_p
        |  FROM pp GROUP BY 1)
        |SELECT o.n_users, o.conv0, o.n0, o.conv1, o.n1,
        |  CAST(o.stat_obs AS BIGINT) AS stat_obs,
        |  CAST(sum(CASE WHEN ps.stat_p >= o.stat_obs THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_ge,
        |  CAST(((1 + sum(CASE WHEN ps.stat_p >= o.stat_obs THEN 1 ELSE 0
        |    END)) * 1000000) // 129 AS BIGINT) AS p_value_ppm
        |FROM ps CROSS JOIN obs2 o GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin,
    "q_markov_attribution" -> markovAttributionSql(8),
    "q_shapley_attribution" -> shapleyAttributionSql(8),
    "q_sprt" -> sprtSql,
    // minimax closed form of PAV over exact-cents $1000 price bins;
    // fixed-point range averages from prefix sums
    "q_isotonic" ->
      """WITH b AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 100000 AS bin,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |h AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS s FROM b GROUP BY 1),
        |i AS (SELECT bin, n, s,
        |    CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS i,
        |    CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
        |    CAST(sum(s) OVER (ORDER BY bin) AS BIGINT) AS cs FROM h),
        |p AS (SELECT i AS p_i, cn, cs FROM i
        |      UNION ALL SELECT 0, 0, 0),
        |rg AS (SELECT lo.p_i + 1 AS j, hi.p_i AS k,
        |    CAST((CAST(hi.cs - lo.cs AS HUGEINT) * 1000000000000)
        |      // (hi.cn - lo.cn) AS BIGINT) AS avg_fp
        |  FROM p lo JOIN p hi ON lo.p_i < hi.p_i),
        |mj AS (SELECT i.i, i.bin, i.n, i.s, rg.j, min(rg.avg_fp) AS m_j
        |  FROM i JOIN rg ON rg.j <= i.i AND rg.k >= i.i
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT bin, n, s, (s * 1000000) // n AS rate_ppm,
        |  CAST(max(m_j) AS BIGINT) AS iso_fp
        |FROM mj GROUP BY 1, 2, 3, 4""".stripMargin,
    // split conformal per return flag: histogram-walk calibration
    // quantile, even-half coverage census
    "q_conformal" ->
      """WITH r AS (SELECT l.l_returnflag AS grp, l.l_orderkey % 2 AS half,
        |    abs(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
        |          // CAST(l.l_quantity AS BIGINT)
        |        - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)) AS res
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |cn AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_cal,
        |    (9 * CAST(count(*) AS BIGINT) + 18) // 10 AS m
        |  FROM r WHERE half = 1 GROUP BY 1),
        |h AS (SELECT grp, res, count(*) AS c FROM r WHERE half = 1 GROUP BY 1, 2),
        |cum AS (SELECT grp, res,
        |    sum(c) OVER (PARTITION BY grp ORDER BY res) AS cum FROM h),
        |q AS (SELECT cum.grp, min(res) AS qhat, min(n_cal) AS n_cal,
        |    min(m) AS m_rank
        |  FROM cum JOIN cn ON cum.grp = cn.grp WHERE cum >= m GROUP BY 1)
        |SELECT r.grp, q.n_cal, q.m_rank, q.qhat,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN res <= qhat THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_covered,
        |  (CAST(sum(CASE WHEN res <= qhat THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(count(*) AS BIGINT) AS coverage_ppm
        |FROM r JOIN q ON r.grp = q.grp WHERE half = 0
        |GROUP BY 1, 2, 3, 4""".stripMargin,
    "q_markov_stationary" -> markovSql(20),
  )
}
