package graft.oracles

import graft.oracles.OracleCtes._

/** DuckDB oracle SQL for the TPC-H + relational-corner family (split from SparkEntry in r11;
  * entries unchanged — SparkEntry.baseOracleSql concatenates the
  * family maps). */
private[graft] object RelationalOracles {
  val sql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_13', 'NATION_19')
        |  AND n2.n_name IN ('NATION_13', 'NATION_19')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY 1 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY 1""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.08 AND l_quantity < 25""".stripMargin,
    // exact-cents revenue (floor(x·100+½) per row, integer sums): the
    // one IEEE product is deterministic, so the hash is engine-exact
    "q10_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q14_promo_share" ->
      """WITH l AS (
        |  SELECT CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents,
        |    p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
        |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST((CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS HUGEINT) * 1000000)
        |    // CAST(sum(cents) AS HUGEINT) AS BIGINT) AS promo_ppm
        |FROM l""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, revenue_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE revenue_cents = (SELECT max(revenue_cents) FROM rev)""".stripMargin,
    "q17_small_qty" ->
      """WITH j AS (
        |  SELECT l_partkey, l_quantity,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents,
        |    avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#4')
        |SELECT CAST(sum(cents) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_items
        |FROM j WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q22_no_order_rich" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |        CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        |      FROM customer),
        |t AS (SELECT CAST(sum(bal_cents) // count(*) AS BIGINT) AS avg_cents
        |      FROM c WHERE bal_cents > 0)
        |SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(bal_cents) AS BIGINT) AS total_cents
        |FROM c CROSS JOIN t
        |WHERE bal_cents > avg_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
        |SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date, sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q19_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 6 AND 15 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20 AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q_bucket_join" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    "q8_market_share" ->
      """WITH f AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT yr,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_12' THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST((CAST(sum(CASE WHEN supp_nation = 'NATION_12' THEN cents ELSE 0 END) AS HUGEINT) * 1000000)
        |    // CAST(sum(cents) AS HUGEINT) AS BIGINT) AS mkt_share_ppm
        |FROM f GROUP BY 1""".stripMargin,
    // the textbook correlated form — the Spark side's one-pass census
    // must agree with EXISTS + NOT EXISTS semantics exactly
    "q21_sole_fault" ->
      """WITH pp AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_fault
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_suppkey, s_name, numwait FROM (
        |  SELECT p1.l_suppkey, count(*) AS numwait
        |  FROM pp p1
        |  WHERE p1.has_fault = 1
        |    AND EXISTS (SELECT 1 FROM pp p2
        |                WHERE p2.l_orderkey = p1.l_orderkey
        |                  AND p2.l_suppkey <> p1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM pp p3
        |                    WHERE p3.l_orderkey = p1.l_orderkey
        |                      AND p3.l_suppkey <> p1.l_suppkey
        |                      AND p3.has_fault = 1)
        |  GROUP BY 1)
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin,
    // textbook correlated-min form — the Spark side's single-pass
    // aggregate + min-probe must agree with the scalar subquery
    "q2_min_cost_supp" ->
      """WITH supply AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST((CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS HUGEINT) * 1000000)
        |      // CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS HUGEINT) AS BIGINT) AS cost_ppm
        |  FROM lineitem GROUP BY 1, 2),
        |eu AS (
        |  SELECT s_suppkey, s_name, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |sup AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, n_name, cost_ppm
        |  FROM supply
        |  JOIN eu ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |    AND p_type = 'STANDARD' AND p_size BETWEEN 1 AND 15)
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, cost_ppm
        |FROM sup s1
        |WHERE cost_ppm = (SELECT min(cost_ppm) FROM sup s2
        |                  WHERE s2.p_partkey = s1.p_partkey)
        |ORDER BY p_partkey, s_suppkey LIMIT 50""".stripMargin,
    // textbook EXISTS form — the semi join with the inequality residual
    // must agree with the correlated subquery
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
        |    - (CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
        |       * CAST(floor(l_quantity + 0.5) AS BIGINT) * 6) // 10) AS BIGINT)
        |    AS sum_profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    // textbook HAVING-over-scalar-subquery form
    "q11_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey AS p_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS value_cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_12'
        |  GROUP BY 1)
        |SELECT p_partkey, value_cents FROM v
        |WHERE CAST(value_cents AS HUGEINT) * (SELECT count(*) FROM v)
        |  > (SELECT CAST(sum(value_cents) AS HUGEINT) FROM v) * 2
        |ORDER BY value_cents DESC, p_partkey""".stripMargin,
    "q12_ship_latency" ->
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'FAST'
        |            WHEN date_diff('day', o_orderdate, l_shipdate) < 90 THEN 'MEDIUM'
        |            ELSE 'SLOW' END AS latency_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
        |    AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // textbook NOT IN form — the broadcast anti join must agree
    "q16_supplier_census" ->
      """SELECT p_brand, p_type, CAST(p_size AS INT) AS p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#4'
        |  AND p_size IN (1, 5, 11, 15, 21, 25, 28, 37)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // textbook nested-IN form — the flattened aggregation tree must agree
    "q20_heavy_suppliers" ->
      """WITH pair AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS pair_units
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM pair p1
        |  WHERE pair_units * 10 > 3 * (SELECT sum(pair_units) FROM pair p2
        |                               WHERE p2.l_partkey = p1.l_partkey))
        |ORDER BY s_suppkey""".stripMargin,
    "q_dpp_prune" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS epoch_days, value
        |  FROM events)
        |SELECT strftime(DATE '1970-01-01' + CAST(epoch_days AS INT), '%Y-%m-%d') AS day,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM e
        |WHERE (epoch_days + 4) % 7 IN (0, 6)
        |GROUP BY 1""".stripMargin,
    // quadratic correlated form — the window-based frontier must agree
    "q_skyline" ->
      """WITH p AS (SELECT p_partkey, p_brand,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
        |    CAST(p_size AS BIGINT) AS p_size
        |  FROM part)
        |SELECT p_partkey, p_brand, price_cents, p_size FROM p p1
        |WHERE NOT EXISTS (SELECT 1 FROM p p2
        |  WHERE p2.p_brand = p1.p_brand
        |    AND p2.price_cents <= p1.price_cents AND p2.p_size >= p1.p_size
        |    AND (p2.price_cents < p1.price_cents OR p2.p_size > p1.p_size))""".stripMargin,
    "q13_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        |      GROUP BY 1)
        |GROUP BY 1""".stripMargin,
    "q_part_brand_stats" ->
      """SELECT p_brand, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1""".stripMargin,
    "q_customer_order_stats" ->
      """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_window_topk" ->
      """SELECT * FROM (
        |  SELECT c_custkey, c_mktsegment, total_spent,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY total_spent DESC, c_custkey) AS BIGINT) AS rnk
        |  FROM (SELECT c_custkey, c_mktsegment, round(sum(o_totalprice), 2) AS total_spent
        |        FROM customer JOIN orders ON c_custkey = o_custkey GROUP BY 1, 2))
        |WHERE rnk <= 5""".stripMargin,
    // same relation as q_window_topk, computed by the native heap operator
    "q_topk_native" ->
      """SELECT * FROM (
        |  SELECT c_custkey, c_mktsegment, total_spent,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY total_spent DESC, c_custkey) AS BIGINT) AS rnk
        |  FROM (SELECT c_custkey, c_mktsegment, round(sum(o_totalprice), 2) AS total_spent
        |        FROM customer JOIN orders ON c_custkey = o_custkey GROUP BY 1, 2))
        |WHERE rnk <= 5""".stripMargin,
    "q_rank_ties" ->
      """SELECT * FROM (
        |  SELECT p_partkey, p_brand, p_size,
        |    CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS BIGINT) AS rnk
        |  FROM part)
        |WHERE rnk <= 3""".stripMargin,
    "q_dense_rank_groups" ->
      """SELECT * FROM (
        |  SELECT p_partkey, p_brand, p_size,
        |    CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size ASC) AS BIGINT) AS rnk
        |  FROM part)
        |WHERE rnk <= 2""".stripMargin,
    "q_window_running" ->
      """SELECT o_orderpriority, month, revenue,
        |  round(sum(revenue) OVER (PARTITION BY o_orderpriority ORDER BY month), 2) AS cum_revenue
        |FROM (SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
        |        round(sum(o_totalprice), 2) AS revenue
        |      FROM orders GROUP BY 1, 2)""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_grouping_sets" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
        |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
        |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
        |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        |FROM orders GROUP BY 1""".stripMargin,
    "q_stats_agg" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_date_arith" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
        |  count(*) AS n_orders,
        |  CAST(min(date_diff('day', DATE '1995-01-01', o_orderdate)) AS INT) AS min_days_since_epoch,
        |  CAST(max(date_diff('day', DATE '1995-01-01', o_orderdate)) AS INT) AS max_days_since_epoch
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q_string_ops" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  replace(p_name, ' ', '_') AS name_snake,
        |  lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_padded,
        |  substring(p_type, 1, 3) AS type_prefix
        |FROM part""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer)""".stripMargin,
    // the salt must be invisible: plain join is the oracle
    "q_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS total_qty,
        |  round(sum(l_extendedprice), 2) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers
        |           FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
        |      FROM supplier GROUP BY 1)
        |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        |  coalesce(n_customers, 0) AS n_customers,
        |  coalesce(n_suppliers, 0) AS n_suppliers
        |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey""".stripMargin,
    "q_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier""".stripMargin,
    "q_window_moving" ->
      """SELECT o_orderpriority, month, revenue,
        |  round(avg(revenue) OVER (PARTITION BY o_orderpriority ORDER BY month
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS avg_3mo
        |FROM (SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
        |        round(sum(o_totalprice), 2) AS revenue
        |      FROM orders GROUP BY 1, 2)""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(value / 5.0) AS BIGINT) AS bucket, count(*) AS n,
        |  round(min(value), 2) AS lo, round(max(value), 2) AS hi
        |FROM events GROUP BY 1""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier""".stripMargin,
    "q_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT c_mktsegment, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey""".stripMargin,
    // the incremental fold must equal the one-shot aggregate — the
    // oracle IS the full recompute
    "q_incr_agg" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM events GROUP BY 1""".stripMargin,
    // independent formulation: delta by SUBTRACTION (full − base) —
    // hash-matches the engine's three-leg union only if the IVM algebra
    // neither drops nor double-counts a join pair
    "q_ivm_join" ->
      """WITH o AS (SELECT o_custkey, o_orderdate,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |cut AS (SELECT max(o_orderdate) - INTERVAL 180 DAY AS cut FROM o),
        |full_v AS (SELECT c_mktsegment, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS rev
        |  FROM o JOIN customer ON o_custkey = c_custkey GROUP BY 1),
        |base_v AS (SELECT c_mktsegment, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS rev
        |  FROM o CROSS JOIN cut
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderdate < cut AND c_custkey % 20 <> 0 GROUP BY 1)
        |SELECT f.c_mktsegment, coalesce(b.n, 0) AS n_base,
        |  coalesce(b.rev, 0) AS rev_base_cents,
        |  f.n - coalesce(b.n, 0) AS n_delta,
        |  f.rev - coalesce(b.rev, 0) AS rev_delta_cents,
        |  f.n AS n_view, f.rev AS rev_view_cents
        |FROM full_v f LEFT JOIN base_v b USING (c_mktsegment)""".stripMargin,
    "q_fk_check" -> fkCheckSql,
    "q_schema_profile" -> schemaProfileSql,
    "q_benford" ->
      """WITH d AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |        FROM orders)
        |  WHERE cents > 0),
        |g AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY 1),
        |t AS (SELECT sum(n_obs) AS n FROM g)
        |SELECT CAST(digit AS BIGINT) AS digit, n_obs,
        |  round(CAST(n AS DOUBLE) * log10(1.0 + 1.0 / digit), 4) AS n_expected,
        |  round(pow(CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * log10(1.0 + 1.0 / digit), 2)
        |    / (CAST(n AS DOUBLE) * log10(1.0 + 1.0 / digit)), 4) AS chi2_term
        |FROM g CROSS JOIN t""".stripMargin,
    "q_gini" ->
      """WITH freq AS (SELECT lang, tok, count(*) AS f FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2),
        |rk AS (SELECT lang, f,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY f, tok) AS BIGINT) AS i
        |  FROM freq),
        |agg AS (SELECT lang, count(*) AS n_types,
        |    CAST(sum(f) AS BIGINT) AS n_tokens,
        |    sum(i::HUGEINT * f) AS s_if
        |  FROM rk GROUP BY 1)
        |SELECT lang, n_types, n_tokens,
        |  CAST((2::HUGEINT * s_if - (n_types + 1)::HUGEINT * n_tokens) * 1000000
        |    // (n_types::HUGEINT * n_tokens) AS BIGINT) AS gini_ppm
        |FROM agg""".stripMargin,
    "q_null_semantics" ->
      """WITH ev AS (SELECT nullif(event_type, 'error') AS k,
        |    CASE WHEN event_type <> 'signup'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END AS cents
        |  FROM events),
        |g AS (SELECT k, count(*) AS n_rows, count(cents) AS n_nonnull,
        |    coalesce(CAST(sum(cents) AS BIGINT), -1) AS sum_cents
        |  FROM ev GROUP BY 1)
        |SELECT coalesce(a.k, '<null>') AS k, a.n_rows, a.n_nonnull,
        |  b.sum_cents
        |FROM g a JOIN g b ON a.k IS NOT DISTINCT FROM b.k""".stripMargin,
    "q_ntile_deciles" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
        |  FROM orders),
        |r AS (SELECT o_orderpriority, total_cents,
        |    CAST(ntile(10) OVER w AS BIGINT) AS decile,
        |    percent_rank() OVER w AS pr,
        |    cume_dist() OVER w AS cd
        |  FROM o
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |    ORDER BY total_cents, o_orderkey))
        |SELECT o_orderpriority, decile, count(*) AS n_orders,
        |  min(total_cents) AS min_cents, max(total_cents) AS max_cents,
        |  round(min(pr), 6) AS pr_lo, round(max(pr), 6) AS pr_hi,
        |  round(max(cd), 6) AS cd_hi
        |FROM r GROUP BY 1, 2""".stripMargin,
    "q_manifest" ->
      """SELECT 'documents' AS table_name, count(*) AS n_rows,
        |  bit_xor(CAST(('0x' || substr(md5(
        |    CAST(doc_id AS VARCHAR) || ':' || lang || ':' || source || ':' || md5(text)
        |  ), 1, 15))::UBIGINT AS BIGINT)) AS checksum
        |FROM documents
        |UNION ALL
        |SELECT 'embeddings', count(*),
        |  bit_xor(CAST(('0x' || substr(md5(
        |    CAST(vec_id AS VARCHAR) || ':' || CAST(label AS VARCHAR) || ':' ||
        |    array_to_string(list_transform(embedding,
        |      x -> CAST(CAST(round(CAST(x AS DOUBLE) * 65536) AS BIGINT) AS VARCHAR)), ',')
        |  ), 1, 15))::UBIGINT AS BIGINT))
        |FROM embeddings
        |UNION ALL
        |SELECT 'events', count(*),
        |  bit_xor(CAST(('0x' || substr(md5(
        |    CAST(event_id AS VARCHAR) || ':' || CAST(user_id AS VARCHAR) || ':' ||
        |    event_type || ':' || CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR)
        |  ), 1, 15))::UBIGINT AS BIGINT))
        |FROM events""".stripMargin,
    // the oracle reads the ORIGINAL parquet: matching it proves the
    // Avro encode+decode chain is byte-faithful
    "q_avro_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS bal_cents
        |FROM customer GROUP BY 1""".stripMargin,
    "q_lake_merge" ->
      s"""$mergeChangeCte
         |SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
         |  c.c_mktsegment
         |FROM customer c ANTI JOIN chg g ON c.c_custkey = g.c_custkey
         |UNION ALL
         |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         |FROM chg WHERE op = 'U'""".stripMargin,
    // digest compare: doubles enter as exact cents (floor(x·100 + ½)),
    // the manifest discipline, so both engines hash identical strings
    "q_snapshot_diff" ->
      s"""$mergeChangeCte,
         |merged AS (
         |  SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
         |    c.c_mktsegment
         |  FROM customer c ANTI JOIN chg g ON c.c_custkey = g.c_custkey
         |  UNION ALL
         |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         |  FROM chg WHERE op = 'U'),
         |o AS (SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR) || ':' ||
         |        c_name || ':' || CAST(c_nationkey AS VARCHAR) || ':' ||
         |        CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR)
         |        || ':' || c_mktsegment) AS od
         |      FROM customer),
         |nn AS (SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR) || ':' ||
         |        c_name || ':' || CAST(c_nationkey AS VARCHAR) || ':' ||
         |        CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR)
         |        || ':' || c_mktsegment) AS nd
         |      FROM merged)
         |SELECT c_custkey, status FROM (
         |  SELECT coalesce(o.c_custkey, nn.c_custkey) AS c_custkey,
         |    CASE WHEN o.c_custkey IS NULL THEN 'added'
         |         WHEN nn.c_custkey IS NULL THEN 'removed'
         |         WHEN od <> nd THEN 'changed' END AS status
         |  FROM o FULL JOIN nn ON o.c_custkey = nn.c_custkey)
         |WHERE status IS NOT NULL""".stripMargin,
    // tracked attributes = (c_acctbal, c_mktsegment); version 0 history
    // closed at version-1 = 0, batch applied at version 1
    "q_scd2" ->
      s"""$mergeChangeCte,
         |chg_u AS (SELECT * FROM chg WHERE op = 'U'),
         |open0 AS (SELECT c_custkey, c_name, c_nationkey, c_acctbal,
         |            c_mktsegment FROM customer),
         |m AS (SELECT o.c_custkey, o.c_acctbal AS ob, o.c_mktsegment AS os,
         |        u.c_acctbal AS nb, u.c_mktsegment AS ns
         |      FROM open0 o JOIN chg_u u ON o.c_custkey = u.c_custkey),
         |resent AS (SELECT c_custkey FROM m WHERE nb = ob AND ns = os),
         |closedk AS (SELECT c_custkey FROM m WHERE nb <> ob OR ns <> os
         |            UNION ALL SELECT c_custkey FROM chg WHERE op = 'D')
         |SELECT o.*, CAST(0 AS BIGINT) AS valid_from,
         |  CAST(999999999 AS BIGINT) AS valid_to
         |FROM open0 o ANTI JOIN closedk k ON o.c_custkey = k.c_custkey
         |UNION ALL
         |SELECT o.*, 0, 0
         |FROM open0 o SEMI JOIN closedk k ON o.c_custkey = k.c_custkey
         |UNION ALL
         |SELECT u.c_custkey, u.c_name, u.c_nationkey, u.c_acctbal,
         |  u.c_mktsegment, 1, 999999999
         |FROM chg_u u ANTI JOIN resent r ON u.c_custkey = r.c_custkey""".stripMargin,
    // RRF fusion of the BM25 (k=10) and exact-cosine (k=10) lists; each
    // contribution is 1e9 // (60 + rank) — truncating integer division,
    // so the fused sum and ranking replay exactly
    "q_rrf_fusion" ->
      s"""WITH ${retrievalListCtes(20, 10)},
         |${rrfFusedCte(5)}
         |SELECT qid, id, rrf_fp, n_lists, rnk FROM fused""".stripMargin,
    "q_ndcg_eval" -> ndcgEvalSql(20, 10),
    "q_mrr_eval" -> mrrEvalSql(20, 10),
    "q_boosted_stumps" -> boostedStumpsSql(3),
    "q_stump_crossval" -> stumpCrossvalSql(5, 2),
    // the bloom is invisible to the RESULT (exact semi join scrubs false
    // positives) — the oracle is the plain IN-subquery semi join
    "q_bloom_prune" ->
      """SELECT l_returnflag, count(*) AS n_items, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY 1""".stripMargin,
    "q_rfm" ->
      """WITH o AS (SELECT o_custkey, o_orderdate,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |mx AS (SELECT CAST(max(o_orderdate) AS DATE) AS d1 FROM o),
        |per AS (SELECT o_custkey,
        |    CAST(datediff('day', CAST(max(o_orderdate) AS DATE),
        |      (SELECT d1 FROM mx)) AS BIGINT) AS recency_days,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(cents) AS BIGINT) AS monetary_cents
        |  FROM o GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM per),
        |rt AS (SELECT
        |    max(CASE WHEN rn = (n + 3) // 4 THEN v END) AS t1,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS t2,
        |    max(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS t3
        |  FROM (SELECT recency_days AS v, row_number()
        |      OVER (ORDER BY recency_days, o_custkey) AS rn FROM per)
        |    CROSS JOIN nn),
        |ft AS (SELECT
        |    max(CASE WHEN rn = (n + 3) // 4 THEN v END) AS t1,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS t2,
        |    max(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS t3
        |  FROM (SELECT frequency AS v, row_number()
        |      OVER (ORDER BY frequency, o_custkey) AS rn FROM per)
        |    CROSS JOIN nn),
        |mt AS (SELECT
        |    max(CASE WHEN rn = (n + 3) // 4 THEN v END) AS t1,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS t2,
        |    max(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS t3
        |  FROM (SELECT monetary_cents AS v, row_number()
        |      OVER (ORDER BY monetary_cents, o_custkey) AS rn FROM per)
        |    CROSS JOIN nn),
        |sc AS (SELECT p.o_custkey, p.recency_days, p.frequency,
        |    p.monetary_cents,
        |    5 - (1 + CASE WHEN p.recency_days > rt.t1 THEN 1 ELSE 0 END
        |      + CASE WHEN p.recency_days > rt.t2 THEN 1 ELSE 0 END
        |      + CASE WHEN p.recency_days > rt.t3 THEN 1 ELSE 0 END)
        |      AS r_score,
        |    1 + CASE WHEN p.frequency > ft.t1 THEN 1 ELSE 0 END
        |      + CASE WHEN p.frequency > ft.t2 THEN 1 ELSE 0 END
        |      + CASE WHEN p.frequency > ft.t3 THEN 1 ELSE 0 END
        |      AS f_score,
        |    1 + CASE WHEN p.monetary_cents > mt.t1 THEN 1 ELSE 0 END
        |      + CASE WHEN p.monetary_cents > mt.t2 THEN 1 ELSE 0 END
        |      + CASE WHEN p.monetary_cents > mt.t3 THEN 1 ELSE 0 END
        |      AS m_score
        |  FROM per p CROSS JOIN rt CROSS JOIN ft CROSS JOIN mt)
        |SELECT o_custkey, recency_days, frequency, monetary_cents,
        |  CAST(r_score AS BIGINT) AS r_score,
        |  CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
        |    AS segment
        |FROM sc""".stripMargin,
    "q_k_anonymity" ->
      """WITH cls AS (SELECT event_type,
        |    (epoch_us(ts) // 3600000000) % 24 AS hod,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) // 5000 AS vbucket,
        |    CAST(count(*) AS BIGINT) AS sz,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS l_div
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  min(sz) AS min_class_size, min(l_div) AS min_l_diversity,
        |  CAST(sum(CASE WHEN sz < 2 THEN sz ELSE 0 END) AS BIGINT) AS rows_k1,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS rows_lt5,
        |  CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_lt10,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) * 1000000
        |    // sum(sz) AS BIGINT) AS risk5_ppm
        |FROM cls""".stripMargin,
    // the oracle skips the Apriori pruning on purpose: downward closure
    // makes every prune lossless, so the naive triple count is the spec
    "q_freq_triples" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem)
        |SELECT a.pk AS p1, b.pk AS p2, c.pk AS p3,
        |  CAST(count(*) AS BIGINT) AS support
        |FROM li a
        |JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |JOIN li c ON a.ok = c.ok AND b.pk < c.pk
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2""".stripMargin,
    "q_grid_cluster" ->
      """WITH RECURSIVE pts AS (SELECT vec_id,
        |    CAST(floor(embedding[1]::DOUBLE * 10000) + 10000 AS BIGINT)
        |      // 1000 AS gx,
        |    CAST(floor(embedding[2]::DOUBLE * 10000) + 10000 AS BIGINT)
        |      // 1000 AS gy
        |  FROM embeddings),
        |cells AS (SELECT gx, gy, CAST(count(*) AS BIGINT) AS n_pts,
        |    gx * 100000 + gy AS cell_id
        |  FROM pts GROUP BY 1, 2 HAVING count(*) >= 5),
        |adj AS (SELECT a.cell_id AS src, b.cell_id AS dst
        |  FROM cells a JOIN cells b
        |  ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1),
        |reach(a, b) AS (SELECT cell_id, cell_id FROM cells
        |  UNION
        |  SELECT r.a, j.dst FROM reach r JOIN adj j ON r.b = j.src),
        |lbl AS (SELECT a AS cell_id, min(b) AS cluster_id
        |  FROM reach GROUP BY 1),
        |dense AS (SELECT l.cluster_id,
        |    CAST(count(*) AS BIGINT) AS n_cells,
        |    CAST(sum(c.n_pts) AS BIGINT) AS n_points,
        |    min(c.gx) AS gx_min, max(c.gx) AS gx_max,
        |    min(c.gy) AS gy_min, max(c.gy) AS gy_max
        |  FROM cells c JOIN lbl l USING (cell_id) GROUP BY 1)
        |SELECT * FROM dense
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT),
        |  CAST(count(*) AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |  CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |FROM pts p LEFT JOIN cells c USING (gx, gy)
        |WHERE c.cell_id IS NULL""".stripMargin,
    // exponential-mechanism median: Gumbel-max over md5 uniforms, the
    // same deterministic-DP family as q_dp_counts
    "q_dp_quantile" ->
      """WITH h AS (SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) // 500 AS bin,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |cm AS (SELECT event_type, bin, c,
        |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM h),
        |sc AS (SELECT event_type, bin, n, -abs(cum * 2 - n) AS u2,
        |    ('0x' || substring(md5('graft-dpq:' || event_type || ':'
        |      || CAST(bin AS VARCHAR)), 1, 13))
        |      ::UBIGINT::DOUBLE / 4503599627370496.0 AS uu
        |  FROM cm),
        |pk AS (SELECT event_type, n AS n_rows, bin AS dp_bin FROM (
        |    SELECT event_type, bin, n,
        |      row_number() OVER (PARTITION BY event_type ORDER BY
        |        ((100 / 100.0) * u2 / 4.0
        |          - ln(-ln(least(greatest(uu, 1e-15), 1.0 - 1e-15)))) DESC,
        |        bin) AS rn
        |    FROM sc) WHERE rn = 1),
        |tr AS (SELECT event_type, min(bin) AS median_bin FROM cm
        |  WHERE cum * 2 >= n GROUP BY 1)
        |SELECT pk.event_type, pk.n_rows, tr.median_bin, pk.dp_bin,
        |  CAST(100 AS BIGINT) AS epsilon_pct
        |FROM pk JOIN tr ON pk.event_type = tr.event_type""".stripMargin,
    "q_dp_counts" ->
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
        |  FROM events GROUP BY 1),
        |u AS (SELECT event_type, n_true,
        |    ('0x' || substring(md5('graft-dp:' || event_type), 1, 13))
        |      ::UBIGINT::DOUBLE / 4503599627370496.0 AS u
        |  FROM g)
        |SELECT event_type, n_true,
        |  n_true + CAST(floor(-(100.0 / 10)
        |    * sign(u - 0.5)
        |    * ln(greatest(1.0 - 2.0 * abs(u - 0.5), 1e-15)) + 0.5)
        |    AS BIGINT) AS n_noisy,
        |  CAST(10 AS BIGINT) AS epsilon_pct
        |FROM u""".stripMargin,
    "q_key_skew" ->
      """WITH counts AS (SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |          max(c) AS max_count FROM counts),
        |top10 AS (SELECT CAST(sum(c) AS BIGINT) AS top10_rows FROM
        |          (SELECT c FROM counts ORDER BY c DESC, l_partkey LIMIT 10)),
        |cum AS (SELECT c, sum(kc) OVER (ORDER BY c
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumk
        |        FROM (SELECT c, count(*) AS kc FROM counts GROUP BY 1)),
        |pct AS (SELECT
        |    min(CASE WHEN cumk >= (n_keys - 1) * 50 // 100 + 1 THEN c END) AS p50_count,
        |    min(CASE WHEN cumk >= (n_keys - 1) * 99 // 100 + 1 THEN c END) AS p99_count
        |  FROM cum CROSS JOIN tot)
        |SELECT n_rows, n_keys, max_count,
        |  max_count * 1000000 // n_rows AS max_share_ppm,
        |  top10_rows * 1000000 // n_rows AS top10_share_ppm,
        |  p50_count, p99_count
        |FROM tot CROSS JOIN top10 CROSS JOIN pct""".stripMargin,
  )
}
