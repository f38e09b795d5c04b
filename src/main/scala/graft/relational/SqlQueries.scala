package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL-string surface (`spark.sql` over registered temp views) —
  * operators that the DataFrame API lacks (GROUPING SETS) or that users of
  * an analytics engine reach for in SQL first. Same determinism contract
  * as [[RelationalQueries]].
  */
object SqlQueries {

  private def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(query)
  }

  /** GROUPING SETS (marginals + grand total in one pass). */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())""".stripMargin)

  /** Pivot: order counts per status × priority (dense — nulls filled so the
    * FILTER-aggregation oracle matches). */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", priorities)
      .count()
      .na.fill(0L)
  }

  /** Statistical aggregates: sample stddev/variance, covariance,
    * correlation (rounded — accumulation-order noise is ~1e-10). */
  def qStatsAgg(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)

  /** Date arithmetic: extract parts + day difference from a fixed epoch. */
  def qDateArith(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  count(*) AS n_orders,
        |  min(datediff(o_orderdate, DATE '1995-01-01')) AS min_days_since_epoch,
        |  max(datediff(o_orderdate, DATE '1995-01-01')) AS max_days_since_epoch
        |FROM orders GROUP BY 1, 2""".stripMargin)

  /** String function battery over part names. */
  def qStringOps(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  replace(p_name, ' ', '_') AS name_snake,
        |  lpad(CAST(p_size AS STRING), 5, '0') AS size_padded,
        |  substring(p_type, 1, 3) AS type_prefix
        |FROM part""".stripMargin)

  /** Approximate sketches (HLL distinct, quantile summaries) — the
    * bounded-memory path for cardinality/percentile at 100 TB. Sketch
    * VALUES are engine-specific, so the oracle-facing columns are
    * engine-independent accuracy assertions computed from exact data:
    * the HLL/exact cardinality ratio rounds to 1.0 (rsd 0.01 « the 0.05
    * rounding tolerance) and the exact rank fraction of each
    * approx-percentile rounds to its nominal quantile (GK rank error 1e-4
    * « the 0.005 tolerance). A broken sketch shifts these columns and
    * hash-mismatches; raw sketch outputs stay available via
    * [[qSketchRaw]]. */
  def qSketchStats(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      // two scans of events total: (1) ONE grouped pass computes the exact
      // distinct count AND both sketches side by side (Spark plans the
      // mixed distinct/non-distinct aggregate as a single scan + expand);
      // (2) the rank-check pass re-reads events against the tiny
      // broadcast-joined summary. The previous formulation's third scan
      // and second join bought nothing — the exact/approx columns were
      // computed in separate passes over the same rows. The summary
      // columns ride through max() rather than the GROUP BY: they are
      // functionally dependent on event_type, and grouping by
      // aggregate-derived join columns measured ~6x slower here (it
      // defeats the second aggregate's partial/final split).
      """WITH g AS (SELECT event_type,
        |             count(DISTINCT user_id) AS n_users,
        |             approx_count_distinct(user_id, 0.01) AS approx_users,
        |             approx_percentile(value, 0.5) AS p50,
        |             approx_percentile(value, 0.95) AS p95
        |           FROM events GROUP BY 1)
        |SELECT g.event_type, max(g.n_users) AS n_users,
        |  round(max(CAST(g.approx_users AS DOUBLE)) / max(g.n_users), 1) AS users_ratio,
        |  round(avg(CAST(CASE WHEN e.value <= g.p50 THEN 1.0 ELSE 0.0 END AS DOUBLE)), 2) AS p50_rank,
        |  round(avg(CAST(CASE WHEN e.value <= g.p95 THEN 1.0 ELSE 0.0 END AS DOUBLE)), 2) AS p95_rank
        |FROM events e JOIN g ON e.event_type = g.event_type
        |GROUP BY g.event_type""".stripMargin)

  /** Raw sketch outputs (engine-specific values; library surface). */
  def qSketchRaw(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT event_type,
        |  approx_count_distinct(user_id) AS approx_users,
        |  approx_percentile(value, 0.5) AS p50_value,
        |  approx_percentile(value, 0.95) AS p95_value
        |FROM events GROUP BY 1""".stripMargin)

  /** Fixed-width histogram of event values (floor-bucket arithmetic —
    * identical in any engine, unlike width_bucket variants). */
  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT CAST(floor(value / 5.0) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  round(min(value), 2) AS lo,
        |  round(max(value), 2) AS hi
        |FROM events GROUP BY 1""".stripMargin)

  /** Scalar subquery: customers above the (rounded) mean balance. */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer)""".stripMargin)
}
