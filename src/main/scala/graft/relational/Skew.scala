package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for large joins. Division of labor, pinned by
  * PlanAuditSpec on both sides:
  *
  *   - AQE skew-join is the DEFAULT answer: it splits a join's oversized
  *     shuffle partitions at runtime (replicating the matching build-side
  *     partition), needs no query change, and sees the actual sizes — use
  *     it whenever the skew is a join's reduce-side partition
  *     (PlanAuditSpec "AQE splits a skewed join partition" shows it
  *     engaging with `skew=true`).
  *   - Explicit salting remains the tool where AQE's rewrite does not
  *     reach: a hot key inside a GROUP BY (skew-join only rewrites
  *     joins — the fix is salt + two-phase re-aggregation), a single key
  *     so hot that even one key-group overflows a task (AQE splits
  *     PARTITIONS, salting splits the KEY), or a plan whose required
  *     co-partitioning forbids the runtime split. Salting presumes the
  *     join stays a shuffle join — PlanAuditSpec pins [[qSaltedJoin]]'s
  *     ShuffledHashJoin shape with the salt in the join keys.
  *
  * The reference's static uniform split has the same failure mode — a
  * straggler worker — and no answer for it: its rescheduler is an
  * unimplemented stub (`server.c:440-447`).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways: each big-side
    * row gets a deterministic salt from its full row content, the small
    * side is replicated once per salt, and the join key becomes
    * (key, salt) — splitting a hot key across `salts` reducers. Result
    * multiset is identical to the plain join.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1)
    val bigCols: Array[Column] = big.columns.map(col)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(bigCols: _*)), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt").drop(replicated(key))
  }

  /** Driver-facing showcase: lineitem ⋈ orders salted 8 ways (the
    * orderkey distribution is what a hot-tenant key would skew), then
    * aggregated — the salt must be invisible in the result, so the plain
    * SQL join is the oracle. The small side is NOT broadcast here on
    * purpose: salting only matters for shuffle joins. */
  def qSaltedJoin(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val lineitem = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      .hint("shuffle_hash")
    saltedJoin(lineitem, orders, "l_orderkey", salts = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("total_qty"),
        round(sum("l_extendedprice"), 2).as("total_price"))
  }

  /** Join-key skew census — the diagnostic that picks AQE vs salting
    * BEFORE a 100 TB join runs: the exact per-key frequency distribution
    * of `l_partkey`, reduced to the numbers that matter (hot-key share,
    * top-10 concentration, p50/p99 key sizes). Everything downstream of
    * the first groupBy runs over DISTINCT KEYS (and then distinct key
    * SIZES — strictly smaller again), so the census costs one scan plus
    * bounded-cardinality aggregations; shares are integer ppm and the
    * percentiles are rank-SELECTED counts, so the row is engine-exact. */
  def qKeySkew(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum("c").as("n_rows"),
      count(lit(1)).as("n_keys"), max("c").as("max_count"))
    val top10 = counts.orderBy(col("c").desc, col("l_partkey"))
      .limit(10).agg(sum("c").as("top10_rows"))
    // rank-selected percentiles of the key-size distribution: the window
    // input is the distinct SIZES histogram — cardinality bounded by the
    // number of distinct frequencies, not keys, not rows
    val w = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.groupBy("c").agg(count(lit(1)).as("kc"))
      .withColumn("cumk", sum("kc").over(w))
    val pct = cum.crossJoin(broadcast(tot.select("n_keys")))
      .agg(
        min(when(col("cumk") >= expr("(n_keys - 1) * 50 div 100 + 1"),
          col("c"))).as("p50_count"),
        min(when(col("cumk") >= expr("(n_keys - 1) * 99 div 100 + 1"),
          col("c"))).as("p99_count"))
    tot.crossJoin(top10).crossJoin(pct)
      .select(col("n_rows"), col("n_keys"), col("max_count"),
        expr("max_count * 1000000 div n_rows").as("max_share_ppm"),
        expr("top10_rows * 1000000 div n_rows").as("top10_share_ppm"),
        col("p50_count"), col("p99_count"))
  }
}
