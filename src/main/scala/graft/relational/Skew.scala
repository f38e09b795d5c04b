package graft.relational

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
}
