package graft.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for large joins. AQE's skew-join handles most cases at
  * runtime; explicit salting remains the tool when one hot key dominates a
  * shuffle (the reference's static uniform split has the same failure mode
  * — a straggler worker — and no answer for it: its rescheduler is an
  * unimplemented stub, `server.c:440-447`).
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
