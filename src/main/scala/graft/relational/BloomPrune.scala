package graft.relational

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.{Column, DataFrame, GraftShim, SparkSession}

/** Bloom-filter join pruning — the semi-join reduction every engine at
  * 100 TB leans on (the technique behind Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` runtime filters, applied
  * here EXPLICITLY so the prune is visible in the plan and its
  * effectiveness measurable): build a Bloom filter over the small side's
  * join keys, drop probe-side rows whose key cannot be present BEFORE
  * they reach the join's shuffle, then run the exact join over the
  * survivors. False positives cost nothing but wasted shuffle bytes —
  * the exact join removes them — so the RESULT is exactly the semi join
  * and carries a normal DuckDB oracle; the bloom only decides how many
  * probe rows pay the exchange.
  *
  * Scale shape: the filter is O(build keys) bits (~1.2 MB per million
  * keys at 3% fpp), aggregated with map-side combine (bitwise OR) and
  * shipped to probe tasks as one plan constant — the same
  * broadcast-metadata discipline as the IVF centroid table. The probe
  * side stays a scan → codegen'd filter: at a 1% selective build side
  * this deletes ~99% of the probe exchange, which is the difference
  * between shuffling 100 TB and shuffling 1 TB.
  */
object BloomPrune {

  /** Bloom filter (Spark's `util.sketch.BloomFilter` binary form) over
    * `xxhash64(key)` of `df`'s rows. One tiny job; the returned bytes
    * are embedded as a foldable plan literal, exactly like Spark's
    * runtime-filter subquery result. */
  def bloomOf(df: DataFrame, key: Column, expectedItems: Long): Array[Byte] =
    df.select(GraftShim.column(
        new BloomFilterAggregate(
          GraftShim.expression(xxhash64(key)), expectedItems)
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** `might_contain(bloom, xxhash64(key))` as a codegen'd filter Column.
    * The bloom side must be a plan CONSTANT (Spark rejects a per-row
    * bloom attribute by design — a bloom per row would defeat the
    * point), which is why [[bloomOf]] hands back bytes, not a frame. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftShim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftShim.expression(xxhash64(key))))

  /** Big-probe ⋉ small-build with an explicit bloom prune ahead of the
    * exact semi join: lineitems of high-value orders, per-flag census.
    * The exact semi join makes false positives invisible to the result —
    * the oracle is the plain `IN` subquery. */
  def qBloomPrune(
      spark: SparkSession, dir: String,
      minTotal: Double = 400000.0): DataFrame = {
    val hot = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > minTotal)
      .select(col("o_orderkey"))
    // sized for the filtered build side; overestimating only pads the
    // filter (bits are cheap), underestimating raises fpp — at 100 TB
    // the estimate comes from table stats, here from the SF contract
    val bloom = bloomOf(hot, col("o_orderkey"), expectedItems = 1L << 20)
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      .filter(mightContain(bloom, col("l_orderkey")))
      .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum("l_quantity").as("sum_qty"))
  }

  /** Measured prune effectiveness on the probe side (for the spec and
    * the plan audit): rows surviving the bloom alone vs the exact count.
    * survivors ∈ [exact, exact + fp margin]. */
  private[graft] def pruneCounts(
      spark: SparkSession, dir: String,
      minTotal: Double = 400000.0): (Long, Long) = {
    val hot = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > minTotal)
      .select(col("o_orderkey"))
    val bloom = bloomOf(hot, col("o_orderkey"), expectedItems = 1L << 20)
    val li = Tables.load(spark, dir, "lineitem").select(col("l_orderkey"))
    val afterBloom = li.filter(mightContain(bloom, col("l_orderkey"))).count()
    val exact = li
      .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    (afterBloom, exact)
  }
}
