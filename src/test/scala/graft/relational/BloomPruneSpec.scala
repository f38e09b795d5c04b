package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bloom prune: result equals the plain semi join census") {
    val got = BloomPrune.qBloomPrune(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val li = Tables.load(spark, dir, "lineitem")
    val hot = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000.0).select("o_orderkey")
    val want = li
      .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
  }

  test("bloom prune: the filter kills non-matching rows before the join") {
    val (afterBloom, exact) = BloomPrune.pruneCounts(spark, dir)
    val totalProbe = Tables.load(spark, dir, "lineitem").count()
    assert(afterBloom >= exact, "a bloom can never produce false negatives")
    // fpp of the sized filter is ~3%: survivors beyond the exact matches
    // are bounded by fpp × non-matching rows (generous 2× margin so the
    // case is not flaky across Spark's bloom seeding)
    assert(afterBloom - exact <= 0.06 * (totalProbe - exact) + 10,
      s"bloom pruned too little: $afterBloom survivors vs $exact exact")
    // and the prune is actually selective on this fixture (the point of
    // shipping it): the hot-order subset is a small fraction of lineitem
    assert(afterBloom.toDouble / totalProbe < 0.5,
      s"fixture not selective: $afterBloom of $totalProbe survive")
  }

  test("bloom prune: plan shows might_contain filtering ahead of a semi join") {
    val plan = BloomPrune.qBloomPrune(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom filter in plan:\n$plan")
    assert(plan.contains("LeftSemi"), s"no semi join in plan:\n$plan")
  }
}
