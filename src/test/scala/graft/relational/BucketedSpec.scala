package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucket join: co-located SMJ — no shuffle, no sort below the join") {
    val df = Bucketed.qBucketJoin(spark, dir)
    df.collect() // finalize the adaptive plan
    val full = df.queryExecution.executedPlan.toString
    // assert on the FINAL adaptive plan only — the dump's trailing
    // "== Initial Plan ==" section still shows the pre-AQE exchanges
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    assert(plan.contains("SortMergeJoin"),
      s"bucketed join must stay sort-merge (the 100 TB shape):\n$plan")
    // the join subtree is everything after the SMJ node; neither input
    // may shuffle or sort — the bucketed, key-sorted layout feeds it
    val below = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!below.contains("Exchange"),
      s"no exchange below the join — bucket layout must be reused:\n$plan")
    assert(!below.contains("Sort "),
      s"no sort below the join — sortBy buckets must be reused:\n$plan")
    // the scans really are the bucketed tables
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"scan must be bucketed:\n$plan")
  }

  test("bucketed writer invariant: exactly one file per bucket") {
    Bucketed.qBucketJoin(spark, dir).collect()
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    for (t <- Seq("graft_bkt_lineitem", "graft_bkt_orders")) {
      val name = t + dir.replaceAll("[^a-zA-Z0-9]", "_")
      val files = new java.io.File(s"$wh/$name").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 8,
        s"$name must hold one file per bucket (sound sort propagation); " +
          s"got ${files.map(_.getName).mkString(", ")}")
    }
  }

  test("bucket join result equals the straight parquet join") {
    val got = Bucketed.qBucketJoin(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          100 + 0.5).cast("long")).as("revenue_cents"),
        count(lit(1)).as("n_items"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }
}
