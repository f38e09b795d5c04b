package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning over the date-partitioned events copy. */
class PartitionedLakeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dpp result equals the unpartitioned filter-aggregate") {
    val got = PartitionedLake.qDppPrune(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val want = graft.relational.Tables.load(spark, dir, "events")
      .selectExpr("ts div 86400000000000 as epoch_days", "value")
      .filter(expr("(epoch_days + 4) % 7 in (0, 6)"))
      .groupBy("epoch_days")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .selectExpr(
        "date_format(date_add(date '1970-01-01', cast(epoch_days as int)), 'yyyy-MM-dd')",
        "n", "cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got === want)
    assert(got.length === 8, "January 2024 has 8 weekend days")
  }

  test("the fact scan carries a runtime partition filter and reads 8/30 dirs") {
    val df = PartitionedLake.qDppPrune(spark, dir)
    df.collect() // execute so AQE finalizes and DPP subqueries run
    val plan = df.queryExecution.executedPlan
    def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
        // AQE leaves are materialized stages wrapping the real subtree
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          leaves(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(leaves) ++
          other.subqueries.flatMap(leaves)
      }
    val scans = leaves(plan)
      .filter(_.relation.partitionSchema.fieldNames.contains("event_date"))
    assert(scans.nonEmpty, "partitioned scan present")
    scans.foreach { s =>
      // the scan's partition filters must include the RUNTIME pruning
      // subquery (plan.toString truncates the filter list, so inspect
      // the expressions, not the rendering)
      assert(s.partitionFilters.exists(
        _.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])),
        "partition filter must carry the runtime DPP subquery")
      assert(s.metrics("numPartitions").value === 8,
        "8 weekend partitions of 30 read after pruning")
    }
  }
}
