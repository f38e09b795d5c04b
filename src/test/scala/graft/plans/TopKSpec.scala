package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("native top-k equals the Window formulation on real data") {
    val win = graft.relational.RelationalQueries
      .qTopCustomersPerSegment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val native = graft.relational.RelationalQueries
      .qTopKNative(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(native === win)
  }

  test("physical plan is partial + final heap execs around one exchange") {
    val df = graft.relational.RelationalQueries.qTopKNative(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopK"), plan)
    assert(plan.contains("PartialTopK"), plan)
  }

  test("edge cases: k > group size, single group, ties broken by id") {
    import spark.implicits._
    val df = Seq(
      ("a", 3L, 10.0), ("a", 1L, 10.0), ("a", 2L, 5.0),
      ("b", 9L, 1.0)).toDF("g", "id", "v")
    val got = TopK.topKPerKey(df,
      Seq(col("g")), Seq(col("v").desc, col("id").asc), k = 5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    // ties at v=10.0 rank by ascending id; k=5 > group sizes keeps all
    assert(got === Seq(("a", 1L, 1L), ("a", 3L, 2L), ("a", 2L, 3L),
      ("b", 9L, 1L)))
  }

  test("100k synthetic rows: equals Window; exchange sits between the execs") {
    val n = 100000L
    val df = spark.range(0, n)
      .select((col("id") % 7).as("g"), col("id"),
        (col("id") * 2654435761L % 1000003L).as("v"))
    val got = TopK.topKPerKey(df, Seq(col("g")),
      Seq(col("v").desc, col("id").asc), k = 3)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet === want)
    // map-side pruning happens BEFORE the exchange: Partial under shuffle,
    // Final above it
    val plan = got.queryExecution.executedPlan.toString
    val (iFinal, iEx, iPartial) = (plan.indexOf("FinalTopK"),
      plan.indexOf("Exchange hashpartitioning"), plan.indexOf("PartialTopK"))
    assert(iFinal >= 0 && iEx > iFinal && iPartial > iEx, plan)
  }
}
