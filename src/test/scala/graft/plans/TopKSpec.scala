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

  test("empty keys = GLOBAL top-k: one result set, not per-partition") {
    val df = spark.range(0, 10000)
      .repartition(8)
      .select(col("id"), (col("id") * 2654435761L % 1000003L).as("v"))
    val got = TopK.topKPerKey(df, keys = Nil,
      Seq(col("v").desc, col("id").asc), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._2)
    val want = df.orderBy(col("v").desc, col("id").asc).limit(3)
      .collect().map(_.getLong(0))
    assert(got.map(_._1).toSeq === want.toSeq)
    assert(got.map(_._2).toSeq === Seq(1L, 2L, 3L))
  }

  test("optimizer rule rewrites Filter(rnk<=k, Window(row_number)) plans") {
    import org.apache.spark.sql.functions._
    TopKRewrite.enable(spark)
    try {
      // DataFrame idiom: Project(cast) between Filter and Window
      val win = graft.relational.RelationalQueries
        .qTopCustomersPerSegment(spark, dir)
      val plan = win.queryExecution.executedPlan.toString
      assert(plan.contains("FinalTopK") && !plan.contains("Window"), plan)
      val viaRule = win.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
        .toSet
      TopKRewrite.disable(spark)
      val viaWindow = graft.relational.RelationalQueries
        .qTopCustomersPerSegment(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
        .toSet
      assert(viaRule === viaWindow)

      // SQL subquery idiom: Filter directly on the int rank
      TopKRewrite.enable(spark)
      graft.relational.Tables.registerAll(spark, dir)
      val sql = spark.sql(
        """SELECT * FROM (
          |  SELECT o_custkey, o_totalprice,
          |    row_number() OVER (PARTITION BY o_custkey
          |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          |  FROM orders)
          |WHERE rnk <= 2""".stripMargin)
      val sqlPlan = sql.queryExecution.executedPlan.toString
      assert(sqlPlan.contains("FinalTopK") && !sqlPlan.contains("Window"), sqlPlan)
      TopKRewrite.disable(spark)
      val sqlWindow = spark.sql(
        """SELECT * FROM (
          |  SELECT o_custkey, o_totalprice,
          |    row_number() OVER (PARTITION BY o_custkey
          |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          |  FROM orders)
          |WHERE rnk <= 2""".stripMargin)
      assert(sql.collect().map(_.toSeq).toSet ===
        sqlWindow.collect().map(_.toSeq).toSet)
      assert(sql.schema("rnk").dataType ===
        org.apache.spark.sql.types.IntegerType)
    } finally TopKRewrite.disable(spark)
  }

  test("rank mode keeps boundary ties and matches the Window rank()") {
    val native = graft.relational.RelationalQueries.qRankTies(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSet
    graft.relational.Tables.registerAll(spark, dir)
    val win = spark.sql(
      """SELECT * FROM (
        |  SELECT p_partkey, p_brand, p_size,
        |    CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS BIGINT) AS rnk
        |  FROM part)
        |WHERE rnk <= 3""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(native === win)
    // boundary-tie behavior on real data is exercised by the sf0.01
    // oracle (9 brands emit > 3 rows there) and by the synthetic
    // many-partition ties test below; sf0.001 happens to be tie-free
  }

  test("dense-rank mode keeps k distinct order values and matches Window") {
    val native = graft.relational.RelationalQueries.qDenseRankGroups(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSet
    graft.relational.Tables.registerAll(spark, dir)
    val win = spark.sql(
      """SELECT * FROM (
        |  SELECT p_partkey, p_brand, p_size,
        |    CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size ASC) AS BIGINT) AS rnk
        |  FROM part)
        |WHERE rnk <= 2""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(native === win)
    native.groupBy(_._2).foreach { case (brand, rows) =>
      assert(rows.map(_._3).size <= 2, s"$brand distinct sizes")
    }
  }

  test("optimizer rule rewrites rank()/dense_rank() filters too") {
    TopKRewrite.enable(spark)
    try {
      graft.relational.Tables.registerAll(spark, dir)
      for (fn <- Seq("rank", "dense_rank")) {
        val q =
          s"""SELECT * FROM (
             |  SELECT p_partkey, p_brand,
             |    $fn() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rnk
             |  FROM part)
             |WHERE rnk <= 2""".stripMargin
        val df = spark.sql(q)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("FinalTopK") && !plan.contains("Window"), s"$fn: $plan")
        val viaRule = df.collect().map(_.toSeq).toSet
        TopKRewrite.disable(spark)
        val viaWindow = spark.sql(q).collect().map(_.toSeq).toSet
        TopKRewrite.enable(spark)
        assert(viaRule === viaWindow, fn)
      }
    } finally TopKRewrite.disable(spark)
  }

  test("rank-mode prune is lossless across many partitions (synthetic ties)") {
    import spark.implicits._
    // heavy ties: v = id % 7 gives dense collision groups across 16 slices
    val df = spark.range(0, 20000).repartition(16)
      .select((col("id") % 11).as("g"), col("id"), (col("id") % 7).as("v"))
    val native = TopK.topKPerKey(df, Seq(col("g")), Seq(col("v").desc),
      k = 4, mode = RankMode)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val win = df.withColumn("rnk",
      org.apache.spark.sql.functions.rank().over(
        Window.partitionBy("g").orderBy(col("v").desc)).cast("long"))
      .filter(col("rnk") <= 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(native === win)
  }

  test("rule leaves mixed window lists and non-rank filters alone") {
    import org.apache.spark.sql.functions._
    TopKRewrite.enable(spark)
    try {
      graft.relational.Tables.registerAll(spark, dir)
      // two window functions: must stay a Window
      val mixed = spark.sql(
        """SELECT * FROM (
          |  SELECT o_custkey,
          |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rnk,
          |    sum(o_totalprice) OVER (PARTITION BY o_custkey) AS tot
          |  FROM orders)
          |WHERE rnk <= 2""".stripMargin)
      assert(mixed.queryExecution.executedPlan.toString.contains("Window"))
      // rank filter with a non-literal bound: must stay a Window
      val nonLit = spark.sql(
        """SELECT * FROM (
          |  SELECT o_custkey, o_orderkey,
          |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rnk
          |  FROM orders)
          |WHERE rnk <= o_orderkey""".stripMargin)
      assert(nonLit.queryExecution.executedPlan.toString.contains("Window"))
    } finally TopKRewrite.disable(spark)
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
