package graft.relational

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("driver contract: entry() returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract: every oracleSql key has a queries entry") {
    val q = graft.SparkEntry.queries.keySet
    val missing = graft.SparkEntry.oracleSql.keySet.diff(q)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries execute and most return rows at sf0.001") {
    val counts = graft.SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dir).count()
    }
    // legitimately empty at sf0.001: no preimage, no duplicate texts, every
    // nation has suppliers, every customer has orders
    val expectedEmpty =
      Set("q_crack_notfound", "q_dedup_exact", "q_except", "q_anti_join")
    counts.foreach { case (name, n) =>
      if (!expectedEmpty.contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("semi + anti join partition the customer set") {
    val all = Tables.load(spark, dir, "customer").count()
    val withOrders = Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "orders"),
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("o_custkey"), "left_semi")
      .count()
    val noOrders = RelationalQueries.qAntiCustomersNoOrders(spark, dir).count()
    assert(withOrders + noOrders === all)
  }
}
