package graft.relational

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fk check: the generated lake is referentially consistent; sizes match") {
    val rows = DataQuality.qFkCheck(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.size === 7)
    rows.values.foreach { case (_, orphans) => assert(orphans === 0L) }
    val nOrders = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey").distinct().count()
    assert(rows("lineitem.orderkey->orders")._1 === nOrders)
  }

  test("fk check flags orphans on a broken child relation") {
    // the operator logic, driven directly: a key set with strangers
    import spark.implicits._
    val child = Seq(1L, 2L, 999L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val orphans = child.join(parent, Seq("k"), "left_anti").count()
    assert(orphans === 1L)
  }

  test("schema profile equals a JVM replay on representative columns") {
    val rows = DataQuality.qSchemaProfile(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(rows.size === 11)
    val li = Tables.load(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_extendedprice", "l_returnflag").collect()
    val keys = li.map(_.getLong(0))
    assert(rows("l_orderkey") ===
      ((0L, keys.distinct.length.toLong, keys.min.toString, keys.max.toString)))
    val prices = li.map(_.getDouble(1))
    def cents(d: Double): String = math.floor(d * 100 + 0.5).toLong.toString
    assert(rows("l_extendedprice")._3 === cents(prices.min))
    assert(rows("l_extendedprice")._4 === cents(prices.max))
    val flags = li.map(_.getString(2))
    assert(rows("l_returnflag") ===
      ((0L, flags.distinct.length.toLong, flags.min, flags.max)))
  }
}
