package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RfmRulesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("assoc rules: both directions per pair, confidence consistent") {
    val rules = graft.graph.GraphOps.qAssocRules(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rules.nonEmpty)
    // every rule has its reverse, same support and lift, and
    // confidence <= 1e6
    rules.foreach { case ((a, c), (sup, conf, lift)) =>
      val (sup2, _, lift2) = rules((c, a))
      assert(sup2 === sup)
      assert(lift2 === lift) // lift is symmetric
      assert(conf > 0 && conf <= 1000000L)
    }
    // confidence(a->c) = support / count(a), checked against raw counts
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val itemCnt = li.groupBy(_._2).map { case (p, xs) => p -> xs.length }
    rules.foreach { case ((a, _), (sup, conf, _)) =>
      assert(conf === 1000000L * sup / itemCnt(a))
    }
  }

  test("rfm: quartile scores balanced, segment encodes the triple") {
    val rows = RelationalQueries.qRfm(spark, dir).collect()
    val nCust = Tables.load(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.length.toLong === nCust)
    rows.foreach { r =>
      val (rs, fs, ms, seg) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(rs >= 1 && rs <= 4 && fs >= 1 && fs <= 4 && ms >= 1 && ms <= 4)
      assert(seg === rs * 100 + fs * 10 + ms)
    }
    // value-tie contract: equal metric values get equal scores, and each
    // quartile holds between 0 and n (ties can unbalance, but the rank
    // thresholds keep every band within 2x of n/4 on this data)
    val byScore = rows.groupBy(_.getLong(5)).view.mapValues(_.length)
    (1L to 4L).foreach { s =>
      assert(byScore.getOrElse(s, 0) <= rows.length / 2,
        s"f_score band $s degenerate: $byScore")
    }
    // monetary scores are monotone in monetary value
    val sorted = rows.sortBy(_.getLong(3)).map(_.getLong(6))
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
  }
}
