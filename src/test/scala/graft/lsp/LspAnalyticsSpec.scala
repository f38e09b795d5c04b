package graft.lsp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LspAnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("messageLog: seqnums are contiguous 1..n per connection") {
    val bad = LspAnalytics.messageLog(spark, dir)
      .groupBy("connid")
      .agg(count(lit(1)).as("n"), max("seqnum").as("mx"), min("seqnum").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
      .count()
    assert(bad === 0)
  }

  test("dpc classifier partitions the log exhaustively") {
    val total = LspAnalytics.messageLog(spark, dir).count()
    val byType = LspAnalytics.qDpcClassify(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.values.sum === total)
    assert(byType.keySet.subsetOf(Set(
      "JOIN_REQ", "CRACK_REQ", "PASS_FOUND", "PASS_NOTFOUND", "UNKNOWN")))
  }

  test("gap detection: thinned log has gaps, full log has none") {
    val gaps = LspAnalytics.qGapDetect(spark, dir)
    assert(gaps.count() > 0)
    gaps.collect().foreach { r =>
      assert(r.getLong(3) >= 1) // n_lost
    }
    // un-thinned log (seqnums contiguous) → no gaps possible: verified by
    // the contiguity test above
  }

  test("parse extracts 40-hex-free fields positionally (P1)") {
    LspAnalytics.qDpcParse(spark, dir).collect().foreach { r =>
      assert(r.getString(2).matches("[0-9a-f]{32}")) // md5 stand-in hash
      assert(r.getString(3) === "aaaa")
      assert(r.getString(4) === "zzzz")
    }
  }
}
