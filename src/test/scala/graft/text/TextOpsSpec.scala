package graft.text

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("unigram perplexity matches an independent driver-side model") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val counts = docs.values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = counts.values.sum.toDouble
    val v = counts.size.toDouble
    def nll(toks: Seq[String]): Double = {
      val raw = toks.map(tok => -math.log((counts(tok) + 1).toDouble / (t + v)))
        .sum / toks.size
      math.rint(raw * 10000) / 10000
    }
    val got = TextOps.qPerplexity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length === docs.size)
    got.foreach { case (id, n, gNll, gPpl) =>
      assert(n === docs(id).size.toLong, s"doc $id token count")
      // accumulation order differs (distributed vs sequential fold); the
      // 4-decimal rounding is the contract, allow the boundary ulp
      assert(math.abs(gNll - nll(docs(id))) < 2e-4, s"doc $id nll")
      assert(math.abs(gPpl - math.rint(math.exp(gNll) * 100) / 100) < 1e-9,
        s"doc $id ppl from rounded nll")
    }
    // the score separates documents (constant scores would filter nothing)
    assert(got.map(_._3).distinct.length > docs.size / 10)
  }

  test("repetition stats match a driver-side computation") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val got = TextOps.qRepetitionStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length === docs.size)
    got.foreach { case (id, n, nd, topTok, topBg) =>
      val toks = docs(id)
      val bgs = toks.sliding(2).map(_.mkString(" ")).toSeq
      assert(n === toks.size.toLong)
      assert(nd === toks.distinct.size.toLong)
      def frac(xs: Seq[String]) = {
        val top = xs.groupBy(identity).values.map(_.size).max
        // HALF_UP like Spark/DuckDB round(); math.rint would go half-even
        BigDecimal(top.toDouble / xs.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(topTok === frac(toks), s"doc $id top token")
      assert(topBg === frac(bgs), s"doc $id top bigram")
    }
    // repetition separates docs: planted "x x x" runs push the tail up
    assert(got.map(_._5).max > got.map(_._5).min)
  }
}
