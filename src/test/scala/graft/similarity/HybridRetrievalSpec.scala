package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RRF fusion: exact contributions on a hand-built case, agreement
  * dominance, and the end-to-end hybrid query over the sf0.001 corpus. */
class HybridRetrievalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("rrfFuse sums exact integer contributions and ranks by them") {
    import spark.implicits._
    // q0: lexical proposes (1, 2), dense proposes (2, 3).
    val lex = Seq((0L, 1L, 1L), (0L, 2L, 2L)).toDF("qid", "id", "rnk")
    val den = Seq((0L, 2L, 1L), (0L, 3L, 2L)).toDF("qid", "id", "rnk")
    val out = HybridRetrieval.rrfFuse(Seq(lex, den), kOut = 3)
      .orderBy("rnk")
      .select("id", "rrf_fp", "n_lists", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val c = (r: Long) => HybridRetrieval.RrfScale / (HybridRetrieval.RrfK + r)
    // id 2 is in both lists (ranks 2 and 1) and must fuse to the top.
    assert(out === Seq(
      (2L, c(2) + c(1), 2L, 1L),
      (1L, c(1), 1L, 2L),
      (3L, c(2), 1L, 3L)))
  }

  test("hybrid query: k results per query, both retrievers contribute") {
    val out = HybridRetrieval.qRrfFusion(spark, dir).persist()
    try {
      val perQ = out.groupBy("qid").count().collect()
      assert(perQ.length === 20)
      assert(perQ.forall(_.getLong(1) === 5L))
      // on a real corpus the two retrievers must AGREE on some candidates
      // (n_lists = 2) and DISAGREE on others — if either side were dead
      // weight every n_lists would be 1 (or the fusion degenerate)
      val agree = out.filter(col("n_lists") === 2).count()
      val single = out.filter(col("n_lists") === 1).count()
      assert(agree > 0, "no candidate proposed by both retrievers")
      assert(single > 0, "retrievers identical — fusion is degenerate")
    } finally out.unpersist()
  }

  test("fused ranking is deterministic under repartitioning") {
    val a = HybridRetrieval.qRrfFusion(spark, dir)
      .orderBy("qid", "rnk").collect().toSeq
    val b = {
      import spark.implicits._
      val lex = graft.text.TextOps.qBm25TopK(spark, dir, 20, 10)
        .repartition(7)
        .select(col("qid"), col("doc_id").as("id"), col("rnk"))
      val den = Similarity.qAnnBruteForce(spark, dir, 20, 10)
        .repartition(3)
        .select(col("qid"), col("nid").as("id"), col("rnk"))
      HybridRetrieval.rrfFuse(Seq(lex, den), 5)
        .orderBy("qid", "rnk").collect().toSeq
    }
    assert(a === b)
  }

  test("nDCG eval: weights well-formed, scores proper, replay matches") {
    // the single weight definition both engines interpolate: strictly
    // decreasing, w1 = 1e9 exactly (1/log2(2)), prefix sums match
    val w = HybridRetrieval.ndcgWeights(10)
    assert(w.head === ((1L, 1000000000L)))
    assert(w.map(_._2) === w.map(_._2).sorted.reverse)
    assert(w.map(_._2).distinct.length === 10)
    val cum = HybridRetrieval.ndcgIdealPrefix(10)
    assert(cum.map(_._2) === (1 to 10).map(c => w.take(c).map(_._2).sum))
    val got = HybridRetrieval.qNdcgEval(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === Set("bm25", "dense", "hybrid"))
    // nDCG is a proper score in [0, 1] (ppm) for every system
    got.values.foreach { case (n, ppm) =>
      assert(n > 0 && ppm >= 0 && ppm <= 1000000)
    }
    // binary label relevance is the dense retriever's home game — if
    // BM25 beat embeddings on it the label join would be wired wrong
    assert(got("dense")._2 > got("bm25")._2)
    // the dense system must actually find relevant docs (a zero here
    // means the label ground-truth join is vacuous)
    assert(got("dense")._2 > 0)
  }
}
