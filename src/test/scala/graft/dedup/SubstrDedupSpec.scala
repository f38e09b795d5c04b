package graft.dedup

import graft.SparkSpec

/** ExactSubstr passage dedup: hand-built corpora pin the
  * first-occurrence-keep rule, span merging, pass-through, and the
  * everything-removed edge; the sf0.001 corpus run checks invariants. */
class SubstrDedupSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)], ell: Int) = {
    import spark.implicits._
    SubstrDedup.exactSubstrDedup(docs.toDF("doc_id", "text"), ell)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("later occurrences are removed, first kept; clean docs untouched") {
    // ell=3: docs 0 and 1 share "a b c"; doc 0 is first (doc order)
    val got = run(Seq(
      (0L, "a b c x y"),
      (1L, "p q a b c"),
      (2L, "u v w u v")), 3)
    // doc 0 keeps everything (first occurrence)
    assert(got(0L) === ((5L, 0L, 0L, "a b c x y")))
    // doc 1 loses its copy (one 3-token span)
    assert(got(1L) === ((5L, 1L, 3L, "p q")))
    // doc 2 shares nothing and passes through byte-identical
    assert(got(2L) === ((5L, 0L, 0L, "u v w u v")))
  }

  test("within-doc repeats count; overlapping spans merge; full removal") {
    // doc 0: "a b a b a b" with ell=2 — "a b" occurs at 0,2,4 and
    // "b a" at 1,3; firsts keep (0,0) and (0,1); removed idx 2..5
    val got = run(Seq((0L, "a b a b a b")), 2)
    assert(got(0L) === ((6L, 1L, 4L, "a b")))
    // two docs with identical text: the whole later doc is removed
    val got2 = run(Seq((0L, "a b c d"), (1L, "a b c d")), 4)
    assert(got2(0L) === ((4L, 0L, 0L, "a b c d")))
    assert(got2(1L) === ((4L, 1L, 4L, "")))
  }

  test("disjoint duplicated spans stay separate spans") {
    // doc 2 contains two copies of doc-0/doc-1 passages at a distance
    val got = run(Seq(
      (0L, "a b c"),
      (1L, "x y z"),
      (2L, "a b c m1 m2 m3 m4 x y z")), 3)
    assert(got(2L)._2 === 2L)  // two merged spans
    assert(got(2L)._3 === 6L)
    assert(got(2L)._4 === "m1 m2 m3 m4")
  }

  test("corpus run: spans fire, counts are consistent, short docs safe") {
    val res = SubstrDedup.qSubstrDedup(spark, "/root/testdata/sf0.001")
      .collect()
    val n = graft.relational.Tables
      .load(spark, "/root/testdata/sf0.001", "documents").count()
    assert(res.length === n)  // one verdict row per document
    res.foreach { r =>
      val (nt, spans, dup) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dup <= nt)                    // can't remove more than exists
      assert((spans == 0) === (dup == 0))  // spans and tokens agree
      if (dup > 0) assert(dup >= SubstrDedup.SpanTokens) // a span is >= L
      // rebuilt token count is exactly n_tokens - n_dup_tokens
      val rebuiltLen =
        if (r.getString(4).isEmpty) 0 else r.getString(4).split(" ", -1).length
      assert(rebuiltLen === (nt - dup))
    }
    // the corpus has planted duplicate passages; the operator must fire
    assert(res.exists(_.getLong(3) > 0))
  }
}
