package graft.text

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Independent reference: the textbook BPE training loop over a plain
    * word-frequency map — different data structures, same contract
    * (argmax by weighted pair count, ties to the CODEPOINT-order smallest
    * pair — formulated here via codepoint arrays, vs the impl's UTF-8
    * byte compare; the two orders coincide, which is the point). */
  private def cpLt(a: String, b: String): Boolean = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      if (x(i) != y(i)) return x(i) < y(i)
      i += 1
    }
    x.length < y.length
  }

  private def refMerges(
      wordFreq: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var types = wordFreq.toSeq.map { case (w, f) =>
      (w.codePoints().toArray.toVector.map(Character.toString), f)
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var continue = true
    var round = 0
    while (round < k && continue) {
      val counts = types
        .flatMap { case (syms, f) =>
          syms.zip(syms.drop(1)).map(p => (p, f))
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), f) = counts.reduceLeft { (p, q) =>
          val better =
            if (p._2 != q._2) p._2 > q._2
            else if (p._1._1 != q._1._1) cpLt(p._1._1, q._1._1)
            else cpLt(p._1._2, q._1._2)
          if (better) p else q
        }
        if (f < 2) continue = false
        else {
          out += ((a, b, f))
          types = types.map { case (syms, fr) =>
            val merged = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                merged += a + b; i += 2
              } else { merged += syms(i); i += 1 }
            }
            (merged.result(), fr)
          }
          round += 1
        }
      }
    }
    out.result()
  }

  test("mergePair: leftmost non-overlapping rewrite") {
    assert(BpeTrain.mergePair(Seq("a", "b", "c"), "a", "b") === Seq("ab", "c"))
    assert(BpeTrain.mergePair(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(BpeTrain.mergePair(Seq("x"), "a", "b") === Seq("x"))
    assert(BpeTrain.mergePair(Seq.empty, "a", "b") === Seq.empty)
  }

  test("hand-pinned corpus: learns the classic merges in order") {
    import spark.implicits._
    // "low lower lowest": 'l o' and 'o w' both weigh 3 — lexicographic
    // tie-break picks ('l','o') first, then 'lo w', then 'low e' (2)
    val docs = Seq("low lower lowest low", "low lower").toDF("text")
    val merges = BpeTrain.learnMerges(docs, "text", 4)
    assert(merges.map(m => (m.left, m.right)).take(3) ===
      Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    // frequencies: 6 words, all start 'l o' -> 6, then 'lo w' -> 6,
    // then 'low e' on lower/lower/lowest -> 3
    assert(merges.map(_.pairFreq).take(3) === Seq(6L, 6L, 3L))
  }

  test("tie-break is codepoint order, not UTF-16 — supplementary-plane safe") {
    import spark.implicits._
    // "😀a" (U+1F600) vs "～a" (U+FF5E), both pairs at freq 2: codepoint
    // order puts U+FF5E first; UTF-16 code-unit order would pick the
    // emoji (surrogate 0xD83D < 0xFF5E) — local AND distributed must
    // agree on the codepoint answer
    val docs = Seq("😀a ～a 😀a ～a").toDF("text")
    val local = BpeTrain.learnMerges(docs, "text", 1)
    assert(local.map(m => (m.left, m.right, m.pairFreq)) ===
      Seq(("～", "a", 2L)))
    val dist = BpeTrain.learnMergesImpl(docs, "text", 1, localSolveMax = 0L)
    assert(dist === local)
  }

  test("early stop: no repeating pair ends training before numMerges") {
    import spark.implicits._
    val docs = Seq("ab cd ef").toDF("text") // every pair count = 1
    assert(BpeTrain.learnMerges(docs, "text", 10) === Seq.empty)
  }

  test("corpus merges match the independent reference; distributed == local") {
    val docsDf = graft.relational.Tables.load(spark, dir, "documents")
    val wordFreq = docsDf.select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = refMerges(wordFreq, 16)
    assert(want.length === 16, "corpus supports 16 merges")
    val local = BpeTrain.learnMerges(docsDf, "text", 16)
    assert(local.map(m => (m.left, m.right, m.pairFreq)) === want)
    // the distributed loop (forced) must learn the identical table; 6
    // rounds is enough to cross several merge-feeds-merge dependencies
    // without paying 16 Spark jobs in CI
    val dist = BpeTrain.learnMergesImpl(docsDf, "text", 6, localSolveMax = 0L)
    assert(dist === local.take(6))
    // learned merges are consistent with what inference consumes: each
    // merged token's parts were themselves chars or earlier merges
    val known = scala.collection.mutable.Set.empty[String]
    local.foreach { m =>
      assert(m.left.length == 1 || known.contains(m.left), m.toString)
      assert(m.right.length == 1 || known.contains(m.right), m.toString)
      known += m.left + m.right
    }
  }
}
