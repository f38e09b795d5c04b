package graft.text

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Every segmentation of `w` into pieces from `scores` (pieces up to
    * [[UnigramLm.MaxPieceLen]]) — the exponential reference the DP must
    * match. */
  private def allSegs(
      w: String, scores: Map[String, Long]): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(UnigramLm.MaxPieceLen, w.length)).flatMap { l =>
      val p = w.substring(0, l)
      if (scores.contains(p)) allSegs(w.substring(l), scores).map(p +: _)
      else Seq.empty
    }

  /** The documented total order: score desc, piece count asc, then piece
    * lengths compared from the LAST piece backwards, longer first. */
  private def bestByEnumeration(
      w: String, scores: Map[String, Long]): Option[Seq[String]] = {
    val segs = allSegs(w, scores)
    if (segs.isEmpty) None
    else Some(segs.minBy { seg =>
      (-seg.map(scores).sum, seg.length,
        seg.map(-_.length).reverse.toIndexedSeq)
    }(Ordering.Tuple3(Ordering.Long, Ordering.Int,
      Ordering.Implicits.seqOrdering[IndexedSeq, Int])))
  }

  test("viterbi DP equals exhaustive enumeration under the total order") {
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { k =>
      // random piece inventory over {a, b} (all chars kept segmentable)
      // with deliberately collision-heavy scores so ties are common
      val pieces = (Seq("a", "b") ++
        Seq.fill(6)(Seq.fill(1 + rnd.nextInt(UnigramLm.MaxPieceLen))(
          if (rnd.nextBoolean()) "a" else "b").mkString)).distinct
      val scores = pieces.map(p => p -> (-1L - rnd.nextInt(3))).toMap
      val w = Seq.fill(1 + rnd.nextInt(10))(
        if (rnd.nextBoolean()) "a" else "b").mkString
      val got = Option(UnigramLm.segment(w, scores))
      assert(got === bestByEnumeration(w, scores), s"case $k: w=$w scores=$scores")
    }
  }

  test("segment returns null exactly when a character is uncovered") {
    assert(UnigramLm.segment("abc", Map("a" -> -1L, "b" -> -1L)) == null)
    assert(UnigramLm.segment("", Map("a" -> -1L)) === Seq.empty)
  }

  test("learned model: pieces cover the corpus and encode round-trips") {
    val model = UnigramLm.learn(
      graft.relational.Tables.load(spark, dir, "documents"), "text")
    assert(model.nonEmpty)
    // deterministic output order (piece utf8 asc), unique pieces
    assert(model.map(_._1) === model.map(_._1).sortWith(BpeTrain.utf8Lt))
    assert(model.map(_._1).distinct.size === model.size)
    // EM found multi-character structure with real mass
    assert(model.exists { case (p, c, _) => p.length > 1 && c > 0 })
    // encode: concatenation restores the text, for every document
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    docs.foreach { t =>
      val toks = UnigramLm.encode(t, model)
      assert(toks.mkString === t.replace(" ", ""))
    }
  }

  test("local == forced-distributed (parity of the size-gated twin)") {
    val docs = graft.relational.Tables.load(spark, dir, "documents")
    val local = UnigramLm.learn(docs, "text")
    val dist = UnigramLm.learnImpl(docs, "text", localSolveMax = 0L)
    assert(local === dist)
  }

  test("q_unigram_lm: driver-contract shape") {
    val df = UnigramLm.qUnigramLm(spark, dir)
    assert(df.columns.toSeq === Seq("piece", "cnt", "score_fp"))
    assert(df.count() > 0)
  }
}
