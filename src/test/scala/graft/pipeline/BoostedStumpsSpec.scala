package graft.pipeline

import graft.SparkSpec

class BoostedStumpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("boosted stumps equal a JVM replay; residual loss decreases") {
    val got = BoostedStumps.qBoostedStumps(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    // independent replay from raw collected documents
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .selectExpr("text", "n_chars").collect()
      .map { r =>
        val toks = r.getString(0).split(" ", -1)
        val f = Map(
          "f1" -> toks.length.toLong,
          "f2" -> r.getLong(1),
          "f3" -> toks.count(t => t == "the" || t == "a").toLong)
        (f, toks.distinct.length.toLong * 1000000L)
      }
    val grid = Seq("f1", "f2", "f3").flatMap { fe =>
      val vs = docs.map(_._1(fe))
      val (mn, mx) = (vs.min, vs.max)
      (1 to 7).map(i => (fe, mn + (mx - mn) * i / 8))
    }
    var resid = docs.map(_._2)
    val want = (1 to 3).map { t =>
      val nAll = docs.length.toLong
      val sAll = resid.sum
      val best = grid.flatMap { case (fe, th) =>
        val mask = docs.map(_._1(fe) <= th)
        val nl = mask.count(identity).toLong
        if (nl == 0 || nl == nAll) None
        else {
          val sl = resid.zip(mask).collect { case (r, true) => r }.sum
          val num = BigInt(sl) * (nAll - nl) - BigInt(sAll - sl) * nl
          Some((fe, th, nl, sl, num * num, BigInt(nl) * (nAll - nl)))
        }
      }.reduceLeft { (a, c) =>
        val cmp = a._5 * c._6 - c._5 * a._6
        if (cmp > 0 || (cmp == 0 &&
          (a._1 < c._1 || (a._1 == c._1 && a._2 <= c._2)))) a else c
      }
      val (fe, th, nl, sl, _, _) = best
      val (dl, dr) = (sl / nl, (sAll - sl) / (nAll - nl))
      resid = docs.zip(resid).map { case ((f, _), r) =>
        r - (if (f(fe) <= th) dl else dr)
      }
      (t.toLong, fe, th, nl, dl, dr, resid.map(math.abs).sum)
    }
    assert(got.toSeq === want)
    val losses = got.map(_._7)
    assert(losses.zip(losses.tail).forall { case (a, b) => b <= a },
      s"boosting must not increase |residual|: ${losses.toSeq}")
    got.foreach { case (_, _, _, nl, _, _, _) =>
      assert(nl > 0 && nl < docs.length, "splits must be non-trivial")
    }
  }

  test("stump crossval: fold-0 equals an independent JVM train+score replay") {
    val got = BoostedStumps.qStumpCrossval(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "text", "n_chars").collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        (r.getLong(0), Map(
          "f1" -> toks.length.toLong,
          "f2" -> r.getLong(2),
          "f3" -> toks.count(t => t == "the" || t == "a").toLong),
          toks.distinct.length.toLong * 1000000L)
      }
    val total = docs.length.toLong
    got.foreach { case (fold, nTr, nTe, sae, mae) =>
      assert(nTr + nTe === total, s"fold $fold partition")
      assert(mae === sae / nTe && mae > 0, s"fold $fold mae")
    }
    // independent replay of fold 0 (train on %5 != 0, score %5 == 0)
    val tr = docs.filter(_._1 % 5 != 0)
    val te = docs.filter(_._1 % 5 == 0)
    val grid = Seq("f1", "f2", "f3").flatMap { fe =>
      val vs = tr.map(_._2(fe))
      (1 to 7).map(i => (fe, vs.min + (vs.max - vs.min) * i / 8))
    }
    var resid = tr.map(_._3)
    val model = (1 to 2).map { _ =>
      val nAll = tr.length.toLong
      val sAll = resid.sum
      val best = grid.flatMap { case (fe, th) =>
        val mask = tr.map(_._2(fe) <= th)
        val nl = mask.count(identity).toLong
        if (nl == 0 || nl == nAll) None
        else {
          val sl = resid.zip(mask).collect { case (r, true) => r }.sum
          val num = BigInt(sl) * (nAll - nl) - BigInt(sAll - sl) * nl
          Some((fe, th, nl, sl, num * num, BigInt(nl) * (nAll - nl)))
        }
      }.reduceLeft { (a, c) =>
        val cmp = a._5 * c._6 - c._5 * a._6
        if (cmp > 0 || (cmp == 0 &&
          (a._1 < c._1 || (a._1 == c._1 && a._2 <= c._2)))) a else c
      }
      val (fe, th, nl, sl, _, _) = best
      val (dl, dr) = (sl / nl, (sAll - sl) / (tr.length - nl))
      resid = tr.zip(resid).map { case ((_, f, _), r) =>
        r - (if (f(fe) <= th) dl else dr)
      }
      (fe, th, dl, dr)
    }
    val sae0 = te.map { case (_, f, y) =>
      val p = model.map { case (fe, th, dl, dr) =>
        if (f(fe) <= th) dl else dr
      }.sum
      math.abs(y - p)
    }.sum
    val want0 = (0L, tr.length.toLong, te.length.toLong, sae0,
      sae0 / te.length)
    assert(got.head === want0)
  }
}
