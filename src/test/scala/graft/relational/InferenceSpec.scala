package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-inference operators: invariants plus independent JVM replays
  * (BigInt arithmetic, jvm md5) — stronger than the DuckDB oracle alone
  * because the replay shares no SQL with either engine. */
class InferenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5u32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
  }

  test("acf: |r| <= 1 and lag-1 of a JVM replay matches exactly") {
    val rows = Inference.qAcf(spark, dir).collect()
    assert(rows.length === 30) // 5 types x 6 lags
    rows.foreach(r => assert(math.abs(r.getLong(3)) <= 1000000L,
      s"acf_ppm out of [-1e6,1e6]: $r"))
    // independent replay for one type: gap-filled hourly series, BigInt
    val ev = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(expr("ts div 1000 div 3600000000").as("h")).collect()
      .map(_.getLong(0))
    // the spine is GLOBAL (all types share the bounds), so bounds come
    // from the full table, not the filtered type
    val all = Tables.load(spark, dir, "events")
      .select(expr("ts div 1000 div 3600000000").as("h")).collect()
      .map(_.getLong(0))
    val (h0, h1) = (all.min, all.max)
    val counts = ev.groupBy(identity).map { case (h, v) => h -> v.length }
    val y = (h0 to h1).map(h => BigInt(counts.getOrElse(h, 0)))
    val n = BigInt(y.length); val s = y.sum
    val dev = y.map(v => n * v - s)
    val den = dev.map(d => d * d).sum
    val num1 = (1 until y.length).map(i => dev(i) * dev(i - 1)).sum
    val want =
      if (den == 0) 0L
      else (num1.sign * ((BigInt(1000000) * num1.abs) / den)).toLong
    val got = rows.find(r => r.getString(0) == "purchase" && r.getLong(1) == 1L)
      .get.getLong(3)
    assert(got === want)
  }

  test("wilson: bound below rate, exact vs a BigInt-isqrt replay") {
    val rows = Inference.qWilsonCtr(spark, dir).collect()
    assert(rows.length === 24)
    assert(rows.map(_.getLong(5)).sorted.sameElements(1L to 24L))
    def isqrt(x: BigInt): BigInt = {
      if (x < 2) return x
      var r = BigInt(math.sqrt(x.toDouble).toLong + 2)
      var prev = BigInt(-1)
      while (prev != r) { prev = r; r = (r + x / r) >> 1 }
      while (r * r > x) r -= 1
      while ((r + 1) * (r + 1) <= x) r += 1
      r
    }
    rows.foreach { r =>
      val t = BigInt(r.getLong(1)); val s = BigInt(r.getLong(2))
      val x = BigInt(38416) * (BigInt(10000) * s * (t - s) + BigInt(9604) * t) * t
      val lb = (BigInt(1000000) * (t * (BigInt(10000) * s + 19208) - isqrt(x))) /
        (t * (BigInt(10000) * t + 38416))
      assert(r.getLong(4) === lb.toLong, s"wilson replay mismatch at $r")
      assert(r.getLong(4) <= r.getLong(3), s"LB above raw rate at $r")
    }
  }

  test("bootstrap: CI ordered around a plausible mean; replicate means replay") {
    val out = Inference.qBootstrapCi(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lo, hi, mean) = (r.getLong(4), r.getLong(5), r.getLong(2))
      assert(lo <= hi)
      // percentile-bootstrap interval need not strictly contain the point
      // estimate, but on this data it comfortably does
      assert(lo <= mean && mean <= hi, s"CI excludes the mean: $r")
      assert(r.getLong(3) === 32L) // every replicate nonempty at this sf
    }
    // full JVM replay of replicate means for one type
    val ev = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("event_id"),
        expr("cast(floor(value * 100 + 0.5) as long)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val th = Inference.poissonThresholds
    def mult(u: Long): Long = {
      val i = th.indexWhere(u < _); if (i < 0) 9L else i.toLong
    }
    val wantMeans = (0 until 32).map { b =>
      var sum = BigInt(0); var n = 0L
      ev.foreach { case (id, c) =>
        val m = mult(md5u32(s"boot:$b:$id")); sum += BigInt(m) * c; n += m
      }
      ((BigInt(1000000) * sum) / n).toLong
    }.sorted
    // rank ceil(.05*32)=2 and ceil(.95*32)=31 (1-indexed)
    val clickRow = out.find(_.getString(0) == "click").get
    assert(clickRow.getLong(4) === wantMeans(1))
    assert(clickRow.getLong(5) === wantMeans(30))
  }

  test("markov stationary: independent replay from raw events") {
    val out = Inference.qMarkovStationary(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // replay: transitions from raw rows, ppm matrix, 20 rounds
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val o = rows.sortBy(r => (r._4, r._2)).map(_._3)
      o.zip(o.tail)
    }
    val n = trans.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val outN = trans.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val p = n.map { case ((a, b), c) => (a, b) -> c * 1000000L / outN(a) }
    val states = outN.keys.toSeq.sorted
    var pi = states.map(_ -> 1000000L / states.length).toMap
    for (_ <- 1 to 20) {
      pi = states.map { j =>
        j -> states.map(i => pi(i) * p.getOrElse((i, j), 0L)).sum / 1000000L
      }.toMap
    }
    states.foreach { s => assert(out(s) === ((pi(s), outN(s))), s"state $s") }
    // fixed point sanity: total mass within truncation loss of 1e6
    val mass = out.values.map(_._1).sum
    assert(mass <= 1000000L && mass > 1000000L - 200L * states.length)
  }

  test("permutation test: full JVM replay, p in (0, 1e6]") {
    val r = Inference.qPermutationTest(spark, dir).collect().head
    val users = Tables.load(spark, dir, "events")
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" &&
        col("value") > 120.0, 1L).otherwise(0L)).as("conv"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    def stat(grp: Long => Int): BigInt = {
      var c0, n0, c1, n1 = 0L
      users.foreach { case (u, c) =>
        if (grp(u) == 0) { c0 += c; n0 += 1 } else { c1 += c; n1 += 1 }
      }
      (BigInt(c0) * n1 - BigInt(c1) * n0).abs
    }
    val obs = stat(u => (u % 2).toInt)
    assert(BigInt(r.getLong(5)) === obs)
    val nGe = (1 to 128).count { p =>
      stat(u => if (md5u32(s"perm:$p:$u") < 2147483648L) 0 else 1) >= obs
    }
    assert(r.getLong(6) === nGe.toLong)
    assert(r.getLong(7) === (1L + nGe) * 1000000L / 129L)
    assert(r.getLong(7) > 0 && r.getLong(7) <= 1000000L)
  }

  test("markov attribution equals a raw-event JVM replay; removal only hurts") {
    val got = Inference.qMarkovAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_id", "event_type", "ts div 1000 as ts_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1).values
      .map(_.sortBy(e => (e._4, e._2)).map(_._3).toSeq)
    val trans = byUser.flatMap(s => s.zip(s.tail)).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val outN = trans.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val pppm = trans.map { case ((a, b), n) =>
      (a, b) -> n * 1000000L / outN(a)
    }
    val starts = byUser.map(_.head).toSeq.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val nUsers = starts.values.sum
    val states = (trans.keys.flatMap(k => Seq(k._1, k._2)) ++
      starts.keys).toSeq.distinct.sorted
    def hit(removed: Option[String]): Map[String, Long] = {
      var h = states.map(s =>
        s -> (if (s == "purchase") 1000000L else 0L)).toMap
      for (_ <- 1 to 8) {
        h = states.map { s =>
          if (s == "purchase") s -> 1000000L
          else if (removed.contains(s)) s -> 0L
          else s -> (pppm.collect { case ((a, b), p) if a == s =>
            p * h(b)
          }.sum / 1000000L)
        }.toMap
      }
      h
    }
    def overall(removed: Option[String]): Long = {
      val h = hit(removed)
      starts.map { case (s, n) =>
        n * (if (removed.contains(s)) 0L else h.getOrElse(s, 0L))
      }.sum / nUsers
    }
    val pf = overall(None)
    val effs = states.filter(_ != "purchase")
      .map(c => (c, pf - overall(Some(c))))
    val tot = effs.map(e => math.max(e._2, 0L)).sum
    val want = effs.map { case (c, eff) =>
      c -> ((pf, pf - eff, eff,
        if (tot == 0) 0L else math.max(eff, 0L) * 1000000L / tot))
    }.toMap
    assert(got === want)
    got.values.foreach { case (full, removed, eff, att) =>
      assert(removed <= full, "removal can only reduce conversion reach")
      assert(eff >= 0 && att <= 1000000L)
    }
    assert(got.values.map(_._4).sum > 900000L,
      "attribution shares should nearly exhaust 1e6")
  }

  test("sprt walk equals a JVM replay; decision freezes at first crossing") {
    val got = Inference.qSprt(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).sortBy(_._1)
    val w1 = math.floor(math.log(0.5 / 0.4) * 1e6).toLong
    val w0 = math.floor(math.log(0.5 / 0.6) * 1e6).toLong
    val a = math.floor(math.log(0.95 / 0.05) * 1e6).toLong
    val users = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "ts div 1000 div 3600000000 as hour",
        """case when event_type = 'purchase' and value > 120.0
          | then 1 else 0 end as conv""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    val perUser = users.groupBy(_._1).toSeq.map { case (_, es) =>
      (es.map(_._2).min, es.map(_._3).max)
    }
    val hourly = perUser.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (h, xs) => (h, xs.length.toLong, xs.map(_._2).sum)
    }
    var cum = 0L
    val walk = hourly.map { case (h, n, c) =>
      val llr = c * w1 + (n - c) * w0
      cum += llr
      (h, n, c, llr, cum)
    }
    val crossIdx = walk.indexWhere(x => x._5 >= a || x._5 <= -a)
    val want = walk.zipWithIndex.map { case ((h, n, c, llr, cm), i) =>
      val dec =
        if (crossIdx < 0 || i < crossIdx) "continue"
        else if (walk(crossIdx)._5 >= a) "accept_h1" else "accept_h0"
      (h, n, c, llr, cm, dec)
    }
    assert(got.toSeq === want)
    // sequential semantics: once not-continue, never continue again
    val decs = got.map(_._6)
    assert(!decs.dropWhile(_ == "continue").contains("continue"),
      "decision must freeze after the first crossing")
  }

  test("shapley attribution: efficiency identity exact, dominates nothing unfairly") {
    val raw = Inference.qShapleyAttribution(spark, dir)
    // schema is FIXED whatever the channel universe: the k! scale is a
    // column, never a column NAME
    assert(raw.columns.toSeq === Seq("channel", "v_full_ppm",
      "k_factorial", "phi_xkf_ppm", "phi_ppm"))
    val got = raw.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got.length === 4)
    assert(raw.collect().forall(_.getLong(2) === 24L), "k=4 -> k!=24")
    val vFull = got.head._2
    assert(got.forall(_._2 == vFull), "v(C) must be one scalar")
    // efficiency: sum of x24 Shapley values telescopes EXACTLY to
    // 24*(v(C) - v(empty)) whatever the truncated coalition values are;
    // v(empty) = reach with every channel removed — recompute it via
    // the removal operator's building blocks: only purchase-starters
    // convert, so v(empty) = n_purchase_starts*1e6 / n_users
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_id", "event_type", "ts div 1000 as ts_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val firsts = ev.groupBy(_._1).values
      .map(_.minBy(e => (e._4, e._2))._3).toSeq
    val vEmpty = firsts.count(_ == "purchase").toLong * 1000000L /
      firsts.length
    assert(got.map(_._3).sum === 24L * (vFull - vEmpty),
      "Shapley efficiency identity must hold exactly in x24 units")
    got.foreach { case (c, _, phiX24, phi) =>
      assert(phiX24 >= 0, s"$c negative marginal sum")
      assert(phi === phiX24 / 24, s"$c phi_ppm division")
    }
  }

  test("isotonic fit is monotone and tracks the exact rational PAV") {
    val rows = Inference.qIsotonic(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._1)
    val iso = rows.map(_._4)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      "isotonic fit must be non-decreasing")
    // exact-rational PAV via the classic pooling stack; the minimax
    // fixed-point fit must sit within one 1e-12 quantum of it
    val stack = scala.collection.mutable.Buffer[(BigInt, BigInt)]()
    rows.foreach { case (_, n, s, _) =>
      var (cs, cn) = (BigInt(s), BigInt(n))
      while (stack.nonEmpty &&
        stack.last._1 * cn >= cs * stack.last._2) {
        val (ps, pn) = stack.remove(stack.length - 1)
        cs += ps; cn += pn
      }
      stack += ((cs, cn))
    }
    // expand blocks back to per-bin fitted values
    val fitted = scala.collection.mutable.Buffer[(BigInt, BigInt)]()
    var bi = 0
    stack.foreach { case (s, n) =>
      var acc = BigInt(0)
      while (acc < n) { acc += rows(bi)._2; fitted += ((s, n)); bi += 1 }
    }
    assert(fitted.length === rows.length)
    rows.zip(fitted).foreach { case ((bin, _, _, isoFp), (s, n)) =>
      val exact = s * BigInt(1000000000000L) / n
      assert((BigInt(isoFp) - exact).abs <= 1,
        s"bin $bin: iso_fp $isoFp vs rational PAV $exact")
    }
  }

  test("conformal: exact quantile replay, coverage near nominal") {
    val rows = Inference.qConformal(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val li = Tables.load(spark, dir, "lineitem")
      .selectExpr("l_returnflag", "l_orderkey", "l_partkey",
        "cast(floor(l_extendedprice * 100 + 0.5) as long) as cents",
        "cast(l_quantity as long) as qty").collect()
    val retail = Tables.load(spark, dir, "part")
      .selectExpr("p_partkey",
        "cast(floor(p_retailprice * 100 + 0.5) as long) as rc")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val res = li.map { r =>
      (r.getString(0), r.getLong(1) % 2,
        math.abs(r.getLong(3) / r.getLong(4) - retail(r.getLong(2))))
    }
    rows.foreach { case (grp, (nCal, mRank, qhat, nTest, nCov, covPpm)) =>
      val cal = res.filter(x => x._1 == grp && x._2 == 1).map(_._3).sorted
      assert(nCal === cal.length.toLong)
      assert(mRank === (9 * cal.length + 18L) / 10)
      assert(qhat === cal((mRank - 1).toInt), s"qhat of $grp")
      val test = res.filter(x => x._1 == grp && x._2 == 0).map(_._3)
      assert(nTest === test.length.toLong)
      assert(nCov === test.count(_ <= qhat).toLong)
      assert(covPpm === nCov * 1000000L / nTest)
      assert(covPpm >= 850000L,
        s"coverage of $grp far below the 90% design point: $covPpm")
    }
  }
}
