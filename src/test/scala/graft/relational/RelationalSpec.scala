package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("driver contract: entry() returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract: every oracleSql key has a queries entry") {
    val q = graft.SparkEntry.queries.keySet
    val missing = graft.SparkEntry.oracleSql.keySet.diff(q)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries execute and most return rows at sf0.001") {
    val counts = graft.SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dir).count()
    }
    // legitimately empty at sf0.001: no preimage, no duplicate texts, every
    // nation has suppliers, every customer has orders
    val expectedEmpty =
      Set("q_crack_notfound", "q_dedup_exact", "q_dedup_exact_sql",
        "q_except", "q_anti_join")
    counts.foreach { case (name, n) =>
      if (!expectedEmpty.contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("value clip: exact rank quantiles and census equal a JVM replay") {
    val ev = Tables.load(spark, dir, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = ev.groupBy(_._1).map { case (t, rows) =>
      val vs = rows.map(_._2).sorted
      val n = vs.length.toLong
      val pLo = vs(((n - 1) * 1 / 100).toInt)
      val pHi = vs(((n - 1) * 99 / 100).toInt)
      t -> ((n, pLo, pHi,
        vs.count(_ < pLo).toLong, vs.count(_ > pHi).toLong,
        vs.map(v => math.floor(math.max(math.min(v, pHi), pLo) * 100 + 0.5)
          .toLong).sum))
    }
    val got = EventQueries.qValueClip(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got === want)
    // the census must actually clip something on each side somewhere
    assert(got.values.exists(_._4 > 0) && got.values.exists(_._5 > 0))
  }

  test("quantile bins: decile assignment equals a JVM replay") {
    val ev = Tables.load(spark, dir, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val vs = rows.map(_._2).sorted
      val n = vs.length.toLong
      val bs = (1 to 9).map(k => vs(((n - 1) * (k * 10) / 100).toInt))
      rows.map(_._2).groupBy(v => bs.count(v >= _).toLong).map {
        case (bin, inBin) =>
          (t, bin) -> ((inBin.length.toLong, inBin.min, inBin.max))
      }
    }.toMap
    val got = EventQueries.qQuantileBins(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got === want)
    // per type: counts cover every row and bins are value-ordered
    got.keys.map(_._1).foreach { t =>
      val bins = got.filter(_._1._1 == t).toSeq.sortBy(_._1._2)
      assert(bins.map(_._2._1).sum === ev.count(_._1 == t).toLong)
      bins.sliding(2).foreach {
        case Seq(a, b) => assert(a._2._3 <= b._2._2,
          s"$t bins overlap: ${a._1._2} max > ${b._1._2} min")
        case _ =>
      }
    }
  }

  test("manifest: row digests XOR to a replayable, order-free checksum") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = Observe.qManifest(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "source", "text").collect()
    val want = docs.map { r =>
      java.lang.Long.parseLong(md5hex(
        s"${r.getLong(0)}:${r.getString(1)}:${r.getString(2)}:" +
          md5hex(r.getString(3))).take(15), 16)
    }.reduce(_ ^ _)
    assert(got("documents") === ((docs.length.toLong, want)))
    assert(got.keySet === Set("documents", "embeddings", "events"))
    // XOR commutes: a rerun (different task interleaving) is identical
    val again = Observe.qManifest(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === again)
  }

  test("key skew census equals a JVM replay of the frequency distribution") {
    val counts = Tables.load(spark, dir, "lineitem")
      .groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cs = counts.values.toSeq.sorted
    val (nRows, nKeys, maxC) = (cs.sum, cs.length.toLong, cs.max)
    val top10 = cs.sorted(Ordering[Long].reverse).take(10).sum
    def pct(p: Int): Long = cs(((nKeys - 1) * p / 100).toInt)
    val r = graft.relational.Skew.qKeySkew(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ===
      ((nRows, nKeys, maxC)))
    assert(row.getLong(3) === maxC * 1000000L / nRows)
    assert(row.getLong(4) === top10 * 1000000L / nRows)
    assert((row.getLong(5), row.getLong(6)) === ((pct(50), pct(99))))
  }

  test("as-of join picks the latest prior click, inclusive at ties") {
    import org.apache.spark.sql.functions._
    // data contract backing the DuckDB-ASOF oracle: per-user timestamps
    // are unique, so "the" latest prior click is well-defined on both
    // engines (DuckDB's tie choice among equal build timestamps is
    // unspecified)
    val dupTs = Tables.load(spark, dir, "events")
      .groupBy("user_id", "ts").count().filter(col("count") > 1).count()
    assert(dupTs === 0, "events (user_id, ts) must be unique for ASOF parity")
    val got = EventQueries.qAsofJoin(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3)))))
      .toMap
    // independent naive reference: max-ts click at or before each purchase
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._1)
    ev.filter(_._3 == "purchase").foreach { case (u, id, _, ts) =>
      val want = clicksByUser.getOrElse(u, Array.empty)
        .filter(_._4 <= ts)
        .sortBy(c => (-c._4, -c._2)).headOption
        .map(c => (c._2, ts - c._4))
      assert(got(id) === want, s"purchase $id")
    }
  }

  test("banded interval join equals the naive range-condition join") {
    import org.apache.spark.sql.functions._
    val banded = EventQueries.qIntervalJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
    val naive = ev.filter(col("event_type") === "error").as("e")
      .join(ev.as("f"),
        col("e.user_id") === col("f.user_id") &&
          col("f.ts_us") > col("e.ts_us") &&
          col("f.ts_us") <= col("e.ts_us") + lit(6L * 3600 * 1000000))
      .select(col("e.event_id"), col("f.event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === naive)
    assert(banded.nonEmpty)
  }

  test("session paths cover exactly the >=3-event sessions") {
    val paths = EventQueries.qSessionPaths(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val bigSessions = EventQueries.qEventsSessionize(spark, dir).collect()
      .count(_.getLong(2) >= 3).toLong
    assert(paths.map(_._2).sum === bigSessions)
    paths.foreach { case (p, _) =>
      assert(p.split(">").length === 3, s"malformed path $p")
    }
    assert(paths.nonEmpty)
  }

  test("A/B chi-square equals an exact BigInt replay of the 2x2 test") {
    val ev = Tables.load(spark, dir, "events")
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val conv = ev.groupBy(_._1).map { case (u, rows) =>
      u -> (if (rows.exists(r => r._2 == "purchase" && r._3 > 120.0)) 1L
        else 0L)
    }
    val a = conv.count { case (u, c) => u % 2 == 0 && c == 1 }.toLong
    val b = conv.count { case (u, c) => u % 2 == 0 && c == 0 }.toLong
    val c = conv.count { case (u, cc) => u % 2 == 1 && cc == 1 }.toLong
    val d = conv.count { case (u, cc) => u % 2 == 1 && cc == 0 }.toLong
    val num = BigInt(a + b + c + d) *
      (BigInt(a) * d - BigInt(b) * c) * (BigInt(a) * d - BigInt(b) * c)
    val den = BigInt(a + b) * (c + d) * (a + c) * (b + d)
    val want = num.toDouble / den.toDouble
    val row = EventQueries.qAbTest(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      === ((a, b, c, d)))
    assert(row.getDouble(4) === want)
  }

  test("PSI drift census equals a JVM replay of shares and terms") {
    val ev = Tables.load(spark, dir, "events")
      .select(expr("(ts div 1000) div 3600000000"), col("value"))
      .collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val n = ev.length.toLong
    val hours = ev.map(_._1).groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy(_._1)
    var cum = 0L
    val cutHour = hours.collectFirst {
      case (h, c) if { cum += c; cum >= (n - 1) * 50 / 100 + 1 } => h
    }.get
    val (early, late) = ev.partition(_._1 <= cutHour)
    val evals = early.map(_._2).sorted
    val bounds = (1 to 9).map { k =>
      val kth = ((evals.length - 1).toLong * (k * 10) / 100 + 1).toInt
      evals(kth - 1)
    }
    def bucket(v: Long): Long = bounds.count(v >= _).toLong
    val ne = early.groupBy(e => bucket(e._2)).view.mapValues(_.size.toLong)
    val nl = late.groupBy(e => bucket(e._2)).view.mapValues(_.size.toLong)
    val te = early.length.toLong; val tl = late.length.toLong
    val got = EventQueries.qDriftPsi(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet === (ne.keySet ++ nl.keySet))
    got.foreach { case (bkt, (gNe, gNl, p, q, term)) =>
      assert(gNe === ne.getOrElse(bkt, 0L) && gNl === nl.getOrElse(bkt, 0L))
      assert(p === (gNe + 1) * 1000000L / (te + 10))
      assert(q === (gNl + 1) * 1000000L / (tl + 10))
      val wantTerm = (p - q).toDouble / 1e6 * math.log(p.toDouble / q)
      assert(math.abs(term - wantTerm) < 1e-6, s"bucket $bkt")
    }
  }

  test("Markov transitions equal a JVM replay; mass accounts per prev") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).values.flatMap { rows =>
      val s = rows.sortBy(r => (r._4, r._2)).map(_._3)
      s.zip(s.tail)
    }.toSeq
    val cnt = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = EventQueries.qEventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.size === cnt.size)
    cnt.foreach { case (k, n) =>
      assert(got(k) === ((n, n * 1000000L / out(k._1))), s"pair $k")
    }
    // every non-first event is exactly one transition
    val nUsers = ev.map(_._1).distinct.length
    assert(got.values.map(_._1).sum === ev.length - nUsers)
  }

  test("rolling 3-sigma outliers equal an exact JVM replay") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("event_id"), expr("ts div 1000"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    val want = ev.groupBy(_._1).flatMap { case (_, rows) =>
      val s = rows.sortBy(r => (r._3, r._2))
      s.indices.flatMap { i =>
        val w = s.slice(math.max(0, i - 50), i).map(_._4)
        val n = w.length.toLong
        if (n < 20) None
        else {
          val sum = w.sum; val ss = w.map(c => c * c).sum
          val dev = n * s(i)._4 - sum
          if (dev * dev > 9 * (n * ss - sum * sum))
            Some(s(i)._2 -> ((n, sum, ss))) else None
        }
      }
    }
    val got = EventQueries.qRollingOutliers(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.size === want.size)
    want.foreach { case (id, v) => assert(got(id) === v, s"event $id") }
    assert(got.nonEmpty)
  }

  test("fixed-point EWMA equals a JVM fold over the ordered sequence") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), expr("ts div 1000"), col("event_id"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val cs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      u -> ((cs.length.toLong, cs.tail.foldLeft(cs.head) {
        (acc, c) => (acc * 7 + c) / 8
      }))
    }
    val got = EventQueries.qEwma(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  test("funnel stages equal a JVM replay and shrink monotonically") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    var n1, n2, n3 = 0L
    var gap2, gap3 = 0L
    byUser.values.foreach { rows =>
      val t1 = rows.filter(_._2 == "view").map(_._3).sorted.headOption
      t1.foreach { v =>
        n1 += 1
        val t2 = rows.filter(r => r._2 == "click" && r._3 > v)
          .map(_._3).sorted.headOption
        t2.foreach { c =>
          n2 += 1; gap2 += c - v
          val t3 = rows.filter(r => r._2 == "purchase" && r._3 > c)
            .map(_._3).sorted.headOption
          t3.foreach { p => n3 += 1; gap3 += p - c }
        }
      }
    }
    val got = EventQueries.qFunnel(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === (("view", n1, 0L)))
    assert(got(2L) === (("click", n2, gap2)))
    assert(got(3L) === (("purchase", n3, gap3)))
    assert(n1 >= n2 && n2 >= n3 && n3 > 0)
  }

  test("cohort retention equals a JVM replay; week zero covers all users") {
    val dayUs = 86400000000L
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), expr("(ts div 1000) div " + dayUs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val first = ev.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val want = ev.map { case (u, d) =>
      (first(u) / 7, (d - first(u)) / 7, u)
    }.distinct.groupBy(t => (t._1, t._2)).map { case (k, us) =>
      k -> us.size.toLong
    }
    val got = EventQueries.qRetention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === want)
    // every user lands in their own cohort's week 0
    val week0 = got.filter(_._1._2 == 0L).values.sum
    assert(week0 === first.size.toLong)
  }

  test("trimmed mean equals a sort-based JVM replay and resists outliers") {
    val got = EventQueries.qTrimmedMean(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val rows = Tables.load(spark, dir, "orders")
      .selectExpr("o_orderpriority",
        "cast(floor(o_totalprice * 100 + 0.5) as long) as v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length.toLong
      val kept = sorted.slice((n / 10).toInt, (n - n / 10).toInt)
      g -> ((n, kept.length.toLong,
        (kept.map(BigInt(_)).sum / kept.length).toLong))
    }
    assert(got === want)
    // robustness: the trimmed mean sits within the untrimmed range and
    // every group kept ~80% of its rows
    got.foreach { case (g, (n, k, _)) =>
      assert(k === n - 2 * (n / 10), s"$g trim count")
    }
  }

  test("cohort LTV equals a JVM replay; curves are monotone per cohort") {
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "ts div 1000 div 86400000000 as day",
        "cast(floor(value * 100 + 0.5) as long) as cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d0 = ev.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).min }
    val cells = ev.map { case (u, d, c) =>
      ((d0(u) / 7, (d - d0(u)) / 7), (u, c))
    }
    val nUsers = cells.groupBy(_._1._1).map { case (cw, xs) =>
      cw -> xs.map(_._2._1).distinct.length.toLong
    }
    val spend = cells.groupBy(_._1).map { case (k, xs) =>
      k -> xs.map(_._2._2).sum
    }
    val want = spend.groupBy(_._1._1).flatMap { case (cw, ages) =>
      var cum = 0L
      ages.toSeq.sortBy(_._1._2).map { case ((_, age), c) =>
        cum += c
        (cw, age) -> ((nUsers(cw), cum, cum / nUsers(cw)))
      }
    }
    val got = EventQueries.qCohortLtv(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
    got.groupBy(_._1._1).foreach { case (cw, rows) =>
      val curve = rows.toSeq.sortBy(_._1._2).map(_._2._2)
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
        s"cohort $cw LTV must be monotone")
    }
  }

  test("KM survival equals a JVM replay; exits telescope the risk set") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hz = ev.map(_._3).max
    val obs = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val gaps = sorted.zip(sorted.tail).map { case (a, b) =>
        ((b._3 - a._3) / 3600000000L, true) }
      gaps :+ (((hz - sorted.last._3) / 3600000000L, false))
    }
    var risk = obs.size.toLong
    var surv = 1000000L
    val want = (0L to obs.map(_._1).max).map { k =>
      val d = obs.count(t => t._1 == k && t._2).toLong
      val c = obs.count(t => t._1 == k && !t._2).toLong
      val h = if (risk > 0) 1000000L * d / risk else 0L
      surv = surv * (1000000L - h) / 1000000L
      val row = (k, risk, d, c, h, surv); risk -= d + c; row
    }
    val got = EventQueries.qSurvival(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(got === want)
    // every observation exits exactly once: risk telescopes to zero
    assert(risk === 0L)
    // the fixture actually exercises the hazard path: arrivals exist
    // and the curve strictly decays somewhere
    assert(got.map(_._3).sum > 0L)
    assert(got.last._6 < 1000000L)
    // survival is monotone non-increasing from 1e6, never negative
    got.map(_._6).foldLeft(1000000L) { (p, s) =>
      assert(s <= p && s >= 0L); s
    }
  }

  test("top supplier by exact cents equals a JVM-replay max") {
    val cents = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100
          + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = cents.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(_._2).sum }
    val maxRev = bySupp.values.max
    val want = bySupp.filter(_._2 == maxRev).keySet
    val got = RelationalQueries.q15TopSupplier(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet === want)
    assert(got.values.forall(_ === maxRev))
  }

  test("large orders: every reported order beats the quantity gate") {
    val got = RelationalQueries.q18LargeOrders(spark, dir).collect()
    assert(got.nonEmpty)
    val sums = Tables.load(spark, dir, "lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { r =>
      assert(sums(r.getLong(2)) > 250.0)
      assert(r.getLong(4) === sums(r.getLong(2)).toLong)
    }
    // and no qualifying order is missing
    assert(got.length === sums.count(_._2 > 250.0))
  }

  test("semi + anti join partition the customer set") {
    val all = Tables.load(spark, dir, "customer").count()
    val withOrders = Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "orders"),
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("o_custkey"), "left_semi")
      .count()
    val noOrders = RelationalQueries.qAntiCustomersNoOrders(spark, dir).count()
    assert(withOrders + noOrders === all)
  }

  test("q13: distribution covers every customer; zero bucket holds the unjoined") {
    val rows = RelationalQueries.q13CustDistribution(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = Tables.load(spark, dir, "customer").count()
    assert(rows.values.sum === nCust, "every customer lands in exactly one bucket")
    val urgentCust = Tables.load(spark, dir, "orders")
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    assert(rows.getOrElse(0L, 0L) === nCust - urgentCust,
      "zero bucket = customers with no urgent order (left-outer semantics)")
  }

  test("correlation matrix equals a BigInt-moment JVM replay") {
    val hourly = Tables.load(spark, dir, "events")
      .selectExpr("ts div 3600000000000 as hr", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val types = hourly.keySet.map(_._2).toSeq.sorted
    val hrs = hourly.keySet.map(_._1)
    val h = BigInt(hrs.size)
    def series(t: String): Map[Long, Long] =
      hourly.collect { case ((hr, `t`), n) => hr -> n }
    val want = (for {
      a <- types; b <- types if a < b
      sa = series(a); sb = series(b)
      sx = BigInt(sa.values.sum); sy = BigInt(sb.values.sum)
      sxx = sa.values.map(v => BigInt(v) * v).sum
      syy = sb.values.map(v => BigInt(v) * v).sum
      sxy = sa.keySet.intersect(sb.keySet).toSeq
        .map(k => BigInt(sa(k)) * sb(k)).sum
      cov = h * sxy - sx * sy
    } yield (a, b) -> BigDecimal(
        cov.toDouble / math.sqrt(((h * sxx - sx * sx) * (h * syy - sy * sy)).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    val got = EventQueries.qCorrMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(got === want)
  }

  test("RANGE frame: trailing 6h totals equal an interval-scan replay") {
    val rows = Tables.load(spark, dir, "events")
      .selectExpr("event_type", "event_id", "ts div 1000 as ts_us",
        "cast(floor(value * 100 + 0.5) as long) as cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val win = 6L * 3600 * 1000000
    val want = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.toSeq.map { case (_, id, ts, _) =>
        val inWin = g.filter(e => e._3 >= ts - win && e._3 <= ts)
        id -> ((inWin.length.toLong, inWin.map(_._4).sum))
      }
    }.toMap
    val got = EventQueries.qWindowRange(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(got === want)
  }

  test("target encoding is leave-one-out: own label never leaks in") {
    val got = EventQueries.qTargetEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySeg = got.groupBy(_._2)
    val prior = got.map(_._3).sum / got.length
    got.foreach { case (_, seg, cents, enc) =>
      val g = bySeg(seg)
      val want = (g.map(_._3).sum - cents + 100L * prior) /
        (g.length - 1 + 100L)
      assert(enc === want)
    }
    // leakage check: two same-segment rows with different labels get
    // DIFFERENT encodings (an in-fold mean would give them the same)
    val seg = bySeg.head._2
    val twoLabels = seg.map(_._3).distinct
    if (twoLabels.length >= 2)
      assert(seg.map(_._4).distinct.length >= 2)
  }

  test("KS distance equals a JVM supremum over the union support") {
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("event_type", "cast(floor(value * 100 + 0.5) as long) as c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = EventQueries.qKsTest(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val types = byType.keySet.toSeq.sorted
    assert(got.size === types.combinations(2).size)
    types.combinations(2).foreach { case Seq(a, b) =>
      val (va, vb) = (byType(a), byType(b))
      val (n1, n2) = (va.length.toLong, vb.length.toLong)
      val support = (va ++ vb).distinct.sorted
      val dNum = support.map { v =>
        math.abs(va.count(_ <= v) * n2 - vb.count(_ <= v) * n1)
      }.max
      assert(got((a, b)) === ((n1, n2, dNum, dNum * 1000000L / (n1 * n2))))
    }
  }

  test("Mann-Whitney 2U equals the all-pairs comparison count") {
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("event_type", "cast(floor(value * 100 + 0.5) as long) as c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = EventQueries.qMannWhitney(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val types = byType.keySet.toSeq.sorted
    types.combinations(2).foreach { case Seq(a, b) =>
      val (va, vb) = (byType(a), byType(b))
      // 2U = 2·#{(x,y): x>y} + #{ties} over all cross pairs
      val u2 = va.map(x =>
        2L * vb.count(_ < x) + vb.count(_ == x)).sum
      val n1n2 = va.length.toLong * vb.length
      assert(got((a, b)) ===
        ((va.length.toLong, vb.length.toLong, u2, u2 * 500000L / n1n2)))
    }
  }

  test("CUSUM closed form equals the textbook max(0, C+d) recurrence") {
    val rows = EventQueries.qCusum(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val ordered = g.sortBy(_._2)
      val mu = ordered.map(_._3).sum / ordered.length
      var c = 0L
      ordered.foreach { case (_, _, y, cusum, alarm) =>
        c = math.max(0L, c + (y - mu - mu / 20))
        assert(cusum === c, "closed form == recurrence")
        assert(alarm === (c > mu / 5))
      }
    }
  }

  test("MAD outliers equal an exact JVM rank-select replay") {
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("event_type", "cast(floor(value * 100 + 0.5) as long) as cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def med(vs: Seq[Long]): Long = {
      val s = vs.sorted; s((s.length + 1) / 2 - 1) // smallest r with 2r >= n
    }
    val want = ev.groupBy(_._1).map { case (t, g) =>
      val cents = g.map(_._2).toSeq
      val m = med(cents)
      val adev = cents.map(c => math.abs(c - m))
      val md = med(adev)
      t -> ((cents.length.toLong, m, md,
        adev.count(_ * 10000 > md * 44478).toLong, cents.max))
    }
    val got = EventQueries.qMadOutliers(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got === want)
  }

  test("gap fill: dense spine, zero-filled holes, forward-filled totals") {
    val rows = EventQueries.qGapFill(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val types = rows.map(_._1).distinct
    val hours = rows.map(_._2)
    val span = hours.max - hours.min + 1
    assert(rows.length.toLong === span * types.length, "dense spine")
    // holes exist on this sparse corpus and are zero-filled
    assert(rows.exists(_._3 == 0L))
    // forward fill replay for one type
    val t = types.head
    val perHour = Tables.load(spark, dir, "events")
      .filter(col("event_type") === t)
      .selectExpr("ts div 3600000000000 as hr",
        "cast(floor(value * 100 + 0.5) as long) as cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    var ff = 0L
    rows.filter(_._1 == t).sortBy(_._2).foreach { case (_, hr, n, cf) =>
      perHour.get(hr).foreach { case (_, sum) => ff = sum }
      assert(cf === ff, s"hr $hr")
      assert(n === perHour.get(hr).map(_._1).getOrElse(0L))
    }
  }

  test("q8: market share ppm is the exact integer quotient; shares bounded") {
    val rows = RelationalQueries.q8MarketShare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nation, total, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nation >= 0 && nation <= total)
      assert(ppm === (BigInt(nation) * 1000000 / BigInt(total)).toLong,
        "ppm is exactly the integer division of cents")
    }
    // region gate is load-bearing: ASIA nations only on the demand side
    val asiaCents = rows.map(_.getLong(2)).sum
    val allRegions = RelationalQueries
      .q8MarketShare(spark, dir, region = "AMERICA")
      .collect().map(_.getLong(2)).sum
    assert(asiaCents != allRegions, "different regions see different demand")
  }

  test("q21: one-pass census equals the naive exists/not-exists replay") {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byOrder = li.groupBy(_._1)
    val want = byOrder.toSeq.flatMap { case (_, rows) =>
      val supps = rows.map(_._2).distinct
      val faulty = rows.filter(_._3 == "R").map(_._2).distinct
      // EXISTS another supplier, NOT EXISTS another faulty supplier
      faulty.filter(s => supps.exists(_ != s) && faulty.forall(_ == s))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = want.toSeq.sortBy { case (s, n) => (-n, s) }.take(20).toMap
    val got = RelationalQueries.q21SoleFaultSupplier(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === top)
  }

  test("Theil-Sen/Mann-Kendall matches a driver-side replay") {
    def floordiv(a: Long, b: Long): Long = (a - (((a % b) + b) % b)) / b
    val daily = graft.relational.Tables.load(spark, dir, "events")
      .select(org.apache.spark.sql.functions.expr("ts div 86400000000000")
        .as("day"), col("event_type"),
        org.apache.spark.sql.functions
          .floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.sum("cents").as("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1))
      .toMap
    val want = daily.map { case (tpe, series) =>
      val pairs = for {
        (di, yi) <- series; (dj, yj) <- series if di < dj
      } yield (di, dj, floordiv((yj - yi) * 1000000L, dj - di),
        java.lang.Long.signum(yj - yi).toLong)
      val sorted = pairs.sortBy(p => (p._3, p._1, p._2))
      val median = sorted((pairs.size + 1) / 2 - 1)._3
      tpe -> ((series.size.toLong, pairs.size.toLong,
        pairs.map(_._4).sum, median))
    }
    val got = EventQueries.qTheilSen(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
    // Mann-Kendall S is bounded by the pair count
    got.values.foreach { case (_, nPairs, s, _) =>
      assert(math.abs(s) <= nPairs)
    }
  }

  test("bot detection flags the metronome and clears the bursty user") {
    import spark.implicits._
    // user 1: perfect 10s metronome (cv^2 = 0); user 2: same mean gap
    // but alternating 1s/19s bursts (cv^2 = 0.81); user 3: too few gaps
    val metronome = (0 until 30).map(i => (1L, i.toLong, i * 10000000L))
    val bursty = (0 until 30).map { i =>
      val us = (i / 2) * 20000000L + (if (i % 2 == 1) 1000000L else 0L)
      (2L, 100L + i, us)
    }
    val sparse = (0 until 5).map(i => (3L, 200L + i, i * 10000000L))
    val got = EventQueries.botDetect(
        (metronome ++ bursty ++ sparse).toDF("user_id", "event_id", "us"),
        minGaps = 20, botCv2Ppm = 100000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getBoolean(4)))).toMap
    assert(!got.contains(3L)) // below the gap floor
    val (n1, cv1, bot1) = got(1L)
    assert(n1 === 29L && cv1 === 0L && bot1, s"metronome $cv1")
    val (n2, cv2, bot2) = got(2L)
    // alternating 1s/19s around a 10s mean: cv^2 = (9/10)^2 = 0.81
    assert(n2 === 29L && !bot2 && cv2 > 700000L, s"bursty $cv2")
  }

  test("contingency and mutual information obey their theoretic bounds") {
    val ct = EventQueries.qContingency(spark, dir).collect().head
    val (nCells, chi2, v) = (ct.getLong(0), ct.getDouble(2), ct.getDouble(3))
    assert(nCells === 35) // 5 event types x 7 weekdays, zero cells kept
    assert(chi2 >= 0.0)
    assert(v >= 0.0 && v <= 1.0)
    val mi = EventQueries.qMutualInfo(spark, dir).collect().head
    val (m, hx, hy, nmi) =
      (mi.getDouble(0), mi.getDouble(1), mi.getDouble(2), mi.getDouble(3))
    // 0 <= MI <= min(H_X, H_Y); entropies bounded by log of cardinality
    assert(m >= 0.0 && m <= math.min(hx, hy) + 1e-9)
    assert(hx > 0 && hx <= math.log(5) + 1e-9)
    assert(hy > 0 && hy <= math.log(24) + 1e-9)
    assert(nmi >= 0.0 && nmi <= 1.0)
  }

  /** Daily revenue in whole dollars per type, replayed on the driver —
    * shared fixture for the parametric-stats specs below. */
  private def dailyDollarsLocal(): Map[String, Seq[Long]] =
    Tables.load(spark, dir, "events")
      .selectExpr("event_type", "ts div 86400000000000 as day",
        "cast(floor(value * 100 + 0.5) as long) as cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum / 100L).toSeq
      .groupBy(_._1._1).view
      .mapValues(_.sortBy(_._1._2).map(_._2)).toMap

  test("Welch t2/nu equal a BigInt replay AND the IEEE formula") {
    val series = dailyDollarsLocal()
    val got = EventQueries.qWelchTtest(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.nonEmpty)
    series.keySet.toSeq.sorted.combinations(2).foreach { case Seq(a, b) =>
      val (ya, yb) = (series(a), series(b))
      val (n1, n2) = (BigInt(ya.length), BigInt(yb.length))
      val (s1, s2) = (BigInt(ya.sum), BigInt(yb.sum))
      val v1 = n1 * ya.map(y => BigInt(y) * y).sum - s1 * s1
      val v2 = n2 * yb.map(y => BigInt(y) * y).sum - s2 * s2
      val md = s1 * n2 - s2 * n1
      val a1 = v1 * n2 * n2 * (n2 - 1)
      val a2 = v2 * n1 * n1 * (n1 - 1)
      val t2 = md * md * (n1 - 1) * (n2 - 1) * 1000000 / (a1 + a2)
      val nu = (a1 + a2) * (a1 + a2) * (n1 - 1) * (n2 - 1) * 10 /
        (a1 * a1 * (n2 - 1) + a2 * a2 * (n1 - 1))
      assert(got((a, b)) ===
        ((n1.toLong, n2.toLong, t2.toLong, nu.toLong)))
      // and the exact rational agrees with the textbook IEEE formula
      val (m1, m2) = (ya.sum.toDouble / ya.length, yb.sum.toDouble / yb.length)
      def svar(ys: Seq[Long], m: Double) =
        ys.map(y => (y - m) * (y - m)).sum / (ys.length - 1.0)
      val se2 = svar(ya, m1) / ya.length + svar(yb, m2) / yb.length
      val t2d = (m1 - m2) * (m1 - m2) / se2
      assert(math.abs(t2.toDouble / 1e6 - t2d) <= 1e-4 * (1 + t2d))
    }
  }

  test("ANOVA F equals a BigInt replay and eta2 the IEEE decomposition") {
    val series = dailyDollarsLocal()
    val Array(row) = EventQueries.qAnova(spark, dir).collect()
    val groups = series.values.toSeq
    val k = BigInt(groups.length)
    val nn = BigInt(groups.map(_.length).sum)
    val t = BigInt(groups.map(_.sum).sum)
    val sstot = groups.flatten.map(y => BigInt(y) * y).sum
    val p = groups.map(g => BigInt(g.length)).product
    val sumS2pn = groups.map(g => BigInt(g.sum) * BigInt(g.sum) *
      (p / g.length)).sum
    val ssbNp = nn * sumS2pn - t * t * p
    val sstNp = (nn * sstot - t * t) * p
    assert(row.getLong(0) === k.toLong)
    assert(row.getLong(1) === nn.toLong)
    assert(row.getLong(2) === (ssbNp * 1000000 / sstNp).toLong)
    assert(row.getLong(3) ===
      (ssbNp * (nn - k) * 1000000 / ((sstNp - ssbNp) * (k - 1))).toLong)
    // IEEE cross-check of the variance decomposition
    val grand = t.toDouble / nn.toDouble
    val ssb = groups.map { g =>
      val m = g.sum.toDouble / g.length
      g.length * (m - grand) * (m - grand)
    }.sum
    val sst = groups.flatten.map(y => (y - grand) * (y - grand)).sum
    assert(math.abs(row.getLong(2).toDouble / 1e6 - ssb / sst) <= 1e-4)
  }

  test("seasonality shares sum to ~1e6 and indices mean-center at ~1e6") {
    val rows = EventQueries.qSeasonality(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).toSet.subsetOf((0L to 6L).toSet))
      // floors lose < 1 ppm per dow row
      val share = g.map(_._5).sum
      assert(share > 1000000L - 7 && share <= 1000000L)
      // n_days-weighted mean of the index is 1e6 up to per-row floors
      val wsum = g.map(r => r._6 * r._3).sum
      val days = g.map(_._3).sum
      assert(math.abs(wsum.toDouble / days - 1e6) < 7)
    }
  }

  test("Holt smoothing equals the floorDiv recurrence replay") {
    val series = Tables.load(spark, dir, "events")
      .selectExpr("event_type", "ts div 86400000000000 as day",
        "cast(floor(value * 100 + 0.5) as long) as cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toSeq
      .groupBy(_._1._1).view
      .mapValues(_.sortBy(_._1._2).map(_._2)).toMap
    val got = EventQueries.qHoltWinters(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === series.keySet.filter(series(_).length >= 2))
    series.filter(_._2.length >= 2).foreach { case (tpe, ys) =>
      var l = ys.head
      var b = 0L
      var sae = 0L
      ys.tail.foreach { y =>
        sae += math.abs(y - (l + b))
        // Java / truncates toward zero — the recurrence's contract
        val l2 = (y + 3 * (l + b)) / 4
        b = (3 * b + l2 - l) / 4
        l = l2
      }
      val n = ys.length.toLong
      assert(got(tpe) === ((n, l, b, l + 7 * b, sae / (n - 1))),
        s"$tpe recurrence")
    }
  }

  test("frequent triples equal the brute-force basket enumeration") {
    val baskets = Tables.load(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val want = baskets.values.toSeq.flatMap { items =>
      items.combinations(3).map(c => (c(0), c(1), c(2)))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2).toMap
    val got = RelationalQueries.qFreqTriples(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got.nonEmpty, "sf0.001 has frequent triples at support 2")
    assert(got === want, "Apriori pruning is lossless")
  }

  test("changepoint equals the brute-force SSE argmin per type") {
    val series = dailyDollarsLocal()
    val got = EventQueries.qChangepoint(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got.size === series.size)
    series.foreach { case (tpe, ys) =>
      val n = ys.length
      // brute force: minimize SSE_left + SSE_right in doubles
      def sse(g: Seq[Long]): Double = {
        val m = g.sum.toDouble / g.length
        g.map(y => (y - m) * (y - m)).sum
      }
      val bestK = (1 until n).minBy(kk =>
        (sse(ys.take(kk)) + sse(ys.drop(kk)), kk))
      val (nDays, splitK, meanL, meanR, gain) = got(tpe)
      assert(nDays === n.toLong)
      assert(splitK === bestK.toLong,
        s"$tpe: argmin split (ties break on smaller k)")
      assert(meanL === ys.take(bestK).sum / bestK)
      assert(meanR === ys.drop(bestK).sum / (n - bestK))
      assert(gain >= -n.toLong, "gain is non-negative up to floor slack")
    }
  }
}
