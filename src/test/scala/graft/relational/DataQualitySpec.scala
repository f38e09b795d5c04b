package graft.relational

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fk check: the generated lake is referentially consistent; sizes match") {
    val rows = DataQuality.qFkCheck(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.size === 7)
    rows.values.foreach { case (_, orphans) => assert(orphans === 0L) }
    val nOrders = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey").distinct().count()
    assert(rows("lineitem.orderkey->orders")._1 === nOrders)
  }

  test("fk check flags orphans on a broken child relation") {
    // the operator logic, driven directly: a key set with strangers
    import spark.implicits._
    val child = Seq(1L, 2L, 999L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val orphans = child.join(parent, Seq("k"), "left_anti").count()
    assert(orphans === 1L)
  }

  test("benford census: digit counts partition the rows; chi2 terms replay") {
    val rows = DataQuality.qBenford(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val n = rows.map(_._2).sum
    val nPos = Tables.load(spark, dir, "orders")
      .selectExpr("cast(floor(o_totalprice * 100 + 0.5) as long) as c")
      .filter("c > 0").count()
    assert(n === nPos, "every positive total contributes one digit")
    rows.foreach { case (d, obs, expd, chi2) =>
      assert(d >= 1 && d <= 9)
      val e = n.toDouble * math.log10(1.0 + 1.0 / d)
      def r4(x: Double): Double =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(expd === r4(e))
      assert(chi2 === r4(math.pow(obs.toDouble - e, 2) / e))
    }
  }

  test("gini: zero on a uniform distribution, positive on the corpus") {
    val got = DataQuality.qGini(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, nTypes, nTokens, ppm) =>
      assert(nTypes > 0 && nTokens >= nTypes)
      assert(ppm >= 0L && ppm < 1000000L)
    }
    // JVM replay for one language
    val (lang, _, _, wantPpm) = got.head
    val freqs = Tables.load(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("lang") === lang)
      .selectExpr("explode(split(text, ' ')) as tok").collect()
      .map(_.getString(0)).groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (t, f) => (f, t) }.map(_._2)
    val nT = freqs.length.toLong
    val tot = freqs.sum
    val sif = freqs.zipWithIndex.map { case (f, i) =>
      BigInt(i + 1) * f
    }.sum
    val want = ((BigInt(2) * sif - BigInt(nT + 1) * tot) * 1000000 /
      (BigInt(nT) * tot)).toLong
    assert(wantPpm === want)
  }

  test("schema profile equals a JVM replay on representative columns") {
    val rows = DataQuality.qSchemaProfile(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(rows.size === 11)
    val li = Tables.load(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_extendedprice", "l_returnflag").collect()
    val keys = li.map(_.getLong(0))
    assert(rows("l_orderkey") ===
      ((0L, keys.distinct.length.toLong, keys.min.toString, keys.max.toString)))
    val prices = li.map(_.getDouble(1))
    def cents(d: Double): String = math.floor(d * 100 + 0.5).toLong.toString
    assert(rows("l_extendedprice")._3 === cents(prices.min))
    assert(rows("l_extendedprice")._4 === cents(prices.max))
    val flags = li.map(_.getString(2))
    assert(rows("l_returnflag") ===
      ((0L, flags.distinct.length.toLong, flags.min, flags.max)))
  }

  test("DP counts equal the deterministic Laplace replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val truth = Tables.load(spark, dir, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = DataQuality.qDpCounts(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === truth.keySet)
    truth.foreach { case (tpe, n) =>
      val u = java.lang.Long.parseLong(
        md5hex(s"graft-dp:$tpe").take(13), 16).toDouble / 4503599627370496.0
      val noise = math.floor(-(100.0 / 10) * math.signum(u - 0.5) *
        math.log(math.max(1.0 - 2.0 * math.abs(u - 0.5), 1e-15)) + 0.5)
        .toLong
      assert(got(tpe) === ((n, n + noise, 10L)), s"$tpe")
    }
    // the mechanism actually perturbs: not every type lands on zero noise
    assert(got.exists { case (t, (nt, nn, _)) => nn != nt })
  }

  test("k-anonymity census equals a JVM replay") {
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("event_type", "ts div 3600000000000 as hr",
        "cast(floor(value * 100 + 0.5) as long) as cents", "user_id")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1) % 24, r.getLong(2) / 5000),
        r.getLong(3)))
    val classes = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      (rows.length.toLong, rows.map(_._2).distinct.length.toLong)
    }
    val nRows = classes.map(_._1).sum
    val rowsLt = (k: Long) => classes.filter(_._1 < k).map(_._1).sum
    val Array(row) = DataQuality.qKAnonymity(spark, dir).collect()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5), row.getLong(6), row.getLong(7)) ===
      ((classes.length.toLong, nRows, classes.map(_._1).min,
        classes.map(_._2).min, rowsLt(2), rowsLt(5), rowsLt(10),
        rowsLt(5) * 1000000 / nRows)))
  }

  test("dp quantile: exponential mechanism equals a JVM Gumbel-max replay") {
    val got = DataQuality.qDpQuantile(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Tables.load(spark, dir, "events")
      .selectExpr("event_type",
        "cast(floor(value * 100 + 0.5) as bigint) div 500 as bin")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).map { case (et, rs) =>
      val hist = rs.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val n = rs.length.toLong
      var cum = 0L
      val scored = hist.map { case (bin, c) =>
        cum += c
        val u2 = -math.abs(cum * 2 - n)
        val uu = java.lang.Long.parseLong(
          md5hex(s"graft-dpq:$et:$bin").take(13), 16)
          .toDouble / 4503599627370496.0
        val g = -math.log(-math.log(
          math.min(math.max(uu, 1e-15), 1.0 - 1e-15)))
        (bin, cum, (100 / 100.0) * u2 / 4.0 + g)
      }
      val dpBin = scored.minBy { case (bin, _, s) => (-s, bin) }._1
      val medBin = scored.find(_._2 * 2 >= n).get._1
      et -> ((n, medBin, dpBin, 100L))
    }
    assert(got === want)
    // at eps=100% the mechanism should land near the truth often;
    // gate loosely: picked bin within the observed bin span
    got.foreach { case (et, (_, med, dp, _)) =>
      assert(math.abs(dp - med) <= 50, s"$et picked an absurd bin")
    }
  }
}
