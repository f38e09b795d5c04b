package graft.relational

import java.security.MessageDigest

import graft.SparkSpec

/** Skyline + deterministic-sketch operators vs exact JVM replays. */
class SketchesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("skyline equals the quadratic dominance replay; frontier is an antichain") {
    val parts = Tables.load(spark, dir, "part")
      .selectExpr("p_partkey", "p_brand",
        "cast(floor(p_retailprice * 100 + 0.5) as bigint) as cents",
        "cast(p_size as bigint) as sz")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = parts.filter { case (_, b, c, s) =>
      !parts.exists { case (_, b2, c2, s2) =>
        b2 == b && c2 <= c && s2 >= s && (c2 < c || s2 > s)
      }
    }.map(_._1).toSet
    val got = Skyline.qSkyline(spark, dir).collect().map(_.getLong(0)).toSet
    assert(got === want)
    // antichain: no frontier point dominates another within a brand
    val pts = Skyline.qSkyline(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).distinct
    pts.foreach { case (b, c, s) =>
      assert(!pts.exists { case (b2, c2, s2) =>
        b2 == b && c2 <= c && s2 >= s && (c2 < c || s2 > s)
      })
    }
  }

  test("HLL estimate is accurate in the linear-counting regime and merge-stable") {
    val rows = Sketches.qHllDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, exact, est) =>
      // 15 distinct users, m=256 → linear counting; |err| well under 20%
      assert(math.abs(est - exact) <= 0.2 * exact,
        s"$t: est $est too far from exact $exact")
    }
    // register build is deterministic: a second run is bit-identical
    val again = Sketches.qHllDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(again.sortBy(_._1).toSeq === rows.sortBy(_._1).toSeq)
  }

  test("audience overlap equals a JVM register-algebra replay") {
    import graft.streaming.StreamingSketch.{estimate, register}
    val ev = Tables.load(spark, dir, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val regs: Map[String, Array[Byte]] = ev.groupBy(_._1).view.mapValues { rows =>
      val mj = Array.fill[Byte](256)(0)
      rows.foreach { case (_, u) =>
        val (b, r) = register(u)
        if (r > mj(b)) mj(b) = r
      }
      mj
    }.toMap
    def est(a: Array[Byte]): Double =
      // unrounded variant of the streaming replay's formula
      {
        val zs = a.map(m => BigInt(1) << (61 - m)).sum
        val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
          2305843009213693952.0 / BigDecimal(zs).toDouble
        val v0 = a.count(_ == 0)
        if (raw <= 640.0 && v0 > 0) 256.0 * math.log(256.0 / v0) else raw
      }
    def r2(d: Double): Double =
      BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byType = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = byType.keySet.toSeq.sorted
    val want = (for {
      a <- types; b <- types if a < b
      u = regs(a).zip(regs(b)).map { case (x, y) => if (x > y) x else y }
    } yield (a, b) -> ((byType(a).intersect(byType(b)).size.toLong,
      r2(est(u)), r2(est(regs(a)) + est(regs(b)) - est(u))))).toMap
    // pairs drive the join now: every type pair surfaces, n_both
    // coalesced to 0 for disjoint audiences (the replay covers all
    // pairs, so equality also pins that contract)
    val got = Sketches.qAudienceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(4), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("hll blob functions work from the SQL surface and match the sparse path") {
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .createOrReplaceTempView("ev_sql")
    // same registers as Sketches.hllRegister, built in pure SQL through
    // the registered native functions (the cluster-deployment surface)
    val viaSql = spark.sql(
      """WITH r AS (SELECT event_type,
        |    cast(conv(substring(md5(concat('hll:', cast(user_id as string))), 1, 2), 16, 10) as int) AS bucket,
        |    cast(conv(substring(md5(concat('hll:', cast(user_id as string))), 3, 15), 16, 10) as bigint) AS v
        |  FROM ev_sql),
        |s1 AS (SELECT event_type, bucket, v | shiftright(v,1) AS x FROM r),
        |s2 AS (SELECT event_type, bucket, x | shiftright(x,2) AS x FROM s1),
        |s3 AS (SELECT event_type, bucket, x | shiftright(x,4) AS x FROM s2),
        |s4 AS (SELECT event_type, bucket, x | shiftright(x,8) AS x FROM s3),
        |s5 AS (SELECT event_type, bucket, x | shiftright(x,16) AS x FROM s4),
        |s6 AS (SELECT event_type, bucket, x | shiftright(x,32) AS x FROM s5),
        |s AS (SELECT event_type, bucket, 61 - bit_count(x) AS rho FROM s6),
        |b AS (SELECT event_type, hll_merge(hll_seed_blob(bucket, rho)) AS blob
        |  FROM s GROUP BY 1)
        |SELECT event_type, hll_blob_zs(blob) AS zs, hll_blob_zeros(blob) AS v0
        |FROM b""".stripMargin)
      .collect().map(r => r.getString(0) ->
        ((r.getDecimal(1).toBigInteger, r.getInt(2)))).toMap
    val sparse = Sketches.qHllDistinct(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // reassemble the estimate from the SQL blob stats and compare
    viaSql.foreach { case (t, (zs, v0)) =>
      val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
        2305843009213693952.0 / BigDecimal(zs).toDouble
      val est = if (raw <= 640.0 && v0 > 0) 256.0 * math.log(256.0 / v0) else raw
      val r2 = BigDecimal(est).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r2 === sparse(t), s"$t")
    }
    assert(viaSql.nonEmpty)
  }

  test("KMV quantile sketch: sample is the hash bottom-k; estimates track exact") {
    val rows = Sketches.qKmvQuantiles(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, nSample, p50, p50e, p95, p95e) =>
      assert(nSample === math.min(256L, n))
      // a 256-row uniform sample of a few-hundred-row population: the
      // rank-selected estimates sit close to the exact quantiles
      assert(math.abs(p50e - p50) <= 0.2 * p50, s"$t p50 $p50e vs $p50")
      assert(math.abs(p95e - p95) <= 0.2 * p95, s"$t p95 $p95e vs $p95")
    }
    // JVM replay of the bottom-k selection itself for one type
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("event_type", "event_id",
        "cast(floor(value * 100 + 0.5) as long) as cents").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 == rows.head._1)
    def md5hexS(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sample = ev.sortBy { case (_, id, _) => (md5hexS(s"kmv:$id"), id) }
      .take(256).map(_._3).sorted
    val n = sample.length
    val p50want = sample((n + 1) / 2 - 1) // smallest r with 2r >= n
    assert(rows.find(_._1 == ev.head._1).get._5 === p50want)
  }

  test("AMS F2 sketch: unbiased self-join-size estimate within 10%") {
    val row = Sketches.qF2Moment(spark, dir).collect().head
    val (nKeys, exact, est) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nKeys > 0 && exact >= nKeys, "F2 >= F0 when every count >= 1")
    // median-of-5 over 1024 signed buckets: rel std ~ sqrt(2/1024) ~ 4%
    assert(math.abs(est - exact) <= 0.10 * exact,
      s"est $est vs exact $exact")
  }

  test("count-min estimates equal a JVM replay of the counters; never undercount") {
    val toks = Tables.load(spark, dir, "documents")
      .selectExpr("explode(split(text, ' ')) as tok")
      .collect().map(_.getString(0))
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def bucket(i: Int, tok: String): Long =
      java.lang.Long.parseLong(md5hex(s"cm$i:$tok").substring(0, 5), 16) % 1024
    val counters = (0 until 4).map { i =>
      exact.toSeq.groupBy { case (t, _) => bucket(i, t) }
        .view.mapValues(_.map(_._2).sum).toMap
    }
    val want = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
      .map { case (t, n) =>
        t -> ((n, (0 until 4).map(i => counters(i)(bucket(i, t))).min))
      }.toMap
    val got = Sketches.qHeavyHitters(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    got.values.foreach { case (n, est) => assert(est >= n) }
  }

  test("sliding HLL: trailing re-merge of per-hour blobs == from-scratch window sketch") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val rows = Sketches.qHllSliding(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // mergeability: the re-merged trailing estimate must equal the
    // sketch built DIRECTLY from the window's raw rows (register merge
    // is associative + idempotent, so window composition is lossless)
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"),
        expr("ts div 1000 div 3600000000").as("hour"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def jvmEst(users: Set[Long]): Double = {
      val regs = Array.fill(256)(0)
      users.foreach { u =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"hll:$u".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val bucket = Integer.parseInt(hex.substring(0, 2), 16)
        val v = java.lang.Long.parseLong(hex.substring(2, 17), 16)
        val rho = 61 - (64 - java.lang.Long.numberOfLeadingZeros(v)).toInt
        if (rho > regs(bucket)) regs(bucket) = rho
      }
      val zs = regs.map(m => BigInt(1) << (61 - m)).sum
      val v0 = regs.count(_ == 0)
      val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
        2305843009213693952.0 / zs.toDouble
      val est = if (raw <= 640.0 && v0 > 0) 256.0 * math.log(256.0 / v0)
        else raw
      math.rint(est * 100) / 100
    }
    rows.take(40).foreach { case (t, h, nExact, est) =>
      val users = ev.filter(e =>
        e._1 == t && e._2 > h - 3 && e._2 <= h).map(_._3).toSet
      assert(users.size.toLong === nExact, s"$t@$h exact")
      assert(jvmEst(users) === est, s"$t@$h merged != from-scratch")
    }
  }
}
