package graft.crack

import graft.SparkSpec

/** Known-answer vectors from FIXTURES.md §1 (reference query parity:
  * `request.c` / `worker.c:41-56,84`). */
class CrackSpec extends SparkSpec {

  test("len=2: domain min / max / early / X1-wrap-regression vectors") {
    assert(CrackQuery.crack(spark, "e0c9035898dd52fc65c41454cec9c4d2611bfb37", 2)
      === Some("aa"))
    assert(CrackQuery.crack(spark, "d7dacae2c968388960bf8970080a980ed5c5dcb7", 2)
      === Some("zz"))
    assert(CrackQuery.crack(spark, "da23614e02469a0d7c7bd1bdab5c9c474b1904dc", 2)
      === Some("ab"))
    // with 10 partitions the reference's last worker wrapped and never
    // terminated; our exact tiling must still find "ad"
    assert(CrackQuery.crack(spark, "4aeb195cd69ed93520b9b4129636264e0cdc0153", 2,
      parallelism = 10) === Some("ad"))
  }

  test("len=4: found (min, max, middle, word) and not-found") {
    assert(CrackQuery.crack(spark, "70c881d4a26984ddce795f6f71817c9cf4480e79", 4)
      === Some("aaaa"))
    assert(CrackQuery.crack(spark, "cb990257247b592eaaed54b84b32d96b7904fd95", 4)
      === Some("zzzz"))
    assert(CrackQuery.crack(spark, "81fe8bfe87576c3ecb22426f8e57847382917acf", 4)
      === Some("abcd"))
    assert(CrackQuery.crack(spark, "a94a8fe5ccb19ba61c4c0873d391e987982fbbd3", 4)
      === Some("test"))
    // sha1("1234") has no [a-z]^4 preimage → "x"
    assert(CrackQuery.crack(spark, "7110eda4d09e062aa5e4a390b0a572ac0d2c0220", 4)
      === None)
  }

  test("fused sha1 kernel == generic sha1(num_to_pass) pipeline on full len-3 domain") {
    import org.apache.spark.sql.functions._
    // every ordinal where the fused kernel fires must be exactly the set
    // the generic pipeline finds, for several targets incl. no-match
    val targets = Seq(
      "a9993e364706816aba3e25717850c26c9cd0d89d", // sha1("abc")
      "d0be2dc421be4fcd0172e5afceea3970e2f3d940", // sha1("apple") — len 5, no len-3 match
      "29abf2a2bcc77a2b1f9a9a0a0c5113cfc4cd3b58") // arbitrary
    targets.foreach { hex =>
      val generic = spark.range(0, 17576)
        .select(graft.functions.num_to_pass(col("id"), 3).as("pass"))
        .filter(sha1(col("pass")) === lit(hex))
        .collect().map(_.getString(0)).toSet
      val fused = CrackQuery.matches(spark, hex, 3)
        .collect().map(_.getString(0)).toSet
      assert(fused === generic, hex)
    }
  }

  test("parallelism edge cases: 1, 11, more partitions than keys") {
    assert(CrackQuery.crack(spark, "da23614e02469a0d7c7bd1bdab5c9c474b1904dc", 2,
      parallelism = 1) === Some("ab"))
    assert(CrackQuery.crack(spark, "da23614e02469a0d7c7bd1bdab5c9c474b1904dc", 2,
      parallelism = 11) === Some("ab"))
    assert(CrackQuery.crack(spark, "86f7e437faa5a7fce15d1ddcb9eaeaea377667b8", 1,
      parallelism = 100) === Some("a"))
  }

  test("chunkedCrack: early exit finds answer without scanning later chunks") {
    assert(CrackQuery.chunkedCrack(spark,
      "81fe8bfe87576c3ecb22426f8e57847382917acf", 4, chunkSize = 32768)
      === Some("abcd"))
    assert(CrackQuery.chunkedCrack(spark,
      "7110eda4d09e062aa5e4a390b0a572ac0d2c0220", 4, chunkSize = 200000)
      === None)
  }

  test("cancellingScan: early hit cancels sibling tasks (launched < tiles)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskStart}
    // sha1("aaaaa") — ordinal 0, so tile 0 hits instantly while 255 other
    // tiles are queued behind local[4]'s cores
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val hash = md.digest("aaaaa".getBytes).map("%02x".format(_)).mkString
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val counter = new SparkListener {
      override def onTaskStart(ts: SparkListenerTaskStart): Unit =
        started.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(counter)
    try {
      val (lo, hi) = graft.keyspace.Keyspace.fullRange(5)
      assert(CrackQuery.cancellingScan(spark, hash, 5, lo, hi,
        parallelism = 256) === Some("aaaaa"))
      // listener bus is async — wait for the count to settle
      val deadline = System.nanoTime() + 5_000_000_000L
      var last = -1
      while (System.nanoTime() < deadline && started.get() != last) {
        last = started.get()
        Thread.sleep(100)
      }
      assert(started.get() < 256,
        s"cancel-on-hit must keep queued tiles from launching, started=${started.get()}")
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  test("len-6 throughput gate: fused kernel sustains the per-core floor") {
    // pins the fused-kernel claim (CrackQuery.scaladoc: no per-candidate
    // string/hex/digest allocation) against regression: a full 26^6 ≈
    // 309M-ordinal scan through chunkedCrack, timed. The floor is
    // per-core so the same gate holds at local[4] (suite) and local[32]
    // (bench box); an all-zeros digest has no preimage, so every chunk
    // scans to completion — the clean full-throughput measurement.
    val cores = spark.sparkContext.defaultParallelism
    val keyspace = graft.keyspace.Keyspace.size(6)
    assert(keyspace === 308915776L)
    def measure(): Double = {
      val t0 = System.nanoTime()
      val hit = CrackQuery.chunkedCrack(spark, "0" * 40, 6, parallelism = cores)
      val secs = (System.nanoTime() - t0) / 1e9
      assert(hit.isEmpty)
      val rate = keyspace / secs
      info(f"len-6 full scan: $secs%.1f s, ${rate / 1e6}%.1f M SHA-1/s on $cores cores")
      rate
    }
    // measured 30-32 M/s at local[4]; a fallback to per-candidate
    // allocation (~2× slower, see the kernel-equivalence case) lands
    // ~15 M/s — the 20 M floor trips on that regression with 1.5×
    // headroom, and holds a fortiori at local[32]. A wall-clock gate on
    // a shared box can lose to transient load, so one below-floor run
    // earns one re-measure, and a second below-floor run is judged
    // RELATIVE to the box: raw JDK SHA-1 over the same 6-byte messages,
    // run at the SAME parallelism (so SMT sharing and external load
    // depress kernel and yardstick together), is the box-speed
    // calibration; the guarded regression halves the KERNEL rate but
    // not the yardstick, so the aggregate ratio still trips. Healthy
    // ratio measures 0.69-0.88 (this box loaded and unloaded); the
    // allocation fallback lands ~0.41; the floor is 0.55.
    def calibrationRate(): Double = {
      val perThread = 4000000
      val total = new java.util.concurrent.atomic.AtomicLong()
      val t0 = System.nanoTime()
      val threads = (0 until cores).map { _ =>
        new Thread(() => {
          val md = java.security.MessageDigest.getInstance("SHA-1")
          val buf = new Array[Byte](6)
          val out = new Array[Byte](20)
          var i = 0
          while (i < perThread) {
            buf(0) = (i & 0x1f).toByte
            md.update(buf, 0, 6)
            md.digest(out, 0, 20)
            i += 1
          }
          total.addAndGet(perThread.toLong)
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      total.get() / ((System.nanoTime() - t0) / 1e9)
    }
    val rate = { val r1 = measure(); if (r1 >= 20e6) r1 else measure() }
    if (rate < 20e6) {
      val cal = calibrationRate()
      val ratio = rate / cal
      info(f"below absolute floor; calibration ${cal / 1e6}%.1f M/s " +
        f"aggregate on $cores threads, ratio $ratio%.2f")
      assert(ratio >= 0.55,
        f"aggregate ${rate / 1e6}%.1f M SHA-1/s AND calibrated ratio " +
          f"$ratio%.2f below the floor — kernel regression, not box load")
    }
  }

  test("cancellingScan: miss scans everything and returns None") {
    // "1234"'s sha1 has no len-2 preimage
    assert(CrackQuery.cancellingScan(spark,
      "7110eda4d09e062aa5e4a390b0a572ac0d2c0220", 2, 0L, 675L,
      parallelism = 8) === None)
  }

  test("crackMany: batch of hashes in one scan (fused == broadcast join)") {
    val hashes = Seq(
      "81fe8bfe87576c3ecb22426f8e57847382917acf", // abcd
      "a94a8fe5ccb19ba61c4c0873d391e987982fbbd3", // test
      "7110eda4d09e062aa5e4a390b0a572ac0d2c0220"  // not found
    )
    val expected = Map(
      "81fe8bfe87576c3ecb22426f8e57847382917acf" -> "abcd",
      "a94a8fe5ccb19ba61c4c0873d391e987982fbbd3" -> "test")
    val fused = CrackQuery.crackMany(spark, hashes, 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val joined = CrackQuery.crackManyJoin(spark, hashes, 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fused === expected)
    assert(joined === expected)
    // empty batch: normal empty result; malformed hex: loud plan-time error
    assert(CrackQuery.crackMany(spark, Nil, 4).count() === 0)
    intercept[IllegalArgumentException] {
      CrackQuery.crackMany(spark, Seq("zz" * 20), 4)
    }
  }

  test("sha1_multi_ordinal_match via SQL with an array literal") {
    graft.functions.registerAll(spark)
    val rows = spark.sql(
      """SELECT id, sha1_multi_ordinal_match(id, 3,
        |  array('a9993e364706816aba3e25717850c26c9cd0d89d')) AS slot
        |FROM range(0, 17576)""".stripMargin)
      .where("slot >= 0").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(28L)) // "abc"
  }

  test("crack() SQL table function: found, not-found, and composability") {
    graft.functions.registerAll(spark)
    // found: the reference's `./request <hash> 4` as one SQL statement
    val found = spark.sql(
      "SELECT * FROM crack('81fe8bfe87576c3ecb22426f8e57847382917acf', 4)")
      .collect()
    assert(found.map(_.getString(0)).toSeq === Seq("abcd"))
    // not-found: sha1("1234") has no [a-z]^4 preimage → empty, ≅ "x"
    val miss = spark.sql(
      "SELECT * FROM crack('7110eda4d09e062aa5e4a390b0a572ac0d2c0220', 4)")
    assert(miss.count() === 0)
    assert(miss.schema.fieldNames.toSeq === Seq("pass"))
    // a TABLE function composes like any relation (joins, filters, CTEs)
    val composed = spark.sql(
      """SELECT upper(pass) AS up
        |FROM crack('81fe8bfe87576c3ecb22426f8e57847382917acf', 4, 8)
        |WHERE pass LIKE 'a%'""".stripMargin).collect()
    assert(composed.map(_.getString(0)).toSeq === Seq("ABCD"))
    // malformed hex is a loud analysis-time error, not an empty result
    intercept[Exception] {
      spark.sql("SELECT * FROM crack('zz', 4)").collect()
    }
  }

  test("crack_candidates() SQL table function: the S1 keyspace scan in SQL") {
    graft.functions.registerAll(spark)
    val rows = spark.sql(
      """SELECT count(*) AS n, min(pass) AS lo, max(pass) AS hi
        |FROM crack_candidates(2)""".stripMargin).collect()(0)
    assert(rows.getLong(0) === 676L)
    assert(rows.getString(1) === "aa")
    assert(rows.getString(2) === "zz")
    // the reference's whole query, composed from the SQL pieces alone
    val sqlCrack = spark.sql(
      """SELECT pass FROM crack_candidates(3)
        |WHERE sha1(pass) = 'a9993e364706816aba3e25717850c26c9cd0d89d'""".stripMargin)
      .collect()
    assert(sqlCrack.map(_.getString(0)).toSeq === Seq("abc"))
  }
}
