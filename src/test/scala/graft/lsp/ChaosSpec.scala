package graft.lsp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChaosSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("F9 Bernoulli thinning: seeded, rate-accurate, protected rows survive") {
    val log = LspAnalytics.messageLog(spark, dir)
    val total = log.count().toDouble
    val thinned = LspAnalytics.bernoulliThin(log, dropRate = 0.5, seed = 42)
    val kept = thinned.count().toDouble
    assert(math.abs(kept / total - 0.5) < 0.1, s"kept ${kept / total}")
    // seeded → reproducible
    assert(LspAnalytics.bernoulliThin(log, 0.5, 42).count() === kept.toLong)
    // CONN_REQ-protection: 'j' messages never dropped (lsp_common.c:80-91)
    val joins = log.filter(col("payload") === "j").count()
    val protectedThin = LspAnalytics.bernoulliThin(
      log, dropRate = 1.0, seed = 7, protectCol = Some(col("payload") === "j"))
    assert(protectedThin.count() === joins)
  }

  test("T3: retransmit detection counts injected duplicates exactly") {
    val log = LspAnalytics.messageLog(spark, dir)
    val expected = log.filter(col("event_id") % 5 === 0).count()
    val rt = LspAnalytics.qRetransmitDetect(spark, dir)
    assert(rt.agg(sum("n_retransmits")).collect()(0).getLong(0) === expected)
    rt.collect().foreach(r => assert(r.getLong(2) >= 1))
  }

  test("exactly-once delivery under 50% loss + retransmission (chaos stage)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SessionTracker
    import graft.streaming.SessionTracker._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // stop-and-wait sender over a lossy link: each seqnum is retransmitted
    // 1 + (h % 3) times (first loss rate ~ 0.5), and stale retransmits of
    // already-acked seqnums straggle into later batches
    val rng = new scala.util.Random(42)
    val n = 200
    val conns = Seq(1L, 2L, 3L)
    val input = MemoryStream[LspPacket]
    val name = s"chaos_${System.nanoTime()}"
    val q = SessionTracker.eventStream(input.toDS(), epochCnt = 0)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      (1 to n).foreach { s =>
        val batch = conns.flatMap { c =>
          val copies = 1 + rng.nextInt(3)
          Seq.fill(copies)(LspPacket(c, s.toLong, 3)) ++
            (if (s > 1 && rng.nextBoolean())
              Seq(LspPacket(c, rng.nextInt(s - 1).toLong + 1, 3)) // stale straggler
            else Nil)
        }
        input.addData(rng.shuffle(batch))
        if (s % 50 == 0) q.processAllAvailable()
      }
      q.processAllAvailable()
      val events = spark.table(name).as[ConnEvent].collect()
      // EXACTLY-ONCE: every (conn, seqnum) delivered once, in order
      val delivered = events.filter(_.event == Delivered)
      conns.foreach { c =>
        assert(delivered.filter(_.connid == c).map(_.seqnum).toSeq ===
          (1L to n.toLong), s"conn $c")
      }
      // every duplicate surfaced as an observable DUP_DROPPED, none lost
      assert(events.count(_.event == DupDropped) ===
        events.length - delivered.length)
      assert(events.count(_.event == OutOfOrderDropped) === 0)
    } finally q.stop()
  }

  test("chaos at reference scale: drop 0.5, 10k+ datagrams, bridge + micro-batch") {
    // the reference's own echo demo runs DROP_RATE 0.5 (sample_server.c);
    // this drives the FULL pipe — UDP socket → bridge → commit-marked
    // capture batches → DSv2 micro-batch scan → session state machine —
    // at 10k+ datagrams, asserting exactly-once end to end
    import java.nio.file.Files
    import graft.sources.LspSocketBridge
    import graft.streaming.SessionTracker
    import graft.streaming.SessionTracker._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_chaos_scale").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_chaos_scale_ck").toFile.getAbsolutePath
    val bridge = new LspSocketBridge(dir, flushCount = 2048, flushMillis = 100L)
      .start()
    val name = s"chaos_scale_${System.nanoTime()}"
    val packets = spark.readStream.format("graft.sources.LspFrameSource")
      .load(dir)
      .select(col("connid"), col("seqnum"), length(col("payload")).as("payloadLen"))
      .as[LspPacket]
    val q = SessionTracker.eventStream(packets, epochCnt = 0)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val sender = new java.net.DatagramSocket()
    val rng = new scala.util.Random(438)
    var sent = 0L
    try {
      val addr = new java.net.InetSocketAddress(
        java.net.InetAddress.getLoopbackAddress, bridge.localPort)
      def send(c: Long, s: Long): Unit = {
        val frame = LspWire.encode(c, s, Array[Byte]((s % 127).toByte))
        sender.send(new java.net.DatagramPacket(frame, frame.length, addr))
        sent += 1
        // pace below the bridge's drain rate so the kernel buffer never
        // overflows during a capture-flush pause — the sender-side
        // equivalent of LSP's stop-and-wait flow control
        if (sent % 32 == 0) Thread.sleep(1)
      }
      val conns = 1L to 4L
      val n = 1500
      (1 to n).foreach { s =>
        conns.foreach { c =>
          // stop-and-wait over a 0.5-drop link: the sender retransmits
          // until a copy survives the coin flip, so the RECEIVER sees
          // 1 + Geometric(0.5) copies of every seqnum — the same arrival
          // process as receiver-side drops with timeout retransmission
          send(c, s.toLong)
          while (rng.nextBoolean()) send(c, s.toLong)
          // stale straggler: a retransmit of an already-acked seqnum
          // whose ACK the "link" dropped
          if (s > 1 && rng.nextBoolean()) send(c, rng.nextInt(s - 1).toLong + 1)
        }
        if (s % 500 == 0) q.processAllAvailable()
      }
      assert(sent >= 10000L, s"fixture must exercise 10k+ datagrams, sent $sent")
      // drain, with FAITHFUL stop-and-wait recovery: UDP guarantees
      // nothing even on loopback (a kernel-buffer overflow during a
      // flush stall silently drops), and the protocol's answer is the
      // one the reference implements — retransmit whatever was not
      // acknowledged. Each drain round re-sends every (conn, seqnum) not
      // yet DELIVERED; the exactly-once assertions below stay exact
      // because retransmits of delivered seqnums surface as DUP_DROPPED.
      val deadline = System.nanoTime() + 60_000_000_000L
      def deliveredSet() = {
        q.processAllAvailable()
        spark.table(name).as[ConnEvent].collect()
          .filter(_.event == Delivered).map(e => (e.connid, e.seqnum)).toSet
      }
      var have = deliveredSet()
      val want = conns.flatMap(c => (1 to n).map(s => (c, s.toLong))).toSet
      var recovered = false
      while (have.size < want.size && System.nanoTime() < deadline) {
        Thread.sleep(200)
        val still = deliveredSet()
        if (still.size == have.size) { // quiet and incomplete → retransmit
          recovered = true
          // in seqnum order per conn: the in-order gate delivers s only
          // after s-1 (a sweep in set order would trip it on purpose)
          (want -- still).toSeq.sorted.foreach { case (c, s) => send(c, s) }
        }
        have = still
      }
      val evs = spark.table(name).as[ConnEvent].collect()
      val delivered = evs.filter(_.event == Delivered)
      // THE exactly-once property, unconditional: every (conn, seqnum)
      // delivered exactly once, in order — losses were retransmitted,
      // duplicates surfaced as DUP_DROPPED, nothing was doubled
      conns.foreach { c =>
        assert(delivered.filter(_.connid == c).map(_.seqnum).toSeq ===
          (1L to n.toLong), s"conn $c in-order exactly-once delivery")
      }
      assert(evs.forall(e => e.event == Delivered || e.event == DupDropped ||
        e.event == OutOfOrderDropped), "only delivery/drop events")
      if (!recovered) {
        // clean run (the overwhelmingly common case): full datagram
        // accounting holds — every datagram is exactly one event, and
        // nothing ever arrived ahead of its predecessor
        assert(evs.length.toLong === sent, s"sent $sent, got ${evs.length}")
        assert(evs.count(_.event == OutOfOrderDropped) === 0)
      }
      assert(bridge.failure.isEmpty)
    } finally {
      q.stop(); bridge.stop(); sender.close()
    }
  }

  test("multi-length crack finds the only cross-length preimage") {
    val rows = graft.crack.CrackQuery.crackLens(spark,
      "da23614e02469a0d7c7bd1bdab5c9c474b1904dc", Seq(1, 2, 3)).collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq === Seq((2, "ab")))
  }

  test("approximate sketches stay within 5% of exact") {
    import graft.relational.{SqlQueries, Tables}
    val approx = SqlQueries.qSketchRaw(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("users"),
        expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (users, p50)) =>
      val (au, ap50) = approx(k)
      assert(math.abs(au - users).toDouble / users <= 0.05, s"$k users $au vs $users")
      assert(math.abs(ap50 - p50) / math.max(p50, 1.0) <= 0.05, s"$k p50 $ap50 vs $p50")
    }
    // the driver-facing assertion form must hold exactly: ratio 1.0,
    // rank fractions at nominal quantiles
    SqlQueries.qSketchStats(spark, dir).collect().foreach { r =>
      assert(r.getDouble(2) === 1.0, s"${r.getString(0)} users_ratio")
      assert(r.getDouble(3) === 0.5, s"${r.getString(0)} p50_rank")
      assert(r.getDouble(4) === 0.95, s"${r.getString(0)} p95_rank")
    }
  }
}
