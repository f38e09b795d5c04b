package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LspFrameSourceSpec extends SparkSpec {

  test("DSv2 round-trip: encode capture files, scan them back in parallel") {
    val dir = Files.createTempDirectory("graft_lsp_frames").toFile.getAbsolutePath
    val src = spark.range(0, 1000)
      .select(col("id").as("connid"), (col("id") * 3 + 1).as("seqnum"),
        concat(lit("payload-"), col("id").cast("string")).cast("binary")
          .as("payload"))
      .repartition(4)
    LspFrameFiles.write(src, dir)
    val back = spark.read.format("graft.sources.LspFrameSource").load(dir)
    assert(back.rdd.getNumPartitions === 4) // one partition per capture file
    assert(back.count() === 1000)
    // a second write continues the batch sequence instead of clobbering
    LspFrameFiles.write(src, dir)
    assert(spark.read.format("graft.sources.LspFrameSource").load(dir)
      .count() === 2000)
    val bad = back
      .filter(col("seqnum") =!= col("connid") * 3 + 1 ||
        col("payload").cast("string") =!=
          concat(lit("payload-"), col("connid").cast("string")))
      .count()
    assert(bad === 0)
  }

  test("batch parts stay invisible until the commit marker lands") {
    val dir = Files.createTempDirectory("graft_lsp_commit").toFile.getAbsolutePath
    // a writer-batch part WITHOUT its marker: a reader must not see it
    // (this is the crash-window state of LspFrameFiles.write)
    val part = new java.io.File(dir, "batch-00000-part-00000.lsp")
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(part))
    val frame = graft.lsp.LspWire.encode(7L, 1L, Array[Byte](1, 2))
    out.writeInt(frame.length); out.write(frame); out.close()
    assert(spark.read.format("graft.sources.LspFrameSource").load(dir)
      .count() === 0)
    // the marker publishes the batch atomically
    new java.io.File(dir, "batch-00000.commit").createNewFile()
    assert(spark.read.format("graft.sources.LspFrameSource").load(dir)
      .count() === 1)
    // a retrying writer clears uncommitted debris and never re-exposes it
    val junk = new java.io.File(dir, "batch-00001-part-00003.lsp")
    junk.createNewFile()
    val src = spark.range(0, 10)
      .select(col("id").as("connid"), lit(1L).as("seqnum"),
        lit(Array[Byte](9)).as("payload"))
      .repartition(2)
    LspFrameFiles.write(src, dir)
    assert(!junk.exists(), "uncommitted leftover part must be cleaned")
    assert(spark.read.format("graft.sources.LspFrameSource").load(dir)
      .count() === 11)
  }

  test("micro-batch stream picks up files appended to the capture dir") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_lsp_stream").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_lsp_ck").toFile.getAbsolutePath
    def capture(name: String, ids: Range): Unit = {
      val f = new java.io.File(dir, name)
      val out = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
      try ids.foreach { i =>
        val b = graft.lsp.LspWire.encode(i.toLong, 1L, Array[Byte](1))
        out.writeInt(b.length); out.write(b)
      } finally out.close()
    }
    capture("a.lsp", 0 until 10)
    val name = s"lspstream_${System.nanoTime()}"
    val q = spark.readStream.format("graft.sources.LspFrameSource").load(dir)
      .select(col("connid"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 10)
      capture("b.lsp", 10 until 25) // arrives later
      q.processAllAvailable()
      assert(spark.table(name).count() === 25)
      assert(spark.table(name).collect().map(_.getLong(0)).toSet ===
        (0L until 25L).toSet)
    } finally q.stop()
  }

  test("seen-file-set offsets pick up a straggler below the name watermark") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_lsp_seen").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_lsp_seen_ck").toFile.getAbsolutePath
    def capture(name: String, ids: Range): Unit = {
      val f = new java.io.File(dir, name)
      val out = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
      try ids.foreach { i =>
        val b = graft.lsp.LspWire.encode(i.toLong, 1L, Array[Byte](1))
        out.writeInt(b.length); out.write(b)
      } finally out.close()
    }
    // the HIGH name arrives first: under the default watermark offsets a
    // later low-named file would be (by documented contract) skipped;
    // offsets=seen must read it anyway
    capture("z.lsp", 0 until 10)
    val name = s"lspseen_${System.nanoTime()}"
    val q = spark.readStream.format("graft.sources.LspFrameSource")
      .option("offsets", "seen").load(dir)
      .select(col("connid"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 10)
      capture("a.lsp", 10 until 25) // straggler: sorts BELOW z.lsp
      q.processAllAvailable()
      assert(spark.table(name).count() === 25,
        "seen-set offsets must not drop the low-named straggler")
      assert(spark.table(name).collect().map(_.getLong(0)).toSet ===
        (0L until 25L).toSet)
      capture("m.lsp", 25 until 30) // and nothing is ever re-read
      q.processAllAvailable()
      assert(spark.table(name).count() === 30)
    } finally q.stop()
    // RESTART from a checkpoint (memory sinks can't recover, so this leg
    // runs a parquet sink): the committed MULTI-FILE offset must
    // deserialize — Spark's offset log is one offset PER LINE, so a
    // newline-bearing serialization corrupts it and dies right here —
    // already-read files must not replay, and new files still arrive
    val ckpt2 = Files.createTempDirectory("graft_lsp_seen_ck2").toFile.getAbsolutePath
    val sink = Files.createTempDirectory("graft_lsp_seen_out").toFile.getAbsolutePath
    def startFileSink() = spark.readStream
      .format("graft.sources.LspFrameSource")
      .option("offsets", "seen").load(dir)
      .select(col("connid"))
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt2)
      .outputMode("append").start()
    val q2 = startFileSink()
    try { q2.processAllAvailable() } finally q2.stop() // reads all 3 files
    assert(spark.read.parquet(sink).count() === 30)
    capture("b.lsp", 30 until 34)
    val q3 = startFileSink() // recovers the 3-name offset from ckpt2
    try { q3.processAllAvailable() } finally q3.stop()
    val all = spark.read.parquet(sink).collect().map(_.getLong(0))
    assert(all.length === 34, "restart must read ONLY the new file")
    assert(all.toSet === (0L until 34L).toSet)
  }

  test("seen offsets are monotone: a deleted-then-recreated name is not re-read") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_lsp_mono").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_lsp_mono_ck").toFile.getAbsolutePath
    val sink = Files.createTempDirectory("graft_lsp_mono_out").toFile.getAbsolutePath
    def capture(name: String, ids: Range): Unit = {
      val f = new java.io.File(dir, name)
      val out = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
      try ids.foreach { i =>
        val b = graft.lsp.LspWire.encode(i.toLong, 1L, Array[Byte](1))
        out.writeInt(b.length); out.write(b)
      } finally out.close()
    }
    def startFileSink() = spark.readStream
      .format("graft.sources.LspFrameSource")
      .option("offsets", "seen").load(dir)
      .select(col("connid"))
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    capture("a.lsp", 0 until 10)
    val q = startFileSink()
    try {
      q.processAllAvailable()
      // retention/compaction removes the processed file, then a rewrite
      // re-creates the NAME with different content: rebuilding the offset
      // from the listing alone would forget "a.lsp" and read it again
      assert(new java.io.File(dir, "a.lsp").delete())
      capture("a.lsp", 100 until 110)
      capture("b.lsp", 10 until 15)
      q.processAllAvailable()
      val live = spark.read.parquet(sink).collect().map(_.getLong(0))
      assert(live.length === 15, s"recreated name re-read: ${live.length} rows")
      assert(live.toSet === (0L until 15L).toSet)
    } finally q.stop()
    // same property across a RESTART: the committed offset (which still
    // carries a.lsp) must survive even though the file vanished again
    assert(new java.io.File(dir, "a.lsp").delete())
    capture("a.lsp", 200 until 220)
    capture("c.lsp", 15 until 18)
    val q2 = startFileSink()
    try { q2.processAllAvailable() } finally q2.stop()
    val all = spark.read.parquet(sink).collect().map(_.getLong(0))
    assert(all.length === 18, s"restart re-read a committed name: ${all.length}")
    assert(all.toSet === (0L until 18L).toSet)
  }

  test("socket bridge: live datagrams reach a running stream exactly once") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_lsp_bridge").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_lsp_bridge_ck").toFile.getAbsolutePath
    val bridge = new LspSocketBridge(dir, flushCount = 16, flushMillis = 40L)
      .start()
    val name = s"lspbridge_${System.nanoTime()}"
    val q = spark.readStream.format("graft.sources.LspFrameSource").load(dir)
      .select(col("connid"), col("seqnum"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val sender = new java.net.DatagramSocket()
    try {
      val addr = new java.net.InetSocketAddress(
        java.net.InetAddress.getLoopbackAddress, bridge.localPort)
      // send while the stream runs — batches land concurrently with reads
      (0 until 100).foreach { i =>
        val frame = graft.lsp.LspWire.encode(i.toLong, (i * 7 + 1).toLong,
          Array[Byte]((i % 127).toByte))
        sender.send(new java.net.DatagramPacket(frame, frame.length, addr))
        if (i % 25 == 24) q.processAllAvailable()
      }
      // UDP on loopback does not reorder/drop in practice, but the bridge
      // flushes on its own clock — poll until everything arrived
      val deadline = System.nanoTime() + 30_000_000_000L
      def seen() = { q.processAllAvailable(); spark.table(name).count() }
      while (seen() < 100 && System.nanoTime() < deadline) Thread.sleep(50)
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length === 100, s"expected 100 rows, got ${rows.length}")
      // exactly once: no duplicates, every datagram present
      assert(rows.toSet === (0 until 100)
        .map(i => (i.toLong, (i * 7 + 1).toLong)).toSet)
    } finally {
      q.stop(); bridge.stop(); sender.close()
    }
  }

  test("stream tolerates a capture dir that does not exist yet") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft_lsp_race").toFile
    val dir = new java.io.File(base, "captures") // not created yet
    val ckpt = Files.createTempDirectory("graft_lsp_race_ck").toFile.getAbsolutePath
    val name = s"lsplate_${System.nanoTime()}"
    val q = spark.readStream.format("graft.sources.LspFrameSource")
      .load(dir.getAbsolutePath)
      .select(col("connid"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable() // empty, but must not crash
      assert(spark.table(name).count() === 0)
      dir.mkdirs()
      val f = new java.io.File(dir, "00000.lsp")
      val out = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
      try {
        val b = graft.lsp.LspWire.encode(5L, 1L, Array[Byte](1))
        out.writeInt(b.length); out.write(b)
      } finally out.close()
      q.processAllAvailable()
      assert(spark.table(name).collect().map(_.getLong(0)).toSeq === Seq(5L))
    } finally q.stop()
  }

  test("malformed frames are skipped, not fatal (drop-don't-crash)") {
    val dir = Files.createTempDirectory("graft_lsp_bad").toFile
    val f = new java.io.File(dir, "cap.lsp")
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
    def frame(b: Array[Byte]): Unit = { out.writeInt(b.length); out.write(b) }
    frame(graft.lsp.LspWire.encode(1L, 1L, "ok".getBytes))
    frame(Array[Byte](0x08, 0xff.toByte)) // truncated varint → undecodable
    frame(graft.lsp.LspWire.encode(2L, 2L, "ok2".getBytes))
    out.close()
    val back = spark.read.format("graft.sources.LspFrameSource")
      .load(dir.getAbsolutePath)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }
}
