package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("featureExtract: schema, row-parity with source, deterministic features") {
    val df = Multimodal.featureExtract(spark, dir, dim = 8)
    assert(df.columns.toSeq ===
      Seq("doc_id", "n_bytes", "width", "height", "channels", "features"))
    val rows = df.collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getInt(4) === 3) // stub channels
      assert(r.getSeq[Float](5).length === 8)
    }
    // determinism: re-running yields identical features
    val again = Multimodal.featureExtract(spark, dir, dim = 8).collect()
    assert(rows.map(_.getSeq[Float](5)).zip(again.map(_.getSeq[Float](5)))
      .forall { case (a, b) => a == b })
  }

  test("stub decoder dimensions derive from payload length") {
    val (w, h, c) = Multimodal.StubDecoder.decode(Array.fill(130)(65.toByte))
    assert((w, h, c) === (130 % 64 + 1, 130 / 64 + 1, 3))
  }

  test("frame sampling: stride-bounded, hex frames, 0-based contiguous index") {
    val rows = Multimodal.qFrameSample(spark, dir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, frames) =>
      val idxs = frames.map(_.getLong(1)).sorted
      assert(idxs === (0L until idxs.length.toLong))
    }
  }

  test("resize: nearest-neighbor thumbnail, fixed output size, known vector") {
    // 130-byte payload -> w=3, h=3 per the stub's fake dims; thumbnail
    // samples (i*3/4)*3 + (j*3/4) for i,j in 0..3
    val payload = Array.tabulate(130)(i => (i % 251).toByte)
    val thumb = Multimodal.StubDecoder.resize(payload, 3, 3, 4, 4)
    assert(thumb.length === 16)
    val expect = for (i <- 0 until 4; j <- 0 until 4)
      yield payload(math.min((i * 3 / 4) * 3 + (j * 3 / 4), 129))
    assert(thumb.toSeq === expect)
    // query surface: one row per doc, 32-hex-char thumbnails
    val df = Multimodal.qMediaResize(spark, "/root/testdata/sf0.001")
    assert(df.count() === 500)
    df.collect().take(20).foreach { r =>
      assert(r.getString(3).length === 32)
    }
  }
}
