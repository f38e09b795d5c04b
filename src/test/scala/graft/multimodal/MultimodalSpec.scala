package graft.multimodal

import graft.SparkSpec

/** Synthetic second decoder: a per-partition "handle" (the lookup table
  * is codec-init stand-in, built in open(), never serialized), different
  * dims/channels/features than the stub. Top-level so the provider
  * serializes without dragging a test-class outer reference along. */
class NegatingDecoder extends Multimodal.MediaDecoder {
  private val lut: Array[Float] =
    Array.tabulate(256)(b => 1.0f - b / 255.0f)
  private var closed = false
  def decode(payload: Array[Byte]): (Int, Int, Int) =
    (payload.length % 32 + 1, payload.length / 32 + 1, 1)
  def features(payload: Array[Byte], dim: Int): Array[Float] = {
    require(!closed, "decoder used after close")
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += lut(payload(i) & 0xff); i += 1
    }
    out
  }
  override def close(): Unit = closed = true
}

object NegatingProvider extends Multimodal.MediaDecoderProvider {
  def open(): Multimodal.MediaDecoder = new NegatingDecoder
}

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

  test("decoder swap: a second impl runs the oracled query unchanged in shape") {
    // the synthetic second decoder (top-level NegatingDecoder below):
    // per-partition "handle" built in open() — the real-codec init
    // pattern — different features and dims; the provider seam means
    // swapping the codec keeps the plan, schema, and row count.
    val stub = Multimodal.qMediaFeatures(spark, dir)
    val neg = Multimodal.qMediaFeatures(spark, dir, provider = NegatingProvider)
    // identical schema and row set; only decoder-derived values move
    assert(neg.schema === stub.schema)
    val stubRows = stub.collect().map(r => r.getLong(0) -> r).toMap
    val negRows = neg.collect().map(r => r.getLong(0) -> r).toMap
    assert(negRows.keySet === stubRows.keySet)
    negRows.foreach { case (id, r) =>
      assert(r.getLong(4) === 1L, "negating decoder channels")
      assert(stubRows(id).getLong(4) === 3L, "stub channels")
      assert(r.getLong(1) === stubRows(id).getLong(1), "n_bytes is payload-derived")
    }
    // and the resize path swaps the same way
    val rs = Multimodal.qMediaResize(spark, dir, provider = NegatingProvider)
    assert(rs.count() === 500)
  }

  test("stub decoder dimensions derive from payload length") {
    val (w, h, c) = Multimodal.StubDecoder.decode(Array.fill(130)(65.toByte))
    assert((w, h, c) === (130 % 64 + 1, 130 / 64 + 1, 3))
  }

  test("provider opens a fresh decoder per partition (init is executor-side)") {
    // NegatingDecoder.close() poisons the instance; if partitions shared
    // one decoder across partitions the second partition would hit the
    // closed guard. 4 partitions → at least 4 independent opens.
    val n = Multimodal.qMediaFeatures(spark, dir, provider = NegatingProvider)
      .count()
    assert(n === 500L)
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
