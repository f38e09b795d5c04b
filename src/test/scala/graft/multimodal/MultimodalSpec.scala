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

/** Counts opens/closes across the JVM (local-mode executors share it) to
  * prove the task-completion listener closes abandoned decoders. */
object CountingProvider extends Multimodal.MediaDecoderProvider {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  def open(): Multimodal.MediaDecoder = {
    opens.incrementAndGet()
    new Multimodal.MediaDecoder {
      def decode(payload: Array[Byte]): (Int, Int, Int) = (1, 1, 1)
      def features(payload: Array[Byte], dim: Int): Array[Float] =
        new Array[Float](dim)
      override def close(): Unit = closes.incrementAndGet()
    }
  }
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

  // --- real codec through the provider seam -------------------------------

  /** Deterministic RGB test pattern; PNG is lossless so the decoded
    * raster equals this exactly. */
  private def patternRgb(x: Int, y: Int): Int =
    ((x % 256) << 16) | ((y % 256) << 8) | ((x + y) % 256)

  private def patternLum(x: Int, y: Int): Int =
    ((x % 256) + (y % 256) + ((x + y) % 256)) / 3

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, patternRgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "PNG writer present")
    bos.toByteArray
  }

  test("ImageIO decoder: real PNGs through the full query path") {
    import spark.implicits._
    // a dozen real images of varying dims, including non-square and 1-pixel
    val dims = Seq((7, 5), (16, 16), (1, 1), (33, 9), (5, 40), (64, 3),
      (2, 2), (11, 11), (8, 24), (3, 1), (1, 17), (29, 13))
    val media = dims.zipWithIndex
      .map { case ((w, h), i) => (i.toLong, pngBytes(w, h)) }
      .toDF("doc_id", "payload")
      .repartition(4)
    val dim = 8
    val rows = Multimodal
      .qMediaFeaturesFrom(media, dim, ImageIoProvider)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === dims.indices.map(_.toLong).toSet)
    dims.zipWithIndex.foreach { case ((w, h), i) =>
      val r = rows(i.toLong)
      assert(r.getLong(2) === w.toLong, s"img $i width")
      assert(r.getLong(3) === h.toLong, s"img $i height")
      assert(r.getLong(4) === 3L, s"img $i channels (RGB)")
      // expected features from the pattern itself — independent of the
      // decoder: bucket by row-major index mod dim, exact luminance sums
      val sums = new Array[Double](dim)
      for (y <- 0 until h; x <- 0 until w)
        sums((y * w + x) % dim) += patternLum(x, y)
      val chunk = math.max(1, w * h / dim)
      (0 until dim).foreach { j =>
        val expect = BigDecimal(sums(j) / 255.0 / chunk)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(5 + j) - expect) < 1e-9,
          s"img $i f$j")
      }
    }
    // resize: real nearest-neighbor over decoded pixels
    val thumbs = Multimodal
      .qMediaResizeFrom(media, 4, 4, ImageIoProvider)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    dims.zipWithIndex.foreach { case ((w, h), i) =>
      val expect = (for (ti <- 0 until 4; tj <- 0 until 4)
        yield "%02X".format(
          patternLum(tj * w / 4, ti * h / 4).toByte & 0xff)).mkString
      assert(thumbs(i.toLong) === expect, s"img $i thumbnail")
    }
  }

  test("ImageIO decoder rejects undecodable payloads loudly") {
    val ex = intercept[Exception] {
      ImageIoProvider.open().decode("not an image".getBytes)
    }
    assert(ex.getMessage.contains("not a decodable image"))
  }

  test("WAV decoder: real javax.sound.sampled parse through the query path") {
    import spark.implicits._
    // byte patterns spanning the full sample range, incl. empty and
    // single-sample payloads
    val srcs: Seq[Array[Byte]] = Seq(
      Array.tabulate(100)(i => (i * 7 % 256).toByte),
      Array[Byte](),
      Array[Byte](0),
      Array[Byte](-1, 0, 127, -128),
      Array.tabulate(17)(i => (255 - i).toByte))
    // decoder-level closed form: decoded sample view == source bytes
    val dec = WavProvider.open()
    srcs.foreach { src =>
      val wav = WavSynth.pcm16MonoWav(src)
      val (w, h, c) = dec.decode(wav)
      assert((w, h, c) === ((src.length, 1, 1)), "decoded dims")
      val f = dec.features(wav, 4)
      val sums = new Array[Double](4)
      src.indices.foreach(i => sums(i % 4) += (src(i) & 0xff))
      val chunk = math.max(1, src.length / 4)
      (0 until 4).foreach(j =>
        assert(math.abs(f(j) - (sums(j) / 255.0 / chunk).toFloat) === 0.0f,
          s"f$j over decoded PCM"))
    }
    // query surface: WavProvider over synthesized containers — same
    // schema as the stub query, f-columns equal the stub's (the decoded
    // view reproduces the source bytes), metadata container-derived
    val media = srcs.zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toDF("doc_id", "payload")
      .repartition(2)
    val wavRows = Multimodal
      .qMediaFeaturesFrom(media.select($"doc_id",
        $"payload").as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) =>
          (id, WavSynth.pcm16MonoWav(p)) })
        .toDF("doc_id", "payload"), 8, WavProvider)
    val stubRows = Multimodal.qMediaFeaturesFrom(media, 8)
    assert(wavRows.columns.toSeq === stubRows.columns.toSeq)
    val wv = wavRows.collect().map(r => r.getLong(0) -> r).toMap
    val st = stubRows.collect().map(r => r.getLong(0) -> r).toMap
    srcs.indices.foreach { i =>
      val (w0, s0) = (wv(i.toLong), st(i.toLong))
      assert(w0.getLong(1) === 44L + 2 * srcs(i).length, "container bytes")
      assert(w0.getLong(2) === srcs(i).length.toLong, "frames")
      assert((w0.getLong(3), w0.getLong(4)) === ((1L, 1L)))
      (0 until 8).foreach(j =>
        assert(w0.getDouble(5 + j) === s0.getDouble(5 + j),
          s"doc $i f$j: real decode == stub over source bytes"))
    }
  }

  test("WAV decoder rejects non-PCM16 and non-RIFF payloads loudly") {
    intercept[Exception] {
      WavProvider.open().decode("not audio at all".getBytes)
    }
    // an 8-bit WAV parses as a container but violates the PCM16 contract
    val eightBit = {
      val w = WavSynth.pcm16MonoWav(Array[Byte](1, 2, 3))
      w(34) = 8 // bits-per-sample field
      w(32) = 1 // block align
      w
    }
    val ex = intercept[Exception] { WavProvider.open().decode(eightBit) }
    assert(ex.getMessage.contains("16-bit"), ex.getMessage)
  }

  test("decoder closes when the iterator is abandoned (limit/take)") {
    import spark.implicits._
    val media = (0L until 400L).map(i => (i, Array.fill(4)(i.toByte)))
      .toDF("doc_id", "payload").repartition(4)
    val before = (CountingProvider.opens.get, CountingProvider.closes.get)
    // take(1) abandons every partition's iterator mid-stream — without the
    // task-completion listener the ++-thunk close never runs
    Multimodal.featureExtractFrom(media, CountingProvider, 4).take(1)
    val opened = CountingProvider.opens.get - before._1
    val closed = CountingProvider.closes.get - before._2
    assert(opened > 0, "at least one decoder opened")
    assert(closed === opened, s"every opened decoder closed ($closed/$opened)")
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

  test("audio frames: energies match a JVM replay of the framing") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (fl, h, t) = (Multimodal.AudioFrame, Multimodal.AudioHop,
      Multimodal.SilentBelow)
    def frames(text: String): Seq[Long] = {
      val cp = text.toSeq.map(_.toLong) // code points (BMP corpus)
      (0 to (cp.length - fl) / h).map(f =>
        (0 until fl).map(j => cp(f * h + j) * cp(f * h + j)).sum)
    }
    val got = Multimodal.qAudioFrames(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val eligible = docs.filter(_._2.length >= fl)
    assert(got.length === eligible.size)
    got.foreach { case (id, n, nSil, maxE, lead) =>
      val es = frames(docs(id))
      assert(n === es.length.toLong, s"doc $id frame count")
      assert(nSil === es.count(_ < t).toLong, s"doc $id silence census")
      assert(maxE === es.max, s"doc $id max energy")
      val wantLead =
        if (es.exists(_ >= t)) es.indexWhere(_ >= t).toLong
        else es.length.toLong
      assert(lead === wantLead, s"doc $id trim point")
      assert(nSil <= n && lead <= n)
    }
  }

  test("audio features: ZCR + pitch bin match a JVM replay") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.relational.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (fl, h) = (Multimodal.AudioFrame, Multimodal.AudioHop)
    val lags = Multimodal.LagMin to Multimodal.LagMax
    // per-frame (zcr, rmax, pitch) replay: centered without division
    // (c_j = 16·s_j − Σs), first-max-lag argmax
    def feats(text: String): Seq[(Long, Long, Long)] = {
      val cp = text.toSeq.map(_.toLong)
      (0 to (cp.length - fl) / h).map { f =>
        val s = (0 until fl).map(j => cp(f * h + j))
        val sum = s.sum
        val c = s.map(_ * fl - sum)
        val zcr = (1 until fl).count(j => c(j) * c(j - 1) < 0).toLong
        val rs = lags.map(l => (0 until fl - l).map(j => c(j) * c(j + l)).sum)
        val rmax = rs.max
        val pitch = lags(rs.indexWhere(_ == rmax)).toLong
        (zcr, rmax, pitch)
      }
    }
    val got = Multimodal.qAudioFeatures(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val eligible = docs.filter(_._2.length >= fl)
    assert(got.length === eligible.size)
    got.foreach { case (id, n, zcrTotal, nVoiced, pitchMode) =>
      val fs = feats(docs(id))
      assert(n === fs.length.toLong, s"doc $id frame count")
      assert(zcrTotal === fs.map(_._1).sum, s"doc $id zcr")
      assert(nVoiced === fs.count(_._2 > 0).toLong, s"doc $id voiced")
      val byPitch = fs.groupBy(_._3).view.mapValues(_.size).toMap
      val maxC = byPitch.values.max
      val wantMode = byPitch.collect { case (p, c) if c == maxC => p }.min
      assert(pitchMode === wantMode, s"doc $id pitch mode")
      assert(pitchMode >= Multimodal.LagMin && pitchMode <= Multimodal.LagMax)
    }
    // the feature is informative: pitch modes vary across the corpus
    assert(got.map(_._5).distinct.length > 1, "pitch mode is not constant")
  }
}
