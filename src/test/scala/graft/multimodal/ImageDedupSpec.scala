package graft.multimodal

import graft.SparkSpec

/** dHash image near-dup: lossless band candidates vs brute force, real
  * PNG near-duplicates through ImageIO, JPEG recompression robustness
  * (the first JPEG through the real codec), and the stub-path query. */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private def grayImage(
      w: Int, h: Int, lum: (Int, Int) => Int,
      format: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = lum(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos),
      s"$format writer present")
    bos.toByteArray
  }

  test("band candidates are lossless to hamming 3 (brute-force parity)") {
    val rnd = new scala.util.Random(7)
    val bases = (0L until 30L).map { i =>
      (i, Array.fill(200)(rnd.nextInt(256).toByte))
    }
    // seeded near-identical copies: one byte tweaked at a sampled grid
    // position (stub dims for len 200: w=9, h=4 -> grid index = payload
    // index for the first rows), flipping at most 2 dHash bits
    val copies = bases.take(5).map { case (i, b) =>
      val c = b.clone(); c(5) = (c(5) ^ 0x7f).toByte; (100L + i, c)
    }
    val media = (bases ++ copies).toDF("doc_id", "payload")
    val hdf = ImageDedup.imageHashes(media).persist()
    val bands = hdf.collect().map(r => r.getLong(0) ->
      Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def ham(a: Array[Long], b: Array[Long]): Int =
      (0 until 4).map(k => java.lang.Long.bitCount(a(k) ^ b(k))).sum
    val want = (for {
      d1 <- bands.keys; d2 <- bands.keys
      if d1 < d2 && ham(bands(d1), bands(d2)) <= 3
    } yield (d1, d2)).toSet
    val got = ImageDedup.nearDupPairs(hdf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(want.nonEmpty, "seeded near-dups must produce pairs")
    hdf.unpersist()
  }

  test("real PNGs: seeded near-dup found, reversed gradient not paired") {
    val (w, h) = (90, 80)
    val base = (x: Int, _: Int) => x * 255 / w
    // darken exactly one dHash sample point (grid cell i=0, j=4)
    val pert = (x: Int, y: Int) =>
      if (x == 4 * w / 9 && y == 0) 0 else x * 255 / w
    val desc = (x: Int, _: Int) => 255 - x * 255 / w
    val media = Seq((0L, grayImage(w, h, base)), (1L, grayImage(w, h, pert)),
      (2L, grayImage(w, h, desc))).toDF("doc_id", "payload")
    val hashes = ImageDedup.imageHashes(media, ImageIoProvider).persist()
    val pairs = ImageDedup.nearDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((0L, 1L)))
    val hamming = pairs.head._3
    assert(hamming >= 1 && hamming <= 3,
      s"single-sample perturbation should cost 1-2 bits, got $hamming")
    hashes.unpersist()
  }

  test("JPEG through the real codec: recompression is a near-dup of the PNG") {
    val (w, h) = (90, 80)
    val base = (x: Int, _: Int) => x * 255 / w
    val jpegBytes = grayImage(w, h, base, "jpg")
    // the JPEG plugin decodes with correct dims through the same seam
    val dec = ImageIoProvider.open()
    assert(dec.decode(jpegBytes) === ((w, h, 3)))
    dec.close()
    // gradient signs survive lossy recompression -> hamming <= 3
    val media = Seq((0L, grayImage(w, h, base)), (1L, jpegBytes))
      .toDF("doc_id", "payload")
    val hashes = ImageDedup.imageHashes(media, ImageIoProvider).persist()
    val pairs = ImageDedup.nearDupPairs(hashes).collect()
    assert(pairs.length === 1)
    assert((pairs.head.getLong(0), pairs.head.getLong(1)) === ((0L, 1L)))
    hashes.unpersist()
  }

  test("q_image_neardup: ordered pairs, hamming capped, exact dups at 0") {
    val res = ImageDedup.qImageNearDup(spark, "/root/testdata/sf0.001")
      .collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 3)
    }
  }
}
