package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import Multimodal.{MediaDecoder, MediaDecoderProvider}

/** A REAL image codec behind the [[Multimodal.MediaDecoderProvider]] seam:
  * decodes PNG/BMP/GIF payloads with `javax.imageio` (present in every
  * JDK, including headless) and derives the same feature/resize contract
  * the stub ships — proving the per-partition provider pattern against an
  * actual codec's constraints rather than a fake:
  *
  *   - ImageIO readers are NOT thread-safe and NOT serializable — exactly
  *     the constraint the provider seam exists for; one decoder instance
  *     per partition, constructed executor-side.
  *   - A real decode is the expensive step, so the decoder memoizes the
  *     last decoded image BY PAYLOAD REFERENCE: `decode` + `features` +
  *     `resize` on the same row cost one decode. Reference (not value)
  *     identity keeps the memo O(1) and is sound because each row's
  *     payload is a distinct array instance handed to all three calls.
  *
  * Feature semantics mirror [[Multimodal.StubDecoder]] EXACTLY (parity is
  * the contract — a consumer must be able to swap providers without the
  * schema or scale changing): bucket j accumulates the integer luminance
  * sum of pixels with row-major index ≡ j (mod dim), normalized by
  * 255·floor-chunk (`max(1, n/dim)`, the stub's formula). Values land in
  * [0, ceil(n/dim)/max(1, n/dim)] — ≤ 1 when dim divides the pixel
  * count, up to 2× otherwise (a bucket can hold one pixel more than the
  * floor-chunk divisor) — so do NOT treat 1.0 as a hard bound. Integer
  * sums held exactly in doubles, one float cast at the end, so values
  * are bit-reproducible across engines and partitionings. Luminance is
  * the exact integer (r+g+b)/3 (floor), not the perceptual weighting, to
  * stay engine-recomputable without float rounding questions.
  */
object ImageIoProvider extends MediaDecoderProvider {
  def open(): MediaDecoder = new ImageIoDecoder
}

final class ImageIoDecoder extends MediaDecoder {

  // last-decoded memo, keyed by payload reference (single-threaded per
  // partition by construction)
  private var lastPayload: Array[Byte] = null
  private var lastImage: BufferedImage = null

  private def image(payload: Array[Byte]): BufferedImage = {
    if (lastPayload ne payload) {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null)
        throw new IllegalArgumentException(
          s"payload of ${payload.length} bytes is not a decodable image")
      lastPayload = payload
      lastImage = img
    }
    lastImage
  }

  /** Exact integer luminance: floor((r+g+b)/3) of the sRGB pixel. */
  private def lum(img: BufferedImage, x: Int, y: Int): Int = {
    val rgb = img.getRGB(x, y)
    (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
  }

  def decode(payload: Array[Byte]): (Int, Int, Int) = {
    val img = image(payload)
    (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
  }

  def features(payload: Array[Byte], dim: Int): Array[Float] = {
    val img = image(payload)
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Float](dim)
    val n = w * h
    if (n == 0) return out
    val sums = new Array[Double](dim) // exact: integer luminance sums
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        sums((y * w + x) % dim) += lum(img, x, y)
        x += 1
      }
      y += 1
    }
    val chunk = math.max(1, n / dim)
    var j = 0
    while (j < dim) { out(j) = (sums(j) / 255.0 / chunk).toFloat; j += 1 }
    out
  }

  /** Real nearest-neighbor thumbnail over DECODED pixels (the trait
    * default samples raw payload bytes — meaningless for a compressed
    * format): out(i,j) = luminance of source pixel
    * (floor(j·w/tw), floor(i·h/th)), row-major. The `w`/`h` arguments are
    * the decoded dims the caller already obtained — re-derived from the
    * memoized image, so no second decode. */
  override def resize(
      payload: Array[Byte], w: Int, h: Int, tw: Int, th: Int): Array[Byte] = {
    val img = image(payload)
    val out = new Array[Byte](tw * th)
    var i = 0
    while (i < th) {
      var j = 0
      while (j < tw) {
        out(i * tw + j) = lum(img, j * w / tw, i * h / th).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  override def close(): Unit = { lastPayload = null; lastImage = null }
}
