package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

import Multimodal.{MediaDecoder, MediaDecoderProvider}

/** A REAL audio codec behind the [[Multimodal.MediaDecoderProvider]] seam —
  * the audio counterpart of [[ImageIoProvider]] (the r5 precedent):
  * RIFF/WAVE PCM payloads are parsed by `javax.sound.sampled` (present in
  * every JDK, headless included), and the decoded SAMPLES — not the
  * container bytes — feed the same feature/resize contract the stub
  * ships. The seam constraints are the real ones:
  *
  *   - `AudioInputStream`s are stateful single-pass handles, not
  *     serializable — one decoder per partition, constructed
  *     executor-side, exactly what the provider pattern exists for;
  *   - parsing is the expensive step, so the decoder memoizes the last
  *     decoded sample array BY PAYLOAD REFERENCE (the
  *     [[ImageIoDecoder]] discipline): decode + features + resize on
  *     the same row cost one parse.
  *
  * Decoded-sample VIEW: each PCM frame contributes channel 0's 16-bit
  * sample reduced to its unsigned high byte (`(s >> 8) + 128` ∈
  * [0, 255]) — an exact integer view any engine can recompute, mirroring
  * [[Multimodal.StubDecoder]]'s byte-stream semantics over real decoded
  * audio instead of container bytes. `decode` reports
  * (frames, 1, channels). Feature buckets then follow the stub formula
  * verbatim (integer sums, one float cast), so a consumer can swap
  * providers without schema or scale changing — and on
  * [[WavSynth]]-shaped payloads (source byte → sample high byte) the
  * decoded view reproduces the source bytes EXACTLY, which is what
  * makes the registered `q_wav_features` query carry a closed-form
  * DuckDB oracle while exercising the real codec end-to-end.
  */
object WavProvider extends MediaDecoderProvider {
  def open(): MediaDecoder = new WavDecoder
}

final class WavDecoder extends MediaDecoder {

  // last-decoded memo, keyed by payload reference (single-threaded per
  // partition by construction)
  private var lastPayload: Array[Byte] = null
  private var lastSamples: Array[Byte] = null // unsigned-high-byte view
  private var lastChannels: Int = 1

  private def samples(payload: Array[Byte]): Array[Byte] = {
    if (lastPayload ne payload) {
      val ais = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16,
          s"WavDecoder supports 16-bit signed PCM, got $fmt")
        val ch = fmt.getChannels
        val frameBytes = fmt.getFrameSize
        val data = ais.readAllBytes()
        val n = data.length / frameBytes
        val out = new Array[Byte](n)
        val hiOff = if (fmt.isBigEndian) 0 else 1 // channel 0's high byte
        var i = 0
        while (i < n) {
          // (signed high byte) + 128 == unsigned view of (sample >> 8)
          out(i) = (data(i * frameBytes + hiOff) + 128).toByte
          i += 1
        }
        lastPayload = payload
        lastSamples = out
        lastChannels = ch
      } finally ais.close()
    }
    lastSamples
  }

  def decode(payload: Array[Byte]): (Int, Int, Int) = {
    val s = samples(payload)
    (s.length, 1, lastChannels)
  }

  /** Stub-formula buckets over the DECODED sample view: bucket j sums
    * the unsigned sample bytes at positions ≡ j (mod dim), normalized
    * by 255 · max(1, n / dim). Integer sums held exactly in doubles,
    * one float cast at the end. */
  def features(payload: Array[Byte], dim: Int): Array[Float] = {
    val s = samples(payload)
    val out = new Array[Float](dim)
    if (s.isEmpty) return out
    val sums = new Array[Double](dim)
    var i = 0
    while (i < s.length) {
      sums(i % dim) += (s(i) & 0xff)
      i += 1
    }
    val chunk = math.max(1, s.length / dim)
    var j = 0
    while (j < dim) { out(j) = (sums(j) / 255.0 / chunk).toFloat; j += 1 }
    out
  }

  /** Nearest-neighbor downsample over the DECODED sample grid (the trait
    * default reads raw container bytes — meaningless for a framed
    * format): the audio analogue of a thumbnail, i.e. a fixed-length
    * waveform sketch. */
  override def resize(
      payload: Array[Byte], w: Int, h: Int, tw: Int, th: Int): Array[Byte] = {
    val s = samples(payload)
    val out = new Array[Byte](tw * th)
    if (s.isEmpty) return out
    var i = 0
    while (i < th) {
      var j = 0
      while (j < tw) {
        val pos = (i * h / th) * w + (j * w / tw)
        out(i * tw + j) = s(math.min(pos, s.length - 1))
        j += 1
      }
      i += 1
    }
    out
  }

  override def close(): Unit = { lastPayload = null; lastSamples = null }
}

/** Deterministic RIFF/WAVE PCM16 mono synthesizer: source byte `b`
  * becomes the 16-bit sample `(b − 128) << 8`, whose unsigned high byte
  * recovers `b` exactly — the closed form that lets a real-codec query
  * carry a DuckDB oracle written against the source bytes. Hand-rolled
  * header (44 bytes, little-endian) so the container layout is pinned
  * here, while DECODING goes through the actual `javax.sound.sampled`
  * parser, not a mirror of this writer. */
object WavSynth {
  def pcm16MonoWav(src: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val n = src.length
    val out = new Array[Byte](44 + 2 * n)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
      out(off + 2) = ((v >>> 16) & 0xff).toByte
      out(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    tag(0, "RIFF"); le32(4, 36 + 2 * n); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, sampleRate); le32(28, sampleRate * 2)
    le16(32, 2); le16(34, 16) // block align, bits
    tag(36, "data"); le32(40, 2 * n)
    var i = 0
    while (i < n) {
      // sample = (b - 128) << 8, little-endian: low byte 0, high byte b-128
      out(44 + 2 * i) = 0
      out(44 + 2 * i + 1) = ((src(i) & 0xff) - 128).toByte
      i += 1
    }
    out
  }
}
