package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import graft.relational.Tables

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract /
  * frame-sample as distributed per-partition operators.
  *
  * The actual codecs (JPEG/PNG/audio decoders) are NOT available in this
  * environment, so the decode step is a clearly-marked deterministic stub
  * ([[StubDecoder]]) behind the [[MediaDecoder]] interface — the Spark-side
  * plumbing (schema, partitioning, batch shape, column lineage) is real and
  * tested, and a real decoder drops in without touching the plan.
  */
object Multimodal {

  /** Decoded-media metadata + features. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      features: Array[Float])

  /** Pluggable decode/feature-extract step. Implementations must be
    * deterministic per byte payload. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Int) // (width, height, channels)
    def features(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB: deterministic fake decoder (no image libs in this container).
    * "Dimensions" are derived from payload length; "features" are chunked
    * byte averages — deterministic, shape-correct, cheap. */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) =
      (payload.length % 64 + 1, payload.length / 64 + 1, 3)
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload.isEmpty) return out
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      var j = 0
      val chunk = math.max(1, payload.length / dim)
      while (j < dim) { out(j) /= chunk; j += 1 }
      out
    }
  }

  /** Media table: documents' text re-encoded as an opaque binary payload —
    * the stand-in for an image/audio bytes column. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Distributed decode + feature extraction via `mapPartitions`: one
    * decoder instance per partition (the real-codec pattern — init cost
    * amortized across the partition's rows, no per-row codec setup). */
  def featureExtract(
      spark: SparkSession, dir: String,
      decoder: MediaDecoder = StubDecoder,
      dim: Int = 8): DataFrame = {
    val media = mediaTable(spark, dir)
    implicit val enc = Encoders.product[MediaFeatures]
    media.select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (w, h, c) = decoder.decode(payload)
          MediaFeatures(id, payload.length, w, h, c,
            decoder.features(payload, dim))
        }
      }
      .toDF()
  }

  /** Pure-SQL metadata pass (no decode): byte length, header bytes, fake
    * dimensions derived deterministically from size — the part of the
    * pipeline an oracle can check exactly. */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        upper(hex(substring(col("payload"), 1, 8))).as("header_hex"),
        (octet_length(col("payload")) % 64 + 1).cast("long").as("width"),
        (floor(octet_length(col("payload")) / 64) + 1).cast("long").as("height"),
        (octet_length(col("payload")) % 7).cast("long").as("n_frames"))

  /** Deterministic frame sampling plumbing: pick every `stride`-th chunk of
    * the payload as a "frame" (real video frame-sampling has the same plan
    * shape: explode bounded by per-row frame count). */
  def qFrameSample(
      spark: SparkSession, dir: String, stride: Int = 3): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, int(octet_length(payload) / (8 * $stride))), " +
            s"i -> upper(hex(substring(payload, i * 8 * $stride + 1, 8))))"))
          .as(Seq("frame_idx", "frame_hex")))
      .filter(length(col("frame_hex")) > 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_hex"))
}
