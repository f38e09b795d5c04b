package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import graft.relational.Tables

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract /
  * frame-sample as distributed per-partition operators.
  *
  * The decode step is pluggable behind the [[MediaDecoder]] interface:
  * [[StubDecoder]] is the deterministic default (no external image libs in
  * this container), and [[ImageIoProvider]] is a REAL codec plugin on the
  * JDK's `javax.imageio` (PNG/BMP/GIF) proving the seam against actual
  * decoder constraints — the Spark-side plumbing (schema, partitioning,
  * batch shape, column lineage) is identical under both.
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

  /** Pluggable decode/feature-extract step — ONE INSTANCE PER PARTITION,
    * created executor-side by a [[MediaDecoderProvider]]. Deliberately NOT
    * `Serializable`: real codec handles (libjpeg contexts, ffmpeg
    * decoders, ONNX sessions) can't cross the driver→executor boundary,
    * so the decoder must be constructed where it runs. Implementations
    * must be deterministic per byte payload. */
  trait MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) // (width, height, channels)
    def features(payload: Array[Byte], dim: Int): Array[Float]

    /** Release codec resources; called best-effort when the partition's
      * rows are exhausted (a cancelled task may skip it — hold handles a
      * JVM can reclaim). Default no-op. */
    def close(): Unit = ()

    /** Nearest-neighbor thumbnail of the decoded grid: sample the source
      * at `floor(i·h/th) × floor(j·w/tw)`, row-major. Takes the decoded
      * dims so the (expensive, with a real codec) decode runs once per
      * row. Deterministic. */
    def resize(payload: Array[Byte], w: Int, h: Int, tw: Int, th: Int): Array[Byte] = {
      val out = new Array[Byte](tw * th)
      if (payload.isEmpty) return out
      var i = 0
      while (i < th) {
        var j = 0
        while (j < tw) {
          val pos = (i * h / th) * w + (j * w / tw)
          out(i * tw + j) = payload(math.min(pos, payload.length - 1))
          j += 1
        }
        i += 1
      }
      out
    }
  }

  /** What actually ships to executors: a small serializable factory that
    * opens one [[MediaDecoder]] per partition (init cost — codec tables,
    * model weights — amortized over the partition's rows, never per row,
    * and never serialized). Swapping codecs is swapping providers; the
    * plan, schema, and partitioning don't change (proven by
    * MultimodalSpec, which runs the oracled query under two different
    * providers). */
  trait MediaDecoderProvider extends Serializable {
    def open(): MediaDecoder
  }

  /** Default provider: the deterministic stub. */
  object StubProvider extends MediaDecoderProvider {
    def open(): MediaDecoder = StubDecoder
  }

  /** Run `f` over a partition with a freshly-opened decoder. Close runs
    * exactly once via a task-completion listener — which fires on normal
    * completion, task failure, AND cancellation — so a `limit`/`take`
    * that abandons the iterator mid-partition can't leak a native codec
    * handle. The drain-time close (the `++` thunk, evaluated only after
    * the left side exhausts) is kept as the fast path so handles free as
    * soon as the rows are consumed, not at task teardown. */
  private[multimodal] def withDecoder[T](provider: MediaDecoderProvider)(
      f: MediaDecoder => Iterator[T]): Iterator[T] = {
    val dec = provider.open()
    val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def closeOnce(): Unit = if (closed.compareAndSet(false, true)) dec.close()
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
    f(dec) ++ { closeOnce(); Iterator.empty }
  }

  /** STUB: deterministic fake decoder (no image libs in this container).
    * "Dimensions" are derived from payload length; "features" are chunked
    * byte averages — deterministic, shape-correct, cheap. Accumulation is
    * an exact integer byte sum (held in double) with a single float cast
    * at the end, so feature values are reproducible by any engine that
    * can sum bytes — float-accumulation drift would make them
    * engine-specific. */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) =
      (payload.length % 64 + 1, payload.length / 64 + 1, 3)
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload.isEmpty) return out
      val sums = new Array[Double](dim) // exact: integer byte sums
      var i = 0
      while (i < payload.length) {
        sums(i % dim) += (payload(i) & 0xff)
        i += 1
      }
      val chunk = math.max(1, payload.length / dim)
      var j = 0
      while (j < dim) { out(j) = (sums(j) / 255.0 / chunk).toFloat; j += 1 }
      out
    }
  }

  /** Media table: documents' text re-encoded as an opaque binary payload —
    * the stand-in for an image/audio bytes column. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Frame length / hop (samples) and the silence-energy floor for
    * [[qAudioFrames]] — 50% overlap, the standard DSP framing. */
  val AudioFrame: Int = 16
  val AudioHop: Int = 8
  val SilentBelow: Long = 100000L

  /** Audio-shaped frame analysis over the opaque payload — the
    * windowed-DSP pipeline stage (framing → per-frame energy → silence
    * census / leading-silence trim point) that an audio corpus runs
    * before feature extraction. The DECODE step is the documented stub:
    * payload code points stand in for PCM samples (the container has no
    * audio codecs; a real deployment swaps the sample source behind the
    * same seam as [[MediaDecoderProvider]]). Everything downstream of
    * the stub is the real distributed shape: per-row-bounded frame
    * explode, an unrolled 16-term integer energy kernel inside
    * whole-stage codegen (the [[graft.similarity.Similarity]] PQ
    * discipline), one map-side-combinable aggregation — and every
    * output is an exact integer, so the query carries a full DuckDB
    * oracle. Docs shorter than one frame carry no frames and are
    * absent, mirrored by the oracle. */
  def qAudioFrames(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .filter(col("len") >= AudioFrame)
      .withColumn("n_frames",
        expr(s"CAST((len - $AudioFrame) div $AudioHop AS BIGINT) + 1"))
    val eCol = (0 until AudioFrame).map { j =>
      val samp = ascii(expr(s"substr(text, f * $AudioHop + ${j + 1}, 1)"))
        .cast("long")
      samp * samp
    }.reduce(_ + _)
    docs
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("f"),
        col("text"))
      .withColumn("energy", eCol)
      .groupBy("doc_id")
      .agg(first("n_frames").as("n_frames"),
        sum(when(col("energy") < SilentBelow, 1L).otherwise(0L))
          .as("n_silent"),
        max("energy").as("max_energy"),
        coalesce(min(when(col("energy") >= SilentBelow, col("f"))),
          first("n_frames")).as("lead_silent"))
  }

  /** Autocorrelation lag range for [[qAudioFeatures]]'s pitch proxy:
    * periods of 2..8 samples inside the 16-sample frame. */
  val LagMin: Int = 2
  val LagMax: Int = 8

  /** FFT-free spectral features per audio frame — the feature-depth
    * match for the image column's census: integer ZERO-CROSSING RATE
    * (the classic voiced/unvoiced + spectral-tilt proxy) and an
    * AUTOCORRELATION PITCH BIN (argmax of R(lag), lag ∈ [LagMin,
    * LagMax] — the period estimate a pitch tracker starts from),
    * aggregated per document as total crossings, voiced-frame count
    * (R(argmax) > 0), and the modal pitch bin (ties to the smaller
    * lag, the min(struct) argmax discipline).
    *
    * Exactness: samples center WITHOUT division — c_j = 16·s_j − Σs has
    * the sign of (s_j − mean) exactly — so crossings (c_j·c_{j−1} < 0),
    * autocorrelations (Σ c_j·c_{j+lag}, |c| ≤ 2032 so every product is
    * long-safe), and the argmax CASE chain are pure integer arithmetic
    * with a bit-exact DuckDB oracle. Same decode stub and framing as
    * [[qAudioFrames]]; both per-doc aggregations (census + pitch mode)
    * are map-side combinable. */
  def qAudioFeatures(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .filter(col("len") >= AudioFrame)
      .withColumn("n_frames",
        expr(s"CAST((len - $AudioFrame) div $AudioHop AS BIGINT) + 1"))
    // STAGED projections, not one inline tree: every c_j feeds ~15
    // products (zcr + 7 autocorrelations), so inlining expands the
    // expression tree combinatorially — the generated method blows past
    // the JIT limit, codegen falls back, and the interpreted tree
    // re-evaluates each substr thousands of times per row (measured
    // 21.9 s at sf0.1; staged: sub-second). Across Project stages a
    // column reference is one local read, and CollapseProject leaves
    // multi-use non-cheap outputs alone, so each sample/centered value
    // computes exactly once.
    val sStage = docs
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("f"),
        col("text"))
      .select(col("doc_id") +: col("n_frames") +:
        (0 until AudioFrame).map { j =>
          ascii(expr(s"substr(text, f * $AudioHop + ${j + 1}, 1)"))
            .cast("long").as(s"s$j")
        }: _*)
    val ssum = (0 until AudioFrame).map(j => col(s"s$j")).reduce(_ + _)
    val cStage = sStage
      .select(col("doc_id") +: col("n_frames") +:
        (0 until AudioFrame).map { j =>
          (col(s"s$j") * AudioFrame - ssum).as(s"c$j")
        }: _*)
    def c(j: Int) = col(s"c$j")
    val zcr = (1 until AudioFrame).map { j =>
      when(c(j) * c(j - 1) < 0, 1L).otherwise(0L)
    }.reduce(_ + _)
    val rStage = cStage
      .select(col("doc_id") +: col("n_frames") +: zcr.as("zcr") +:
        (LagMin to LagMax).map { lag =>
          (0 until AudioFrame - lag).map(j => c(j) * c(j + lag))
            .reduce(_ + _).as(s"r$lag")
        }: _*)
    val rs = (LagMin to LagMax).map(lag => col(s"r$lag"))
    val rmax = rs.reduce((a, b) => greatest(a, b))
    // first lag attaining the max — the tie-to-smaller-lag argmax
    val pitch = (LagMin to LagMax).zip(rs).tail.foldLeft(
      when(rs.head === col("rmax"), lit(LagMin.toLong))) {
        case (acc, (lag, r)) => acc.when(r === col("rmax"), lit(lag.toLong))
      }
    val frames = rStage
      .withColumn("rmax", rmax)
      .select(col("doc_id"), col("n_frames"), col("zcr"),
        col("rmax"), pitch.as("pitch"))
    val census = frames.groupBy("doc_id")
      .agg(first("n_frames").as("n_frames"),
        sum("zcr").as("zcr_total"),
        sum(when(col("rmax") > 0, 1L).otherwise(0L)).as("n_voiced"))
    val mode = frames.groupBy("doc_id", "pitch")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(min(struct((-col("c")).as("nc"), col("pitch"))).as("m"))
      .select(col("doc_id"), col("m.pitch").as("pitch_mode"))
    census.join(mode, "doc_id")
  }

  /** Distributed decode + feature extraction via `mapPartitions`: one
    * decoder instance per partition (the real-codec pattern — init cost
    * amortized across the partition's rows, no per-row codec setup). */
  def featureExtract(
      spark: SparkSession, dir: String,
      provider: MediaDecoderProvider = StubProvider,
      dim: Int = 8): DataFrame =
    featureExtractFrom(mediaTable(spark, dir), provider, dim)

  /** [[featureExtract]] over an arbitrary `(doc_id, payload)` frame — the
    * entry a caller with REAL image bytes (not the documents stand-in
    * table) uses; MultimodalSpec drives PNG payloads through it with the
    * ImageIO decoder. */
  def featureExtractFrom(
      media: DataFrame,
      provider: MediaDecoderProvider = StubProvider,
      dim: Int = 8): DataFrame = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        withDecoder(provider) { decoder =>
          rows.map { case (id, payload) =>
            val (w, h, c) = decoder.decode(payload)
            MediaFeatures(id, payload.length, w, h, c,
              decoder.features(payload, dim))
          }
        }
      }
      .toDF()
  }

  /** Driver-facing form of [[featureExtract]]: same `mapPartitions` decode
    * path, with the feature vector exploded to fixed-precision scalar
    * columns `f0..f{dim-1}` — an array column can't be sorted/hashed by
    * the oracle compare (ADVICE r1), and rounded scalars also make the
    * result stable under any future decoder whose tail bits dither. The
    * array form stays available via [[featureExtract]] for library use. */
  def qMediaFeatures(
      spark: SparkSession, dir: String, dim: Int = 8,
      provider: MediaDecoderProvider = StubProvider): DataFrame =
    qMediaFeaturesFrom(mediaTable(spark, dir), dim, provider)

  /** [[qMediaFeatures]] over an arbitrary `(doc_id, payload)` frame. */
  def qMediaFeaturesFrom(
      media: DataFrame, dim: Int = 8,
      provider: MediaDecoderProvider = StubProvider): DataFrame = {
    val feats = featureExtractFrom(media, provider, dim)
    feats.select(
      Seq(col("doc_id"),
        col("n_bytes").cast("long").as("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels")) ++
        (0 until dim).map(j =>
          round(element_at(col("features"), j + 1).cast("double"), 6)
            .as(s"f$j")): _*)
  }

  /** The documents table as a REAL-audio media table: each payload is a
    * RIFF/WAVE PCM16 mono container synthesized from the text bytes
    * ([[WavSynth]] — source byte → sample high byte, the closed form).
    * Synthesis runs per partition next to where the codec will parse
    * it, so no WAV blob ever crosses a shuffle. */
  def wavMediaTable(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.map { case (id, p) =>
        (id, WavSynth.pcm16MonoWav(p))
      })(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("doc_id", "payload")

  /** [[qMediaFeatures]] with the REAL `javax.sound.sampled` codec in the
    * decode seat ([[WavProvider]]) over [[wavMediaTable]] payloads — the
    * registered query that consumes genuinely-decoded PCM samples (the
    * r12 counterpart of the image column's ImageIO story). Oracle-able
    * in closed form: the decoded sample view reproduces the source text
    * bytes exactly (WavSynth contract), so DuckDB replays the feature
    * buckets from `ascii(text)` with container-derived metadata
    * (n_bytes = 44 + 2·n, width = n frames, height = 1, mono). Plan and
    * schema are IDENTICAL to the stub query's — the provider seam's
    * whole contract (MultimodalSpec pins both). */
  def qWavFeatures(
      spark: SparkSession, dir: String, dim: Int = 8): DataFrame =
    qMediaFeaturesFrom(wavMediaTable(spark, dir), dim, WavProvider)

  /** Resize/thumbnail plumbing through the decoder path: each payload is
    * downsampled to a 4×4 "thumbnail" (nearest-neighbor over the decoded
    * grid) inside `mapPartitions` — the same plan shape as a real image
    * resize (decoder init per partition, fixed-size output per row).
    * Emits the thumbnail as hex for oracle comparability. */
  def qMediaResize(
      spark: SparkSession, dir: String,
      tw: Int = 4, th: Int = 4,
      provider: MediaDecoderProvider = StubProvider): DataFrame =
    qMediaResizeFrom(mediaTable(spark, dir), tw, th, provider)

  /** [[qMediaResize]] over an arbitrary `(doc_id, payload)` frame. */
  def qMediaResizeFrom(
      media: DataFrame,
      tw: Int = 4, th: Int = 4,
      provider: MediaDecoderProvider = StubProvider): DataFrame = {
    media.select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        withDecoder(provider) { decoder =>
          rows.map { case (id, payload) =>
            val (w, h, _) = decoder.decode(payload) // ONCE per row
            val thumb = decoder.resize(payload, w, h, tw, th)
            (id, w.toLong, h.toLong,
              thumb.map("%02X".format(_)).mkString)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.STRING))
      .toDF("doc_id", "width", "height", "thumb_hex")
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
    * shape: explode bounded by per-row frame count).
    *
    * Plan shape matters: explode the (cheap, codegen'd) index sequence
    * FIRST and slice per output row, rather than building the frame array
    * with a `transform` lambda — higher-order functions evaluate
    * interpreted with per-element boxing, and the array construction
    * doubles peak row width. The repartition spreads per-document work
    * across cores when the source arrives as one split. */
  def qFrameSample(
      spark: SparkSession, dir: String, stride: Int = 3): DataFrame =
    mediaTable(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), col("payload"),
        posexplode(expr(s"sequence(0, int(octet_length(payload) / (8 * $stride)))"))
          .as(Seq("pos", "i")))
      .select(col("doc_id"), col("i").cast("long").as("frame_idx"),
        upper(hex(col("payload").substr(
          col("i") * (8 * stride) + 1, lit(8)))).as("frame_hex"))
      .filter(length(col("frame_hex")) > 0)
}
