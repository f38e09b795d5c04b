package graft.similarity

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.vec_dot
import graft.relational.Tables

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim,
  * unit-norm).
  *
  * Two paths:
  *   - [[qAnnBruteForce]]: exact cosine top-k — the correctness baseline.
  *   - [[qAnnLshBuckets]]: the scale path — sign-bit (axis-aligned
  *     hyperplane) LSH buckets with multi-probe, so candidate generation is
  *     a bucket-equi-join instead of a cross join. At 100 TB the cross join
  *     is impossible; the bucket join shuffles each side once on a
  *     low-cardinality key.
  *
  * Scoring uses the native [[FloatVectorDot]] kernel (codegen'd), with
  * per-vector norms computed ONCE before pairing — the naive per-pair
  * norm recomputation triples the hot-loop cost. Fold order is fixed
  * left-to-right, so results are bit-reproducible across engines.
  */
object Similarity {

  import Tables.load

  /** Cosine from a native left-to-right fold (for ad-hoc use; the queries
    * below precompute norms instead of re-deriving them per pair). */
  def cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))

  private def withNorm(df: DataFrame, v: String): DataFrame =
    df.withColumn("norm", sqrt(vec_dot(col(v), col(v))))

  /** Exact brute-force cosine top-k for query vectors `vec_id < nQueries`.
    * Deterministic: rank by rounded similarity with id tiebreak. */
  def qAnnBruteForce(
      spark: SparkSession, dir: String,
      nQueries: Int = 20, k: Int = 5): DataFrame = {
    val emb = load(spark, dir, "embeddings")
    val q = withNorm(emb.filter(col("vec_id") < nQueries), "embedding")
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("norm").as("qn"))
    val c = withNorm(emb, "embedding")
      .select(col("vec_id").as("nid"), col("embedding").as("nv"),
        col("norm").as("nn"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(vec_dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6)
          .as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Embedding-cosine near-dup pairs above a threshold (the embedding
    * variant of near-dedup). */
  def qEmbeddingNearDup(
      spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val emb = withNorm(load(spark, dir, "embeddings"), "embedding")
    val a = emb.select(col("vec_id").as("d1"), col("embedding").as("av"),
      col("norm").as("na"))
    val b = emb.select(col("vec_id").as("d2"), col("embedding").as("bv"),
      col("norm").as("nb"))
    a.join(b, col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(vec_dot(col("av"), col("bv")) / (col("na") * col("nb")), 6)
          .as("sim"))
      .filter(col("sim") > threshold)
  }

  /** Random-hyperplane LSH bucket id (native kernel; every plane projects
    * the full vector, so collisions track cosine similarity). */
  def signBucket(emb: Column, bits: Int): Column =
    graft.functions.hyperplane_bucket(emb, bits)

  /** Approximate top-k: candidates limited to the query's LSH bucket plus
    * all buckets within hamming distance `probeDist` (multi-probe). The
    * recall/cost dial: raise `bits` as the corpus grows (keeping bucket
    * size ~constant), raise `probeDist` for recall. Measured against
    * [[qAnnBruteForce]] in the test suite. */
  def qAnnLshBuckets(
      spark: SparkSession, dir: String,
      nQueries: Int = 20, k: Int = 5, bits: Int = 4,
      probeDist: Int = 2): DataFrame = {
    val emb = withNorm(load(spark, dir, "embeddings"), "embedding")
      .withColumn("bucket", signBucket(col("embedding"), bits))
    // XOR masks of all bit patterns with popcount <= probeDist
    val masks = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeDist)
    val probes = transform(
      lit(masks.toArray),
      m => col("bucket").bitwiseXOR(m))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("norm").as("qn"), explode(probes).as("bucket"))
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("nv"),
      col("norm").as("nn"), col("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(vec_dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6)
          .as("sim"))
      .distinct()
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }
}
