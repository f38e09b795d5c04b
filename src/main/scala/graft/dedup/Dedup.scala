package graft.dedup

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.relational.Tables

/** Deduplication operators for a training-data pipeline: exact,
  * n-gram-Jaccard, MinHash+LSH, and SimHash near-dup detection over the
  * `documents` table.
  *
  * Scale design: shingling, signatures and banding are all per-row column
  * expressions (no UDFs, no explode until the last possible moment). The
  * only shuffles are (a) the band-bucket grouping — whose fan-in is bounded
  * by band-hash cardinality, not corpus size — and (b) the candidate-pair
  * verification join, whose size LSH keeps near-linear. A naive
  * all-pairs token join would be quadratic in documents-per-token and is
  * exactly what this module avoids at 100 TB.
  */
object Dedup {

  import Tables.load

  /** Exact dedup with a deterministic keeper: groups of identical texts,
    * keyed by content hash, keeping the smallest doc_id. */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Contiguous 4-token shingles (distinct per doc) via the native
    * single-pass [[graft.text.ShingleSet]] kernel (the HOF formulation —
    * `transform` + `slice` + `array_join` + `array_distinct` — evaluates
    * interpreted and costs ~2× on the dedup hot path). 4-gram shingles
    * keep the shingle vocabulary large enough that the candidate join
    * stays near-linear (see module scaladoc). */
  def shingles(text: Column, n: Int = 4): Column =
    graft.functions.shingle_set(text, n)

  /** Documents hash-repartitioned on `doc_id`: shingling/signature maps
    * then run on all cores even when the source parquet is one split
    * (locally it is; at scale the repartition cost is noise next to the
    * per-token work it parallelizes). */
  private def docs(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))

  private def shingleSets(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(shingles(col("text"))).as("sh"))

  /** Exact n-gram (4-token shingle) Jaccard near-dup pairs at
    * threshold >= 0.5. Integer intersection/union counts; the single
    * division is deterministic, so an SQL oracle matches exactly. */
  def qNgramJaccardPairs(
      spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val sh = shingleSets(spark, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signature of `numHashes` permutations over a shingle-array
    * column, via the native one-pass [[graft.text.MinHashSig]] kernel
    * (k running minima per row; the HOF formulation hashes every shingle
    * k times through interpreted lambdas). NULL for empty shingle sets. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    graft.functions.minhash_sig(shingleCol, numHashes)

  /** MinHash + LSH near-dup pairs: signatures → banded bucket join for
    * candidates → exact Jaccard verification. Scale path for near-dedup:
    * candidate generation is linear in corpus size (band-bucket grouping),
    * never all-pairs. Approximate in recall only — every reported pair is
    * exact-verified. */
  def qMinhashLshPairs(
      spark: SparkSession, dir: String,
      numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val docs = this.docs(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh_arr"))
      .select(col("doc_id"), minhashSignature(col("sh_arr"), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
    val banded = docs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        .as(Seq("band", "bucket")))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val sh = shingleSets(spark, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    candidates
      .join(sh.select(col("doc_id").as("d1"), col("sh")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("sh")), Seq("d2", "sh"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash signature: per-bit majority vote over token hashes,
    * emitted as 4 × 16-bit band values (bands double as LSH buckets).
    * Computed by the native one-pass [[graft.text.SimHashBands]] kernel —
    * a pure map; the explode-then-64-aggregates formulation costs a full
    * groupBy shuffle of every token in the corpus. `md5Hash` selects the
    * engine-portable token hash (oracle-checkable) over XXH64 (fast). */
  private def simhashBands(
      spark: SparkSession, dir: String, md5Hash: Boolean): DataFrame = {
    val sig = graft.functions.simhash_bands(col("text"), md5Hash)
    docs(spark, dir)
      .select(col("doc_id") +: (0 until 4).map(k =>
        element_at(sig, k + 1).as(s"band$k")): _*)
  }

  /** Edit-distance fuzzy dedup over part names, BANDED by brand so the
    * pair space is sum-of-squares-per-band, never corpus-quadratic — the
    * same blocking discipline as the LSH paths (at 100 TB an unbanded
    * levenshtein self-join is impossible; a good blocking key bounds
    * each band). Both engines implement the same classic DP distance,
    * so the result is oracle-exact. */
  def qEditDistancePairs(
      spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
      .repartition(spark.sparkContext.defaultParallelism, col("p_brand"))
    part.as("a")
      .join(part.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("k1"), col("b.p_partkey").as("k2"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** SimHash near-dup pairs: candidates share at least one 16-bit band
    * (pigeonhole: hamming<=3 guarantees a shared band), verified by exact
    * hamming distance over the full 64-bit signature. */
  def qSimhashPairs(
      spark: SparkSession, dir: String, maxHamming: Int = 3,
      md5Hash: Boolean = false): DataFrame = {
    val sigs = simhashBands(spark, dir, md5Hash)
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until 4).map(k => col(s"band$k")): _*))
        .as(Seq("band", "value")))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.value") === col("b.value") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val sigA = sigs.select(col("doc_id").as("d1") +:
      (0 until 4).map(k => col(s"band$k").as(s"a$k")): _*)
    val sigB = sigs.select(col("doc_id").as("d2") +:
      (0 until 4).map(k => col(s"band$k").as(s"b$k")): _*)
    val hamming = (0 until 4).map(k =>
      bit_count(col(s"a$k").bitwiseXOR(col(s"b$k")))).reduce(_ + _)
    candidates.join(sigA, "d1").join(sigB, "d2")
      .withColumn("hamming", hamming.cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("d1", "d2", "hamming")
  }
}
