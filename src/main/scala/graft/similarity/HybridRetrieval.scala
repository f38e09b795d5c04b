package graft.similarity

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.text.TextOps

/** Hybrid retrieval — reciprocal-rank fusion (RRF) of a lexical and a
  * dense retriever, the standard way a RAG stack combines BM25 with
  * embedding search (Cormack et al.'s RRF: score = Σ 1/(k₀ + rank)).
  *
  * The fused score is kept EXACT: each list contributes
  * `RrfScale div (RrfK + rank)` — a truncating integer division — and
  * the per-candidate sum of integers is order-free, so the fused
  * ranking replays bit-identically in any engine (IEEE 1/(60+r) sums
  * would not). Both input ranks are themselves integer-deterministic
  * (BM25's exact rational score; cosine rounded to 1e-6 with id
  * tiebreak — the same rank contract their own oracles hash).
  *
  * Scale shape: all the heavy lifting stays inside the two retrievers
  * (each already k-bounded per query — see [[TextOps.bm25TopK]] and
  * [[Similarity.qAnnBruteForce]]); fusion itself touches only
  * nQueries × k rows per list, a projection-only union and one
  * map-side-combinable aggregation, then the native top-k operator.
  * At 100 TB the retriever lists are still k-sized per query — fusion
  * cost is independent of corpus size by construction.
  */
object HybridRetrieval {

  /** Fixed-point scale for one reciprocal-rank contribution. 1e9 keeps
    * nine significant digits of 1/(k₀+rank) and the sum of a few lists
    * far below Long overflow. */
  val RrfScale: Long = 1000000000L

  /** RRF's rank-smoothing constant k₀ (60 is the constant from the
    * original paper and what search engines ship by default). */
  val RrfK: Int = 60

  /** Fuse ranked lists (`qid`, `id`, `rnk`) into a top-`kOut` per query
    * by summed reciprocal-rank, ties broken by smallest id. Also emits
    * `n_lists`, the number of lists that proposed the candidate — the
    * agreement diagnostic a retrieval dashboard plots. */
  def rrfFuse(lists: Seq[DataFrame], kOut: Int): DataFrame = {
    val contribs = lists.map(_.select(col("qid"), col("id"),
      expr(s"${RrfScale}L div ($RrfK + rnk)").as("c")))
    val fused = contribs.reduce(_ unionAll _)
      .groupBy("qid", "id")
      .agg(sum("c").as("rrf_fp"), count(lit(1)).as("n_lists"))
    graft.plans.TopK.topKPerKey(fused,
      keys = Seq(col("qid")),
      order = Seq(col("rrf_fp").desc, col("id").asc),
      k = kOut)
  }

  /** Hybrid retrieval over the corpus: queries are ids < `nQueries`,
    * each retriever returns its top `kIn`, fusion keeps the top `kOut`.
    * The lexical list runs BM25 over `documents.text`; the dense list
    * runs exact cosine over the parallel `embeddings` table (vec_id is
    * the same id space as doc_id). */
  def qRrfFusion(
      spark: SparkSession, dir: String,
      nQueries: Int = 20, kIn: Int = 10, kOut: Int = 5): DataFrame = {
    val lex = TextOps.qBm25TopK(spark, dir, nQueries, kIn)
      .select(col("qid"), col("doc_id").as("id"), col("rnk"))
    val den = Similarity.qAnnBruteForce(spark, dir, nQueries, kIn)
      .select(col("qid"), col("nid").as("id"), col("rnk"))
    rrfFuse(Seq(lex, den), kOut)
  }
}
