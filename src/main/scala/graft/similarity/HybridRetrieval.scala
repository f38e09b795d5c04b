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

  /** Fixed-point DCG rank weights: wᵣ = ⌊10⁹/log₂(r+1) + ½⌋. The ONE
    * definition both the Spark plan and the DuckDB oracle interpolate
    * as literals (the BpeVocab single-source rule), so no engine ever
    * recomputes a logarithm — DCG sums become exact integer sums,
    * order-free. */
  def ndcgWeights(k: Int): Seq[(Long, Long)] =
    (1 to k).map { r =>
      (r.toLong,
        math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong)
    }

  /** Ideal-DCG prefix sums: (cap, Σ first `cap` weights) for
    * cap = 1..k — the IDCG of a query with `cap` relevant docs. */
  def ndcgIdealPrefix(k: Int): Seq[(Long, Long)] = {
    val w = ndcgWeights(k).map(_._2)
    (1 to k).map(c => (c.toLong, w.take(c).sum))
  }

  /** nDCG@k eval of all three retrieval systems (BM25, dense cosine,
    * RRF hybrid) against a label ground truth — the standard offline
    * relevance gate a retrieval stack runs before shipping a ranker
    * change. Relevance is binary share-a-label (the `embeddings.label`
    * column; doc_id and vec_id are the same id space), so judgments are
    * data, not a model.
    *
    * Everything is integer: DCG = Σ wᵣ over relevant hits with the
    * interpolated [[ndcgWeights]] literals; IDCG is the rank-selected
    * [[ndcgIdealPrefix]] entry at min(n_rel, k); per-query
    * nDCG = dcg·10⁶ div idcg; the per-system mean is an integer
    * (sum div count). Queries with no relevant doc in the corpus are
    * excluded (IDCG undefined), mirrored by the oracle.
    *
    * Scale shape: the retrievers already bound their lists to k per
    * query; everything downstream touches nQueries × k × 3 rows. The
    * relevance join streams the k-bounded lists against the label
    * table on id; weights and prefix sums broadcast as literal
    * relations. */
  /** The three systems' k-lists ('bm25' / 'dense' / 'hybrid') plus the
    * label judgments — ONE definition consumed by every retrieval eval
    * (the Spark twin of the oracle-side `retrievalListCtes`): a BM25
    * constant or tie-break fix must reach every eval at once or they
    * silently diverge from each other and their oracles. Returns
    * (lists, labels, qLab). */
  private def evalLists(
      spark: SparkSession, dir: String, nQueries: Int, k: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val lex = TextOps.qBm25TopK(spark, dir, nQueries, k)
      .select(col("qid"), col("doc_id").as("id"), col("rnk"))
    val den = Similarity.qAnnBruteForce(spark, dir, nQueries, k)
      .select(col("qid"), col("nid").as("id"), col("rnk"))
    val fused = rrfFuse(Seq(lex, den), k)
      .select(col("qid"), col("id"), col("rnk"))
    val lists = lex.select(lit("bm25").as("system"), col("qid"),
        col("id"), col("rnk"))
      .unionAll(den.select(lit("dense").as("system"), col("qid"),
        col("id"), col("rnk")))
      .unionAll(fused.select(lit("hybrid").as("system"), col("qid"),
        col("id"), col("rnk")))
    val labels = graft.relational.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val qLab = labels.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"))
    (lists, labels, qLab)
  }

  def qNdcgEval(
      spark: SparkSession, dir: String,
      nQueries: Int = 20, k: Int = 10): DataFrame = {
    import spark.implicits._
    val (lists, labels, qLab) = evalLists(spark, dir, nQueries, k)
    val wDf = broadcast(ndcgWeights(k).toDF("rnk", "w_fp"))
    val dcg = lists
      .join(broadcast(qLab), "qid")
      .join(labels.select(col("vec_id").as("id"),
        col("label").as("dlabel")), "id")
      .join(wDf, "rnk")
      .groupBy("system", "qid")
      .agg(sum(when(col("dlabel") === col("qlabel"), col("w_fp"))
        .otherwise(0L)).as("dcg_fp"))
    val nRel = labels.select(col("vec_id").as("id"),
        col("label").as("dlabel"))
      .join(broadcast(qLab), col("dlabel") === col("qlabel"))
      .filter(col("id") =!= col("qid"))
      .groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val idcg = nRel.filter(col("n_rel") > 0)
      .withColumn("cap", least(col("n_rel"), lit(k.toLong)))
      .join(broadcast(ndcgIdealPrefix(k).toDF("cap", "idcg_fp")), "cap")
    dcg.join(idcg, "qid")
      .select(col("system"), col("qid"),
        expr("dcg_fp * 1000000 div idcg_fp").as("ndcg_ppm"))
      .groupBy("system")
      .agg(count(lit(1)).as("n_queries"),
        expr("sum(ndcg_ppm) div count(1)").as("mean_ndcg_ppm"))
  }

  /** MRR@k + hit-rate eval of the same three systems against the same
    * binary share-a-label judgments as [[qNdcgEval]] — the
    * first-relevant-hit metric a RAG stack optimizes when only one
    * passage gets stuffed into the prompt. Per query the reciprocal
    * rank is the exact integer `10⁶ div r₁` (r₁ = best relevant rank in
    * the k-list, 0 when the list misses entirely); the query universe
    * is the ndcg one (≥1 relevant doc exists in the corpus), held fixed
    * across systems by a universe×system grid left-join so a system
    * that whiffs scores 0 rather than silently shrinking its mean's
    * denominator. All integer; same k-bounded row counts as ndcg. */
  def qMrrEval(
      spark: SparkSession, dir: String,
      nQueries: Int = 20, k: Int = 10): DataFrame = {
    import spark.implicits._
    val (lists, labels, qLab) = evalLists(spark, dir, nQueries, k)
    val firstRel = lists
      .join(broadcast(qLab), "qid")
      .join(labels.select(col("vec_id").as("id"),
        col("label").as("dlabel")), "id")
      .filter(col("dlabel") === col("qlabel"))
      .groupBy("system", "qid").agg(min("rnk").as("r1"))
    val universe = labels.select(col("vec_id").as("id"),
        col("label").as("dlabel"))
      .join(broadcast(qLab), col("dlabel") === col("qlabel"))
      .filter(col("id") =!= col("qid"))
      .select("qid").distinct()
    val grid = universe
      .crossJoin(broadcast(Seq("bm25", "dense", "hybrid").toDF("system")))
    grid.join(firstRel, Seq("system", "qid"), "left")
      .select(col("system"),
        coalesce(expr("1000000 div r1"), lit(0L)).as("rr_ppm"),
        when(col("r1").isNotNull, 1L).otherwise(0L).as("hit"),
        when(col("r1") === 1, 1L).otherwise(0L).as("hit1"))
      .groupBy("system")
      .agg(count(lit(1)).as("n_queries"),
        expr("sum(rr_ppm) div count(1)").as("mean_rr_ppm"),
        sum("hit").as("n_hit"),
        sum("hit1").as("n_hit_at_1"))
  }
}
