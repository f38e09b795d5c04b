package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.relational.Tables

/** Corpus-preparation operators a training-data pipeline runs AFTER
  * dedup/quality scoring: cluster near-duplicates and pick canonical
  * docs, assign deterministic train/val/test splits, stratify-sample by
  * class, and pack documents into fixed token budgets. Everything is
  * hash- or order-deterministic (no RNG state), so identical inputs give
  * identical corpora on any cluster size — the reproducibility property
  * training pipelines need and `rand()`-based sampling can't give.
  */
object TrainingData {

  import Tables.load

  /** One computed cluster table per (session, dir): the iterative label
    * propagation is this module's only multi-job operator, and both its
    * direct query and the corpus-build composition consume the SAME
    * small checkpointed result — recomputing it per caller would re-run
    * the whole loop. Keyed by `sessionUUID` string (a cached DataFrame
    * strongly references its session, so weak keys would never collect);
    * entries live for the JVM, bounded by sessions × dirs. */
  private val clusterCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** Drop this session's cached cluster tables — REQUIRED after
    * rewriting the data under a cached dir mid-session, or the stale
    * keep-list keeps being served. */
  def invalidateCaches(spark: SparkSession): Unit =
    clusterCache.filterInPlace { case ((sid, _), _) => sid != org.apache.spark.sql.GraftShim.sessionId(spark) }

  /** Near-dup CLUSTERS from the exact-verified pair relation: connected
    * components, labeled by the minimum doc_id in each component, with
    * the canonical-keeper flag (the member equal to its cluster id).
    * Completes the dedup story: pairs say "these two match"; the cluster
    * keep-list is what a pipeline actually deletes against.
    *
    * Algorithm: alternating LARGE-STAR / SMALL-STAR contraction (Kiveris
    * et al., "Connected Components in MapReduce and Beyond") — per round,
    * large-star rewires every neighbor larger than a node to the
    * neighborhood minimum, small-star rewires the smaller neighbors
    * likewise; each pair of min-joins at least HALVES long chains, so the
    * round count is O(log diameter), not O(diameter) like plain label
    * propagation — the difference between 7 and 64 rounds on a 64-node
    * chain (asserted in TrainingDataSpec), and the property that makes
    * the loop safe against a pathological chain at 100 TB. The edge set
    * contracts to stars (every member adjacent to its component min) and
    * termination is an edge-set fixpoint, counted by one full-outer
    * anti-comparison per round (one action/round, same discipline as
    * before). Overrunning the round cap FAILS rather than silently
    * returning unconverged (wrong) labels.
    *
    * Oracle: DuckDB recursive-CTE reachability computing min reachable
    * id per node — an independent formulation of the same fixpoint.
    *
    * The result is cached per (session, dir) — the same checkpointed
    * frame is returned to every caller, so do NOT unpersist it; use
    * [[invalidateCaches]] when the underlying data changes. */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame =
    clusterCache.getOrElseUpdate((org.apache.spark.sql.GraftShim.sessionId(spark), dir),
      connectedComponents(
        graft.dedup.Dedup.qMinhashLshPairs(spark, dir)
          .select(col("d1"), col("d2")), spark))

  /** Connected components over an undirected pair relation `(d1, d2)` via
    * large-star/small-star; returns (doc_id, cluster_id, is_keeper) for
    * every endpoint, cluster labeled by its minimum member. Exposed for
    * reuse (and for TrainingDataSpec's synthetic-chain convergence
    * fixture, which feeds a 64-node path and asserts ≤ 8 rounds). */
  private[graft] def connectedComponents(
      pairs: DataFrame, spark: SparkSession): DataFrame =
    connectedComponentsWithRounds(pairs, spark)._1

  /** [[connectedComponents]] plus the number of contraction rounds taken
    * (the last round is the fixpoint-confirming one) — the observable the
    * O(log diameter) convergence test pins down. */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, spark: SparkSession): (DataFrame, Int) = {
    val p = spark.sparkContext.defaultParallelism
    // canonical undirected edge set (lo < hi), deduped once up front —
    // star-contraction is a SET algorithm; the fixpoint test needs
    // canonical rows
    var edges = pairs
      .select(least(col("d1"), col("d2")).as("lo"),
        greatest(col("d1"), col("d2")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .repartition(p, col("hi"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the node universe, captured BEFORE contraction: stars only keep
    // edges, and the label join below must cover every original endpoint
    val nodes = edges.select(col("lo").as("id"))
      .unionAll(edges.select(col("hi").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // O(log² n) worst case for star-contraction; 64 rounds is orders of
    // magnitude above any reachable graph and exists only to turn an
    // implementation bug into a loud failure instead of an infinite loop
    val maxRounds = 64
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // LARGE-STAR: from the symmetric neighborhood view, connect every
      // strictly-larger neighbor v of u to m = min(Γ(u) ∪ {u}). m ≤ u < v
      // keeps the (lo, hi) orientation canonical by construction.
      val sym = edges.select(col("lo").as("u"), col("hi").as("v"))
        .unionAll(edges.select(col("hi").as("u"), col("lo").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("m").as("lo"), col("v").as("hi"))
        .distinct()
      // SMALL-STAR: per high endpoint, rewire its smaller neighbors (and
      // itself) to their minimum. v ∈ smaller(hi) ⇒ v ≥ m, so orientation
      // stays canonical here too.
      val smins = large.groupBy("hi").agg(min("lo").as("m"))
      // localCheckpoint (eager), not persist: each round's plan embeds the
      // previous round's ~4× over (sym and the joins reference `edges`
      // repeatedly), so an uncut lineage grows 4^rounds — the checkpoint
      // truncates it to a leaf every round, the same periodic-truncation
      // discipline Pregel/GraphX use for iterative frames
      val next = large.join(smins, "hi")
        .filter(col("lo") =!= col("m"))
        .select(col("m").as("lo"), col("lo").as("hi"))
        .unionAll(smins.select(col("m").as("lo"), col("hi")))
        .distinct()
        .repartition(p, col("hi"))
        .localCheckpoint(true)
      // fixpoint test = set equality over two leaf frames: rows missing a
      // side of the full-outer join are the symmetric difference
      val changed = edges.withColumn("a", lit(1))
        .join(next.withColumn("b", lit(1)), Seq("lo", "hi"), "full_outer")
        .filter(col("a").isNull || col("b").isNull)
        .count()
      edges.unpersist()
      edges = next
      converged = changed == 0
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not converge in $maxRounds rounds")
    // converged stars: each non-root node has exactly one edge, to its
    // component minimum; roots (and any isolated canonical node) label
    // themselves
    val result = nodes
      .join(edges.select(col("hi").as("id"), col("lo").as("root")),
        Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("root"), col("id")).as("cluster_id"))
      .withColumn("is_keeper", col("doc_id") === col("cluster_id"))
      // truncate the iterative lineage so the cached intermediates can be
      // freed without the caller's action replaying the whole loop
      .localCheckpoint(true)
    edges.unpersist()
    nodes.unpersist()
    (result, rounds)
  }

  /** THE split policy — one definition, because two drifting copies of
    * the 80/90 cut or the hash width would silently put docs in
    * different splits in different queries (the contamination guarantee
    * is only as strong as its single source of truth). */
  private def bucketOf(docId: Column): Column =
    conv(substring(md5(docId.cast("string")), 1, 8), 16, 10)
      .cast("long") % 100

  private def splitOf(bucket: Column): Column =
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")

  /** Deterministic train/val/test assignment: bucket = leading 32 bits of
    * md5(doc_id) mod 100, split at 80/90. Hash-based (not `rand()`), so
    * the split is stable across runs, partitionings, and engines — a doc
    * never migrates between train and test when the corpus is rebuilt,
    * which is the contamination guarantee that matters. */
  def qSplitAssign(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(col("doc_id"), bucketOf(col("doc_id")).as("bucket"))
      .withColumn("split", splitOf(col("bucket")))

  /** Stratified sampling with per-class rates (rare classes kept whole,
    * dominant classes downsampled — the class-rebalancing step of a
    * training mix), decided per row by a content hash so the sample is
    * reproducible and join-free. Output is the per-class census the
    * pipeline logs: totals, sampled counts, achieved rate. */
  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = when(col("event_type") === "purchase", 1000)
      .when(col("event_type") === "click", 100)
      .otherwise(10) // per-mille
    load(spark, dir, "events")
      .withColumn("keep",
        (conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 1000) < rate)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"))
      .withColumn("achieved_rate",
        round(col("n_sampled").cast("double") / col("n_total"), 4))
  }

  /** The capstone composition — a corpus BUILD in one relation: quality
    * gate (token count + repetition bound) → exact-dup losers removed
    * (md5 groups keep min doc_id) → near-dup cluster losers removed
    * (the [[qDedupClusters]] keep-list) → deterministic split assignment
    * → per-(split, lang) census. Every stage is an operator this library
    * ships individually; the composition is what a user actually runs,
    * and it stays one declarative plan end-to-end (the dedup relations
    * are computed over the FULL corpus, then subtracted from the
    * quality-passing set — order documented because it changes counts).
    * All stages are hash/order-deterministic, so the whole five-stage
    * pipeline carries a single DuckDB oracle. */
  def qCorpusBuild(
      spark: SparkSession, dir: String,
      minTokens: Int = 20, maxBigramFrac: Double = 0.2): DataFrame = {
    val docs = load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
    // quality: enough tokens, not repetition-dominated (the same gram
    // counting the repetition stats use). The length gate applies BEFORE
    // the bigram explode — a doc that can't pass minTokens must not pay
    // for the pipeline's heaviest shuffle (conjunctive gates + inner
    // join make this equivalent).
    val longEnough = docs.filter(col("n_tokens") >= minTokens)
    val bigrams = graft.functions.shingle_list(col("text"), 2)
    val bgTop = longEnough
      .select(col("doc_id"), explode(bigrams).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("top_bg"), sum("c").as("n_bg"))
    val qualified = longEnough.join(bgTop, "doc_id")
      .filter(col("top_bg").cast("double") / col("n_bg") <= maxBigramFrac)
      .select("doc_id", "lang", "text", "n_tokens")
    // exact-dup losers: any copy that is not its text group's min doc_id
    val exactLosers = load(spark, dir, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep"), collect_list("doc_id").as("all"))
      .select(explode(col("all")).as("doc_id"), col("keep"))
      .filter(col("doc_id") =!= col("keep"))
      .select("doc_id")
    // near-dup losers: cluster members that are not the canonical keeper
    val nearLosers = qDedupClusters(spark, dir)
      .filter(!col("is_keeper"))
      .select("doc_id")
    qualified
      .join(exactLosers, Seq("doc_id"), "left_anti")
      .join(nearLosers, Seq("doc_id"), "left_anti")
      .withColumn("bucket", bucketOf(col("doc_id")))
      .withColumn("split", splitOf(col("bucket")))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
  }

  /** Greedy contiguous sequence packing: docs in doc_id order are packed
    * into fixed token budgets (`capacity`), each doc assigned to the bin
    * its RUNNING token total falls in — the streaming approximation of
    * bin packing every large-scale pretokenizer uses (true first-fit is
    * inherently sequential; contiguous packing is one window scan and
    * within a few percent of it on shuffled corpora). Output is the
    * per-bin census: docs, tokens, fill ratio. */
  def qPackSequences(
      spark: SparkSession, dir: String, capacity: Int = 2048): DataFrame = {
    // packing is per-language (streams are per-shard in a real pipeline):
    // the window partitions by lang, so the sequential scan parallelizes
    // across shards instead of serializing the corpus through one sort
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      .withColumn("running", sum("n_tokens").over(w))
      // bin of the doc's START offset: a doc straddling a boundary stays
      // in the bin it began in (contiguous packing semantics)
      .withColumn("bin",
        floor((col("running") - col("n_tokens")) / capacity).cast("long"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"))
      .withColumn("fill",
        round(col("n_tokens").cast("double") / capacity, 4))
  }
}
