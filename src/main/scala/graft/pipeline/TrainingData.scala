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
    * Algorithm: min-label propagation to fixpoint — per round every node
    * takes the min of its own and its neighbors' labels, a convergence
    * count decides termination (the driver-side count is a convergence
    * CHECK, not data movement — the same shape Pregel/GraphX use).
    * Rounds = graph diameter; near-dup components are shallow (pairs,
    * triangles, small chains), so 2-4 rounds in practice. At 100 TB the
    * same loop runs with the large-star/small-star optimization
    * (alternating min-joins that halve long chains) — the edge relation
    * here is already the LSH-bucketed one, never all-pairs.
    *
    * Oracle: DuckDB recursive-CTE reachability computing min reachable
    * id per node — an independent formulation of the same fixpoint.
    *
    * The result is cached per (session, dir) — the same checkpointed
    * frame is returned to every caller, so do NOT unpersist it; use
    * [[invalidateCaches]] when the underlying data changes. */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame =
    clusterCache.getOrElseUpdate((org.apache.spark.sql.GraftShim.sessionId(spark), dir),
      computeDedupClusters(spark, dir))

  private def computeDedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.dedup.Dedup.qMinhashLshPairs(spark, dir)
      .select(col("d1"), col("d2"))
    // undirected: propagate both ways. Cached PRE-HASHED on the join key
    // (d2): the static side of an iterative join must not reshuffle every
    // round — with matching partitioning the per-round exchange touches
    // only the small moving labels side (the GraphX discipline).
    val edges = pairs
      .unionAll(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
      .repartition(spark.sparkContext.defaultParallelism, col("d2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cached = edges.select(col("d1").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = cached
    // termination: every round either converges or strictly decreases at
    // least one label, and a component of diameter d converges within d
    // rounds — the cap only guards against an implementation bug, and
    // overrunning it FAILS rather than silently returning unconverged
    // (wrong) labels
    val maxRounds = 10000
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val nbrMin = edges
        .join(labels.select(col("id").as("d2"), col("lbl").as("nlbl")), "d2")
        .groupBy(col("d1").as("id"))
        .agg(min("nlbl").as("nbr"))
      // carry the previous label through the same join, so the round's
      // ONE action materializes the new labels AND counts the changes
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nbr"), col("lbl"))).as("lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.filter(col("lbl") =!= col("old")).count()
      cached.unpersist()
      cached = next
      labels = next.select(col("id"), col("lbl"))
      converged = changed == 0
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge in $maxRounds rounds")
    // truncate the iterative lineage so the cached intermediates can be
    // freed without the caller's action replaying the whole loop
    val result = labels
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
        (col("id") === col("lbl")).as("is_keeper"))
      .localCheckpoint(true)
    cached.unpersist()
    edges.unpersist()
    result
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
