package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Change-data apply for a keyed parquet lake — the write-side operators
  * every incremental pipeline needs once a corpus stops being
  * append-only (crawl refreshes, takedown/deletion requests, metadata
  * backfills):
  *
  *   - [[merge]] — SQL-MERGE/upsert semantics (full-row update, insert,
  *     delete) applied as one declarative plan.
  *   - [[scd2Apply]] — slowly-changing-dimension type 2: attribute
  *     history is preserved as versioned rows instead of overwritten.
  *
  * Scale shape: the classic MERGE formulation is a FULL OUTER join,
  * which forces a sort-merge exchange of BOTH sides — including the
  * 100 TB target. Here the matched/unmatched cases are decomposed into
  * `target ANTI JOIN changes` ∪ `changes(op='U')`: the target-sized
  * side only ever feeds an anti join against the (typically
  * batch-sized) change set, which Spark executes as a broadcast
  * anti join — the target never shuffles at all. Deletes fall out for
  * free: a key with op='D' is removed by the anti join and contributes
  * no replacement row. All bookkeeping columns are integers, so both
  * operators replay bit-exactly in any engine.
  */
object LakeMerge {

  /** Open-ended `valid_to` sentinel (BIGINT, beyond any version stamp):
    * keeps the history table NULL-free, so version predicates
    * (`v BETWEEN valid_from AND valid_to`) never need three-valued logic. */
  val OpenVersion: Long = 999999999L

  /** MERGE `changes` into `target` on `key`.
    *
    * `changes` must carry the target's columns plus an `op` column:
    * 'U' = upsert (full-row replace or insert), 'D' = delete. A key may
    * appear at most once in `changes` (enforce upstream; the last-writer
    * collapse is a one-line `row_number` the caller owns, because WHICH
    * writer wins is policy, not mechanism).
    *
    * Plan: `target LEFT ANTI changes` keeps untouched rows — a
    * broadcast anti join for any reasonably-sized batch, so the
    * target-side scan streams straight to the sink with no exchange —
    * then the op='U' rows union in as both updates and inserts
    * (full-row replace makes the two cases the same row). */
  def merge(target: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val untouched = target.join(
      broadcast(changes.select(key).distinct()), Seq(key), "left_anti")
    untouched.unionByName(
      changes.filter(col("op") === "U").drop("op"))
  }

  /** Apply a change batch to an SCD2 history table.
    *
    * `history` rows: target attributes + (`valid_from`, `valid_to`)
    * BIGINT version stamps; the current version of a key is the row
    * with `valid_to` = [[OpenVersion]]. `changes` is as in [[merge]].
    * `version` stamps this batch.
    *
    * Semantics per key in `changes` (standard type-2 discipline):
    *   - op='U', attributes DIFFER from the open row (or no open row):
    *     close the open row at `version - 1` and append a new open row.
    *   - op='U', attributes unchanged: no-op (type 2 tracks real
    *     transitions; re-sent identical rows must not fork versions).
    *   - op='D': close the open row, no successor.
    * Closed rows are immutable history and pass through untouched.
    *
    * Plan shape: closed history passes through a filter (no join at
    * all); open rows anti/semi-join the broadcast batch; the appended
    * rows are batch-sized. The history table — the thing that is 100 TB
    * — is never shuffled. `trackedCols` is the attribute set whose
    * change forks a version. */
  def scd2Apply(
      history: DataFrame, changes: DataFrame, key: String,
      trackedCols: Seq[String], version: Long): DataFrame = {
    val closed = history.filter(col("valid_to") =!= OpenVersion)
    val open = history.filter(col("valid_to") === OpenVersion)

    def tracked(side: String): Column =
      struct(trackedCols.map(c => col(s"$side.$c")): _*)

    // open rows × batch: LEFT join on the broadcast batch classifies
    // each open row as untouched (no match), re-sent-identical (match,
    // equal attributes), superseded, or deleted — in one pass
    val cls = open.alias("o").join(
      broadcast(changes.alias("c")), col(s"o.$key") === col(s"c.$key"), "left")
    val untouchedOrResent = cls
      .filter(col("c.op").isNull ||
        (col("c.op") === "U" && tracked("o") === tracked("c")))
      .select(open.columns.map(c => col(s"o.$c")): _*)
    val nowClosed = cls
      .filter(col("c.op") === "D" ||
        (col("c.op") === "U" && tracked("o") =!= tracked("c")))
      .select(open.columns.map(c => col(s"o.$c")): _*)
      .withColumn("valid_to", lit(version - 1))

    // new open rows: updates that changed something, plus true inserts
    // (no open row) — anti-join back against rows that stayed current,
    // computed batch-side so it needs only batch-sized frames
    val resentKeys = cls
      .filter(col("c.op") === "U" && tracked("o") === tracked("c"))
      .select(col(s"o.$key"))
    val appended = changes.filter(col("op") === "U")
      .join(broadcast(resentKeys), Seq(key), "left_anti")
      .drop("op")
      .withColumn("valid_from", lit(version))
      .withColumn("valid_to", lit(OpenVersion))

    closed.unionByName(untouchedOrResent).unionByName(nowClosed)
      .unionByName(appended)
  }

  // ---- registry queries (deterministic change batch over testdata) ----

  import graft.relational.Tables.load

  private val custCols =
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  /** The customer dimension restricted to the merge's attribute set. */
  private def custDim(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    load(spark, dir, "customer").select(custCols.map(col): _*)

  /** Deterministic change batch derived from order activity (mirrored
    * line-for-line by the DuckDB oracles):
    *   - heavy customers (≥15 orders): upsert with `c_acctbal` set to
    *     their order count — a guaranteed-visible attribute change;
    *   - mid customers (10–14 orders): re-sent IDENTICAL row — the
    *     upsert that must NOT fork an SCD2 version;
    *   - order-less keys ≡ 0 (mod 5): brand-new customer at
    *     key + 1,000,000 (the insert case);
    *   - order-less keys ≡ 1 (mod 5): deletion request. */
  private[sources] def changeBatch(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val cnts = load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("cnt"))
    val src = custDim(spark, dir).join(cnts, Seq("c_custkey"), "left")
    val upd = src.filter(col("cnt") >= 15)
      .withColumn("c_acctbal", col("cnt").cast("double"))
    val resent = src.filter(col("cnt").between(10, 14))
    val ins = src.filter(col("cnt").isNull && col("c_custkey") % 5 === 0)
      .withColumn("c_custkey", col("c_custkey") + 1000000L)
      .withColumn("c_acctbal", lit(0.0))
    val del = src.filter(col("cnt").isNull && col("c_custkey") % 5 === 1)
    upd.unionByName(resent).unionByName(ins)
      .select(custCols.map(col) :+ lit("U").as("op"): _*)
      .unionByName(del.select(custCols.map(col) :+ lit("D").as("op"): _*))
  }

  /** MERGE the change batch into the customer dimension. */
  def qLakeMerge(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    merge(custDim(spark, dir), changeBatch(spark, dir), "c_custkey")

  /** Keyed diff of two lake snapshots: which keys were added, removed,
    * or changed between versions — the incremental-validation op a
    * pipeline runs after every merge/compaction/backfill to prove the
    * write did exactly what it claimed. Rows are compared by a digest
    * of their attribute columns (`digest` must be engine-reproducible —
    * fixed-point any floats first, the [[graft.relational.Observe]]
    * manifest discipline); `unchanged` rows are NOT emitted — at 100 TB
    * the overwhelming majority of rows is unchanged and materializing
    * them would make the diff as big as the lake.
    *
    * Scale shape: one co-partitioned full outer join on the lake key —
    * with both snapshots bucketed on `key` (the layout [[ParquetLake
    * .writeBucketed]] produces) the join is exchange-free; the output
    * is change-sized. */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame, key: String,
      digest: Column): DataFrame = {
    val o = oldDf.select(col(key), digest.as("od"))
    val n = newDf.select(col(key), digest.as("nd"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("status",
        when(col("od").isNull, lit("added"))
          .when(col("nd").isNull, lit("removed"))
          .when(col("od") =!= col("nd"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col(key), col("status"))
  }

  /** Diff the merged customer snapshot against the original: recovers
    * exactly the change batch's visible effect (inserts → added,
    * deletes → removed, real updates → changed, re-sent identical rows
    * → absent). Doubles enter the digest as exact cents. */
  def qSnapshotDiff(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val digest = md5(concat_ws(":",
      col("c_custkey").cast("string"), col("c_name"),
      col("c_nationkey").cast("string"),
      floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").cast("string"),
      col("c_mktsegment")))
    snapshotDiff(custDim(spark, dir), qLakeMerge(spark, dir),
      "c_custkey", digest)
  }

  /** Incrementally maintain an ADDITIVE aggregate state table under a
    * delta batch — the materialized-view-maintenance op (per-key counts
    * and sums absorb each micro-batch instead of recomputing the
    * aggregate over all history).
    *
    * `state` and `delta` share the schema (`key`, metrics…); metrics
    * must be additive (count/sum — avg is kept as (count, sum)). The
    * state — the 100 TB side — is never shuffled: existing keys update
    * via a broadcast left join, and the new-key leg derives from a
    * broadcast SEMI join whose output is delta-bounded, so both state
    * passes are streamed scans. Equivalence with full recomputation
    * over all ingested rows is model-checked in LakeMergeSpec. */
  def mergeAdditive(state: DataFrame, delta: DataFrame, key: String,
      metrics: Seq[String]): DataFrame = {
    val updated = state.alias("s")
      .join(broadcast(delta.alias("d")),
        col(s"s.$key") === col(s"d.$key"), "left")
      .select(col(s"s.$key").as(key) +: metrics.map(m =>
        (col(s"s.$m") + coalesce(col(s"d.$m"), lit(0L))).as(m)): _*)
    val matchedKeys = state
      .join(broadcast(delta.select(key).distinct()), Seq(key), "left_semi")
      .select(key)
    val fresh = delta.join(broadcast(matchedKeys), Seq(key), "left_anti")
    updated.unionByName(fresh)
  }

  /** Per-user (count, cents) aggregate maintained incrementally over
    * the event stream split into three arrival batches (`event_id % 3`)
    * — the state after the last batch must equal (and its oracle IS)
    * the one-shot aggregate over everything. */
  def qIncrAgg(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val ev = graft.relational.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    def batchAgg(b: Int): DataFrame = ev
      .filter(pmod(col("event_id"), lit(3)) === b)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
    (1 to 2).foldLeft(batchAgg(0)) { (state, b) =>
      mergeAdditive(state, batchAgg(b), "user_id",
        Seq("n_events", "sum_cents"))
    }
  }

  /** Incrementally maintain a JOIN-aggregate view under deltas on BOTH
    * join sides — the two-sided companion to [[mergeAdditive]]'s
    * single-table state absorb. The view is revenue per market segment
    * over orders ⋈ customer; the fact delta is the trailing 180 days of
    * orders (late-arriving facts), the dimension delta is every 20th
    * customer (late-arriving dimension rows, withheld from the base).
    *
    * The maintenance algebra: Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — each leg
    * bounded by a delta side, so at 100 TB the big relations are each
    * STREAM-SCANNED once against a broadcast delta (the stored base
    * view — here recomputed to have something to merge into — is a
    * maintained artifact that never reaggregates history). The output
    * exposes base, delta, and merged view per segment; the DuckDB
    * oracle derives delta by SUBTRACTION (full − base), an independent
    * formulation that only hash-matches if the three-leg algebra
    * neither drops nor double-counts a single join pair. */
  def qIvmJoin(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val orders = graft.relational.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val cut = orders
      .agg(expr("max(o_orderdate) - interval 180 days").as("cut"))
    val o = orders.crossJoin(broadcast(cut))
    val oBase = o.filter(col("o_orderdate") < col("cut"))
    val oDelta = o.filter(col("o_orderdate") >= col("cut"))
    val cust = graft.relational.Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val cBase = cust.filter(pmod(col("c_custkey"), lit(20)) =!= 0)
    val cDelta = cust.filter(pmod(col("c_custkey"), lit(20)) === 0)
    def pairs(os: DataFrame, cs: DataFrame): DataFrame =
      os.join(cs, col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("cents"))
    def agg(df: DataFrame): DataFrame = df.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("cents").as("rev"))
    val base = agg(pairs(oBase, cBase))
    val delta = agg(pairs(oDelta, cBase)
      .unionByName(pairs(oBase, broadcast(cDelta)))
      .unionByName(pairs(oDelta, broadcast(cDelta))))
    base.withColumnRenamed("n", "bn").withColumnRenamed("rev", "brev")
      .join(delta.withColumnRenamed("n", "dn")
        .withColumnRenamed("rev", "drev"),
        Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("bn"), lit(0L)).as("n_base"),
        coalesce(col("brev"), lit(0L)).as("rev_base_cents"),
        coalesce(col("dn"), lit(0L)).as("n_delta"),
        coalesce(col("drev"), lit(0L)).as("rev_delta_cents"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_view"),
        (coalesce(col("brev"), lit(0L)) + coalesce(col("drev"), lit(0L)))
          .as("rev_view_cents"))
  }

  /** SCD2-apply the change batch to a version-0 history of the customer
    * dimension; emits the full version history. */
  def qScd2(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val history0 = custDim(spark, dir)
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(OpenVersion))
    scd2Apply(history0, changeBatch(spark, dir), "c_custkey",
      trackedCols = Seq("c_acctbal", "c_mktsegment"), version = 1L)
  }
}
