package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Allowlist gate for partition-less windows — the WindowExec shape that
  * funnels the whole input through ONE task.
  *
  * The full test log carries ~359 `WindowExec: No Partition Defined`
  * warnings, all from human-audited windows over bounded histograms
  * (distinct-value / hour / bin tables with documented cardinality
  * bounds — r9 audit). At that volume a NEW, genuinely-unbounded
  * one-partition window would be invisible in the log: this spec closes
  * that silent-regression class the same way CodegenGateSpec closed
  * interpreter fallbacks — the analyzed plan of EVERY registered query
  * is swept, and the set of queries containing a partition-less
  * `logical.Window` must equal the pinned allowlist below. Adding a
  * global window to any query (or a new query) fails here until a human
  * audits the window's input cardinality and extends the list.
  */
class WindowAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Partition-less Window nodes anywhere in the analyzed logical plan
    * (pre-execution — subqueries included via innerChildren traversal). */
  private def unpartitionedWindows(df: DataFrame): Seq[logical.Window] = {
    def sweep(p: logical.LogicalPlan): Seq[logical.Window] =
      p.collect { case w: logical.Window if w.partitionSpec.isEmpty => w } ++
        p.collect { case n => n.subqueries.flatMap(sweep) }.flatten
    sweep(df.queryExecution.analyzed)
  }

  test("detector sees a deliberately-unpartitioned window over documents") {
    // self-test of the detection machinery: the exact regression this
    // gate exists to catch must be visible to it
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bad = docs.withColumn("rn", row_number().over(Window.orderBy("doc_id")))
    assert(unpartitionedWindows(bad).nonEmpty)
    // and a properly partitioned window is NOT flagged
    val ok = docs.withColumn("rn",
      row_number().over(Window.partitionBy("lang").orderBy("doc_id")))
    assert(unpartitionedWindows(ok).isEmpty)
  }

  test("every partition-less window in the query registry is allowlisted") {
    // Audited global windows (r9 audit, re-pinned here). Every entry runs
    // over a bounded histogram/summary, never a raw corpus-sized table:
    // cardinality bound in the comment.
    val allow = Set(
      "q_auc",                // cum-FP sweep over the distinct fixed-point score histogram
      "q_drift_psi",          // rank-select over per-hour + distinct-cents histograms
      "q_effective_diameter", // radius+1 rows (constant)
      "q_funnel_latency",     // rank-select over the distinct-seconds latency histogram
      "q_isotonic",           // PAV straddle over <= ~100 fixed-width price bins
      "q_key_skew",           // rank-select over the distinct-frequency histogram
      "q_slo_burn",           // rolling window over the calendar-bounded hourly spine
      "q_sprt",               // cumulative LLR over the calendar-bounded hourly spine
      "q_vocab_growth",       // Heaps checkpoints over log2(n_docs) <= 64 buckets
      "q_wilson_ctr")         // ranking over the 24-row hour-of-day census
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        if (unpartitionedWindows(fn(spark, dir)).nonEmpty) Some(name) else None
      }.toSet
    val unexpected = offenders.diff(allow)
    val stale = allow.diff(offenders)
    info(s"full partition-less-window set: ${offenders.toSeq.sorted}")
    assert(unexpected.isEmpty,
      s"NEW partition-less window(s) in: $unexpected — a global window " +
        "funnels its whole input through one task; audit the input " +
        "cardinality bound and extend the allowlist only if bounded")
    assert(stale.isEmpty,
      s"stale allowlist entries (no longer contain a global window): $stale")
  }
}
