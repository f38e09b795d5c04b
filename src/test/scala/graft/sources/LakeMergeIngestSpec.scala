package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming MERGE twin: per-micro-batch change sets applied to a keyed
  * lake with the batch operator's broadcast-anti-join decomposition,
  * proven equal to sequential batch merges, idempotent under
  * redelivery, and restart-safe from a checkpoint. */
class LakeMergeIngestSpec extends SparkSpec {
  import spark.implicits._

  private def initial = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
    (4L, "d", 40.0), (5L, "e", 50.0)
  ).toDF("k", "name", "bal")

  // three CDC micro-batches; batch 2 carries TWO changes for key 5
  // (update then delete) — the last writer by seq must win
  private val b0 = Seq(
    (2L, "b", 99.0, "U", 1L), (9L, "z", 0.0, "U", 2L))
  private val b1 = Seq(
    (2L, "b", 77.0, "U", 3L), (4L, "d", 40.0, "D", 4L))
  private val b2 = Seq(
    (5L, "e", 55.0, "U", 5L), (5L, "e", 55.0, "D", 6L),
    (10L, "y", 1.0, "U", 7L))
  private val cols = Seq("k", "name", "bal", "op", "seq")

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").as[(Long, String, Double)].collect().toSeq

  /** Sequential batch-operator application — the reference the stream
    * fold must reproduce (LakeMerge.merge is itself oracle-verified). */
  private def reference(batches: Seq[Seq[(Long, String, Double, String, Long)]]) =
    batches.foldLeft(initial) { (t, b) =>
      LakeMerge.merge(t, LakeMergeIngest.lastWriter(b.toDF(cols: _*), "k"), "k")
    }

  test("stream fold over micro-batches equals sequential batch merges") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double, String, Long)]
    val state = new LakeMergeIngest.MergeState(spark, initial, "k")
    val q = LakeMergeIngest.start(input.toDF.toDF(cols: _*), state)
    try {
      Seq(b0, b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
      assert(table(state.table) === table(reference(Seq(b0, b1, b2))))
      // the within-batch last-writer really decided: key 5's final op
      // was the delete at seq 6, key 2 holds batch 1's 77.0
      val t = table(state.table).map { case (k, _, b) => k -> b }.toMap
      assert(!t.contains(5L) && !t.contains(4L))
      assert(t(2L) === 77.0)
      assert(t(10L) === 1.0)
      assert(state.generationsApplied === 3)
    } finally q.stop()
  }

  test("redelivered batch is a no-op: batchId skip AND merge idempotence") {
    val state = new LakeMergeIngest.MergeState(spark, initial, "k")
    val batch = b0.toDF(cols: _*)
    LakeMergeIngest.foldBatch(state, batch, batchId = 0L)
    val after = table(state.table)
    // same batchId again: skipped entirely
    LakeMergeIngest.foldBatch(state, batch, batchId = 0L)
    assert(state.generationsApplied === 1)
    assert(table(state.table) === after)
    // and even WITHOUT the skip, MERGE is idempotent: full-row replace
    // and delete applied twice produce the identical table — the
    // property that makes foreachBatch redelivery safe
    val once = LakeMerge.merge(initial,
      LakeMergeIngest.lastWriter(batch, "k"), "k")
    val twice = LakeMerge.merge(once,
      LakeMergeIngest.lastWriter(batch, "k"), "k")
    assert(table(twice) === table(once))
  }

  test("scd2 stream fold: versions stamp by batch, idempotent, exact history") {
    implicit val sqlCtx = spark.sqlContext
    val history0 = initial
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(LakeMerge.OpenVersion))
    val input = MemoryStream[(Long, String, Double, String, Long)]
    val state = new LakeMergeIngest.Scd2State(
      spark, history0, "k", trackedCols = Seq("bal"))
    val q = LakeMergeIngest.startScd2(input.toDF.toDF(cols: _*), state)
    try {
      Seq(b0, b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = state.history
      .orderBy("k", "valid_from")
      .as[(Long, String, Double, Long, Long)].collect().toSeq
    // reference: sequential scd2Apply at version = batch index + 1
    val want = Seq(b0, b1, b2).zipWithIndex.foldLeft(history0) {
      case (h, (b, i)) => LakeMerge.scd2Apply(h,
        LakeMergeIngest.lastWriter(b.toDF(cols: _*), "k"), "k",
        Seq("bal"), version = i + 1L)
    }.orderBy("k", "valid_from")
      .as[(Long, String, Double, Long, Long)].collect().toSeq
    assert(got === want)
    // the history really versioned: key 2 has closed v0, closed v1, open v2
    val k2 = got.filter(_._1 == 2L)
    assert(k2.map(r => (r._4, r._5)) ===
      Seq((0L, 0L), (1L, 1L), (2L, LakeMerge.OpenVersion)))
    // redelivery: same batchId again is a no-op
    val before = got
    LakeMergeIngest.foldScd2Batch(state, b2.toDF(cols: _*), batchId = 2L)
    val after = state.history.orderBy("k", "valid_from")
      .as[(Long, String, Double, Long, Long)].collect().toSeq
    assert(after === before)
  }

  test("restart from checkpoint resumes cleanly; final lake exact") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double, String, Long)]
    val state = new LakeMergeIngest.MergeState(spark, initial, "k")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_merge_ckpt").toString
    val q1 = LakeMergeIngest.start(input.toDF.toDF(cols: _*), state, Some(ckpt))
    try {
      Seq(b0, b1).foreach { b => input.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    // restart against the SAME checkpoint: committed offsets are not
    // re-fed; any redelivered uncommitted batch is absorbed by the
    // batchId skip / merge idempotence. (In production the state frame
    // itself reloads from the last written parquet generation.)
    val q2 = LakeMergeIngest.start(input.toDF.toDF(cols: _*), state, Some(ckpt))
    try {
      input.addData(b2)
      q2.processAllAvailable()
      assert(table(state.table) === table(reference(Seq(b0, b1, b2))))
    } finally q2.stop()
  }
}
