package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingNearDup.{NearDupPair, VecIn}

/** Streaming incremental near-dup == the batch strict door, under any
  * batch split — the order-independence contract the first-matching-band
  * emission rule buys (see [[StreamingNearDup]] scaladoc). */
class StreamingNearDupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpusRows(): Seq[VecIn] =
    graft.similarity.Similarity.plantedCorpus(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => VecIn(r.getLong(0), r.getSeq[Float](1)))

  private def runStream(batches: Seq[Seq[VecIn]]): Set[(Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[VecIn]
    val name = s"neardup_${System.nanoTime()}"
    val q = StreamingNearDup.pairs(input.toDS(), threshold = 0.8)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[NearDupPair].collect()
        .map(p => (p.d1, p.d2, p.sim)).toSet
    } finally q.stop()
  }

  private def batchRelation(): Set[(Long, Long, Double)] =
    graft.similarity.Similarity.qEmbeddingNearDupStrict(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streaming ingest == batch strict door, three different splits") {
    val rows = corpusRows()
    val want = batchRelation()
    assert(want.nonEmpty)
    // split 1: one batch; split 2: thirds in id order; split 3: twins
    // arrive FIRST (worst case for any order assumption)
    val byId = rows.sortBy(_.vecId)
    val splits = Seq(
      Seq(rows),
      byId.grouped(math.max(1, byId.length / 3 + 1)).toSeq,
      Seq(byId.filter(_.vecId >= graft.similarity.Similarity.TwinOffset),
        byId.filter(_.vecId < graft.similarity.Similarity.TwinOffset)))
    splits.zipWithIndex.foreach { case (batches, k) =>
      assert(runStream(batches) === want, s"split $k diverged from batch")
    }
  }

  test("re-delivered rows neither re-emit pairs nor grow state output") {
    val rows = corpusRows()
    val want = batchRelation()
    // every row delivered twice: once in its batch, once in a replay
    // batch (an at-least-once producer) — the emitted set must not change
    val got = runStream(Seq(rows, rows))
    assert(got === want)
  }

  test("transformWithState twin == batch strict door (split + re-delivery)") {
    val rows = corpusRows()
    val want = batchRelation()
    val byId = rows.sortBy(_.vecId)
    withRocksDbProvider {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      // thirds + a full replay batch: split AND at-least-once in one run
      val batches =
        byId.grouped(math.max(1, byId.length / 3 + 1)).toSeq :+ byId
      val input = MemoryStream[VecIn]
      val name = s"neardup_tws_${System.nanoTime()}"
      val q = StreamingNearDupTws.pairs(input.toDS(), threshold = 0.8)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .start()
      val got =
        try {
          batches.foreach { b => input.addData(b); q.processAllAvailable() }
          spark.table(name).as[NearDupPair].collect().toSeq
            .map(p => (p.d1, p.d2, p.sim))
        } finally q.stop()
      // SEQ assertions: set equality alone would collapse duplicate
      // emissions — the exact defect the replay batch exists to catch
      assert(got.distinct.size === got.size,
        "TWS flavor emitted a duplicate pair row")
      assert(got.toSet === want)
    }
  }

  test("emission is exactly-once: no pair row is duplicated") {
    val rows = corpusRows()
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[VecIn]
    val name = s"neardup_dup_${System.nanoTime()}"
    val q = StreamingNearDup.pairs(input.toDS(), threshold = 0.8)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val got =
      try {
        input.addData(rows)
        q.processAllAvailable()
        spark.table(name).as[NearDupPair].collect().toSeq
      } finally q.stop()
    assert(got.map(p => (p.d1, p.d2)).distinct.size === got.size)
  }
}
