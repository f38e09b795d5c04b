package graft.pipeline

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class DedupIngestSpec extends SparkSpec {

  // 16 tokens → 13 distinct 4-gram shingles; a last-token variant shares
  // 12 of 13 with the base (J = 12/14 ≈ 0.86), high enough that the
  // 8×4 LSH banding finds every pair (J barely over the 0.5 threshold
  // can deterministically slip through banding — that recall dial is
  // SimilaritySpec's subject, not this one)
  private val stemA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron"
  private val stemU1 = "red orange yellow green blue indigo violet pink black white gray brown maroon teal navy"
  private val stemU2 = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen"
  private val textA = s"$stemA pi"
  private def varA(last: String) = s"$stemA $last"
  private val textU1 = s"$stemU1 olive"
  private def varU1(last: String) = s"$stemU1 $last"
  private val textU2 = s"$stemU2 sixteen"
  private def varU2(last: String) = s"$stemU2 $last"

  private def scratchClusters(docs: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    TrainingData.connectedComponents(
      graft.dedup.Dedup.minhashLshPairsOf(
        graft.dedup.Dedup.shingleArraysOf(df)).select("d1", "d2"), spark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("streaming ingest keep-list equals from-scratch after every batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val state = new DedupIngest.IngestState(spark)
    val q = DedupIngest.start(input.toDF().toDF("doc_id", "text"), state)
    val batches = Seq(
      // batch 1: one near-dup pair + one (pairless) unique doc
      Seq(1L -> textA, 2L -> varA("iota"), 10L -> textU1),
      // batch 2: the A-cluster grows; a brand-new cluster appears
      Seq(3L -> varA("kappa"), 11L -> textU2, 12L -> varU2("nine")),
      // batch 3: A grows again; a new doc pairs with the previously
      // ISOLATED old doc 10 (an endpoint the keep-list has never seen)
      Seq(4L -> varA("lambda"), 13L -> varU1("cyan")))
    try {
      var seen = Seq.empty[(Long, String)]
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        seen ++= b
        val got = state.keepList.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === scratchClusters(seen),
          s"keep-list diverged after ingesting ${seen.map(_._1)}")
        assert(state.docsIngested === seen.length.toLong)
      }
      // the final shape is the one the fixture promises
      val byCluster = state.keepList.collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2)
        .map { case (c, ms) => c -> ms.map(_._1).toSet }
      assert(byCluster === Map(
        1L -> Set(1L, 2L, 3L, 4L),
        10L -> Set(10L, 13L),
        11L -> Set(11L, 12L)))
      // exactly one keeper per cluster, keeper = min member
      state.keepList.collect().foreach { r =>
        assert(r.getBoolean(2) === (r.getLong(0) == r.getLong(1)))
      }
    } finally q.stop()
  }
}
