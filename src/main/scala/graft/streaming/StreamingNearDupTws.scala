package graft.streaming

import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

import graft.streaming.StreamingNearDup.{BandedVec, NearDupPair, VecIn}

/** [[StreamingNearDup]] on Spark 4's `transformWithState` API — the
  * both-state-APIs discipline of [[SessionTrackerTws]] /
  * [[CrackServiceTws]] / [[StreamingSketchTws]]: the per-bucket fold is
  * the SHARED [[StreamingNearDup.bucketFold]], so the two flavors can
  * only differ in state plumbing, and the spec pins both equal to the
  * batch strict door under any split.
  *
  * State here is a natural fit for TWS's `ListState`: bucket residents
  * are append-only (the fold never rewrites accepted rows), so each
  * micro-batch appends exactly the accepted rows instead of
  * re-serializing the whole bucket the way the fMGWS `GroupState`
  * update must — at a 100 TB standing index that is the difference
  * between O(batch) and O(index) state writes per trigger.
  * Requires the RocksDB state store provider. */
object StreamingNearDupTws {

  class NearDupProcessor(threshold: Double)
      extends StatefulProcessor[(Int, Long), BandedVec, NearDupPair] {

    @transient private var st: ListState[BandedVec] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[BandedVec](
        "residents", Encoders.product[BandedVec], TTLConfig.NONE)

    override def handleInputRows(
        key: (Int, Long),
        rows: Iterator[BandedVec],
        timers: TimerValues): Iterator[NearDupPair] = {
      val seen = st.get().toSeq
      val (accepted, out) =
        StreamingNearDup.bucketFold(key._1, threshold, seen, rows.toSeq)
      // ONE state-store merge per trigger, not one per accepted row
      if (accepted.nonEmpty) st.appendList(accepted.toArray)
      out.iterator
    }
  }

  /** Append-mode incremental near-dup pairs, TWS flavor. */
  def pairs(in: Dataset[VecIn], threshold: Double): DataFrame = {
    implicit val outEnc = Encoders.product[NearDupPair]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    StreamingNearDup.banded(in)
      .groupByKey(r => (r.tb, r.bval))
      .transformWithState(new NearDupProcessor(threshold),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
