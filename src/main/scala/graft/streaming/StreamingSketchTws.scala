package graft.streaming

import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.{Dataset, Encoders}

import graft.streaming.StreamingSketch.{DyadicEst, DyadicState, HourEvent, HourRegisters, SlidingEst, ValueRow}

/** [[StreamingSketch.dyadicQuantiles]] on Spark 4's `transformWithState`
  * API — the same discipline as [[SessionTrackerTws]]/[[CrackServiceTws]]:
  * every stateful operator ships on BOTH state APIs, and the pair pins
  * that the semantics don't depend on which one carries them. The
  * counter fold is identical code-path-for-code-path (additive map, cap
  * fixed by construction), so fMGWS, TWS and the batch operator all land
  * on the same estimates (SketchQuantileSpec pins all three).
  * Requires the RocksDB state store provider. */
object StreamingSketchTws {

  /** TWS state-store encoding rejects MapType, so the counter map rides
    * as sorted parallel arrays (key order fixed ⇒ the serialized state is
    * deterministic too). */
  final case class DyadicStateTws(keys: Array[Long], cnts: Array[Long],
      n: Long)

  class DyadicProcessor
      extends StatefulProcessor[String, ValueRow, DyadicEst] {

    @transient private var st: ValueState[DyadicStateTws] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[DyadicStateTws](
        "dyadic", Encoders.product[DyadicStateTws], TTLConfig.NONE)

    override def handleInputRows(
        eventType: String,
        rows: Iterator[ValueRow],
        timers: TimerValues): Iterator[DyadicEst] = {
      val cur =
        if (st.exists()) {
          val s = st.get()
          DyadicState(s.keys.zip(s.cnts).toMap, s.n)
        } else DyadicState(Map.empty, 0L)
      val (next, est) = StreamingSketch.dyadicFold(eventType, cur, rows)
      val sorted = next.counters.toArray.sortBy(_._1)
      st.update(DyadicStateTws(sorted.map(_._1), sorted.map(_._2), next.n))
      Iterator.single(est)
    }
  }

  /** Update-mode per-key dyadic-CM quantile estimates, TWS flavor. */
  def dyadicQuantiles(events: Dataset[ValueRow]): Dataset[DyadicEst] = {
    implicit val outEnc = Encoders.product[DyadicEst]
    events
      .groupByKey(_.eventType)(Encoders.STRING)
      .transformWithState(new DyadicProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** [[StreamingSketch.slidingDistinct]]'s processor on transformWithState
    * — [[HourRegisters]] is already parallel-array encoded (the dyadic
    * MapType workaround), so the state round-trips both APIs unchanged;
    * the fold is the shared [[StreamingSketch.slidingFold]]. State bound:
    * 256 bytes per (key, hour), calendar-bounded hour spine (see the
    * state case class's scaladoc). */
  class SlidingHllProcessor(windowHours: Int)
      extends StatefulProcessor[String, HourEvent, SlidingEst] {

    @transient private var st: ValueState[HourRegisters] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HourRegisters](
        "sliding_hll", Encoders.product[HourRegisters], TTLConfig.NONE)

    override def handleInputRows(
        eventType: String,
        rows: Iterator[HourEvent],
        timers: TimerValues): Iterator[SlidingEst] = {
      val cur =
        if (st.exists()) st.get()
        else HourRegisters(Vector.empty, Vector.empty)
      val (next, ests) =
        StreamingSketch.slidingFold(eventType, cur, rows, windowHours)
      st.update(next)
      ests.iterator
    }
  }

  /** Update-mode trailing-window distinct estimates, TWS flavor. */
  def slidingDistinct(
      events: Dataset[HourEvent], windowHours: Int = 3): Dataset[SlidingEst] = {
    implicit val outEnc = Encoders.product[SlidingEst]
    events
      .groupByKey(_.eventType)(Encoders.STRING)
      .transformWithState(new SlidingHllProcessor(windowHours),
        TimeMode.None(), OutputMode.Update())
  }
}
