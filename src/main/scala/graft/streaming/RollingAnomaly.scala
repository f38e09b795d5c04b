package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, Encoders}

/** Streaming twin of
  * [[graft.relational.EventQueries.qRollingOutliers]]: the same exact
  * integer 3σ test — `(n·c − S)² > 9·(n·SS − S²)` over the previous
  * `win` values of the event type — evaluated ONLINE against a bounded
  * per-key ring buffer instead of a batch window.
  *
  * Equivalence contract (pinned by StreamingSpec): fed the event log in
  * `(ts_us, event_id)` order, the flagged set equals the batch window
  * query row-for-row. Within one micro-batch the group iterator is
  * unordered, so values sort on `(tsUs, eventId)` before folding — the
  * same total order the batch window uses; across micro-batches arrival
  * order IS the contract (a stream cannot retro-sort history — that is
  * the batch twin's job).
  *
  * State is exactly `win` longs per event type — watermark-free and
  * bounded by construction (the reason a ring buffer, not an event
  * list, is the production shape for this monitor).
  */
object RollingAnomaly {

  final case class ValueEvent(eventType: String, eventId: Long,
      tsUs: Long, cents: Long)
  final case class Outlier(eventType: String, eventId: Long, cents: Long,
      winN: Long, winSum: Long, winSumsq: Long)
  final case class Ring(values: Vector[Long])

  def scoreGroup(win: Int, minN: Int)(
      eventType: String,
      events: Iterator[ValueEvent],
      state: GroupState[Ring]): Iterator[Outlier] = {
    var ring = state.getOption.getOrElse(Ring(Vector.empty)).values
    val out = Vector.newBuilder[Outlier]
    events.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
      val n = ring.length.toLong
      if (n >= minN) {
        val s = ring.sum
        val ss = ring.map(c => c * c).sum
        val dev = n * e.cents - s
        if (dev * dev > 9L * (n * ss - s * s))
          out += Outlier(eventType, e.eventId, e.cents, n, s, ss)
      }
      ring = (ring :+ e.cents).takeRight(win)
    }
    state.update(Ring(ring))
    out.result().iterator
  }

  /** Append-mode outlier stream over a (possibly streaming) event set. */
  def detect(events: Dataset[ValueEvent], win: Int = 50,
      minN: Int = 20): Dataset[Outlier] = {
    implicit val ringEnc = Encoders.product[Ring]
    implicit val outEnc = Encoders.product[Outlier]
    events
      .groupByKey(_.eventType)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(scoreGroup(win, minN))
  }

  // ---- streaming CUSUM twin --------------------------------------------

  final case class DailyPoint(eventType: String, day: Long, y: Long,
      mu: Long)
  final case class CusumState(runSum: Long, runMin: Long)
  final case class CusumAlarm(eventType: String, day: Long, y: Long,
      cusum: Long, alarm: Boolean)

  /** Online CUSUM with TWO LONGS of state per key (running sum and its
    * running minimum — the same closed form the batch
    * [[graft.relational.EventQueries.qCusum]] windows compute), fed the
    * per-day aggregates in day order (ordered-feed contract like the
    * ring-buffer monitor; µ arrives on the point because a true online
    * monitor uses a REFERENCE mean, not one from data it hasn't seen). */
  private def cusumGroup(
      eventType: String,
      points: Iterator[DailyPoint],
      state: GroupState[CusumState]): Iterator[CusumAlarm] = {
    var st = state.getOption.getOrElse(CusumState(0L, 0L))
    val out = Vector.newBuilder[CusumAlarm]
    points.toSeq.sortBy(_.day).foreach { p =>
      val s = st.runSum + (p.y - p.mu - p.mu / 20)
      val smin = math.min(st.runMin, s)
      st = CusumState(s, smin)
      val c = s - math.min(0L, smin)
      out += CusumAlarm(eventType, p.day, p.y, c, c > p.mu / 5)
    }
    state.update(st)
    out.result().iterator
  }

  def cusum(points: Dataset[DailyPoint]): Dataset[CusumAlarm] = {
    implicit val stEnc = Encoders.product[CusumState]
    implicit val outEnc = Encoders.product[CusumAlarm]
    points
      .groupByKey(_.eventType)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(cusumGroup)
  }
}
