package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.domain.Schemas.AccessEvent

/** T5 — streaming decayed counters: the event-driven twin of the batch
  * recompute (`update_memory_counters_from_retrieval_async` +
  * `_apply_time_decay`, memory_management.py:3177-3368). Decay-at-update
  * exactly like the reference: on each event, the stored EMA is first
  * decayed by 0.5^(Δdays/30) since the last update, then incremented.
  *
  * Equivalence note (SURVEY §7.4.4): decay-at-update and decay-at-read give
  * identical results for any event-time-ordered fold — asserted by the spec
  * against `Retrieval.decayedCounters`.
  */
object Counters {

  case class CounterState(
      hitTotal: Double,
      ema30d: Double,
      confWeighted30d: Double,
      lastTs: Long)                       // epoch millis of last update

  case class CounterUpdate(
      memory_id: String,
      hit_total: Double,
      ema_30d: Double,
      conf_weighted_30d: Double)

  val HalfLifeDays = 30.0

  def decay(value: Double, fromMs: Long, toMs: Long): Double = {
    val days = (toMs - fromMs) / 86400000.0
    value * math.pow(0.5, days / HalfLifeDays)
  }

  /** Event-time-ordered fold of one memory's events into its counters.
    *
    * Late events (ts < state.lastTs — possible ACROSS micro-batches, since
    * only each batch is sorted) must not produce a negative decay interval:
    * `0.5^(-Δ)` would INFLATE the EMA and regress lastTs, permanently
    * corrupting the counters. Instead a late contribution is itself decayed
    * forward by its age (conf · 0.5^((lastTs−ts)/H)) and lastTs keeps its
    * maximum — with this, the fold is arrival-order independent and stays
    * exactly equal to the batch decay-at-read recompute. */
  def fold(state: Option[CounterState], events: Seq[AccessEvent]): CounterState = {
    val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
    sorted.foldLeft(state.getOrElse(CounterState(0, 0, 0, sorted.head.ts.getTime))) {
      case (st, e) =>
        val t = e.ts.getTime
        if (t >= st.lastTs)
          CounterState(
            hitTotal = st.hitTotal + 1,
            ema30d = decay(st.ema30d, st.lastTs, t) + 1.0,
            confWeighted30d = decay(st.confWeighted30d, st.lastTs, t) + e.confidence,
            lastTs = t)
        else
          CounterState(
            hitTotal = st.hitTotal + 1,
            ema30d = st.ema30d + decay(1.0, t, st.lastTs),
            confWeighted30d = st.confWeighted30d + decay(e.confidence, t, st.lastTs),
            lastTs = st.lastTs)
    }
  }

  def counterStream(spark: SparkSession, events: Dataset[AccessEvent])
      : Dataset[CounterUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.memory_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (mid: String, it: Iterator[AccessEvent], st: GroupState[CounterState]) => {
          val next = fold(st.getOption, it.toSeq)
          st.update(next)
          CounterUpdate(mid, next.hitTotal, next.ema30d, next.confWeighted30d)
        })
  }
}
