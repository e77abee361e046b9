package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming late-data DEAD-LETTER routing (q121, 8th streaming class:
  * multi-output side-channel from custom state) — the piece every
  * production watermark pipeline needs and Spark's built-in stateful
  * aggregation does not give you: a row that arrives after the
  * watermark has passed is silently DROPPED by the built-ins, which at
  * 100 TB means unexplained count drift. Here lateness is decided by
  * explicit per-key state (a KEYED watermark: max event time seen in
  * PRIOR micro-batches, minus the allowed delay) and late rows are
  * routed to a flagged side output instead of vanishing — the
  * dead-letter queue pattern, auditable and replayable.
  *
  * Semantics per key and micro-batch: rows with t < maxTs(prior
  * batches) − delay are LATE (the current batch never makes its own
  * rows late — the watermark only advances BETWEEN batches, Spark's own
  * global-watermark contract); on-time rows land in their tumbling
  * window's count, late rows in the side-channel count; then the stored
  * max advances over ALL observed rows, late included (an event was
  * still observed — time moves forward regardless of routing).
  *
  * Scale: state per key is ONE long — constant for any stream length —
  * and each batch emits only per-touched-window deltas plus one late
  * row, so the sink's append log is bounded by windows×batches, never
  * by row volume. The [[Sessionize]]/[[CdcApply]] convention: the
  * transition is a pure function, unit-testable without Spark.
  */
object DeadLetter {

  final case class Ev(event_type: String, event_id: Long, t: Long)
  final case class WmState(maxTs: Long)
  final case class Routed(event_type: String, kind: String,
      window_start: Long, n: Long)

  /** Pure per-key transition: classify one micro-batch against the
    * PRIOR keyed watermark, return (advanced state, batch deltas).
    * Late rows carry window_start = −1 (the side channel has no
    * window — it is the "should have been dropped" audit stream). */
  def step(prior: Option[WmState], rows: Iterator[Ev],
           delaySec: Long, windowSec: Long): (WmState, Seq[Routed]) = {
    val thresh = prior.map(_.maxTs - delaySec).getOrElse(Long.MinValue)
    var mx = prior.map(_.maxTs).getOrElse(Long.MinValue)
    val ontime = scala.collection.mutable.LongMap.empty[Long]
    var late = 0L
    var key: String = null
    for (r <- rows) {
      key = r.event_type
      if (r.t > mx) mx = r.t
      if (r.t < thresh) late += 1
      else {
        val w = math.floorDiv(r.t, windowSec) * windowSec
        ontime(w) = ontime.getOrElse(w, 0L) + 1
      }
    }
    val out = ontime.toSeq.sortBy(_._1)
      .map { case (w, n) => Routed(key, "ontime", w, n) } ++
      (if (late > 0) Seq(Routed(key, "late", -1L, late)) else Nil)
    (WmState(mx), out)
  }

  private def routeGroup(delaySec: Long, windowSec: Long)(
      key: String, rows: Iterator[Ev],
      state: GroupState[WmState]): Iterator[Routed] = {
    val (st, out) = step(state.getOption, rows, delaySec, windowSec)
    state.update(st)
    out.iterator
  }

  /** Route an event stream: per key per micro-batch, append the batch's
    * window deltas and late count. Summing the sink's log by
    * (key, kind, window) gives the final routed totals — what the q121
    * face and oracle compare. */
  def route(events: Dataset[Ev], delaySec: Long,
            windowSec: Long): Dataset[Routed] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        routeGroup(delaySec, windowSec))
  }
}
