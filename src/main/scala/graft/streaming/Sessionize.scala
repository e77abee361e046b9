package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key state via KeyValueGroupedDataset.flatMapGroupsWithState
  * (SURVEY.md §2B event-time/session state; the shape the built-in
  * `session_window` can't express: arbitrary per-session accumulators,
  * emission control, and explicit timeout semantics).
  *
  * Sessionizes events per user with a gap timeout: a session closes when
  * no event arrives within `gapMs` (event-time, watermark-driven in
  * streaming; end-of-input in batch). State per key is one small case
  * class — bounded by the active-key count, the 100 TB-safe shape.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  final case class SessionState(
      start: Long, lastTs: Long, nEvents: Long, sumValue: Double, types: Set[String])

  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double, n_types: Int, closed_by: String)

  val DefaultGapMs: Long = 30 * 60 * 1000L

  /** The state-transition function — pure, unit-testable. Returns
    * (closed sessions to emit, next state). */
  def step(existing: Option[SessionState], events: Seq[Event], gapMs: Long)
      : (Seq[SessionOut], Option[SessionState]) = {
    val sorted = events.sortBy(e => (e.ts.getTime, e.event_type))
    var state = existing
    val out = Seq.newBuilder[SessionOut]
    for (e <- sorted) {
      val t = e.ts.getTime
      state = state match {
        case Some(s) if t - s.lastTs <= gapMs =>
          Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
            sumValue = s.sumValue + e.value, types = s.types + e.event_type))
        case Some(s) => // gap exceeded: close, start fresh
          out += toOut(e.user_id, s, "gap")
          Some(SessionState(t, t, 1, e.value, Set(e.event_type)))
        case None =>
          Some(SessionState(t, t, 1, e.value, Set(e.event_type)))
      }
    }
    (out.result(), state)
  }

  private def toOut(uid: Long, s: SessionState, why: String): SessionOut =
    SessionOut(uid, new Timestamp(s.start), new Timestamp(s.lastTs),
      s.nEvents, s.sumValue, s.types.size, why)

  /** Streaming/batch sessionization. In streaming, state times out on
    * event-time (watermark-driven). In batch, timeouts never fire, so
    * batch callers get only gap-closed sessions unless `flushOpen` also
    * emits the still-open session per key at end of input. */
  def sessions(events: Dataset[Event], gapMs: Long = DefaultGapMs,
      flushOpen: Boolean = false): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val closed = state.getOption.map(toOut(uid, _, "timeout")).toSeq
            state.remove()
            closed.iterator
          } else {
            val (closed, next) = step(state.getOption, it.toSeq, gapMs)
            var expiredNow: Seq[SessionOut] = Seq.empty
            next match {
              case Some(sess) =>
                state.update(sess)
                // only legal when a watermark exists (streaming); batch
                // never times out. If the requested timeout is already
                // behind the watermark the session IS expired — close it
                // now instead of leaking state with no timeout armed.
                try state.setTimeoutTimestamp(sess.lastTs + gapMs)
                catch {
                  case _: IllegalArgumentException
                      if state.getCurrentWatermarkMs() >= sess.lastTs + gapMs =>
                    expiredNow = Seq(toOut(uid, sess, "timeout"))
                    state.remove()
                  case _: UnsupportedOperationException => () // batch: no watermark
                }
              case None => state.remove()
            }
            // batch: emit the still-open session too (never overlaps with
            // expiredNow — batch has no watermark, so expiredNow is empty)
            val tail = if (flushOpen && expiredNow.isEmpty) {
              val open = next.map(toOut(uid, _, "flush")).toSeq
              state.remove(); open
            } else Seq.empty
            (closed ++ expiredNow ++ tail).iterator
          }
      }
  }
}
