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

  /** One-pass state transition over TIME-ORDERED events — pure,
    * unit-testable, and O(closed sessions) memory rather than O(events):
    * a hot key's event list is never buffered here. Callers must supply
    * events sorted by (ts, event_type); [[step]] does that sort for the
    * bounded micro-batch case. */
  def stepOrdered(existing: Option[SessionState], events: Iterator[Event], gapMs: Long)
      : (Seq[SessionOut], Option[SessionState]) = {
    var state = existing
    val out = Seq.newBuilder[SessionOut]
    for (e <- events) {
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

  /** Sort-then-step convenience for a bounded batch of events (a
    * streaming micro-batch). The sort is the only buffering. */
  def step(existing: Option[SessionState], events: Seq[Event], gapMs: Long)
      : (Seq[SessionOut], Option[SessionState]) =
    stepOrdered(existing, events.sortBy(e => (e.ts.getTime, e.event_type)).iterator, gapMs)

  private def toOut(uid: Long, s: SessionState, why: String): SessionOut =
    SessionOut(uid, new Timestamp(s.start), new Timestamp(s.lastTs),
      s.nEvents, s.sumValue, s.types.size, why)

  /** Hot-key guard: a key's micro-batch slice sorts through
    * [[ExternalEventSorter]] with at most this many events in task
    * memory; beyond it, sorted runs spill to executor scratch disk and
    * stream back through a k-way merge. ~64k events ≈ a few MB. */
  val MaxBufferedEvents: Int = 64 * 1024

  /** Streaming/batch sessionization. In streaming, state times out on
    * event-time (watermark-driven). In batch, timeouts never fire, so
    * batch callers get only gap-closed sessions unless `flushOpen` also
    * emits the still-open session per key at end of input.
    *
    * Scale note: each invocation sorts ONE key's events from ONE
    * micro-batch with BOUNDED task memory — a hot key spills sorted runs
    * to disk ([[ExternalEventSorter]], `maxBuffered`) instead of
    * materializing its whole slice. For whole-history batch
    * sessionization of a skewed corpus still prefer [[sessionsBatch]],
    * which keeps the per-key sort inside WindowExec's spilling sort. */
  def sessions(events: Dataset[Event], gapMs: Long = DefaultGapMs,
      flushOpen: Boolean = false,
      maxBuffered: Int = MaxBufferedEvents): Dataset[SessionOut] = {
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
            val (closed, next) = stepOrdered(state.getOption,
              new ExternalEventSorter(maxBuffered).sorted(it), gapMs)
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

  /** Batch sessionization as pure window SQL — the 100 TB shape for
    * historical reprocessing: lag() flags session starts, a running sum
    * numbers sessions, one hash-agg per (user, session). The per-user
    * sort runs in WindowExec, which SPILLS — a hot user costs disk and
    * time in one task but never OOMs (sessionization is inherently
    * sequential per key; bounding further means splitting keys on
    * calendar boundaries upstream). Semantics match
    * `sessions(flushOpen = true)`: every event lands in exactly one
    * session; the last session per user closes as "flush", others "gap".
    * (sum_value may differ from the sequential path by FP rounding only —
    * addition order differs.) */
  def sessionsBatch(events: Dataset[Event], gapMs: Long = DefaultGapMs): Dataset[SessionOut] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark = events.sparkSession
    import spark.implicits._
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("tms"), col("event_type"))
    val run = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perUser = Window.partitionBy(col("user_id"))
    events.toDF()
      .withColumn("tms", unix_millis(col("ts")))
      .withColumn("new_sess",
        when(col("tms") - lag(col("tms"), 1).over(byTime) <= gapMs, 0L).otherwise(1L))
      .withColumn("sess", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("sess"))
      .agg(
        min(col("tms")).as("start_ms"), max(col("tms")).as("end_ms"),
        count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"),
        countDistinct(col("event_type")).as("n_types"))
      .withColumn("closed_by",
        when(col("sess") === max(col("sess")).over(perUser), "flush").otherwise("gap"))
      .select(col("user_id"),
        timestamp_millis(col("start_ms")).as("session_start"),
        timestamp_millis(col("end_ms")).as("session_end"),
        col("n_events"), col("sum_value"), col("n_types").cast("int").as("n_types"),
        col("closed_by"))
      .as[SessionOut]
  }
}
