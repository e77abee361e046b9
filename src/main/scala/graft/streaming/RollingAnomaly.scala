package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling anomaly detection (q138) — the 10th streaming
  * class: a per-key RING-BUFFER state machine. Where q62's sessionizer
  * carries one open accumulator and q103's CDC apply one winner row,
  * this carries the user's trailing ≤ 7 (day, count) pairs and scores
  * each newly-complete day against them with q135's integer-exact
  * 2σ test — the stream≡batch contract is literal: the oracle is
  * q135's SQL VERBATIM (the q112/q32 convention), so the state
  * machine's incremental answer must match the batch window bit for bit.
  *
  * Input contract: events arrive in DAY-PARTITIONED waves in ascending
  * day order (each calendar day is fully contained in one wave — the
  * natural shape of daily-ingest), so a day is COMPLETE when its wave's
  * micro-batch reaches the state machine. A violation (a day at or
  * before one already scored) cannot be detected as late data here —
  * it would silently corrupt the window — so the machine fails loud,
  * the GramAgg convention. Late-data ROUTING is q121's class, not this
  * one; composing the two is a deployment choice.
  *
  * Scale: state is ≤ 7 longs × 2 per active user regardless of event
  * volume (the bounded-state discipline of every streaming face here);
  * per-invocation work is a day→count hash of ONE wave's slice of ONE
  * key — bounded by the wave's calendar days, not its events. */
object RollingAnomaly {

  final case class Ev(user_id: Long, day: Long)
  /** Parallel ascending-day arrays, length ≤ 7 — the trailing window. */
  final case class Ring(days: Seq[Long], counts: Seq[Long])
  final case class Flag(user_id: Long, day: Long, n_events: Long,
      window_days: Long, anomaly: Option[Boolean])

  /** Score one key's newly-complete days (ascending) against the prior
    * ring; pure and unit-testable. Returns (flags, next ring). */
  def stepDays(uid: Long, prior: Ring, newDays: Seq[(Long, Long)])
      : (Seq[Flag], Ring) = {
    var days = prior.days
    var counts = prior.counts
    val out = Seq.newBuilder[Flag]
    for ((day, n) <- newDays) {
      if (days.nonEmpty && day <= days.last)
        throw new IllegalStateException(
          s"streamRollingAnomaly: day $day for user $uid arrived at/before " +
            s"already-scored day ${days.last} — waves must partition days " +
            "in ascending order (late days are q121's class)")
      val m = days.size.toLong
      // q135's integer test over the ring sums: |n − μ| > 2σ cross-
      // multiplied to (m·n − s1)² > 4·(m·s2 − s1²); NULL below a full frame
      val anomaly = if (m == 7L) {
        val s1 = counts.sum
        val s2 = counts.map(c => c * c).sum
        val lhs = m * n - s1
        Some(lhs * lhs > 4L * (m * s2 - s1 * s1))
      } else None
      out += Flag(uid, day, n, m, anomaly)
      days = (days :+ day).takeRight(7)
      counts = (counts :+ n).takeRight(7)
    }
    (out.result(), Ring(days, counts))
  }

  /** The streaming query: per-user day counts scored incrementally via
    * flatMapGroupsWithState (append, no timeout — every day eventually
    * completes by the wave contract; state lives for the stream). */
  def flags(events: Dataset[Ev]): Dataset[Flag] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Ring, Flag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[Ring]) =>
          // day→count for THIS wave's slice of the key: O(days) memory,
          // never O(events)
          val byDay = scala.collection.mutable.HashMap.empty[Long, Long]
          it.foreach(e => byDay.update(e.day, byDay.getOrElse(e.day, 0L) + 1L))
          val (flags, next) = stepDays(uid,
            state.getOption.getOrElse(Ring(Nil, Nil)),
            byDay.toSeq.sortBy(_._1))
          state.update(next)
          flags.iterator
      }
  }
}
