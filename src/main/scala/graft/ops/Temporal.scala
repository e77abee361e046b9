package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators: AS-OF (each left row picks the most recent
  * right row at-or-before it per key) and RANGE (left rows join right rows
  * whose timestamp falls in a left-anchored interval). Neither exists as a
  * Spark built-in; both are re-expressed as shapes Catalyst already
  * executes well instead of a custom physical operator:
  *
  *  - AS-OF: union the two sides tagged, one window pass per key ordered
  *    by (ts, tag, right-id) with a last-non-null carry-forward, keep left
  *    rows. ONE shuffle on the key, no per-row candidate join — at 100 TB
  *    the cost is a sort-merge window over the union, and skewed keys
  *    spill in WindowExec instead of exploding a join. (The classic
  *    broadcast-range alternative is strictly worse: it replays every
  *    right row per left row in a key.)
  *
  *  - RANGE: equi-join on (key, coarse time bucket) with the right side's
  *    covered buckets exploded (intervals here span ≤ bucket×2, so the
  *    fan-out is a small constant), then the exact interval filter. The
  *    bucket turns an unbounded theta-join into a bounded equi-join —
  *    shuffle-partitionable, AQE-skew-splittable, the 100 TB shape.
  *    Each (left, right) pair meets on exactly one bucket (the right
  *    row's own bucket), so no post-join dedup is needed.
  *
  * The gate instantiations run on `events` (purchase←click attribution,
  * signup→view windows) because the synthetic events table is the one
  * with overlapping time ranges; the operators are generic over any
  * (key, ts) pair of frames.
  */
object Temporal {

  /** Generic as-of join. `left`/`right` must both carry `keyCol` and
    * `tsCol`; every other right column is carried to the matched left row
    * (null when no right row is at-or-before). Ties on right ts resolve
    * to the largest `rightIdCol`. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightIdCol: String): DataFrame = {
    val payload = right.columns.filter(c => c != keyCol && c != tsCol).toSeq
    // payload carried as ONE struct, not per-column: independent
    // last(_, ignoreNulls) carries would tear rows when a payload column
    // holds a genuine NULL (an older row's value would substitute in that
    // column only — a combination existing on no right row). The struct
    // is non-null for every right row, so the carry is atomic and NULL
    // fields survive inside it.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(right.schema.fieldIndex(c))))
    val l = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("_tag"),
        lit(null).cast(payloadType).as("_r")) ++
        left.columns.filterNot(Set(keyCol, tsCol)).map(col): _*)
    val r = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("_tag"),
        struct(payload.map(col): _*).as("_r")) ++
        left.columns.filterNot(Set(keyCol, tsCol))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // right rows (tag 0) sort before left rows at the same ts → an exact
    // ts tie counts as "at or before"; among right ties the largest id
    // sorts last and wins the carry-forward. Null structs on left rows
    // never decide an ordering (tag already separates the sides).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_tag"), col("_r").getField(rightIdCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
    carried.where(col("_tag") === 1)
      .select(Seq(col(keyCol), col(tsCol)) ++
        left.columns.filterNot(Set(keyCol, tsCol)).map(col) ++
        payload.map(c => col("_m").getField(c).as(s"matched_$c")): _*)
  }

  /** Gate face (q45): attribute each purchase event to the user's most
    * recent click at-or-before it — the ad-attribution as-of join. */
  def purchaseAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .select(col("user_id"), col("click_ts").as("ts"), col("click_id"))
    asOfJoin(purchases, clicks, "user_id", "ts", "click_id")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("matched_click_id").as("click_event_id"))
      .orderBy(col("event_id"))
  }

  /** Oracle for [[purchaseAttribution]] — deliberately a DIFFERENT
    * algorithm (per-purchase candidate join + rank) so the union-window
    * carry-forward is cross-checked, not replayed. */
  val purchaseAttributionSql: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      | c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      | cand AS (
      |  SELECT p.event_id AS pid, c.event_id AS cid,
      |    row_number() OVER (PARTITION BY p.event_id
      |                       ORDER BY epoch_us(c.ts) DESC, c.event_id DESC) AS rn
      |  -- compare at MICROsecond precision: the engine's timestamps are µs
      |  -- (nanos→micros on read), so an ns-resolution compare here could
      |  -- disagree on a sub-µs tie
      |  FROM p JOIN c ON c.user_id = p.user_id AND epoch_us(c.ts) <= epoch_us(p.ts))
      |SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
      |  cand.cid AS click_event_id
      |FROM p LEFT JOIN cand ON cand.pid = p.event_id AND cand.rn = 1
      |ORDER BY p.event_id""".stripMargin

  /** Generic bucketed range join: rows of `right` whose `tsCol` falls in
    * `[left.tsCol, left.tsCol + windowMs)` for the same key. `bucketMs`
    * must be ≥ windowMs so each interval spans ≤ 2 buckets. Returns the
    * joined pairs (left columns + right payload) for the caller to
    * aggregate. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                tsCol: String, windowMs: Long, bucketMs: Long): DataFrame = {
    require(bucketMs >= windowMs, "bucket must cover the window")
    // `div`, not `/`: Column `/` on longs is DOUBLE division, and the
    // bucket id must be an exact integer floor
    val l = left
      .withColumn("_t0", unix_millis(col(tsCol)))
      .withColumn("_t1", col("_t0") + lit(windowMs))
      // the interval [t0, t1) touches bucket(t0) and possibly bucket(t0)+1
      .withColumn("_bkt",
        explode(array(expr(s"_t0 div ${bucketMs}L"), expr(s"_t0 div ${bucketMs}L + 1L"))))
      .drop(tsCol)
    val r = right
      .withColumn("_rt", unix_millis(col(tsCol)))
      .withColumn("_bkt", expr(s"_rt div ${bucketMs}L"))
      .drop(tsCol)
    l.join(r, Seq(keyCol, "_bkt"))
      .where(col("_rt") >= col("_t0") && col("_rt") < col("_t1"))
      .drop("_bkt")
  }

  /** Gate face (q46): per signup event, count + sum the user's view
    * events in the following 24 h. */
  def signupViewWindows(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    val dayMs = 24L * 3600 * 1000
    rangeJoin(signups, views, "user_id", "ts", windowMs = dayMs, bucketMs = dayMs)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_views"), round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("event_id"))
  }

  /** Oracle for [[signupViewWindows]] — the plain theta-join DuckDB can
    * afford at verify SF; the engine plan stays the bucketed equi-join. */
  val signupViewWindowsSql: String =
    """SELECT s.event_id, count(*) AS n_views, round(sum(v.value), 4) AS sum_value
      |FROM events s
      |JOIN events v ON v.user_id = s.user_id AND v.event_type = 'view'
      |  AND epoch_ms(v.ts) >= epoch_ms(s.ts)
      |  AND epoch_ms(v.ts) < epoch_ms(s.ts) + 86400000
      |WHERE s.event_type = 'signup'
      |GROUP BY s.event_id
      |ORDER BY s.event_id""".stripMargin
}
