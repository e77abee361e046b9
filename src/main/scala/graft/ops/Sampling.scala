package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators — the training-data curation staple.
  *
  * `sample()`/`randomSplit()` are seed-stable only for a FIXED partition
  * layout: repartition the input (or rescale the cluster) and the sample
  * changes. Curation pipelines need the opposite contract: membership is
  * a pure function of the ROW, so the sample is identical across runs,
  * partitionings, engines — and auditable after the fact. The standard
  * trick: hash a stable row key, keep rows whose hash bucket falls under
  * the stratum's rate.
  *
  * Scale: a narrow map + filter — no shuffle, no state, pushes nothing to
  * the driver; at 100 TB the cost is the scan. The md5-derived bucket is
  * the repo's portable-hash pattern ([[Dedup]]), so the exact sample
  * replays in DuckDB for the oracle.
  */
object Sampling {

  /** 60-bit integer from the row key via md5 — portable verbatim to
    * DuckDB's `CAST('0x'||substr(md5(k),1,15) AS BIGINT)`. */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key), 1, 15), 16, 10).cast("long") % buckets

  /** Keep a per-stratum percentage of rows, membership decided by
    * `hashBucket(key) < rate(stratum)`. Unknown strata drop (rate 0). */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       ratesPct: Map[String, Int]): DataFrame = {
    val rate = ratesPct.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(stratum === k, lit(v)).otherwise(acc)
    }
    df.where(hashBucket(key, 100) < rate)
  }

  /** Gate face (q47): curation-style downsample of `events` — keep all
    * purchases, half of signups, progressively less of the noisy strata.
    * The output is the sampled ROWS (not a summary): the oracle hash
    * replays membership row-for-row, proving the sample is deterministic
    * and engine-independent. */
  val gateRates: Map[String, Int] = Map(
    "purchase" -> 100, "signup" -> 50, "click" -> 20, "view" -> 10, "error" -> 5)

  def eventSample(s: SparkSession, d: String): DataFrame =
    stratifiedSample(Tables.events(s, d),
      key = col("event_id").cast("string"), stratum = col("event_type"),
      ratesPct = gateRates)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"), col("value"))
      .orderBy(col("event_id"))

  val eventSampleSql: String =
    """SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value
      |FROM events
      |WHERE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
      |  < CASE event_type WHEN 'purchase' THEN 100 WHEN 'signup' THEN 50
      |                    WHEN 'click' THEN 20 WHEN 'view' THEN 10
      |                    WHEN 'error' THEN 5 ELSE 0 END
      |ORDER BY event_id""".stripMargin
}
