package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md scale checklist: "skewed
  * keys → salting or AQE skew-join"). AQE splits oversized shuffle
  * partitions after the fact; salting prevents them from forming: the
  * heavy (fact) side gets a deterministic salt in [0, n) per row, the
  * light side is replicated n ways, and the join key becomes
  * (key, salt) — every hot key now spreads over n reducers.
  *
  * Replication multiplies the light side by n, so n stays small (8-32)
  * and the light side should be the smaller input (but too big to
  * broadcast — otherwise just broadcast it).
  */
object SkewJoin {

  /** Inner equi-join of `heavy` and `light` on `key`, salted `n` ways.
    * Row-for-row equivalent to `heavy.join(light, key)`. */
  def saltedJoin(heavy: DataFrame, light: DataFrame, key: String, n: Int): DataFrame = {
    require(n > 0, "salt factor must be positive")
    // deterministic per-row salt: spreads each key's rows across n buckets
    // (uses the row's other columns via xxhash64 over all of them)
    val salted = heavy.withColumn("_salt",
      pmod(xxhash64(heavy.columns.map(col).toIndexedSeq: _*), lit(n)).cast("int"))
    val replicated = light
      .withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop(replicated(key)).drop("_salt")
  }

  /** Two-path variant: broadcast-join only the known hot keys, shuffle-join
    * the long tail, union — the surgical fix when a handful of keys hold
    * most rows and the light side's hot slice fits in memory. */
  def hotKeySplitJoin(heavy: DataFrame, light: DataFrame, key: String,
      hotKeys: Seq[Long]): DataFrame = {
    val isHot: Column = col(key).isin(hotKeys: _*)
    val hot = heavy.where(isHot)
      .join(broadcast(light.where(isHot)), key)
    val tail = heavy.where(!isHot).join(light.where(!isHot), key)
    hot.unionByName(tail)
  }
}
