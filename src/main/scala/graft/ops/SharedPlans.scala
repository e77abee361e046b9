package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Memoized persisted subtrees shared ACROSS gate queries.
  *
  * Motivation (r2 verdict "What's wrong #2"): the near-dup keep-lists are
  * anti-joins against the near-dup PAIR queries — q37 needs q32's pairs,
  * q44 needs q41's. Computed independently, the gate paid the expensive
  * capped self-join twice per run. Here the pair result (tiny — pair ids
  * + score, a few dozen rows per corpus even at sf0.1) is persisted once
  * per (session, key) and every consumer shares it: whichever query runs
  * first pays the join, the keep-list that follows is one cheap
  * anti-join. This is also the honest 100 TB shape: a real pipeline
  * materializes the duplicate-pair table once and derives keep/drop
  * policies from it, rather than re-mining pairs per policy.
  *
  * Persistence hygiene: `spark.catalog.clearCache()` (bench pass
  * boundaries, verify isolation) unpersists the data but leaves the plan
  * valid — [[cached]] re-persists on next access, so a cleared entry
  * costs one recompute, never a correctness change. Entries are keyed
  * weakly by session: a stopped session's plans become unreachable
  * together with the session object.
  */
object SharedPlans {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]()

  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    synchronized {
      val m = {
        val existing = bySession.get(s)
        if (existing != null) existing
        else {
          val fresh = scala.collection.mutable.Map.empty[String, DataFrame]
          bySession.put(s, fresh)
          fresh
        }
      }
      val df = m.getOrElseUpdate(key, build.persist(StorageLevel.MEMORY_AND_DISK))
      if (df.storageLevel == StorageLevel.NONE)
        df.persist(StorageLevel.MEMORY_AND_DISK)
      df
    }
}
