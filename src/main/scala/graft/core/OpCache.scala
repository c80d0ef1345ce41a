package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** One-slot-per-operator cache pool for the analytics operators whose
  * plans share a persisted helper frame across two consumers (the
  * survival at-risk frame, the decomposition's trended frame, the
  * A/B test's per-user frame — each pinned single-fact-scan by
  * PlanSpec).
  *
  * Those operators return LAZY frames, so they can never see "the
  * final consuming action" and unpersist behind it the way
  * TxLog.stageClustered does; a bare `.persist` therefore leaked one
  * session-lifetime cache entry PER CALL. Registering through a keyed
  * slot bounds that: a new call under the same tag releases the
  * previous call's cache, so a long-lived session holds at most ONE
  * cached helper frame per operator no matter how many times it runs.
  * Releasing a frame an older caller still holds only costs a
  * recompute on that stale plan — never correctness. */
object OpCache {

  private val slots =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK) under the operator's slot,
    * releasing whatever the slot held before — UNLESS the previous
    * frame is plan-identical to the new one: Spark's CacheManager
    * dedupes `persist` by canonicalized plan ("Asked to cache already
    * cached data"), so a deterministic operator re-built over the
    * same input re-registers the SAME cache entry, and unpersisting
    * the previous frame would kill the entry the new frame just
    * joined (the shared subtree silently re-derives — PlanSpec's
    * cache-reader pins catch exactly this). A plan-identical slot
    * swap holds one entry either way, so skipping the release leaks
    * nothing. */
  def shared(tag: String, df: DataFrame): DataFrame = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    val prev = slots.put(tag, cached)
    if (prev != null && (prev ne cached) &&
        !prev.queryExecution.analyzed.sameResult(
          cached.queryExecution.analyzed)) {
      // a prev from a since-stopped test session must not poison the
      // new registration
      try prev.unpersist(false)
      catch { case _: Exception => () }
    }
    cached
  }

  /** Release every slot (long-lived callers' teardown hook). */
  def releaseAll(): Unit = {
    val it = slots.entrySet().iterator()
    while (it.hasNext) {
      it.next().getValue.unpersist(false)
      it.remove()
    }
  }
}
