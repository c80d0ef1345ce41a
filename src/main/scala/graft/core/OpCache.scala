package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Slot-pooled cache for the analytics operators whose plans share a
  * persisted helper frame across two consumers (the survival at-risk
  * frame, the decomposition's trended frame, the A/B test's per-user
  * frame — each pinned single-fact-scan by PlanSpec).
  *
  * Those operators return LAZY frames, so they can never see "the
  * final consuming action" and unpersist behind it the way
  * TxLog.stageClustered does; a bare `.persist` therefore leaked one
  * session-lifetime cache entry PER CALL. Registering through a
  * bounded slot pool caps that instead.
  *
  * Slots are keyed by operator tag PLUS a cheap input fingerprint
  * (the analyzed plan's `semanticHash`): keying by tag alone made two
  * interleaved pipelines running the same operator over DIFFERENT
  * inputs evict each other's entry while their lazy result frames
  * were still unconsumed, silently re-deriving the shared subtree
  * (the 2x fact-scan PlanSpec pins against). Distinct inputs now hold
  * distinct slots; a per-tag cap (`MaxPerTag`, insertion-order
  * eviction) bounds the pool, so a long-lived session holds at most
  * `MaxPerTag` cached helper frames per operator no matter how many
  * inputs it cycles through. Releasing a frame an older caller still
  * holds only costs a recompute on that stale plan — never
  * correctness. */
object OpCache {

  private val slots =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  // per-tag insertion order of live slot keys, for the cap
  private val order = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.ArrayDeque[String]]()
  private val MaxPerTag = 4

  /** Persist `df` (MEMORY_AND_DISK) under its (tag, input-fingerprint)
    * slot. A plan-identical re-registration re-takes the SAME slot and
    * must NOT release the previous frame: Spark's CacheManager dedupes
    * `persist` by canonicalized plan ("Asked to cache already cached
    * data"), so the new frame just joined the previous frame's entry,
    * and unpersisting would kill it under the new frame (the shared
    * subtree silently re-derives — PlanSpec's cache-reader pins catch
    * exactly this). A same-key different-plan occupant (semanticHash
    * collision) is released; a different-key occupant is untouched
    * until the per-tag cap evicts it oldest-first. */
  def shared(tag: String, df: DataFrame): DataFrame = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    val key = tag + "#" + cached.queryExecution.analyzed.semanticHash()
    val prev = slots.put(key, cached)
    if (prev != null && (prev ne cached) &&
        !prev.queryExecution.analyzed.sameResult(
          cached.queryExecution.analyzed)) {
      // a prev from a since-stopped test session must not poison the
      // new registration
      try prev.unpersist(false)
      catch { case _: Exception => () }
    }
    val dq = order.computeIfAbsent(tag,
      _ => new java.util.ArrayDeque[String]())
    dq.synchronized {
      dq.remove(key)
      dq.addLast(key)
      while (dq.size > MaxPerTag) {
        val victim = dq.pollFirst()
        val v = slots.remove(victim)
        if (v != null) {
          try v.unpersist(false)
          catch { case _: Exception => () }
        }
      }
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
    order.clear()
  }
}
