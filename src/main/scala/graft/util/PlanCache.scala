package graft.util

/** Tiny synchronized LRU for materialized derived frames (shingle
  * indexes, metadata caches) keyed by logical plan or (session, path).
  *
  * An unbounded plan-keyed map is a slow leak in a long-lived service —
  * every distinct input plan pins a cached DataFrame's blocks forever —
  * so this cache holds at most `maxEntries` values in access order and
  * runs `onEvict` (typically `unpersist()`) on the one it drops. `clear`
  * evicts everything, for session teardown or when underlying data is
  * known to have changed.
  */
final class PlanCache[K, V <: AnyRef](val maxEntries: Int, onEvict: V => Unit) {
  require(maxEntries > 0, "maxEntries must be positive")
  PlanCache.register(this)

  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      if (size() > maxEntries) { onEvict(e.getValue); true } else false
  }

  /** Lookup-or-build. `compute` runs OUTSIDE the cache lock — builds
    * can be whole multi-job index constructions (k-means, shingling)
    * and must not serialize unrelated callers. Two threads racing on
    * the same key may both compute; the loser's value is evicted
    * immediately and the winner's returned. */
  def getOrElseUpdate(k: K)(compute: => V): V = {
    synchronized {
      val existing = map.get(k)
      if (existing != null) return existing
    }
    val v = compute
    synchronized {
      val raced = map.get(k)
      if (raced != null) { onEvict(v); raced }
      else { map.put(k, v); v }
    }
  }

  def clear(): Unit = synchronized {
    map.values.forEach(v => onEvict(v))
    map.clear()
  }

  def size: Int = synchronized(map.size)
}

object PlanCache {
  // Every instance, so "drop every derived index in the engine" is one
  // call — used by the bench's plan-fingerprint pass, which needs each
  // query's COLD plan (a warm cache splices an InMemoryRelation whose
  // rendering embeds run-dependent ids into the logical plan). The
  // instances are a handful of object-level singletons, so a strong
  // list doesn't leak.
  private val instances = scala.collection.mutable.ListBuffer.empty[PlanCache[_, _]]

  private def register(c: PlanCache[_, _]): Unit =
    instances.synchronized { instances += c }

  /** Clear every PlanCache in the process. */
  def clearAll(): Unit =
    instances.synchronized { instances.foreach(_.clear()) }

  /** Live entries across every registered cache — the engine's total
    * derived-index footprint in cached-plan COUNT. */
  def totalEntries: Int =
    instances.synchronized { instances.map(_.size).sum }

  /** Sum of per-cache LRU capacities: the registry-level ceiling
    * totalEntries can never exceed, however many queries run. Exists so
    * a test can assert the per-cache bounds COMPOSE (CacheBudgetSpec)
    * and a deployment can reason about worst-case pinned plans. */
  def totalBudget: Int =
    instances.synchronized { instances.map(_.maxEntries).sum }
}
