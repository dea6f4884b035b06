package graft.core

/**
 * A small synchronized oldest-ACCESSED-evicts map for driver-side
 * registries that grow one entry per published version under perpetual
 * streaming churn (the KvDomainV2 conf/links registries, the
 * IndexMarker verification cache). LRU, not wholesale clear-past-cap:
 * a clear drops entries that are current-but-not-yet-consumed, so every
 * cap crossing pays a burst of re-derivation across ALL live users
 * instead of only the long-idle ones (the r14 KvDomainV2 finding, made
 * the one shared implementation so the retired pattern cannot creep
 * back per call site). Correctness never depends on a hit — every user
 * treats a miss as "re-derive" — so eviction is purely a cost knob.
 */
private[graft] final class LruRegistry[K, V](cap: Int) {
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size > cap
  }
  def put(k: K, v: V): Unit = m.synchronized { m.put(k, v); () }
  def get(k: K): Option[V] = m.synchronized(Option(m.get(k)))
  // targeted invalidation (same-id rebuilds / failed-publish cleanup
  // void exactly one version's entry — never the whole registry)
  def remove(k: K): Unit = m.synchronized { m.remove(k); () }
  // compute OUTSIDE the lock (f may run Spark jobs / filesystem reads);
  // idempotent recomputation on a race is the documented trade — but
  // NOT safe for caches that `remove()` to INVALIDATE: an in-flight
  // stale compute can put() after the remove and resurrect the entry
  // the invalidation killed (use the Locked variant there)
  def getOrElseUpdate(k: K)(f: K => V): V = get(k) match {
    case Some(v) => v
    case None => val v = f(k); put(k, v); v
  }

  // compute UNDER the lock: the miss-check, compute, and put are one
  // atomic block, so a concurrent remove(k) is always strictly before
  // (kills a previous entry) or strictly after (kills this one) — a
  // stale compute can never land after an invalidation, which is the
  // contract remove()-as-invalidation callers need (DomainStore's
  // linksCache: a same-id rebuild voids the version's entry; the old
  // ConcurrentHashMap.computeIfAbsent gave exactly this serialization).
  // Only for CHEAP loaders (one small FS read) — f blocks every other
  // registry user while it runs.
  def getOrElseUpdateLocked(k: K)(f: K => V): V = m.synchronized {
    Option(m.get(k)) match {
      case Some(v) => v
      case None => val v = f(k); m.put(k, v); v
    }
  }
}
