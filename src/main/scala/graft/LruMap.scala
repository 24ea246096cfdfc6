package graft

/** A tiny synchronized LRU memo for the engine's driver-side caches
  * ([[Engine.table]]'s plan cache, [[operators.Dedup]]'s label memo).
  * Access-ordered `LinkedHashMap` with a hard capacity: the eldest entry
  * is dropped on overflow, so a long-lived multi-tenant service can no
  * longer grow either cache without bound (previously both were
  * JVM-lifetime `ConcurrentHashMap`s).
  *
  * Eviction drops only the MEMO — never any scratch files the evicted
  * value's plan scans. A handed-out DataFrame is a live lazy plan; deleting
  * its backing parquet on eviction would corrupt a result the caller still
  * holds. Scratch stays bounded by [[operators.Scratch]]'s session
  * shutdown hook, and callers who need eager reclamation run with the
  * cache conf off (`spark.graft.dedupCache/tableCache=false`).
  *
  * `getOrElseUpdate` is synchronized on the whole map: compute runs under
  * the lock, which is the semantics the previous `computeIfAbsent` gave —
  * two threads never duplicate an expensive LSH run for the same key.
  */
private[graft] final class LruMap[K, V](capacity: Int) {
  require(capacity > 0, "LruMap capacity must be positive")

  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > capacity
  }

  def getOrElseUpdate(key: K, compute: => V): V = m.synchronized {
    val hit = m.get(key)
    if (hit != null) hit
    else { val v = compute; m.put(key, v); v }
  }

  def size: Int = m.synchronized(m.size())
}
