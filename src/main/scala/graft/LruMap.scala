package graft

/** A tiny synchronized LRU memo for the engine's driver-side caches
  * ([[Engine.table]]'s plan cache, [[operators.Dedup]]'s label memo, the
  * standing archive-index memo). Access-ordered `LinkedHashMap` with a
  * hard capacity: the eldest entry is dropped on overflow, so a
  * long-lived multi-tenant service can no longer grow either cache
  * without bound (previously both were JVM-lifetime `ConcurrentHashMap`s).
  *
  * `onEvict` (optional) fires for each dropped entry AFTER the map lock is
  * released — owners of scratch-backed values reclaim their files there
  * (the archive-index memo deletes its two materialized parquet dirs).
  * Eviction callbacks must tolerate a caller still holding the evicted
  * value's DataFrame: reclamation is correct only when evicted plans are
  * no longer live, which holds for the engine's memos because capacity
  * covers every concurrently-active key; owners with weaker guarantees
  * should leave `onEvict` unset and rely on [[operators.Scratch]]'s
  * session shutdown hook.
  *
  * `getOrElseUpdate` is synchronized on the whole map: compute runs under
  * the lock, which is the semantics the previous `computeIfAbsent` gave —
  * two threads never duplicate an expensive LSH run for the same key.
  * `getOrBuild` instead computes OUTSIDE the lock for multi-job builds
  * that would otherwise serialize every concurrent caller behind one
  * build; racing losers hand their value to `discard` for cleanup.
  */
private[graft] final class LruMap[K, V](capacity: Int,
    onEvict: (K, V) => Unit = null) {
  require(capacity > 0, "LruMap capacity must be positive")

  private val pendingEvictions = new java.util.ArrayDeque[(K, V)]

  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean = {
      val evict = this.size() > capacity
      if (evict && onEvict != null) pendingEvictions.add((e.getKey, e.getValue))
      evict
    }
  }

  private def runPendingEvictions(): Unit = {
    // Drain under the lock, fire after releasing it — an eviction callback
    // that waits for scheduler quiescence (Scratch.delete) must not
    // serialize every other cache caller behind it.
    val drained = m.synchronized {
      val out = List.newBuilder[(K, V)]
      while (!pendingEvictions.isEmpty) out += pendingEvictions.poll()
      out.result()
    }
    drained.foreach { case (k, v) => onEvict(k, v) }
  }

  def getOrElseUpdate(key: K, compute: => V): V = {
    val v = m.synchronized {
      val hit = m.get(key)
      if (hit != null) hit
      else { val nv = compute; m.put(key, nv); nv }
    }
    if (onEvict != null) runPendingEvictions()
    v
  }

  /** Memoize like [[getOrElseUpdate]] but run `compute` OUTSIDE the map
    * lock (for expensive multi-job builds). Two concurrent callers of a
    * missing key may both build; the put loser's value goes to `discard`
    * (reclaim scratch there) and the winner's is returned to both.
    */
  def getOrBuild(key: K)(compute: => V)(discard: V => Unit): V = {
    val hit = m.synchronized(m.get(key))
    if (hit != null) return hit
    val built = compute
    val (winner, lost) = m.synchronized {
      val prior = m.get(key)
      if (prior != null) (prior, true)
      else { m.put(key, built); (built, false) }
    }
    if (lost) discard(built)
    if (onEvict != null) runPendingEvictions()
    winner
  }

  def size: Int = m.synchronized(m.size())
}
