package graft.llm

/** Small bounded LRU memo backing the in-session training/truth caches
  * ([[LlmOps.MemoMaxEntries]]): an access-ordered `LinkedHashMap` whose
  * eldest entry evicts past `maxEntries`, so a long-lived service that
  * mints one key per regenerated corpus generation cannot grow the memo
  * forever — the memo is a pure cost cache, and an evicted entry just
  * recomputes on its next probe.
  *
  * Concurrency contract: `compute` runs OUTSIDE the map lock. A
  * `ConcurrentHashMap.computeIfAbsent` would hold the bin lock for the
  * whole multi-second Spark job behind some entries, serializing
  * unrelated sessions that hash to the same bin; here two racing
  * sessions may both compute, and the FIRST `put` wins — the loser's
  * value is discarded and the winner's returned, so every caller of one
  * key observes one value. Duplicate computation is acceptable by
  * construction: every memoized computation is deterministic in the key
  * (the values would be identical anyway), and the race window is one
  * cold construction per key per JVM.
  */
private[llm] final class BoundedMemo[V <: AnyRef](val maxEntries: Int) {
  require(maxEntries > 0, s"maxEntries must be positive: $maxEntries")

  // accessOrder = true: get() refreshes recency, so eviction is
  // least-recently-USED, not least-recently-inserted — a hot entry
  // survives an eviction storm of one-shot keys
  private val m = new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
      this.size() > maxEntries
  }

  def getOrCompute(key: String)(compute: => V): V = {
    val hit = m.synchronized(m.get(key))
    if (hit != null) hit
    else {
      val v = compute
      m.synchronized {
        val race = m.get(key)
        if (race != null) race
        else { m.put(key, v); v }
      }
    }
  }

  def contains(key: String): Boolean = m.synchronized(m.containsKey(key))
  def size: Int = m.synchronized(m.size())
}
