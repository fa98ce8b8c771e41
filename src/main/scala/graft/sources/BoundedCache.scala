package graft.sources

/** A tiny thread-safe LRU (access-order) cache with a hard entry cap —
  * backs per-JVM metadata caches keyed by table root
  * ([[DeltaChanges.feedSchema]]) so a long-lived session that touches
  * many tables cannot grow driver memory without bound. Eviction is
  * least-recently-USED (gets refresh recency), so hot roots stay. */
private[sources] final class BoundedCache[K, V](max: Int) {
  require(max >= 1, s"cache cap must be >= 1, got $max")

  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      this.size() > max
  }

  def get(key: K): Option[V] = map.synchronized(Option(map.get(key)))
  def put(key: K, value: V): Unit = map.synchronized { map.put(key, value); () }
  def size: Int = map.synchronized(map.size())
  def contains(key: K): Boolean = map.synchronized(map.containsKey(key))
}
