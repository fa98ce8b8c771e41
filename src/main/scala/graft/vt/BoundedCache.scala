package graft.vt

/** Bounded process-wide LRU for IMMUTABLE sidecar artifacts (manifests,
  * bloom indexes, decoded deletion vectors) — one implementation of the
  * pattern that used to be copied per artifact kind.
  *
  * The load runs OUTSIDE the lock: concurrent first-time loads of
  * DIFFERENT keys never serialize behind each other's IO, and a rare
  * duplicate load of the same immutable artifact is harmless (last put
  * wins with identical content). Access-ordered, so hot artifacts stay. */
final class BoundedCache[K, V](max: Int) {
  private val m = new java.util.LinkedHashMap[K, V](max, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > max
  }

  def get(key: K)(load: => V): V = {
    val hit = m.synchronized(m.get(key))
    if (hit != null) hit
    else {
      val loaded = load
      m.synchronized(m.put(key, loaded))
      loaded
    }
  }
}
