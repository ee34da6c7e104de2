package graft.core

/** TTL-bounded statistics cache (reference: term-guard/src/optimizer/stats_cache.rs:
  * 15-120 — string-keyed f64 entries, 5-minute TTL, capacity-bound with
  * oldest-entry eviction).
  *
  * Purpose-built for HEURISTIC statistics — row counts, distinctness ratios, overlap
  * probes — that feed suggestion/analysis surfaces ([[graft.analyzers.SchemaAnalyzer]])
  * re-run on slowly-changing tables: a scheduled validation sweep every few minutes
  * re-probes the same (table, column) pairs, and each probe is a full Spark job.
  * It is NOT a correctness surface: validation constraints always recompute.
  *
  * Thread-safe (the suite evaluates multi-job constraints concurrently). The clock is
  * injectable so expiry is deterministically testable.
  */
final class StatsCache(
    ttlMillis: Long = 5 * 60 * 1000L,
    maxEntries: Int = 1000,
    clock: () => Long = System.currentTimeMillis) {
  require(ttlMillis > 0, "ttl must be positive")
  require(maxEntries > 0, "maxEntries must be positive")

  private final case class Entry(value: Double, at: Long)
  private val cache = scala.collection.mutable.LinkedHashMap.empty[String, Entry]

  def get(key: String): Option[Double] = synchronized {
    cache.get(key).filter(e => clock() - e.at < ttlMillis).map(_.value)
  }

  def put(key: String, value: Double): Unit = synchronized {
    if (!cache.contains(key) && cache.size >= maxEntries) {
      // Evict the oldest entry (insertion order ~ age; same policy as the reference).
      cache.remove(cache.head._1)
    }
    cache.remove(key) // re-insert to refresh insertion order
    cache(key) = Entry(value, clock())
  }

  /** Cached lookup or compute-and-store. The compute function runs OUTSIDE the lock —
    * it is typically a Spark job, and holding the cache lock across it would serialize
    * every concurrent stats probe in the process.
    */
  def getOrCompute(key: String)(f: => Double): Double =
    get(key).getOrElse { val v = f; put(key, v); v }

  def invalidate(key: String): Unit = synchronized { cache.remove(key) }
  def clear(): Unit = synchronized { cache.clear() }
  def size: Int = synchronized {
    cache.count { case (_, e) => clock() - e.at < ttlMillis }
  }
}
