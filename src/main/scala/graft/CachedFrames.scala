package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Session-scoped registry of compute-once-per-corpus artifacts
  * (persisted shingle/assignment frames, checkpointed cluster tables,
  * collected model codebooks), keyed by caller-chosen `K` that must lead
  * with the owning session's id.
  *
  * Why not bare `TrieMap.getOrElseUpdate`: it may evaluate the builder
  * CONCURRENTLY on first access, and the loser's corpus-sized persisted
  * value (count() already forced) would be discarded without unpersist —
  * leaking executor cache blocks for the JVM lifetime. Here the race is
  * resolved with `putIfAbsent` and the loser is explicitly `release`d: a
  * racing build costs duplicate compute once, never leaked storage.
  */
final class SessionCache[K, V](release: V => Unit) {
  private val cache = TrieMap.empty[K, V]
  // registration is the LAST initializer: register(this) publishes the
  // instance to the global registry, and invalidateAll() on another
  // thread would NPE on `cache` if it saw a half-constructed instance
  SessionCache.register(this)

  /** The cached value for `key`, building (and keeping) it if absent.
    * Persisted resources in `build`'s result must be releasable by this
    * cache's `release` function. */
  def get(key: K)(build: => V): V =
    cache.get(key) match {
      case Some(v) => v
      case None =>
        val built = build
        cache.putIfAbsent(key, built) match {
          case None => built
          case Some(winner) =>
            release(built)
            winner
        }
    }

  /** Release and drop every entry whose key matches. */
  def invalidate(pred: K => Boolean): Unit =
    cache.filterInPlace { (k, v) =>
      if (pred(k)) { release(v); false } else true
    }

  /** Release and drop every entry (the [[SessionCache.invalidateAll]]
    * hook — existential element types make the predicate form awkward
    * to call through `SessionCache[_, _]`). */
  private[graft] def clear(): Unit = invalidate(_ => true)
}

object SessionCache {
  /** The common case: cached persisted DataFrames. */
  def frames[K]: SessionCache[K, DataFrame] =
    new SessionCache[K, DataFrame](_.unpersist(blocking = false))

  // Every instance self-registers (object-field instances: a few dozen
  // for the JVM's life), so a harness can drop EVERYTHING a corpus ever
  // published — see invalidateAll.
  private val instances =
    new java.util.concurrent.ConcurrentLinkedQueue[SessionCache[_, _]]()

  private def register(c: SessionCache[_, _]): Unit = instances.add(c)

  /** Release and drop every entry of every cache — result caches AND
    * intermediate corpus artifacts (shingle arrays, edge tables, walk
    * indexes, trained models). The bench's sf1 scale leg uses this
    * between entries so each is FULLY cold and entries cannot couple
    * through shared residents: r11/r12 both spent a round adjudicating
    * sentinel readings that turned out to be eviction pressure from
    * earlier leg queries' 10×-sized leftovers. Never called by library
    * code paths — per-family `invalidateCaches` remains the scoped
    * tool. */
  def invalidateAll(): Unit =
    instances.forEach(_.clear())
}

/** Named (non-lambda) per-row copy for `toRdd.map`: unsafe rows are
  * reused per partition, so caching requires copies. A NAMED function
  * object deliberately: `SparkContext.clean` introspects the bytecode
  * of a lambda's capturing class via the thread context classloader,
  * which a previously-run streaming micro-batch thread can leave
  * pointing somewhere that cannot resolve graft classes — the
  * ClosureCleaner NPE that flaked two suites in a full test run. Named
  * function classes skip the cleaner's lambda path entirely. */
private[graft] object CopyInternalRow
    extends (org.apache.spark.sql.catalyst.InternalRow =>
      org.apache.spark.sql.catalyst.InternalRow) with Serializable {
  override def apply(r: org.apache.spark.sql.catalyst.InternalRow)
      : org.apache.spark.sql.catalyst.InternalRow = r.copy()
}
