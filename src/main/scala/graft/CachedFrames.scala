package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Session-scoped registry of persisted DataFrames (trained models,
  * shingle arrays, corpus assignments — the library's
  * compute-once-per-corpus intermediates), keyed by caller-chosen `K`
  * that must lead with the owning session's id.
  *
  * Why not bare `TrieMap.getOrElseUpdate`: it may evaluate the builder
  * CONCURRENTLY on first access, and the loser's corpus-sized persisted
  * frame (count() already forced) would be discarded without unpersist —
  * leaking executor cache blocks for the JVM lifetime. Here the race is
  * resolved with `putIfAbsent` and the loser is explicitly unpersisted:
  * a racing build costs duplicate compute once, never leaked storage.
  */
final class CachedFrames[K] {
  private val cache = TrieMap.empty[K, DataFrame]

  /** The cached frame for `key`, building (and keeping) it if absent.
    * `build` must return an already-persisted frame. */
  def get(key: K)(build: => DataFrame): DataFrame =
    cache.get(key) match {
      case Some(df) => df
      case None =>
        val built = build
        cache.putIfAbsent(key, built) match {
          case None => built
          case Some(winner) =>
            built.unpersist(blocking = false)
            winner
        }
    }

  /** Unpersist and drop every entry whose key matches. */
  def invalidate(pred: K => Boolean): Unit =
    cache.filterInPlace { (k, df) =>
      if (pred(k)) { df.unpersist(); false } else true
    }
}
