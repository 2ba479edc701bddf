package graft.core

import java.util.WeakHashMap
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Identity-keyed per-session memo cache for expensive shared artifacts
  * (trained classifier state, ANN indexes, bucketed layouts, cluster
  * labels, incremental-split signature tables).
  *
  * Why not `identityHashCode(session).toHexString` string keys (the round-8
  * construction): an identity hash is not unique — a NEW SparkSession can
  * collide with a STOPPED one's hash and be served localCheckpoint'd
  * DataFrames bound to the dead session (job failure at best, wrong results
  * at worst), and string keys are never evicted, pinning checkpoint blocks
  * for the JVM lifetime. Here the outer map keys on the session OBJECT
  * (`WeakHashMap` + SparkSession's default reference equality), so distinct
  * sessions can never alias, and a listener registered at first use evicts
  * the session's whole entry on application end — dropping the strong
  * references that would otherwise keep the stopped session (and its
  * checkpoint blocks) reachable through the cached DataFrames.
  *
  * Reference analog: the indexer's per-process in-memory caches of parsed
  * contract metadata (tasks.py module state), scoped to the process the way
  * these artifacts are scoped to the session.
  */
final class SessionCache[V] {
  SessionCache.register(this)

  private val perSession = new WeakHashMap[SparkSession, ConcurrentHashMap[String, V]]()

  private def mapFor(s: SparkSession): ConcurrentHashMap[String, V] =
    perSession.synchronized {
      var m = perSession.get(s)
      if (m == null) {
        m = new ConcurrentHashMap[String, V]()
        perSession.put(s, m)
        // Evict on context stop: the cached values (DataFrames) strongly
        // reference the session, so the weak key alone can never be
        // collected — the listener is what actually releases a stopped
        // session's artifacts. A session whose context is already gone
        // can't take a listener; its entry is garbage either way.
        try s.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
            SessionCache.invalidate(s)
        })
        catch { case _: IllegalStateException => () }
      }
      m
    }

  /** the artifact for (`s`, `key`), building it at most once per pair.
    * `build` runs under the inner map's per-key lock — concurrent callers
    * of the same artifact wait instead of double-building. */
  def get(s: SparkSession, key: String)(build: => V): V =
    mapFor(s).computeIfAbsent(key, _ => build)

  /** drop every artifact cached for `s` in THIS cache. */
  def drop(s: SparkSession): Unit =
    perSession.synchronized { perSession.remove(s); () }
}

object SessionCache {
  private val all = new java.util.concurrent.CopyOnWriteArrayList[SessionCache[_]]()
  private def register(c: SessionCache[_]): Unit = all.add(c)

  /** drop every artifact cached for `s` across ALL caches — the cold-path
    * reset the bench's artifact-build timing and the chaos specs use, and
    * what the application-end listener calls. */
  def invalidate(s: SparkSession): Unit = all.forEach(_.drop(s))
}
