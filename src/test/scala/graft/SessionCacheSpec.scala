package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.core.SessionCache

/** The memoization seam's contract: one build per (live session, key),
  * keyed on the session OBJECT — two distinct sessions can never alias
  * (the round-8 identityHashCode string keys could collide after a
  * restart) — and explicit invalidation forces a rebuild (the bench's
  * cold-pass reset).
  */
class SessionCacheSpec extends AnyFunSuite {
  import SparkTestSession._

  test("one build per (session, key); keys are independent") {
    val cache = new SessionCache[String]
    val builds = new AtomicInteger
    def get(k: String) = cache.get(spark, k) { builds.incrementAndGet(); s"v:$k" }
    assert(get("a") === "v:a")
    assert(get("a") === "v:a")
    assert(builds.get === 1, "second get must reuse the built artifact")
    assert(get("b") === "v:b")
    assert(builds.get === 2, "distinct keys build independently")
  }

  test("distinct session objects never share artifacts") {
    val cache = new SessionCache[Int]
    val builds = new AtomicInteger
    val s2 = spark.newSession() // same context, DISTINCT session object
    val v1 = cache.get(spark, "k") { builds.incrementAndGet() }
    val v2 = cache.get(s2, "k") { builds.incrementAndGet() }
    assert(v1 === 1 && v2 === 2,
      "each session builds its own artifact — object identity, not hash strings")
    assert(cache.get(spark, "k") { builds.incrementAndGet() } === 1)
    assert(cache.get(s2, "k") { builds.incrementAndGet() } === 2)
  }

  test("drop and global invalidate force a rebuild (the cold-pass reset)") {
    val cache = new SessionCache[Int]
    val builds = new AtomicInteger
    assert(cache.get(spark, "k") { builds.incrementAndGet() } === 1)
    cache.drop(spark)
    assert(cache.get(spark, "k") { builds.incrementAndGet() } === 2,
      "drop must evict this session's entries")
    SessionCache.invalidate(spark)
    assert(cache.get(spark, "k") { builds.incrementAndGet() } === 3,
      "the global invalidate must reach every registered cache")
  }

  test("concurrent callers of one key build exactly once") {
    val cache = new SessionCache[Int]
    val builds = new AtomicInteger
    val results = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val threads = (1 to 8).map(_ => new Thread(() => {
      results.add(cache.get(spark, "k") { Thread.sleep(50); builds.incrementAndGet() })
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(results.size === 1 && results.contains(1),
      "per-key lock: waiters must see the one build")
    assert(builds.get === 1)
  }
}
