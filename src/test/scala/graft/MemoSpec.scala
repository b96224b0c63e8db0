package graft

import scala.collection.concurrent.TrieMap

import org.scalatest.funsuite.AnyFunSuite

/** The cross-cache sweep contract: a dead session's entries leave
  * EVERY registered cache, not just the first one swept. The round-8
  * regression was exactly that — `sweep` removed the dead UUID from
  * the liveness registry during the first cache's sweep, so every
  * other cache judged the UUID unknown (not dead) and kept its
  * DataFrame entries forever.
  */
class MemoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dead session entries purge from all registered caches on any access") {
    val m1 = TrieMap.empty[(String, String), String]
    val m2 = TrieMap.empty[(String, String), String]
    // register both caches (and the live session) with Memo
    assert(Memo.cached(m1, spark, "memospec-fp")("live1") == "live1")
    assert(Memo.cached(m2, spark, "memospec-fp")("live2") == "live2")
    // plant entries owned by a session that is already collected
    val ghost = "memospec-ghost-uuid"
    m1.put((ghost, "memospec-fp"), "stale1")
    m2.put((ghost, "memospec-fp"), "stale2")
    Memo.registerCollected(ghost)
    // one access to ONE cache must purge the ghost from BOTH
    assert(Memo.cached(m1, spark, "memospec-fp")("rebuilt") == "live1")
    assert(!m1.keySet.exists(_._1 == ghost), "ghost survived in the accessed cache")
    assert(!m2.keySet.exists(_._1 == ghost),
      "ghost survived in the sibling cache (the round-8 leak)")
    // the live session's entries are untouched
    val u = Memo.sessionKey(spark)
    assert(m1((u, "memospec-fp")) == "live1")
    assert(m2((u, "memospec-fp")) == "live2")
  }

  test("registry holds caches weakly: a dropped test-local cache is pruned") {
    // register a cache that nothing else references…
    var m: TrieMap[(String, String), String] =
      TrieMap.empty[(String, String), String]
    assert(Memo.cached(m, spark, "memospec-weak-fp")("v") == "v")
    val before = Memo.registeredCount
    val probe = new java.lang.ref.WeakReference(m)
    m = null // …drop the only strong reference
    // coax the collector until the probe clears (bounded — the maps are
    // small and unreachable, so this converges in a few cycles)
    var tries = 0
    while (probe.get != null && tries < 50) {
      System.gc(); Thread.sleep(10); tries += 1
    }
    assume(probe.get == null, "JVM declined to collect the probe map")
    Memo.sweepAll() // prunes cleared refs even with no dead sessions
    assert(Memo.registeredCount < before,
      "collected cache still pinned by the registry (the strong-ref leak)")
  }

  test("cached build seconds accrue to the family label and drain once") {
    Memo.drainBuildLog(): Unit
    val m = TrieMap.empty[(String, String), String]
    assert(Memo.cached(m, spark, "memospec-log-fp", "memospec_fam") {
      Thread.sleep(5); "built"
    } == "built")
    // a hit logs nothing
    assert(Memo.cached(m, spark, "memospec-log-fp", "memospec_fam")("x") == "built")
    val log = Memo.drainBuildLog()
    assert(log.contains("memospec_fam") && log("memospec_fam") > 0.0)
    assert(!Memo.drainBuildLog().contains("memospec_fam"), "drain must reset")
  }

  test("capped cache clears on overflow and rebuilds exactly") {
    val m = TrieMap.empty[Int, Int]
    (0 until Memo.ValueCap).foreach(i => Memo.capped(m)(i, i * 10))
    assert(m.size == Memo.ValueCap)
    // hit on an existing key at the cap: no clear
    assert(Memo.capped(m)(0, -1) == 0)
    assert(m.size == Memo.ValueCap)
    // miss at the cap: clear + rebuild the requested entry
    assert(Memo.capped(m)(Memo.ValueCap, 42) == 42)
    assert(m.size == 1)
  }
}
