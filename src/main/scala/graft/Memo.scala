package graft

import java.lang.ref.WeakReference

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Hygiene for the per-(session, corpus-fingerprint) memo caches.
  *
  * Every expensive derived artifact in the engine (dedup cluster
  * labels, the graph-ANN index, trained BPE/unigram/k-means models,
  * …) is memoized in a `TrieMap` keyed by the owning session's UUID
  * plus a data fingerprint, holding `localCheckpoint`-ed DataFrames or
  * small model values. Left alone those maps only ever grow: a
  * long-lived driver that opens and closes many sessions (or re-reads
  * many corpus versions) accumulates checkpoint blocks and stale model
  * state that nothing can reach again — the key embeds a session UUID
  * no future caller can reproduce once the session object is gone.
  *
  * Two eviction disciplines, matched to the two cache shapes:
  *
  *   - [[cached]] — for session-keyed caches (the DataFrame holders):
  *     each access first sweeps entries whose owning session is
  *     stopped or has been collected. Dropping the map reference is
  *     enough — `localCheckpoint` blocks belong to the session's
  *     context (gone when it stops) and otherwise get cleaned by the
  *     ContextCleaner once the RDD is unreachable.
  *   - [[capped]] — for fingerprint-keyed caches of small model values
  *     (centroid arrays, LUTs, scalar stats) that are valid across
  *     sessions: a hard entry cap; on overflow the map is cleared and
  *     rebuilt on demand. Crude but correct — these are pure functions
  *     of the fingerprinted data, so a refit after eviction returns
  *     the identical value.
  */
object Memo {

  /** Sessions seen behind cache keys, by UUID. Weak: the memo must
    * never be what keeps a closed session reachable.
    */
  private val live = TrieMap.empty[String, WeakReference[SparkSession]]

  /** Every session-keyed cache ever passed to [[cached]], by identity
    * (NOT by map equality — two empty caches compare equal). A dead
    * session's entries must be purged from EVERY registered cache
    * before its UUID leaves [[live]]: purging the UUID during the
    * first single-cache sweep would make [[dead]] answer false
    * (unknown UUID) for all the OTHER caches, which would then hold
    * the dead session's DataFrames forever.
    *
    * Weakly referenced: the operator modules' caches are object
    * singletons (reachable forever anyway), but ad-hoc/test-local maps
    * passed to [[cached]] must not be pinned by this registry for the
    * driver's lifetime — cleared references are pruned on every sweep.
    */
  private val registered = scala.collection.mutable.ArrayBuffer
    .empty[WeakReference[TrieMap[(String, String), Any]]]

  private def register(m: TrieMap[(String, String), Any]): Unit =
    synchronized {
      if (!registered.exists(_.get eq m)) registered += new WeakReference(m)
    }

  /** Live registered caches, pruning entries whose map was collected. */
  private def liveCaches(): List[TrieMap[(String, String), Any]] =
    synchronized {
      registered.filterInPlace(_.get ne null)
      registered.iterator.flatMap(r => Option(r.get)).toList
    }

  /** Test seam: register a UUID whose session has already been
    * collected (a cleared weak reference — the post-GC state).
    */
  private[graft] def registerCollected(u: String): Unit =
    live.put(u, new WeakReference[SparkSession](null))

  /** Test seam: how many cache registrations are currently held
    * (collected ones still pending a prune included).
    */
  private[graft] def registeredCount: Int = synchronized(registered.size)

  /** Max entries for a [[capped]] value cache. */
  val ValueCap = 64

  /** The session-UUID key component, registering the session for
    * later liveness checks. UUID, not `identityHashCode`: the hash can
    * collide after a stopped session is GC'd (a new session reusing
    * the hash would receive checkpointed blocks of a dead context),
    * while `sessionUUID` is unique for the JVM's lifetime.
    */
  def sessionKey(s: SparkSession): String = {
    val u = org.apache.spark.sql.graft.ColumnBridge.sessionUUID(s)
    if (!live.contains(u)) live.putIfAbsent(u, new WeakReference(s))
    u
  }

  /** A UUID is dead once its session is stopped or unreachable. A
    * UUID never registered here is left alone (we can't judge it).
    */
  private def dead(u: String): Boolean = live.get(u) match {
    case Some(r) => Option(r.get).forall(_.sparkContext.isStopped)
    case None => false
  }

  /** Drop every dead session's entries from ALL registered caches,
    * then retire the dead UUIDs from the registry. Sweeping all caches
    * before the purge is the point: each UUID is judged dead exactly
    * once, with every cache listening.
    */
  def sweepAll(): Unit = {
    val gone = live.keySet.filter(dead)
    if (gone.nonEmpty) {
      liveCaches().foreach { m =>
        m.keySet.foreach { k => if (gone(k._1)) m.remove(k) }
      }
      gone.foreach(live.remove)
    } else liveCaches(): Unit // still prune collected cache refs
  }

  /** Evict every entry of every registered session-keyed cache, live
    * sessions included. The values are rebuildable-by-construction
    * (pure functions of the fingerprinted corpus), so this is always
    * safe — the next consumer re-pays the build. Used by Bench between
    * query families on large scale factors: the memoized
    * `localCheckpoint` blocks of one family otherwise stay pinned
    * through every later family, and at 10× data the accumulated
    * blocks are what pushed a full-registry pass over the default
    * heap. Dropping the references is enough — the caller follows with
    * a `System.gc()` so the ContextCleaner reclaims the blocks
    * promptly rather than at its periodic interval.
    */
  def evictAll(): Unit = liveCaches().foreach(_.clear())

  /** Seconds spent building memoized artifacts since the last
    * [[drainBuildLog]], accumulated per caller-supplied family label.
    * Bench drains this after each query so BENCH_FULL.json can
    * attribute a memo-riding query's 0.02 s steady-state median to the
    * build that rep 1 of its first consumer actually paid.
    */
  private val buildLog = TrieMap.empty[String, Double]

  private[graft] def drainBuildLog(): Map[String, Double] = {
    val snap = buildLog.toMap
    snap.keys.foreach(buildLog.remove)
    snap
  }

  /** getOrElseUpdate on a (sessionUUID, fingerprint)-keyed cache with
    * a dead-session sweep across all registered caches first. `family`
    * labels the artifact in the bench build ledger; a cache hit logs
    * nothing.
    */
  def cached[V](m: TrieMap[(String, String), V], s: SparkSession,
      fingerprint: String, family: String = "memo")(build: => V): V = {
    val u = sessionKey(s)
    register(m.asInstanceOf[TrieMap[(String, String), Any]])
    sweepAll()
    m.getOrElse((u, fingerprint), {
      val t0 = System.nanoTime()
      val v = m.getOrElseUpdate((u, fingerprint), build)
      val dt = (System.nanoTime() - t0) / 1e9
      buildLog.updateWith(family)(p => Some(p.getOrElse(0.0) + dt)): Unit
      v
    })
  }

  /** getOrElseUpdate on a fingerprint-keyed value cache with a hard
    * entry cap ([[ValueCap]]); overflow clears the map (entries are
    * pure functions of the fingerprinted data — a rebuild is exact).
    */
  def capped[K, V](m: TrieMap[K, V])(key: K, build: => V): V = {
    if (m.size >= ValueCap && !m.contains(key)) m.clear()
    m.getOrElseUpdate(key, build)
  }
}
