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

  /** Max entries for a [[capped]] value cache. */
  val ValueCap = 64

  /** The session-UUID key component, registering the session for
    * later liveness checks.
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

  /** Drop entries owned by dead sessions (and the dead registry rows
    * themselves). `uuidOf` extracts the session-UUID component of a
    * cache key.
    */
  def sweep[K, V](m: TrieMap[K, V])(uuidOf: K => String): Unit = {
    m.keySet.foreach { k => if (dead(uuidOf(k))) m.remove(k) }
    live.keySet.foreach { u => if (dead(u)) live.remove(u) }
  }

  /** getOrElseUpdate on a (sessionUUID, fingerprint)-keyed cache with
    * a dead-session sweep first.
    */
  def cached[V](m: TrieMap[(String, String), V], s: SparkSession,
      fingerprint: String)(build: => V): V = {
    val u = sessionKey(s)
    sweep(m)(_._1)
    m.getOrElseUpdate((u, fingerprint), build)
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
