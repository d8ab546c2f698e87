package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Memo for SESSION-FROZEN index artifacts (the ivfAssign pattern):
  * checkpointed, pinned DataFrames built once per (session, input dir)
  * and served to every consumer query — the production lifecycle of a
  * trained index (IVF cells, PQ codebooks, graph adjacency, corpus
  * token tables).
  *
  * Concurrency contract: the build runs under `computeIfAbsent`, so two
  * concurrent callers of the same key produce exactly ONE artifact —
  * the old get-then-put shape let both run `Tables.hotPinned` and the
  * loser's pinned checkpoint RDDs (pinned against the per-query harness
  * cleanup) leaked for the JVM lifetime. Liveness: entries whose pinned
  * blocks were unpersisted (tests, explicit resets) are dropped and
  * rebuilt; entries whose SparkSession has stopped are swept on every
  * access (the map is a handful of artifacts — the sweep is free).
  */
final class FrozenMemo[K, A] {
  private case class Entry(session: SparkSession, art: A, live: Seq[RDD[_]]) {
    def alive: Boolean =
      live.forall(_.getStorageLevel != StorageLevel.NONE)
  }
  private val m = new java.util.concurrent.ConcurrentHashMap[K, Entry]()

  /** Serve the live artifact for `key`, or build it exactly once.
    * `build` must return the artifact plus the pinned RDDs backing it
    * (the `Tables.hotPinned` return shape).
    *
    * NOT REENTRANT: `build` runs inside `computeIfAbsent`, so a nested
    * `getOrBuild` on the SAME memo instance from within a build
    * deadlocks or throws (ConcurrentHashMap recursive-update rule),
    * and two different keys hashing to one bin serialize their builds.
    * An artifact that composes other artifacts must read them from
    * their OWN memo instances (the docToks ← bm25Stats shape), never
    * from the memo it is being built into. */
  def getOrBuild(key: K, session: SparkSession)
                (build: => (A, Seq[RDD[_]])): A = {
    m.forEach { (k, e) =>
      if (e.session.sparkContext.isStopped) m.remove(k, e)
    }
    val cur = m.get(key)
    if (cur != null && cur.alive) cur.art
    else {
      if (cur != null) m.remove(key, cur) // drop the dead entry only
      m.computeIfAbsent(key, _ => {
        val (a, live) = build
        Entry(session, a, live)
      }).art
    }
  }
}
