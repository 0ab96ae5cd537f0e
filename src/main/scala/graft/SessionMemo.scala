package graft

import org.apache.spark.sql.SparkSession

/** Per-SparkSession memo for expensive per-fixture artifacts
  * (checkpointed edge lists, trained codebooks, driver samples).
  *
  * The session is held WEAKLY: once a stopped session is otherwise
  * unreachable its entries become collectable. The previous
  * identity-hash string keys retained dead sessions' checkpoints for
  * the JVM lifetime, and an identity-hash collision after GC could
  * even have served a new session another session's artifact —
  * test suites that create/stop several sessions hit exactly that
  * lifecycle.
  *
  * `getOrElseUpdate` runs the builder under the memo lock: builders
  * launch Spark jobs, so two threads asking for the same fixture wait
  * rather than duplicate the work (same effective contract as
  * `ConcurrentHashMap.computeIfAbsent` on a contended bin).
  */
final class SessionMemo[V] {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, V]]()

  def getOrElseUpdate(s: SparkSession, key: String, build: => V): V =
    bySession.synchronized {
      var inner = bySession.get(s)
      if (inner == null) {
        inner = scala.collection.mutable.Map.empty[String, V]
        bySession.put(s, inner)
      }
      inner.getOrElseUpdate(key, build)
    }
}
