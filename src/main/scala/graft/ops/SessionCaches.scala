package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Lifetime management for the library's session-keyed memo caches
  * ([[graft.operators.Similarity.corpusCount]]'s count memo,
  * [[graft.queries.Tables]]' shared-frame cache, the near-dup clustering
  * memo): each cache strongly keys on the SparkSession, so without a
  * hook a long-lived multi-session service (one JVM, sessions created
  * and stopped per tenant/job) would pin every stopped session's plans
  * and checkpointed frames forever. Registering here attaches ONE
  * SparkListener per (context, cache) that drops the cache's entries for
  * that session when its SparkContext ends — bounded by #live sessions
  * again, which is the invariant the caches document. Sessions sharing
  * one context (`newSession()`) are all dropped when the context stops —
  * cleanup fires at context end because that is the only end-of-life
  * signal Spark exposes; a finer per-`SparkSession.stop()` hook does not
  * exist in the public listener API. */
object SessionCaches {

  private val installed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, AnyRef)]()

  /** Run `cleanup(session)` when the session's SparkContext ends.
    * Idempotent per (session, caller-identity): pass a stable `tag`
    * object (the cache being cleaned — NOT a shared default, or two
    * caches' registrations would collide) so repeated registration from
    * a hot path installs one listener, not one per call. */
  def onSessionStop(session: SparkSession, tag: AnyRef)
                   (cleanup: SparkSession => Unit): Unit =
    if (installed.add((session, tag))) {
      session.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          cleanup(session)
          installed.remove((session, tag))
        }
      })
    }
}
