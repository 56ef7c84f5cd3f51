package graft.ml

import java.util.concurrent.ConcurrentHashMap

/** Executor-side model lifecycle — the Spark analog of the reference's
  * per-worker lazy model init (Ray actor state): models load ONCE per
  * executor JVM and are shared by every task/partition on that executor,
  * never serialized with the job.
  * Ref: pipeline/caption.py:31-56 (lazy `_loaded` latch),
  * pipeline/video_extract_frame.py:55-87 (init_models_in_worker),
  * pipeline/cut_30min.py:68-85 (_ensure_ops).
  */
object ExecutorSingleton {
  private val cache = new ConcurrentHashMap[String, AnyRef]()

  /** Get-or-create the executor-local instance for `key`. `init` runs at
    * most once per JVM (computeIfAbsent), concurrent tasks share it. */
  def getOrCreate[T <: AnyRef](key: String)(init: => T): T =
    cache.computeIfAbsent(key, _ => init).asInstanceOf[T]

  /** Test hook. */
  private[graft] def clear(): Unit = cache.clear()
}

/** Bounded retry with exponential backoff + deterministic jitter — the
  * reference's ffmpeg retry envelope (common/video/ffmpeg_cut_op.py:16,40-59:
  * max 3 attempts, sleep 2^n + jitter) with the RNG seeded per item so the
  * data plane stays deterministic (SURVEY §7 "what's hard" #5). */
object Retry {
  def withRetry[T](maxAttempts: Int, baseBackoffMs: Long, jitterSeed: Long)
                  (attempt: Int => Either[String, T]): Either[String, T] = {
    val rng = new scala.util.Random(jitterSeed)
    var last: Either[String, T] = Left("no attempts made")
    var i = 0
    while (i < maxAttempts) {
      last = attempt(i)
      if (last.isRight) return last
      i += 1
      if (i < maxAttempts && baseBackoffMs > 0) {
        val sleepMs = (math.pow(2, i) * baseBackoffMs).toLong + rng.nextInt(100)
        Thread.sleep(sleepMs)
      }
    }
    last
  }
}
