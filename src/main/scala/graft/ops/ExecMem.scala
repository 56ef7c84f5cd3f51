package graft.ops

/** Executor-memory resolution for `local-cluster` masters.
  *
  * A `local-cluster[n, cores, memMB]` worker refuses to launch an
  * executor whose `spark.executor.memory` exceeds its worker-memory
  * field — and the app then HANGS waiting for resources with no error
  * (the r12 footgun: the 20g default silently deadlocked against the
  * documented 13312 MB four-worker topology unless every invocation
  * remembered to set SPARK_GRAFT_EXEC_MEM). Derive the default from the
  * master string instead (min(20 GiB, worker memory)), and FAIL FAST
  * with a readable message when an explicit SPARK_GRAFT_EXEC_MEM
  * oversizes the worker. */
object ExecMem {
  private val WorkerMb =
    """local-cluster\[\s*\d+\s*,\s*\d+\s*,\s*(\d+)\s*\]""".r

  /** Parse a SPARK_GRAFT_EXEC_MEM value ("12g", "13312m", bare MiB). */
  private def asMb(v: String): Long = {
    val t = v.trim.toLowerCase
    if (t.endsWith("g")) t.dropRight(1).toLong * 1024L
    else if (t.endsWith("m")) t.dropRight(1).toLong
    else t.toLong
  }

  /** The spark.executor.memory value to configure for `master`. */
  def resolve(master: String,
              env: Map[String, String] = sys.env): String = {
    val workerMb = WorkerMb.findFirstMatchIn(master).map(_.group(1).toLong)
    env.get("SPARK_GRAFT_EXEC_MEM") match {
      case Some(v) =>
        workerMb.foreach { w =>
          require(asMb(v) <= w,
            s"SPARK_GRAFT_EXEC_MEM=$v exceeds the $master worker memory " +
              s"(${w}m): executors would never launch and the app would " +
              "hang waiting for resources. Lower it or raise the master's " +
              "worker-memory field.")
        }
        v
      case None => s"${workerMb.fold(20480L)(math.min(20480L, _))}m"
    }
  }
}
