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

  /** Parse a SPARK_GRAFT_EXEC_MEM value in any Spark-legal byte-string
    * form ("12g", "20gb", "13312m", "512k", "1t", "104857600b" bare
    * bytes, bare MiB). Sub-MiB values round UP to 1 MiB so a
    * tiny-but-nonzero value still trips the oversize check's
    * contrapositive (a 0 would vacuously pass). Unparseable and
    * non-positive values fail fast with a readable message instead of a
    * raw NumberFormatException or a deferred opaque launch error. */
  private[graft] def asMb(v: String): Long = {
    val t0 = v.trim.toLowerCase
    def num(s: String): Long =
      try s.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_EXEC_MEM value '$v' is not a Spark memory string " +
            "(expected <n>[k|m|g|t][b] or <n> bytes + 'b', e.g. 12g, " +
            "13312m, 512k, 104857600b)")
      }
    // Spark accepts both "g" and "gb" suffix spellings, and a bare "b"
    // bytes suffix ("104857600b") — a digit before the 'b' means bytes.
    val bareBytes = t0.endsWith("b") && t0.length > 1 &&
      t0.charAt(t0.length - 2).isDigit
    val t = if (t0.endsWith("b") && t0.length > 1 && !bareBytes)
      t0.dropRight(1) else t0
    val mb =
      if (bareBytes) (num(t.dropRight(1)) + (1L << 20) - 1L) / (1L << 20)
      else if (t.endsWith("t")) num(t.dropRight(1)) * 1024L * 1024L
      else if (t.endsWith("g")) num(t.dropRight(1)) * 1024L
      else if (t.endsWith("m")) num(t.dropRight(1))
      else if (t.endsWith("k")) (num(t.dropRight(1)) + 1023L) / 1024L
      else num(t)
    require(mb > 0,
      s"SPARK_GRAFT_EXEC_MEM=$v is not a positive memory size: executors " +
        "would fail at launch with an opaque Spark error. Use a positive " +
        "value like 12g or 13312m.")
    mb
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
