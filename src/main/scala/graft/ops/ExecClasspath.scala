package graft.ops

/** Executor-visible rendering of this JVM's classpath.
  *
  * Standalone (`local-cluster`) executors run from their own work
  * directories, so any RELATIVE entry the launching command used (e.g.
  * `target/scala-2.13/classes` from a plain `java -cp ...`) silently
  * vanishes from the executor classpath, and the first task closure
  * fails to resolve its capturing class — surfacing as the opaque
  * `SerializedLambda cannot be assigned to Function3` cast error rather
  * than a ClassNotFoundException. sbt-forked runs dodge this only
  * because sbt happens to pass absolute paths. Absolutizing against the
  * driver's CWD at session-build time makes
  * `spark.executor.extraClassPath` launcher-independent (a no-op when
  * the entries are already absolute). */
object ExecClasspath {
  def absolute: String =
    System.getProperty("java.class.path")
      .split(java.io.File.pathSeparator)
      .filter(_.nonEmpty)
      .map { e =>
        val f = new java.io.File(e)
        val abs = f.getAbsolutePath
        // Absolutization resolves against the driver's CWD: a RELATIVE
        // entry that doesn't exist there means the launcher chdir'd (or
        // never sat at the repo root) and the rewrite would bake in a
        // wrong base — warn loudly here so the failure reads as a launch
        // bug, not the opaque executor SerializedLambda cast error.
        // (Wildcard entries are matcher syntax, not paths — skip them.)
        if (!f.isAbsolute && !e.endsWith("*") && !f.exists())
          System.err.println(s"[ExecClasspath] WARNING: relative classpath " +
            s"entry '$e' resolved to missing '$abs' — wrong launch CWD?")
        abs
      }
      .mkString(java.io.File.pathSeparator)
}
