package graft

import org.apache.spark.sql.SparkSession

/** Library front door: a SparkSession configured the way the engine
  * expects — native expressions + optimizer rule registered, AQE with
  * skew-join splitting on, nanosecond-parquet compatibility, and a
  * shuffle-partition default sized to the cluster instead of Spark's
  * fixed 200 (AQE coalesces downward from there at runtime).
  *
  * Existing sessions work too: every `Tables.table` call registers the
  * native functions lazily, and the declarative fallbacks keep any
  * un-registered session correct (just slower). This builder is the
  * one-stop setup for a user bringing their own cluster.
  */
object GraftSession {

  /** Apply graft's settings to a builder before `getOrCreate()`. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.extensions", classOf[graft.plans.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // naive event timestamps read as UTC instants (oracle parity)
      .config("spark.sql.session.timeZone", "UTC")

  /** Local session (tests, single-node runs): `local[cores]` with one
    * shuffle partition per core. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]"), cores)
      .getOrCreate()
    graft.plans.GraftFunctions.register(s)
    s
  }

  /** Cluster session: shuffle partitions ≈ 2-3× total executor cores is
    * the standard starting point; AQE coalesces small stages and splits
    * skewed ones from there. */
  def cluster(totalCores: Int): SparkSession = {
    val s = configure(SparkSession.builder(), totalCores * 2).getOrCreate()
    graft.plans.GraftFunctions.register(s)
    s
  }
}
