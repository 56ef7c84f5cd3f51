package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: planning-vs-execution breakdown for registered queries.
  * Usage: runMain graft.Profile [sfDir] [query ...] */
object Profile {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_CONF="k=v;k2=v2": extra session confs for probe A/Bs
    // (e.g. the codegen hugeMethodLimit / methodSplitThreshold sweeps)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.executedPlan
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"$name%-26s plan=${(t1 - t0) / 1e9}%5.2fs exec1=${(t2 - t1) / 1e9}%5.2fs exec2=${(t3 - t2) / 1e9}%5.2fs")
    }
    spark.stop()
  }
}
