package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (name <- Seq("frame_score_agg", "dedup_ngram_jaccard", "dedup_simhash")) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan // forces analysis+optimization+planning
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"$name%-24s plan=${(t1-t0)/1e9}%5.2fs exec1=${(t2-t1)/1e9}%5.2fs exec2=${(t3-t2)/1e9}%5.2fs")
    }
    spark.stop()
  }
}
