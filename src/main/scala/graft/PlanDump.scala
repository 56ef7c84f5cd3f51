package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `.explain("formatted")` for named queries into
  * per-query files — the optimization-round evidence artifact
  * (`plans/r<N>/<query>_{before,after}.txt`).
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query>[,<query>...] [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, namesArg) = args.take(3)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (namesArg == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else namesArg.split(',').toSeq
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution
        .explainString(ExplainMode.fromString("formatted")).trim
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt + "\n")
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
