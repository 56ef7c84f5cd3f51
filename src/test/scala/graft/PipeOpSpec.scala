package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PipeOp, Pipeline}

class PipeOpSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("pipeline composes ops in order; dead-letter gates stack reasons") {
    val df = Seq((1L, 500.0), (2L, 20.0), (3L, -1.0)).toDF("id", "dur")
    val pipe = Pipeline(
      PipeOp.deadLetterGate("positive", col("dur") > 0, "non-positive duration"),
      PipeOp.deadLetterGate("min-dur", !(col("dur") > 0) || col("dur") >= 60, "duration too short"),
      PipeOp("derive")(d => d.withColumn("mins", col("dur") / 60)))
    val out = pipe.run(df).select("id", "status", "reason", "mins")
      .as[(Long, Int, Option[String], Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3.isEmpty)
    assert(out(2L)._2 == 0 && out(2L)._3.contains("duration too short"))
    assert(out(3L)._2 == 0 && out(3L)._3.contains("non-positive duration"))
    assert(pipe.names == Seq("positive", "min-dur", "derive"))
  }

  test("enrich records errors as data instead of failing") {
    val df = Seq((1L, 24.0), (2L, 0.0)).toDF("id", "fps")
    val out = PipeOp.enrich("spf", "sec_per_frame", lit(1.0) / col("fps"),
        col("fps") > 0, "zero fps")(df)
      .select("id", "sec_per_frame", "sec_per_frame_error")
      .as[(Long, Option[Double], Option[String])].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2.contains(1.0 / 24.0) && out(1L)._3.isEmpty)
    assert(out(2L)._2.isEmpty && out(2L)._3.contains("zero fps"))
  }

  test("andThen composition equals sequential application") {
    val df = Seq((1, 10)).toDF("a", "b")
    val f = PipeOp("double")(d => d.withColumn("b", col("b") * 2))
    val g = PipeOp("inc")(d => d.withColumn("b", col("b") + 1))
    val composed = f.andThen(g)
    assert(composed(df).select("b").as[Int].head() == 21)
    assert(composed.name == "double->inc")
  }
}
