package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join as an EQUI-join.
  *
  * Spark plans a bare `a.v BETWEEN b.lo AND b.hi` join as
  * BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons, and a
  * driver-OOM broadcast once the interval side outgrows the hint — the
  * classic range-join cliff. Binning restores a shuffle-keyed hash join:
  * each interval explodes to the bins its span covers, each point maps to
  * exactly ONE bin, the sides equi-join on `bin`, and a residual
  * `BETWEEN` filter removes same-bin near-misses. Every qualifying pair
  * meets in exactly one bin (the point's), so no dedup pass is needed.
  *
  * Scale: one shuffle keyed by bin; interval fan-out = span/binWidth + 1
  * rows, so pick `binWidth` near the typical interval span (fan-out O(1))
  * — much smaller and the bin key cardinality explodes, much larger and
  * bins collect unrelated intervals (residual filter does the work).
  * Degenerate inputs (hi < lo) join nothing and are dropped up front.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame, binWidth: Double,
                      vCol: String = "v", loCol: String = "lo",
                      hiCol: String = "hi"): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "inputs must not already carry a '_bin' column")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val binnedIntervals = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_bin", explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    val binnedPoints = points.withColumn("_bin", bin(col(vCol)))
    binnedPoints.join(binnedIntervals, "_bin")
      .filter(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Interval-OVERLAP join (sessions × sessions, genomic ranges): pairs
    * where `[a.lo, a.hi]` and `[b.lo, b.hi]` intersect, as the same
    * binned equi-join — both sides explode to covered bins — with the
    * claim-ownership dedup: a qualifying pair is EMITTED only in the bin
    * containing the overlap's START (`floor(max(lo_a, lo_b)/w)`), so
    * each pair surfaces exactly once with no distinct pass. Columns from
    * both sides survive with `_a`/`_b` suffixes on the bound columns.
    * Same binWidth guidance as [[pointInInterval]]. */
  def intervalOverlap(left: DataFrame, right: DataFrame, binWidth: Double,
                      loCol: String = "lo", hiCol: String = "hi"): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    def binned(df: DataFrame, tag: String) = df
      .filter(col(loCol) <= col(hiCol))
      .withColumnRenamed(loCol, s"${loCol}_$tag").withColumnRenamed(hiCol, s"${hiCol}_$tag")
      .withColumn("_bin",
        explode(sequence(bin(col(s"${loCol}_$tag")), bin(col(s"${hiCol}_$tag")))))
    binned(left, "a").join(binned(right, "b"), "_bin")
      .filter(col(s"${loCol}_a") <= col(s"${hiCol}_b") &&
        col(s"${loCol}_b") <= col(s"${hiCol}_a"))
      .filter(col("_bin") === bin(greatest(col(s"${loCol}_a"), col(s"${loCol}_b"))))
      .drop("_bin")
  }
}
