package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the classic salting patterns, kept
  * deterministic (salt is a hash of row content, never rand()).
  *
  * At 100 TB a single hot key (one viral video's frames, one dominant
  * language) overwhelms its reducer; AQE's skew-join split covers sort-
  * merge joins, but hot-key AGGREGATION and broadcast-ineligible joins
  * need explicit salting:
  *  - [[saltedAgg]]: two-phase aggregation — phase 1 aggregates on
  *    (key, salt) spreading the hot key over `buckets` reducers, phase 2
  *    merges the partials (legal for algebraic aggregates: sum/count/
  *    min/max).
  *  - [[saltedJoin]]: big side salted by content hash, small side
  *    replicated `buckets`× — turns one hot reducer into `buckets`
  *    parallel ones at the cost of replicating the small side.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from the hash of `cols`. */
  def saltCol(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Two-phase salted sum+count per key group. Output: keyCols,
    * `sum_<alias>`, `cnt_<alias>` — identical to the direct groupBy
    * (addition is associative-commutative over longs/decimals; for
    * doubles the regrouping can differ in last-ulp like any Spark
    * repartition would). */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], valueCol: Column,
                alias: String, buckets: Int, saltBy: Column): DataFrame = {
    val phase1 = df
      .withColumn("_salt", saltCol(buckets, saltBy))
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
    phase1.groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).as(s"sum_$alias"),
        sum(col("_pcnt")).cast("long").as(s"cnt_$alias"))
  }

  /** Salted equi-join: `big ⋈ small` on `key`, with the big side salted
    * by `saltBy` and the small side replicated across all salts. Returns
    * the joined frame (small-side columns preserved). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int,
                 saltBy: Column): DataFrame = {
    val saltedBig = big.withColumn("_salt", saltCol(buckets, saltBy))
    val replicatedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
