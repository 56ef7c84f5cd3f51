package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the coarse-
  * quantizer scale path next to [[Similarity.lshTopK]]: k-means centroids
  * partition the corpus into `nLists` inverted lists; a query probes its
  * `nProbe` nearest centroids and ranks exactly within those lists only.
  *
  * Scale shape: centroid training samples the corpus once; assignment is
  * a narrow map; search is an equi-join on `list_id` (one shuffle keyed
  * by list), so per-query work is `nProbe/nLists` of the corpus instead
  * of all of it — the standard billion-vector ANN layout. The centroid
  * set (nLists × dim doubles) broadcasts as plan literals.
  */
object Ivf {

  final case class Index(centers: Array[Array[Double]], assigned: DataFrame)

  /** Train the coarse quantizer and assign every vector to its list.
    * `assigned` = input columns + `list_id`. Deterministic via seed.
    *
    * The quantizer fits on a bounded sample (`sampleCap` rows, default
    * 100×nLists — the standard billion-vector recipe): centroid quality
    * converges long before the full corpus is seen, and at 100 TB a
    * full-corpus k-means would dominate the build. Assignment still
    * covers every vector (narrow map over the scan). */
  def build(vectors: DataFrame, nLists: Int, seed: Long = 42L,
            vecCol: String = "embedding", maxIter: Int = 8,
            sampleCap: Long = 0L): Index = {
    val cap = if (sampleCap > 0) sampleCap else 100L * nLists
    val n = vectors.count()
    val featured = vectors.withColumn("_features", array_to_vector(col(vecCol)))
    val train =
      if (n <= cap) featured
      // oversample slightly so the realized sample rarely undershoots cap
      else featured.sample(withReplacement = false, math.min(1.0, 1.1 * cap / n), seed)
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("_features").setPredictionCol("list_id")
      .fit(train)
    val assigned = model.transform(featured).drop("_features")
    Index(model.clusterCenters.map(_.toArray), assigned)
  }

  /** Squared L2 distance from a float-array column to a literal center. */
  private def distSq(vec: Column, center: Array[Double]): Column =
    aggregate(
      zip_with(vec, array(center.map(lit): _*), (x, c) => {
        val d = x.cast("double") - c
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** The `nProbe` nearest list ids for each query vector (by L2 to the
    * literal centroid set). */
  private def probeLists(qvec: Column, centers: Array[Array[Double]], nProbe: Int): Column = {
    val scored = array(centers.zipWithIndex.map { case (c, j) =>
      struct(distSq(qvec, c).as("d"), lit(j).as("list_id"))
    }: _*)
    transform(slice(array_sort(scored), 1, nProbe), s => s.getField("list_id"))
  }

  /** Approximate top-k: probe `nProbe` lists per query, exact cosine rank
    * within the probed lists. */
  def topK(index: Index, queries: DataFrame, k: Int, nProbe: Int,
           idCol: String = "vec_id", vecCol: String = "embedding",
           qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val probed = queries
      .withColumn("list_id", explode(probeLists(col(qvecCol), index.centers, nProbe)))
    val paired = index.assigned.join(broadcast(probed), Seq("list_id"))
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("sim", Similarity.cosine(col(vecCol), col(qvecCol)))
    val w = Window.partitionBy(qidCol).orderBy(col("sim").desc, col(idCol).asc)
    paired.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank").cast("long").as("rank"), col(idCol), col("sim"))
  }
}
