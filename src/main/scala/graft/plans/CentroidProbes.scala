package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `nProbe` nearest centroid ids (squared-L2, ties to the lower id)
  * for one embedding, as a single fused pass over the literal centroid
  * matrix — the IVF coarse-quantizer hot loop.
  *
  * Replaces the declarative argmin (`array_sort` over `nLists` structs,
  * each a zip_with+aggregate distance tree): that form costs Catalyst a
  * `nLists × dim`-literal expression tree — multi-second ANALYSIS on
  * every query — and allocates per-row arrays at execution. Here the
  * centroids are baked into the expression (like [[HyperplaneBuckets]]),
  * planning is O(1), and evaluation is a tight primitive loop with a
  * bounded selection instead of a full sort.
  *
  * Output order: distance asc, then centroid id asc — exactly the
  * declarative `array_sort(struct(d, list_id))` order, so the two paths
  * pick identical lists (DedupSimilaritySpec equivalence).
  */
case class CentroidProbes(child: Expression, centers: Array[Array[Double]], nProbe: Int)
  extends UnaryExpression with CodegenFallback {

  require(centers.nonEmpty, "graft_centroid_probes needs at least one centroid")
  require(nProbe > 0 && nProbe <= centers.length,
    s"nProbe must be in [1, ${centers.length}], got $nProbe")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_centroid_probes expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_centroid_probes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (centers(0).length != n)
      throw new IllegalArgumentException(
        s"graft_centroid_probes: embedding dim $n != centroid dim ${centers(0).length}")
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) { vec(i) = arr.getFloat(i).toDouble; i += 1 }
    val k = centers.length
    val d2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ctr = centers(c)
      var s = 0.0
      var j = 0
      while (j < n) { val d = vec(j) - ctr(j); s += d * d; j += 1 }
      d2(c) = s
      c += 1
    }
    // bounded selection: nProbe passes over k distances (nProbe << k and
    // k is small — simpler and cache-friendlier than a heap here)
    val out = new Array[Any](nProbe)
    val taken = new Array[Boolean](k)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var bestD = Double.MaxValue
      var ci = 0
      while (ci < k) {
        // ascending scan + strict < keeps the lowest id on distance ties
        if (!taken(ci) && d2(ci) < bestD) { best = ci; bestD = d2(ci) }
        ci += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
