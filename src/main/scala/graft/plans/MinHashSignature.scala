package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** k-permutation MinHash signature in one pass: element j is
  * min over shingles of `xxhash64(j, shingle)` — BIT-COMPATIBLE with the
  * declarative fallback `array_min(transform(sh, t => xxhash64(lit(j), t)))`
  * because it replays Spark's own XxHash64 chain (seed 42 → hashInt(j) →
  * hashUnsafeBytes(shingle)). The fused loop replaces k independent
  * transform+array_min trees (k intermediate arrays per row) with a
  * single scan of the shingle array, which is the per-row hot loop of
  * corpus-scale MinHash sketching. */
case class MinHashSignature(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val seeds = new Array[Long](k)
    var j = 0
    while (j < k) { seeds(j) = XxHash64Function.hash(j, IntegerType, 42L); j += 1 }
    var t = 0
    var any = false
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        any = true
        val s = arr.getUTF8String(t)
        j = 0
        while (j < k) {
          val h = XxHash64Function.hash(s, StringType, seeds(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      t += 1
    }
    // array_min of an empty/all-null transform is NULL per slot
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins.map(m => m: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
