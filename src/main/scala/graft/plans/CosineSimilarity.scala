package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen cosine similarity over two `array<float>` columns.
  *
  * Numerically IDENTICAL to the declarative form in
  * [[graft.operators.Similarity]] (dot and squared-norm accumulate as
  * left-to-right folds in double precision; result =
  * `dot / (sqrt(na) * sqrt(nb))`, 0.0 when either norm is 0) — so swapping
  * it into a query cannot change oracle results — but it runs as one fused
  * whole-stage-codegen loop with zero per-element allocations, replacing a
  * `zip_with` + three `aggregate` HOF chains (each of which materializes an
  * intermediate array per row pair). On brute-force ANN this is the hot
  * inner loop at 100 TB: O(pairs × dim) multiply-adds, now at array-scan
  * speed.
  *
  * Reference capability: AdaFace embedding cosine,
  * common/transform/similarity_op.py:16-21 (missing input → 0.0 default).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var na = 0.0; var nb = 0.0; var dot = 0.0
    var i = 0
    while (i < nx) { val v = x.getFloat(i).toDouble; na += v * v; i += 1 }
    i = 0
    while (i < ny) { val v = y.getFloat(i).toDouble; nb += v * v; i += 1 }
    val n = math.min(nx, ny)
    i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    if (na > 0.0 && nb > 0.0) dot / (math.sqrt(na) * math.sqrt(nb)) else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny"); val n = ctx.freshName("n")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |double $na = 0.0, $nb = 0.0, $dot = 0.0;
         |for (int $i = 0; $i < $nx; $i++) { double v = (double) $x.getFloat($i); $na += v * v; }
         |for (int $i = 0; $i < $ny; $i++) { double v = (double) $y.getFloat($i); $nb += v * v; }
         |int $n = $nx < $ny ? $nx : $ny;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = ($na > 0.0 && $nb > 0.0)
         |  ? $dot / (Math.sqrt($na) * Math.sqrt($nb)) : 0.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
