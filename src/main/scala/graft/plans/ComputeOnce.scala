package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Evaluation barrier for EXPENSIVE derived columns: a transparent
  * pass-through of `child` that declares itself non-deterministic, so the
  * optimizer may not duplicate, reorder, or constant-fold it.
  *
  * Why it exists (optimization guide §4.4, applied to native expressions):
  * `PushDownPredicates` substitutes a projected alias's DEFINITION into any
  * filter above it and pushes the copy toward the scan — a filter on a
  * heavy HOF-derived column (e.g. `area_ratio <= 0.4` over an
  * `array_max(transform(...))`) then evaluates the whole HOF chain TWICE
  * per row (once in the pushed Filter, once in the surviving Project), and
  * drags the copy below any repartition meant to spread that compute.
  * Wrapping the heavy column in [[ComputeOnce]] pins it: the filter stays
  * above the projection, referencing the attribute, and the chain runs
  * once, where it was placed.
  *
  * The value is in reality fully deterministic — the flag only disables
  * optimizer rewrites, never changes semantics — so results are identical
  * to the unwrapped expression. Use it ONLY on expensive derivations whose
  * placement was chosen deliberately: the same flag also blocks legitimate
  * pushes of OTHER cheap filters past the projection.
  *
  * ALLOWED POSITIONS: because the expression is flagged non-deterministic,
  * CheckAnalysis only permits it where Spark permits non-deterministic
  * expressions — Project/Filter/Aggregate(-adjacent) positions, i.e.
  * `withColumn`/`select` projections and `filter` predicates (every
  * in-repo use). Wrapping a JOIN condition, groupBy/repartition KEY, or
  * sort key with `once(...)` fails analysis at runtime.
  */
case class ComputeOnce(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): ComputeOnce =
    copy(child = newChild)
  override def prettyName: String = "compute_once"
}

object Once {
  /** Column-level wrapper: `once(heavyCol).as("x")` in a projection. */
  def once(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ComputeOnce(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
