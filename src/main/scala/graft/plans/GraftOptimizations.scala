package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** Optimizer rule: `size(array_intersect(array_sort(a), array_sort(b)))`
  * over string arrays → [[SortedIntersectCount]] on the sorted inputs —
  * the merge-scan replaces array_intersect's per-invocation hash set.
  * Statically safe: it only fires when both inputs are literally
  * `array_sort` with the DEFAULT comparator (binary UTF8 order, the order
  * the merge scan assumes); any custom comparator leaves the plan
  * untouched. This is the engine teaching Catalyst about its own native
  * kernels, so user-written builtin-form queries get the fast path
  * without knowing it exists. */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  /** The RESOLVED shape of ArraySort's default comparator:
    * `(l, r) -> if (l < r) -1 else if (l > r) 1 else 0` over the same two
    * lambda variables. (ArraySort.defaultComparator itself is the
    * unresolved form, so semanticEquals against it can never match an
    * analyzed plan.) */
  private def isDefaultComparator(f: Expression): Boolean = f match {
    // non-nullable elements: if (l < r) -1 else if (l > r) 1 else 0
    case LambdaFunction(
        If(LessThan(la: NamedLambdaVariable, ra: NamedLambdaVariable), Literal(m, IntegerType),
          If(GreaterThan(lb: NamedLambdaVariable, rb: NamedLambdaVariable),
            Literal(p, IntegerType), Literal(z, IntegerType))),
        Seq(l: NamedLambdaVariable, r: NamedLambdaVariable), _) =>
      m == -1 && p == 1 && z == 0 &&
        la.exprId == l.exprId && ra.exprId == r.exprId &&
        lb.exprId == l.exprId && rb.exprId == r.exprId
    // nullable elements: the analyzer wraps the same order with a
    // nulls-LAST prelude — if (isnull(l) && isnull(r)) 0 else
    // if (isnull(l)) 1 else if (isnull(r)) -1 else <non-null form>.
    // Nulls-last is exactly what SortedIntersectCount's null handling
    // assumes, so this shape is safe to rewrite too.
    case LambdaFunction(
        If(And(IsNull(n1: NamedLambdaVariable), IsNull(n2: NamedLambdaVariable)), Literal(z0, IntegerType),
          If(IsNull(n3: NamedLambdaVariable), Literal(p0, IntegerType),
            If(IsNull(n4: NamedLambdaVariable), Literal(m0, IntegerType),
              If(LessThan(la: NamedLambdaVariable, ra: NamedLambdaVariable), Literal(m, IntegerType),
                If(GreaterThan(lb: NamedLambdaVariable, rb: NamedLambdaVariable),
                  Literal(p, IntegerType), Literal(z, IntegerType)))))),
        Seq(l: NamedLambdaVariable, r: NamedLambdaVariable), _) =>
      z0 == 0 && p0 == 1 && m0 == -1 && m == -1 && p == 1 && z == 0 &&
        n1.exprId == l.exprId && n2.exprId == r.exprId &&
        n3.exprId == l.exprId && n4.exprId == r.exprId &&
        la.exprId == l.exprId && ra.exprId == r.exprId &&
        lb.exprId == l.exprId && rb.exprId == r.exprId
    case _ => false
  }

  /** Fire only on `array_sort(array_distinct(...))` with the default
    * comparator: the merge scan counts duplicate matches, while
    * array_intersect dedups its result — the two only agree on DISTINCT
    * inputs, so distinctness must be statically guaranteed. (Null
    * elements are fine: sorted-distinct input has at most one null, last,
    * and [[SortedIntersectCount]] replays array_intersect's both-contain-
    * null semantics instead of dereferencing the null slot.) */
  private def isDefaultSortedStrings(e: Expression): Boolean =
    e match {
      case ArraySort(arg @ ArrayDistinct(_), f, _) =>
        arg.dataType match {
          case ArrayType(StringType, _) => isDefaultComparator(f)
          case _ => false
        }
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(l, r), _) if isDefaultSortedStrings(l) && isDefaultSortedStrings(r) =>
      SortedIntersectCount(l, r)
  }
}
