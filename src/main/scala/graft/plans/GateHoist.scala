package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** Optimizer rule: hoist a deterministic Filter through an OPAQUE
  * `mapPartitions` barrier that has DECLARED a row-wise passthrough
  * contract (SURVEY §4's optional gate-reordering rule).
  *
  * Catalyst cannot push predicates through `MapPartitions` — the lambda
  * is a black box, so a gate a pipeline author writes AFTER a model stage
  * runs after every row has already paid for the models, even when the
  * gate only reads columns the stage copies verbatim. The barrier owner
  * knows better: a model stage is per-input-row (each output row carries
  * its source row's key columns unchanged), so `filter(gate) ∘ stage ≡
  * stage ∘ filter(gate)` for gates over those columns. [[GateHoist.declarePassthrough]]
  * records that contract as a node tag (serialized-field name → input
  * column name, resolved through the `toDF` rename); this rule then
  * rewrites `Filter(cond, SerializeFromObject(MapPartitions(
  * DeserializeToObject(child))))` into the same chain over
  * `Filter(cond', child)` whenever every attribute `cond` references is
  * declared — so mis-ordered gates slide below the barrier and drop rows
  * BEFORE the models run. Tags survive Catalyst copies (`makeCopy`
  * preserves them), and the rule re-tags the rebuilt serialize node so
  * stacked filters hoist across fixed-point iterations.
  *
  * Correctness rests solely on the declared contract (the declaring stage
  * owns it — exactly like [[graft.operators.Sharding]]'s id-uniqueness
  * precondition); undeclared barriers and non-deterministic or
  * undeclared-column predicates are left untouched. */
object GateHoist extends Rule[LogicalPlan] {

  /** serialized-field name → below-barrier column name, set on the
    * SerializeFromObject node of a declaring barrier. */
  val passthroughTag: TreeNodeTag[Map[String, String]] =
    TreeNodeTag[Map[String, String]]("graft.gatehoist.passthrough")

  /** Declare `cols` of `df` (a frame whose plan is `mapPartitions` +
    * optional `toDF` rename) as row-wise passthrough: every output row's
    * value equals its source input row's value for that column. Returns a
    * frame carrying the contract; a no-op (the frame unchanged) when the
    * plan's top is not the expected barrier shape. */
  def declarePassthrough(df: DataFrame, cols: String*): DataFrame = {
    val plan = df.queryExecution.analyzed
    // resolve declared output names through an optional rename Project to
    // the serialize node's field names
    val resolved: Option[(SerializeFromObject, Map[String, String])] = plan match {
      case Project(projList, s: SerializeFromObject) =>
        val outToSer = projList.collect {
          case a @ Alias(attr: Attribute, _) => a.name -> attr.name
          case attr: Attribute => attr.name -> attr.name
        }.toMap
        Some((s, outToSer))
      case s: SerializeFromObject =>
        Some((s, s.output.map(a => a.name -> a.name).toMap))
      case _ => None
    }
    resolved match {
      case Some((serNode, outToSer)) =>
        val below = serNode.collectFirst {
          case DeserializeToObject(_, _, child) => child
        }
        below match {
          case Some(child) =>
            val belowNames = child.output.map(_.name).toSet
            val mapping = cols.flatMap { c =>
              // contract: same-named column below the barrier
              outToSer.get(c).filter(_ => belowNames.contains(c)).map(_ -> c)
            }.toMap
            if (mapping.nonEmpty) serNode.setTagValue(passthroughTag, mapping)
            org.apache.spark.sql.graft.ColumnBridge.ofRows(df.sparkSession, plan)
          case None => df
        }
      case None => df
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Hoist the conjuncts of a gate (each expressed over `s`'s output
    * attributes) that the contract covers below the barrier, returning
    * the rebuilt serialize node and the conjuncts that must STAY above
    * (indexed into `conjuncts` by position, so the Project case can map
    * them back to their original form). None when no conjunct hoists.
    * Conjunction splitting matters in practice: Catalyst's own pushdown
    * merges a late-written cheap gate with the stage's computed-column
    * gates into ONE Filter above the barrier — all-or-nothing hoisting
    * would then strand the cheap gate above the models. Refuses any
    * conjunct whose mapped below-barrier name is AMBIGUOUS in the child
    * output (e.g. after a self-join duplicates a column name):
    * name-based rebinding would silently pick one of the twins, so
    * ambiguity means no hoist, never a guess. */
  private def hoisted(conjuncts: Seq[Expression], s: SerializeFromObject)
      : Option[(SerializeFromObject, Seq[Int])] = s match {
    case SerializeFromObject(_,
        mp @ MapPartitions(_, _, d @ DeserializeToObject(_, _, child)))
        if s.getTagValue(passthroughTag).isDefined =>
      val mapping = s.getTagValue(passthroughTag).get
      val dupNames = child.output.groupBy(_.name)
        .collect { case (n, as) if as.size > 1 => n }.toSet
      val byName = child.output.map(a => a.name -> a).toMap
      val (go, stay) = conjuncts.zipWithIndex.partition { case (c, _) =>
        c.references.forall(r =>
          mapping.get(r.name).exists(t => byName.contains(t) && !dupNames(t)))
      }
      if (go.isEmpty) None
      else {
        val rewritten = go.map(_._1.transform {
          case a: Attribute if mapping.contains(a.name) => byName(mapping(a.name))
        }).reduce(And)
        val newS = s.copy(child = mp.copy(child =
          d.copy(child = Filter(rewritten, child))))
        newS.copyTagsFrom(s)
        Some((newS, stay.map(_._2)))
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, s: SerializeFromObject) if cond.deterministic =>
      val conjuncts = splitConjuncts(cond)
      hoisted(conjuncts, s).map { case (newS, stayIdx) =>
        if (stayIdx.isEmpty) newS: LogicalPlan
        else Filter(stayIdx.map(conjuncts).reduce(And), newS)
      }.getOrElse(f)
    // The common real shape: a pipeline author derives columns between
    // the model stage and the gate (`stage.withColumn(...).filter(gate)`
    // analyzes as Filter(Project(Serialize(...)))). A gate conjunct still
    // hoists when every attribute it references passes through the
    // Project UNCOMPUTED — a bare attribute or a rename Alias of one — by
    // resolving those refs (by exprId, so duplicate display names can't
    // cross wires) down to the serialize node's own outputs. Conjuncts
    // over columns the Project COMPUTES don't exist below the barrier and
    // are left where they are.
    case f @ Filter(cond, p @ Project(projList, s: SerializeFromObject))
        if cond.deterministic =>
      val resolve: Map[ExprId, Attribute] = projList.collect {
        case a: Attribute => a.exprId -> a
        case al @ Alias(attr: Attribute, _) => al.exprId -> attr
      }.toMap
      val conjuncts = splitConjuncts(cond)
      val (resolvable, unresolvable) = conjuncts.partition(
        _.references.forall(r => resolve.contains(r.exprId)))
      if (resolvable.isEmpty) f
      else {
        val overSerialize = resolvable.map(_.transform {
          case a: Attribute if resolve.contains(a.exprId) => resolve(a.exprId)
        })
        hoisted(overSerialize, s) match {
          case None => f
          case Some((newS, stayIdx)) =>
            // conjuncts that resolved but didn't hoist keep their ORIGINAL
            // (above-Project) form; so do the unresolvable ones
            val stay = stayIdx.map(resolvable) ++ unresolvable
            val rebuilt = p.copy(child = newS)
            if (stay.isEmpty) rebuilt: LogicalPlan
            else Filter(stay.reduce(And), rebuilt)
        }
      }
  }
}
