package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        s @ SerializeFromObject(_,
          mp @ MapPartitions(_, _, d @ DeserializeToObject(_, _, child))))
        if cond.deterministic && s.getTagValue(passthroughTag).isDefined =>
      val mapping = s.getTagValue(passthroughTag).get
      val byName = child.output.map(a => a.name -> a).toMap
      val hoistable = cond.references.forall(r =>
        mapping.get(r.name).exists(byName.contains))
      if (!hoistable) f
      else {
        val rewritten = cond.transform {
          case a: Attribute if mapping.contains(a.name) => byName(mapping(a.name))
        }
        val newS = s.copy(child = mp.copy(child =
          d.copy(child = Filter(rewritten, child))))
        newS.copyTagsFrom(s)
        newS
      }
  }
}
