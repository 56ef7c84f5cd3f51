package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Sequence packing — the LLM-training step that concatenates documents
  * into fixed token-budget training sequences (bins) with minimal padding.
  *
  * Greedy next-fit in deterministic id order within each pack group: keep
  * filling the current bin while the next document fits; open a new bin
  * when it doesn't. A document larger than the whole budget gets a bin of
  * its own (it is the caller's job to chunk oversized docs first — see the
  * `chunk_tokens` query — so packing never drops data).
  *
  * Order-dependence makes this a keyed fold, not a groupBy aggregate
  * (`bin_idx` depends on every earlier doc in the group), so it runs as
  * `groupByKey(group).flatMapGroups` with an explicit in-group sort — the
  * same deterministic-fold shape as [[GreedyDedup]]. Per-group state is two
  * counters (current bin index + fill), memory O(1) beyond the group sort.
  *
  * At 100 TB: one shuffle on `group`. Pack groups are whatever unit must
  * not mix (shard, source, split); parallelism = number of groups, so the
  * caller picks groups sized like output shards (thousands of docs), never
  * one global group. Packing quality loss vs global first-fit-decreasing
  * is the last bin per group — negligible at shard sizes.
  */
object Packing {

  /** One packable item: `group` = pack-isolation key (shard/source/split),
    * `doc_id` = deterministic fold order, `n_tokens` = item size. */
  case class Item(group: String, doc_id: Long, n_tokens: Long)

  /** Packed assignment: bin ids are 0-based per group; `offset` is the
    * token position of this doc inside its bin (prefix sum — what a
    * sequence builder needs to place attention-mask boundaries). */
  case class Packed(group: String, bin_idx: Long, doc_id: Long,
                    n_tokens: Long, offset: Long)

  /** Pure fold over one group's items (must already be in doc_id order). */
  def foldGroup(group: String, items: Iterator[Item], budget: Long): Iterator[Packed] = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    var bin = 0L
    var fill = 0L
    items.map { it =>
      if (fill > 0 && fill + it.n_tokens > budget) { bin += 1; fill = 0L }
      val out = Packed(group, bin, it.doc_id, it.n_tokens, fill)
      fill += it.n_tokens
      out
    }
  }

  def run(items: Dataset[Item], budget: Long)
         (implicit spark: SparkSession): Dataset[Packed] = {
    import spark.implicits._
    items.groupByKey(_.group).flatMapGroups { (g, it) =>
      foldGroup(g, it.toArray.sortBy(_.doc_id).iterator, budget)
    }
  }
}
