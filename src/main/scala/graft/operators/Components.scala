package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that turns
  * near-duplicate PAIRS into duplicate CLUSTERS so dedup can keep one
  * canonical document per cluster (min id), drop the rest.
  *
  * Min-label propagation: every node starts labeled with its own id; each
  * round every node takes the min of its label and its neighbors' labels;
  * fixpoint = components. All data-plane work is joins + aggregations
  * (shuffles keyed by node id — AQE-coalesced, skew-splittable); the
  * driver only orchestrates rounds and checks the converged count.
  *
  * Scale: rounds = component diameter. Near-dup clusters are
  * shallow (a dup of a dup of a dup is still textually close), so the
  * fixpoint lands in a handful of rounds; a long-chain graph would want
  * the large-star/small-star variant, which this deliberately is not.
  * Each round `localCheckpoint`s the labels — without cutting lineage the
  * plan doubles per round and Catalyst analysis dominates by round ~10.
  */
object Components {

  /** `nodes`: one `id` column; `edges`: `src`,`dst` (any orientation,
    * self-loops ignored). Returns (id, comp) with comp = min node id
    * reachable — deterministic. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxRounds: Int = 25): DataFrame = {
    // Materialize the edge list ONCE: `sym` is re-read every round (join +
    // convergence count), and an expensive upstream edge derivation (e.g.
    // the ngram-Jaccard all-pairs) would otherwise re-execute per round.
    // Symmetrize with ONE explode pass — a union of two selects would
    // execute that upstream derivation twice before the checkpoint.
    val sym = edges
      .select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val neighborMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("nid"))
        .agg(min(col("comp")).as("ncomp"))
      // Carry the previous label through the checkpoint so convergence is
      // a filter+count over the materialized rows — NOT a second full
      // labels join per round (which would double the per-round shuffles).
      val updated = labels.join(neighborMin, labels("id") === col("nid"), "left")
        .select(labels("id"), labels("comp").as("prev"),
          least(labels("comp"), coalesce(col("ncomp"), labels("comp"))).as("comp"))
        .localCheckpoint()
      val changed = updated.filter(col("comp") =!= col("prev")).count()
      labels = updated.select("id", "comp")
      converged = changed == 0
      round += 1
    }
    require(converged, s"label propagation did not converge in $maxRounds rounds " +
      "(long-chain graph — use a star-contraction variant)")
    labels
  }
}
