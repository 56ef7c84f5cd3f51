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
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val neighborMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("nid"))
        .agg(min(col("comp")).as("ncomp"))
      val updated = labels.join(neighborMin, labels("id") === col("nid"), "left")
        .select(labels("id"),
          least(labels("comp"), coalesce(col("ncomp"), labels("comp"))).as("comp"))
        .localCheckpoint()
      val changed = updated.as("u").join(labels.as("l"), "id")
        .filter(col("u.comp") =!= col("l.comp")).count()
      labels = updated
      converged = changed == 0
      round += 1
    }
    require(converged, s"label propagation did not converge in $maxRounds rounds " +
      "(long-chain graph — use a star-contraction variant)")
    labels
  }
}
