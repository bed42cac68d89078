package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by fixed-round min-label propagation — the
  * cluster-assembly step of every dedup path (MinHash / SimHash /
  * embedding near-dup all emit pair links; a dedup pass keeps one
  * representative per COMPONENT of that graph).
  *
  * Design for scale:
  *  - The propagation runs over the EDGE-ENDPOINT node set only, which
  *    for a dedup graph is the candidate docs — orders of magnitude
  *    smaller than the corpus. Singletons never enter a shuffle; the
  *    caller left-joins labels back (see q_dup_components).
  *  - Each round is one equi-join on the edge key + one min-agg —
  *    partial mins combine map-side, labels are (long, long) rows, so
  *    a round moves 16·|V| bytes. No driver-side collect; `rounds` is
  *    a compile-time constant so the plan is static and AQE-replannable.
  *  - `rounds` bounds the reachable distance: labels converge iff the
  *    component diameter ≤ rounds (same contract as GridDbscan's
  *    propagation rounds — raise it for adversarially-chained dup
  *    graphs; 8 covers star-plus-bridges topology, the shape real
  *    duplicate clusters take, up to diameter 8).
  * An O(log n)-round alternating-star scheme (Kiveris et al. 2014,
  * "Connected Components in MapReduce and Beyond") drops in behind the
  * same signature if a corpus ever exhibits deep chains.
  */
object Components {

  /** Labels every node of `pairs` (columns a_id, b_id) with the minimum
    * node id reachable within `rounds` hops along undirected edges.
    * Returns (id, component).
    *
    * Each round's result is `localCheckpoint`ed: an iterative
    * DataFrame loop otherwise DOUBLES its logical plan per round
    * (labels feeds both the propagation and the merge), and Catalyst
    * analysis goes exponential long before the data does. Truncating
    * lineage to a LogicalRDD keeps planning O(1) per round — the same
    * discipline GraphFrames applies to its iterative algorithms. The
    * checkpointed blocks are executor-local (MEMORY_AND_DISK), freed
    * when the returned frame is garbage-collected. */
  def minLabel(pairs: DataFrame, rounds: Int = 8): DataFrame = {
    val edges = pairs.select(col("a_id").as("s"), col("b_id").as("d"))
      .union(pairs.select(col("b_id").as("s"), col("a_id").as("d")))
      .localCheckpoint(true) // consumed `rounds` times — compute once
    val nodes = edges.select(col("s").as("id")).distinct()
    var labels = nodes.select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    for (_ <- 0 until rounds) {
      val prop = labels.join(edges, col("id") === col("s"))
        .groupBy(col("d")).agg(min(col("component")).as("plbl"))
      labels = labels.join(prop, col("id") === col("d"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("plbl"), col("component")))
            .as("component"))
        .localCheckpoint(true)
    }
    labels
  }
}
