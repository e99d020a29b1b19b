package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.{coalesce, col, least, min}

/** Distributed connected components over an undirected edge list — the
  * clustering step every near-dup pipeline needs downstream of
  * [[Dedup]]: pair output (a~b, b~c) must collapse into components so
  * one canonical document per cluster survives.
  *
  * Algorithm: min-label propagation. Every node starts labeled with its
  * own id; each round it takes the min of its label and its neighbors'
  * labels; fixpoint in O(component diameter) rounds. Near-dup graphs are
  * star/clique-shaped (diameter ≤ ~3), so this converges in 2-4 rounds —
  * the classic alternative (small-star/large-star, Kiveris et al.) only
  * pays off on high-diameter graphs.
  *
  * Scale design (100 TB): per round, one join of the edge list against
  * the label table (both keyed shuffles on the same key — AQE reuses the
  * layout) plus a min aggregation. State per node is one (id, label)
  * row. Lineage is truncated every round with an eager localCheckpoint,
  * otherwise the iterated plan grows unboundedly and re-executes from
  * the source each round. The driver sees only the per-round changed
  * count (a scalar), never the data.
  */
object ConnectedComponents {

  /** Components of the undirected graph given by (aCol, bCol) pairs.
    * Returns (id, component) for every node incident to an edge, where
    * component is the minimum node id reachable. Deterministic.
    *
    * Each round does one neighbor-min hop followed by one pointer-jump
    * (comp ← comp(comp)) — the shortcutting step makes convergence
    * O(log diameter) instead of O(diameter), so a 10k-node transitive
    * chain converges in ~15 rounds, not 10k.
    *
    * Throws IllegalStateException if `maxIter` rounds pass without
    * reaching the fixpoint: truncated labels are WRONG components
    * (split clusters → multiple "canonical" keepers), and a dedup
    * pipeline must never silently treat them as exact.
    */
  def components(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25
  ): DataFrame = {
    // symmetrize once: propagation below only looks one hop dst→src
    // symmetrize once; eager so the per-round joins plan against
    // accurate LogicalRDD size stats (r16: an all-lazy variant measured
    // faster on artifact-edge graphs but 1.5× slower when the edge list
    // is a live subquery — dedup_clusters/pipeline_e2e — because the
    // round joins lost their stats; see OPTIMIZATION_r16.md)
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("comp").as("dst_comp")),
          "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_comp")).as("nbr_comp"))
      val hopped = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp")))
            .as("hop_comp"))
      // pointer jump: comp is itself a node id, and that node's label is
      // ≤ comp, so composing the mapping halves the remaining distance
      // EAGER per-round checkpoint (r16: two alternatives were measured
      // and REVERTED — (a) lazy checkpoints fused with the count saved a
      // job/round but lost LogicalRDD size stats and regressed the
      // live-subquery callers (dedup_clusters 1.5× slower); (b) persist
      // fused with the count kept stats but not plan TRUNCATION, and the
      // hopped self-join then triples the analyzed plan per round —
      // q_graph_robustness measured 2.7× slower. The eager checkpoint
      // does both jobs: truncation for planning and stats for broadcast
      // planning. See OPTIMIZATION_r16.md.)
      val stepped = hopped
        .join(
          hopped.select(col("id").as("hop_comp"),
            col("hop_comp").as("jump_comp")),
          Seq("hop_comp"), "left")
        .select(col("id"), col("hop_comp"),
          least(col("hop_comp"), coalesce(col("jump_comp"), col("hop_comp")))
            .as("next_comp"))
        .join(labels.select(col("id"), col("comp")), Seq("id"))
        .localCheckpoint(true)
      changed = stepped.filter(col("next_comp") < col("comp")).count()
      // free the prior round's checkpoint blocks: without this, block-
      // manager storage grows O(iterations) within one call
      labels.unpersist(false)
      labels = stepped.select(col("id"), col("next_comp").as("comp"))
      i += 1
    }
    sym.unpersist(false)
    if (changed > 0) {
      labels.unpersist(false)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing); raise maxIter — truncated " +
          "labels would be wrong (split) components")
    }
    labels
  }

  /** Dedup-keeper selection: given docs and near-dup pairs, returns
    * (id, component, is_canonical) — the minimum id of each component is
    * the keeper; docs in no pair are their own singleton component.
    */
  def canonicalize(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String
  ): DataFrame = {
    val comps = components(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("comp"))
    docs.select(col(idCol))
      .join(comps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("comp"), col(idCol)).as("component"))
      .withColumn("is_canonical", col("component") === col(idCol))
  }
}
