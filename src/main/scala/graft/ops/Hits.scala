package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs & authorities, Kleinberg) with the exact engine-portable
  * state encoding of [[PageRank]]: per-iteration scores are re-quantized
  * to DECIMAL(28,12), contribution sums are exact DECIMAL additions
  * (order-independent under any partitioning), and normalization is by
  * the iteration MAX — a single exact comparison — rather than the L2
  * norm, whose sqrt-of-float-sum would re-introduce partition-order
  * noise. After every iteration the max-normalized state is a pure
  * function of the graph, replayable in DuckDB as unrolled CTEs.
  *
  * Scale shape per iteration: two keyed join+aggregate passes over the
  * edge list (dst-keyed for authorities, src-keyed for hubs) and two
  * 1-row max aggregates that ride broadcasts. Edge table persisted for
  * the loop, released before return; both score tables are eagerly
  * `localCheckpoint`ed every iteration (the [[BpeTrainer]]/[[PageRank]]
  * lineage contract) so planning cost stays O(1) in depth.
  *
  * The natural input is a DIRECTED (often bipartite) graph — on a
  * symmetric graph hubs equal authorities and the fixpoint degenerates
  * to the degree vector.
  */
object Hits {

  /** (node, auth DECIMAL(28,12), hub DECIMAL(28,12)) after `iters`
    * synchronous iterations. Nodes = src ∪ dst; a node absent from a
    * side simply scores 0 on that side (pure authorities have hub 0,
    * pure hubs authority 0).
    */
  def scores(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .persist()
    // Empty-graph guard (PageRank's `require(n > 0)` twin): without it
    // the first iteration's max-collect returns a null DECIMAL and the
    // .doubleValue() NPEs with no indication of the actual problem.
    require(!e.isEmpty, "HITS: empty graph (no edges after projection)")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist()
    val one = "CAST(1.000000000000 AS DECIMAL(28,12))"
    var hub = nodes.select(col("node"), expr(one).as("h"))
      .localCheckpoint(true)
    var auth = nodes.select(col("node"), expr(one).as("a"))
      .localCheckpoint(true)
    try {
      // Each raw contribution table feeds BOTH its 1-row max and the
      // normalization join, so it is persisted for the iteration and the
      // max is collected as a scalar (the BpeTrainer per-iteration
      // argmax-collect pattern) — one pass instead of two, and the
      // normalizing divisor inlines as a literal identical in value to
      // the oracle's CAST(m AS DOUBLE). Double's toString round-trips
      // exactly, so the inlined literal loses nothing.
      for (_ <- 1 to iters) {
        // authority update: sum of in-neighbor hub scores, max-normalized
        val aRaw = e.join(hub.withColumnRenamed("node", "src"), "src")
          .groupBy("dst").agg(sum(col("h")).as("s"))
          .persist()
        val aM = aRaw.agg(max(col("s"))).head().getDecimal(0).doubleValue()
        auth = nodes
          .join(aRaw.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"), expr(
            s"""CAST(round(CAST(coalesce(s, 0) AS DOUBLE)
                 / CAST('$aM' AS DOUBLE), 12) AS DECIMAL(28,12))""")
            .as("a"))
          .localCheckpoint(true)
        aRaw.unpersist(blocking = false)
        // hub update: sum of out-neighbor authority scores, max-normalized
        val hRaw = e.join(auth.withColumnRenamed("node", "dst"), "dst")
          .groupBy("src").agg(sum(col("a")).as("s"))
          .persist()
        val hM = hRaw.agg(max(col("s"))).head().getDecimal(0).doubleValue()
        hub = nodes
          .join(hRaw.withColumnRenamed("src", "node"), Seq("node"), "left")
          .select(col("node"), expr(
            s"""CAST(round(CAST(coalesce(s, 0) AS DOUBLE)
                 / CAST('$hM' AS DOUBLE), 12) AS DECIMAL(28,12))""")
            .as("h"))
          .localCheckpoint(true)
        hRaw.unpersist(blocking = false)
      }
    } finally {
      nodes.unpersist(blocking = false)
      e.unpersist(blocking = false)
    }
    auth.join(hub, "node")
      .select(col("node"), col("a").as("auth"), col("h").as("hub"))
  }
}
