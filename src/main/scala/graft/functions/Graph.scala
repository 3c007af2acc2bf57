package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph kernels over edge DataFrames (extension — no
  * reference analogue; the companion to [[Components]] for weighted
  * link analysis over behavioural / citation / dedup graphs).
  */
object Graph {

  /** Weighted PageRank, fixed iteration count (Page et al. 1999).
    *
    *   rank'(v) = (1-d)/N + d * Σ_{(u,v) ∈ E} rank(u) * w(u,v) / outW(u)
    *
    * Each iteration is one shuffle join of the edge table against the
    * one-row-per-node rank table plus one hash-agg on dst — the classic
    * distributed formulation: the O(|E|) edge table is re-partitioned
    * on src ONCE (Catalyst reuses the exchange across iterations since
    * the edge lineage is identical), and only the O(|V|) rank table
    * moves per round. Mass entering a dangling node (no out-edges) is
    * dropped, not redistributed — the common simplification; callers
    * needing strict stochasticity add self-loops first.
    *
    * Determinism note for cross-engine gates: the per-edge transition
    * probability is ONE double division of exact integer-valued
    * operands, but the incoming-contribution Σ is a float aggregate
    * whose accumulation order is partition-dependent — gate outputs
    * should round. Returns (node, rank).
    */
  def pageRank(
      edges: DataFrame,
      src: String,
      dst: String,
      weight: String,
      iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val nodes = edges.select(col(src).as("node"))
      .union(edges.select(col(dst).as("node")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one driver-size scalar (|V|), not a data collect
    val n = nodes.count().toDouble
    val outW = edges.groupBy(col(src)).agg(sum(col(weight)).as("_out_w"))
    val e = edges.join(outW, Seq(src))
      .select(col(src).as("_src"), col(dst).as("_dst"),
        (col(weight).cast("double") / col("_out_w").cast("double")).as("_p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    try {
      for (i <- 1 to iterations) {
        val contrib = e.join(ranks, e("_src") === ranks("node"))
          .groupBy(col("_dst"))
          .agg(sum(col("_p") * col("rank")).as("_in"))
        ranks = nodes.join(contrib, nodes("node") === contrib("_dst"), "left")
          .select(nodes("node"),
            (lit((1 - damping) / n) + lit(damping) * coalesce(col("_in"), lit(0.0)))
              .as("rank"))
        // periodic lineage cut: without it the rank plan nests one
        // join-agg layer per round and analysis/planning cost grows
        // superlinearly past ~10 iterations; the checkpoint is O(|V|)
        if (i % 8 == 0 && i < iterations) ranks = ranks.localCheckpoint(true)
      }
      // cut the lineage (O(|V|) rows, eager) so the two iteration-scoped
      // caches can be released before returning — otherwise every call
      // leaks two persisted frames the caller has no handle to unpersist
      ranks.localCheckpoint(true)
    } finally {
      // release on BOTH exit paths — an executor failure mid-iteration
      // must not leak two persisted frames nobody holds a handle to
      e.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
  }
}
