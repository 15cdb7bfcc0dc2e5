package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over an undirected pair graph — the
  * stage after near-dup pair mining where per-node structure matters,
  * not just component membership ([[Dedup.connectedComponents]]):
  * PageRank centrality ranks the "hub" documents of a duplication
  * neighborhood (template sources, boilerplate origins), which is how
  * a curation pipeline picks what to KEEP when a cluster is mostly
  * mutual near-copies of one canonical page.
  */
object Graph {

  /** PageRank over the undirected graph given as (da, db) pairs, run
    * for a FIXED number of power iterations (deterministic — no
    * convergence-threshold float compare to diverge across engines):
    * `r' = (1−d)/N + d·Σ_nbr r_nbr/deg_nbr`. Symmetrized edges mean
    * no dangling nodes (every node has out-degree ≥ 1), so no
    * dangling-mass redistribution term is needed.
    *
    * Scale shape: the symmetrized edge set is built with ONE explode
    * pass (a union spelling would evaluate the — potentially whole-
    * LSH-pipeline — pairs plan once per branch), partitioned by `src`
    * and cached; degree, N, the initial ranks, and the degree-attached
    * edge cache all derive from that cache with NO further exchange
    * (the groupBy and the edge⋈degree join both ride the src hash
    * layout), so the upstream pairs plan executes exactly once. Every
    * iteration then shuffles only the rank table (|V| rows) into that
    * layout, aggregates partially map-side, and chains declaratively.
    * Iterations are bounded (≤ 50), so the lineage stays shallow
    * enough to plan; an unbounded fixpoint would use the per-round
    * `localCheckpoint` cycle of [[Dedup.connectedComponents]] instead.
    * Both caches register in the operator cache registry and are freed
    * by [[Dedup.releaseCaches]] after results materialize.
    *
    * @return (doc_id, pr_micros) — rank in integer micros, ordered. */
  def pageRank(pairs: DataFrame, iterations: Int = 10,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations ($iterations) must be in [1, 50] — beyond that use a " +
        "checkpointed fixpoint (see Dedup.connectedComponents)")
    require(damping > 0 && damping < 1, s"damping ($damping) must be in (0, 1)")
    val sym = Dedup.registerCache(Dedup.symmetrizedEdges(pairs))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    val edges = Dedup.registerCache(sym.join(deg, Seq("src")))
    val n = deg.count() // materializes sym — the pairs plan's only run
    require(n > 0, "pageRank needs a non-empty pair graph")
    val tele = lit(1.0 - damping) / lit(n)
    var ranks = deg.select(col("src").as("node"), (lit(1.0) / lit(n)).as("r"))
    for (_ <- 1 to iterations) {
      ranks = edges
        .join(ranks.select(col("node").as("src"), col("r")), Seq("src"))
        .groupBy("dst")
        .agg(sum(col("r") / col("deg")).as("m"))
        .select(col("dst").as("node"), (tele + lit(damping) * col("m")).as("r"))
    }
    ranks
      .select(col("node").as("doc_id"),
        floor(col("r") * 1000000 + 0.5).cast("long").as("pr_micros"))
      .orderBy("doc_id")
  }
}
