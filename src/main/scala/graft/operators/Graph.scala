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

  /** Canonical low→high edge list from a (da, db) pair table:
    * least/greatest orientation + distinct, so self-pairs are
    * impossible by construction upstream and duplicate orientations
    * collapse. Shared by [[triangleCounts]] and [[graphSummary]]. */
  private def canonicalEdges(pairs: DataFrame): DataFrame =
    pairs.select(least(col("da"), col("db")).as("a"),
        greatest(col("da"), col("db")).as("b"))
      .distinct()

  /** Per-node TRIANGLE counts over the undirected pair graph — the
    * local-density signal: a near-dup pair inside a triangle is
    * corroborated by a third mutual copy (template/mirror structure),
    * while a triangle-free pair is more often an LSH accident worth
    * re-verifying. The standard curation read of the dup graph after
    * [[Dedup.connectedComponents]] says WHICH cluster and
    * [[pageRank]] says WHO is central.
    *
    * Enumeration is the classic ORIENTED wedge join — no cross join,
    * nothing quadratic in nodes: edges orient low→high, wedges come
    * from joining the edge list with itself on the shared MIDDLE
    * vertex (a < b < c by construction, so each triangle is generated
    * exactly once), and a third equi-join closes the wedge. Join mass
    * is Σ_b d⁻(b)·d⁺(b), the orientation bound that keeps high-degree
    * hubs from squaring (degree-ordered orientation — rank nodes by
    * degree instead of id — tightens it to O(m^{3/2}) worst-case;
    * same plan shape, swap the orientation key).
    *
    * @return (doc_id, n_triangles) for nodes in ≥ 1 triangle, ordered. */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val e = canonicalEdges(pairs)
    val tri = triangles(e)
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
      .orderBy("doc_id")
  }

  /** (a, b, c) triangle rows, a < b < c, each triangle once. */
  private def triangles(e: DataFrame): DataFrame = {
    val ab = e
    val bc = e.select(col("a").as("b"), col("b").as("c"))
    val ac = e.select(col("a").as("ca"), col("b").as("cc"))
    ab.join(bc, Seq("b"))
      .join(ac, col("a") === col("ca") && col("c") === col("cc"))
      .select("a", "b", "c")
  }

  /** One-row structural summary of the pair graph: node/edge/wedge/
    * triangle counts and the global clustering coefficient in milli
    * (3·triangles·1000 div wedges — exact integer arithmetic end to
    * end). The dedup-report headline for graph SHAPE: a coefficient
    * near 1000 means near-dup neighborhoods are mutual-copy cliques
    * (high confidence, aggressive survivor selection is safe); near 0
    * means chains/stars — one hub paired with many satellites that are
    * NOT pairs of each other, where transitive cluster collapse
    * ([[Dedup.connectedComponents]] min-label) is doing real work and
    * deserves a second look at the threshold.
    *
    * Cost: the [[triangleCounts]] wedge join plus degree/count
    * aggregates, all over the PAIR graph (vanishing vs corpus); the
    * final combine is three 1×1 cross joins — the x29–x31 recall-
    * combine shape.
    *
    * @return (n_nodes, n_edges, n_wedges, n_triangles, gcc_milli),
    *         gcc_milli NULL on a wedge-free graph. */
  def graphSummary(pairs: DataFrame): DataFrame = {
    val e = canonicalEdges(pairs)
    val deg = e.select(col("a").as("doc_id"))
      .unionByName(e.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("deg"))
    val nodesEdges = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val tris = triangles(e).agg(count(lit(1)).as("n_triangles"))
    nodesEdges.crossJoin(tris)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0L, lit(null).cast("long"))
          .otherwise(expr("(3 * n_triangles * 1000) div n_wedges"))
          .as("gcc_milli"))
  }
}
