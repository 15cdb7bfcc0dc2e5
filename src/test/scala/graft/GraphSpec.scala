package graft

import graft.operators.{Dedup, Graph}

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(es: (Long, Long)*) = es.toDF("da", "db")

  /** Local replay of the exact iteration the operator runs. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = deg.size
    var r = deg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters)
      r = deg.keys.map { v =>
        val m = sym.filter(_._2 == v).map { case (s, _) => r(s) / deg(s) }.sum
        v -> ((1.0 - 0.85) / n + 0.85 * m)
      }.toMap
    r.map { case (k, v) => k -> math.floor(v * 1000000 + 0.5).toLong }
  }

  test("pageRank: path-graph center ranks highest; matches local replay") {
    val out = Graph.pageRank(pairs((1L, 2L), (2L, 3L)), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.releaseCaches()
    val ref = reference(Seq((1L, 2L), (2L, 3L)), 10)
    assert(out === ref)
    assert(out(2L) > out(1L) && out(1L) === out(3L))
  }

  test("pageRank: star hub dominates; ranks sum to ~1e6 (no dangling loss)") {
    val star = pairs((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val out = Graph.pageRank(star, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.releaseCaches()
    assert(out(1L) > out(2L))
    assert(out(2L) === out(5L))
    val total = out.values.sum
    assert(math.abs(total - 1000000L) <= out.size,
      s"rank mass should be conserved, got $total")
  }

  test("pageRank is partition-invariant") {
    val p = pairs((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (4L, 5L))
    val a = Graph.pageRank(p, iterations = 10).collect().toSeq
    val b = Graph.pageRank(p.repartition(7), iterations = 10).collect().toSeq
    Dedup.releaseCaches()
    assert(a === b)
  }

  test("pageRank rejects empty graphs and bad parameters") {
    intercept[IllegalArgumentException](
      Graph.pageRank(pairs((1L, 2L)), iterations = 0))
    intercept[IllegalArgumentException](
      Graph.pageRank(pairs((1L, 2L)), damping = 1.0))
    intercept[IllegalArgumentException](
      Graph.pageRank(pairs()))
  }

  test("triangleCounts: one triangle plus a pendant edge") {
    // K3 on {1,2,3} + edge 3-4: nodes 1,2,3 in one triangle, 4 in none
    val out = Graph.triangleCounts(
      pairs((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: K4 has 3 triangles per node; orientation dedupes") {
    // every K4 node sits in C(3,2) = 3 triangles; pairs given in mixed
    // orientation with a duplicate must not inflate counts
    val out = Graph.triangleCounts(
      pairs((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 2L), (3L, 4L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("graphSummary: K3 + pendant — exact counts and coefficient") {
    // deg = (2,2,3,1): wedges = 1+1+3+0 = 5, triangles = 1, gcc = 600
    val row = Graph.graphSummary(
      pairs((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      === ((4L, 4L, 5L, 1L, 600L)))
  }

  test("graphSummary: wedge-free graph yields NULL coefficient") {
    val row = Graph.graphSummary(pairs((1L, 2L), (3L, 4L))).collect()(0)
    assert((row.getLong(2), row.getLong(3)) === ((0L, 0L)))
    assert(row.isNullAt(4))
  }
}
