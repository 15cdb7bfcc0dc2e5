package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline

/** 2-D skyline: brute-force dominance equivalence, the staircase
  * invariant, bucket-width independence, and the bounded-window plan
  * guard for the two-level decomposition. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force NOT EXISTS dominance (minimize both axes) — the
    * quadratic definition the operator must equal. */
  private def brute(pts: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val d = pts.distinct
    d.filterNot(p => d.exists(q =>
      q._1 <= p._1 && q._2 <= p._2 && (q._1 < p._1 || q._2 < p._2)))
      .sortBy(_._1)
  }

  private def run(pts: Seq[(Long, Long)], width: Long = 10L) =
    Skyline.frontier2d(pts.toDF("x", "y"), "x", "y", width)
      .as[(Long, Long)].collect().toSeq

  test("frontier2d equals brute-force dominance on a deterministic cloud") {
    // 60 points from a fixed congruence — collisions, equal-x groups,
    // equal-y runs, a strictly dominated cluster all occur
    val pts = (0 until 60).map(i => (((i * 37) % 50).toLong, ((i * 53) % 40).toLong))
    assert(run(pts) === brute(pts))
    // and the result is the strictly-decreasing staircase
    val ys = run(pts).map(_._2)
    assert(ys === ys.distinct.sorted.reverse, s"staircase violated: $ys")
  }

  test("frontier2d: dominance edge cases (ties, duplicates, single point)") {
    // equal y at different x: only the smaller x survives; equal x at
    // different y: only the smaller y; exact duplicates collapse
    assert(run(Seq((1L, 5L), (3L, 5L))) === Seq((1L, 5L)))
    assert(run(Seq((2L, 7L), (2L, 4L))) === Seq((2L, 4L)))
    assert(run(Seq((2L, 2L), (2L, 2L))) === Seq((2L, 2L)))
    assert(run(Seq((9L, 9L))) === Seq((9L, 9L)))
    // anti-chain: nothing dominates anything — all survive
    assert(run(Seq((1L, 30L), (2L, 20L), (3L, 10L)))
      === Seq((1L, 30L), (2L, 20L), (3L, 10L)))
  }

  test("frontier2d is bucket-width invariant (the decomposition is internal)") {
    val pts = (0 until 40).map(i => (((i * 13) % 30).toLong, ((i * 7) % 25).toLong))
    val expected = brute(pts)
    for (w <- Seq(1L, 3L, 7L, 1000L))
      assert(run(pts, w) === expected, s"width $w diverged")
  }

  test("frontier2d plan: the only global window reads the bucket summary aggregate") {
    val df = Skyline.frontier2d(
      (0 until 20).map(i => (i.toLong, (20 - i).toLong)).toDF("x", "y"),
      "x", "y", 5L)
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    val (unpart, part) = wins.partition(_.partitionSpec.isEmpty)
    assert(part.nonEmpty, "the in-bucket prefix min must be a PARTITIONED window")
    assert(unpart.nonEmpty, "expected the bucket-summary global window")
    unpart.foreach { w =>
      assert(w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.nonEmpty, "the global window must read the bucket-summary aggregate")
    }
  }
}
