package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.core.Tables

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("banded range join equals the theta join, with an equi-join plan") {
    val part = Tables.part(spark, sf)
    val supplier = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_suppkey").as("lo"),
        (col("s_suppkey") + 20).as("hi"))
    val theta = part.join(supplier,
      col("p_size") >= col("lo") && col("p_size") <= col("hi"))
    val banded = RangeJoin.banded(part, supplier, "p_size", "lo", "hi", binWidth = 16)

    assert(banded.count() === theta.count())
    val pairsA = theta.select("p_partkey", "s_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairsB = banded.select("p_partkey", "s_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsA === pairsB)

    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"banded join must plan as an equi join:\n$plan")
  }

  test("no duplicate pairs: each match meets in exactly one bin") {
    val left = Seq((1L, 5L), (2L, 10L), (3L, 31L)).toDF("id", "v")
    val right = Seq((100L, 0L, 32L), (200L, 10L, 10L)).toDF("rid", "lo", "hi")
    val out = RangeJoin.banded(left, right, "v", "lo", "hi", binWidth = 4)
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === out.distinct.length)
    assert(out.toSet === Set((1L, 100L), (2L, 100L), (3L, 100L), (2L, 200L)))
  }

  test("property: banded equals theta for random intervals at every bin width") {
    val rnd = new scala.util.Random(4242)
    val points = (1L to 400L).map(i => (i, rnd.between(-50L, 150L))).toDF("id", "v")
    val intervals = (1L to 60L).map { i =>
      val lo = rnd.between(-60L, 140L)
      (i, lo, lo + rnd.between(0L, 40L))
    }.toDF("rid", "lo", "hi")
    val expected = points.join(intervals,
      col("v") >= col("lo") && col("v") <= col("hi"))
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1, 3, 7, 16, 64, 1000)) {
      val got = RangeJoin.banded(points, intervals, "v", "lo", "hi", binWidth = w)
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.distinct.length, s"dup pairs at binWidth=$w")
      assert(got.toSet === expected, s"mismatch at binWidth=$w")
    }
  }

  test("negative values bin correctly (floor toward -inf)") {
    val left = Seq((1L, -7L), (2L, -1L)).toDF("id", "v")
    val right = Seq((9L, -8L, -2L)).toDF("rid", "lo", "hi")
    val out = RangeJoin.banded(left, right, "v", "lo", "hi", binWidth = 4)
      .select("id").as[Long].collect().toSet
    assert(out === Set(1L))
  }

  test("intervalOverlap: exact intersection bounds; shared-bin non-overlaps " +
    "are verified away; multi-bin pairs dedupe") {
    val a = Seq(
      (1L, 0L, 25L),    // spans bins 0..2 at width 10
      (2L, 40L, 45L),
      (3L, 8L, 9L)
    ).toDF("a_id", "a_lo", "a_hi")
    val b = Seq(
      (10L, 5L, 22L),   // overlaps a1 on [5,22] and a3 on [8,9]
      (20L, 27L, 29L),  // shares bin 2 with a1 but does NOT overlap
      (30L, 44L, 60L)   // overlaps a2 on [44,45]
    ).toDF("b_id", "b_lo", "b_hi")
    val out = RangeJoin.intervalOverlap(a, b, binWidth = 10L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // a1×b10 share bins 0, 1, 2 — exactly ONE output row (dedup)
    assert(out === Seq(
      (1L, 10L, 5L, 22L, 17L),
      (2L, 30L, 44L, 45L, 1L),
      (3L, 10L, 8L, 9L, 1L)))
  }

  test("intervalOverlap: touching endpoints overlap (closed intervals); " +
    "inverted intervals drop") {
    val a = Seq((1L, 0L, 10L), (2L, 50L, 40L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 10L, 20L)).toDF("b_id", "b_lo", "b_hi")
    val out = RangeJoin.intervalOverlap(a, b, binWidth = 100L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 10L, 10L, 10L, 0L)))
  }
}
