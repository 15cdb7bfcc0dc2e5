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

  test("negative values bin correctly (floor toward -inf)") {
    val left = Seq((1L, -7L), (2L, -1L)).toDF("id", "v")
    val right = Seq((9L, -8L, -2L)).toDF("rid", "lo", "hi")
    val out = RangeJoin.banded(left, right, "v", "lo", "hi", binWidth = 4)
      .select("id").as[Long].collect().toSet
    assert(out === Set(1L))
  }
}
