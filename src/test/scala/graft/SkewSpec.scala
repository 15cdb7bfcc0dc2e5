package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.queries.Relational

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one key — the aggregation hot-key scenario
  private def skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) s"k${i % 50}" else "HOT", i.toLong)
  }.toDF("k", "v")

  test("salted aggregation equals plain aggregation on skewed data") {
    val plain = skewed.groupBy("k").agg(sum("v").as("v_sum"))
      .orderBy("k").collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val salted = Skew.saltedAgg(skewed, Seq("k"), Map("v" -> "sum"))
      .orderBy("k").collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(salted === plain)
  }

  test("salted agg shuffles on (key, salt) first — hot key split across buckets") {
    val df = Skew.saltedAgg(skewed, Seq("k"), Map("v" -> "count"), buckets = 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "first-phase shuffle key must include the salt")
    assert(df.filter(col("k") === "HOT").head().getLong(1) === 9000L)
  }

  test("salted join equals plain join on skewed data") {
    val dim = (0 to 50).map(i => (s"k$i", s"name$i")).toDF("k", "name")
      .union(Seq(("HOT", "hotname")).toDF("k", "name"))
    val plain = skewed.join(dim, Seq("k")).agg(count(lit(1)), sum(length(col("name"))))
      .head()
    val salted = Skew.saltedJoin(skewed, dim, "k").agg(count(lit(1)), sum(length(col("name"))))
      .head()
    assert(salted.getLong(0) === plain.getLong(0))
    assert(salted.getLong(1) === plain.getLong(1))
  }

  test("approx_count_distinct lands within the 2% error bound (x20)") {
    val approx = Relational.approxDistinct(spark, sf).head().getLong(0)
    val exact = Relational.q10CountDistinct(spark, sf).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("saltPlan: only over-budget keys, ceiling-division fan-out") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(2)("b")).map(Tuple1(_))
      .toDF("k")
    val out = Skew.saltPlan(df, "k", targetPerSalt = 2L)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 5L, 3L)))
    intercept[IllegalArgumentException] {
      Skew.saltPlan(df, "k", targetPerSalt = 0L)
    }
  }
}
