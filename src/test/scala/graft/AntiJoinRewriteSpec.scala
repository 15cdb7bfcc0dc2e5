package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.plans.AntiJoinRewrite

class AntiJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ AntiJoinRewrite
    try body
    finally spark.experimental.extraOptimizations = prev
  }

  // the sound shape filters on the right JOIN KEY — null key ⟺
  // unmatched, independent of data nullability
  private def keyShape = Tables.customer(spark, sf)
    .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"), "left")
    .filter(col("o_custkey").isNull)

  test("rewrites left-join + IS NULL on the right key into a LeftAnti plan") {
    val plain = keyShape.count()
    withRule {
      val df = keyShape
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("LeftAnti"), s"expected anti join in:\n$plan")
      assert(df.count() === plain, "rewrite must not change the result")
    }
  }

  test("projected right columns survive as nulls with original names") {
    // suppliers cover only a few nations, so unmatched rows exist
    withRule {
      val df = Tables.nation(spark, sf)
        .join(Tables.supplier(spark, sf), col("n_nationkey") === col("s_nationkey"), "left")
        .filter(col("s_nationkey").isNull)
      assert(df.queryExecution.optimizedPlan.toString.contains("LeftAnti"))
      val rows = df.select("n_name", "s_suppkey", "s_name").collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => r.isNullAt(1) && r.isNullAt(2)))
    }
  }

  test("does NOT fire on a NULLABLE non-key right column (unsound without non-null proof)") {
    // o_orderkey is not a join key and parquet reports it nullable: a
    // matched row could legitimately carry a null there (the engine
    // cannot see PK constraints), so IS NULL on it must keep the
    // outer-join semantics — no rewrite.
    withRule {
      val df = Tables.customer(spark, sf)
        .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"), "left")
        .filter(col("o_orderkey").isNull)
      assert(!df.queryExecution.optimizedPlan.toString.contains("LeftAnti"))
    }
  }

  test("fires on a NON-NULLABLE non-key right column (post-join null ⟺ unmatched)") {
    // primitive-typed Datasets have non-nullable columns: rv cannot be
    // null in a matched row, so IS NULL proves the row unmatched even
    // though rv is not a join key
    withRule {
      val l = Seq((1L, "a"), (2L, "b")).toDF("k", "lv")
      val r = Seq((1L, 10L)).toDF("rk", "rv")
      val df = l.join(r, col("k") === col("rk"), "left").filter(col("rv").isNull)
      assert(df.queryExecution.optimizedPlan.toString.contains("LeftAnti"),
        df.queryExecution.optimizedPlan.toString)
      assert(df.select("lv").as[String].collect().toSeq === Seq("b"))
    }
  }

  test("q07's declared-PK shape plans as LeftAnti and keeps its count") {
    val plain = graft.queries.Relational.q07LeftAnti(spark, sf).head().getLong(0)
    withRule {
      val df = graft.queries.Relational.q07LeftAnti(spark, sf)
      // coalesce(o_orderkey, -1) declares the PK non-null → arm 2 fires
      assert(df.queryExecution.optimizedPlan.toString.contains("LeftAnti"),
        df.queryExecution.optimizedPlan.toString)
      assert(df.head().getLong(0) === plain)
    }
  }

  test("does not fire on inner joins or other filters") {
    withRule {
      val inner = Tables.customer(spark, sf)
        .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderkey").isNotNull)
      assert(!inner.queryExecution.optimizedPlan.toString.contains("LeftAnti"))
    }
  }

  test("compound join conditions still rewrite (right key + extra predicate)") {
    withRule {
      val l = Seq((1L, "a"), (2L, "b")).toDF("k", "lv")
      val r = Seq((1L, 10L)).toDF("k", "rv")
      val df = l.join(r.withColumnRenamed("k", "rk"),
        col("k") === col("rk") && col("rv") > 0, "left")
        .filter(col("rk").isNull)
      assert(df.queryExecution.optimizedPlan.toString.contains("LeftAnti"))
      assert(df.select("lv").as[String].collect().toSeq === Seq("b"))
    }
  }

  test("fires through the real GraftExtensions session (injectOptimizerRule wiring)") {
    // TestSession configures spark.sql.extensions=GraftExtensions
    // (extensions are a STATIC conf, applied when the SparkContext is
    // built), so the shared session's optimizer holds the rule via
    // injectOptimizerRule — NO withRule/extraOptimizations here.
    val df = keyShape
    assert(df.queryExecution.optimizedPlan.toString.contains("LeftAnti"),
      df.queryExecution.optimizedPlan.toString)
  }
}
