package graft

import org.apache.spark.sql.functions._

/** RedundantLeftJoinElimination: fires only on the provably-sound
  * shape (LEFT OUTER × aggregate-unique right × no right references)
  * and never anywhere else. */
class JoinEliminationSpec extends SparkSpec {
  import spark.implicits._

  // stable instances: column refs like left("fk") must come from the
  // SAME plan object that is joined
  private lazy val left = Seq((1L, 10L), (2L, 20L), (3L, 99L))
    .toDF("id", "fk") // fk 99 has no match — LEFT OUTER must keep it
  private lazy val lookup = Seq((10L, 5L), (10L, 6L), (20L, 7L))
    .toDF("k", "v")
  private lazy val agg = lookup.groupBy("k").agg(sum("v").as("sv"))

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("fires: unused left join to a groupBy-unique side disappears") {
    val joined = left.join(agg, left("fk") === agg("k"), "left_outer")
      .select(left("id"), left("fk"))
    assert(!optimized(joined).contains("Join"),
      s"the redundant join must be eliminated:\n${optimized(joined)}")
    // results are the left side, all rows, unmatched fk included
    assert(joined.orderBy("id").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 99L)))
  }

  test("does not fire: inner join (unmatched rows would vanish)") {
    val joined = left.join(agg, left("fk") === agg("k"))
      .select(left("id"), left("fk"))
    assert(optimized(joined).contains("Join"))
    assert(joined.count() === 2L) // fk 99 correctly dropped by the join
  }

  test("does not fire: a right column is referenced") {
    val joined = left.join(agg, left("fk") === agg("k"), "left_outer")
      .select(left("id"), agg("sv"))
    assert(optimized(joined).contains("Join"))
  }

  test("does not fire: right side is a raw table (uniqueness unprovable)") {
    val joined = left.join(lookup, left("fk") === lookup("k"), "left_outer")
      .select(left("id"), left("fk"))
    assert(optimized(joined).contains("Join"))
    // and rightly so — duplicate k=10 rows multiply id=1
    assert(joined.count() === 4L)
  }

  test("multi-key grouping: fires only when every key is equated") {
    val multi = lookup.withColumn("k2", col("k") + 1)
      .groupBy("k", "k2").agg(sum("v").as("sv"))
    val partial = left.join(multi, left("fk") === multi("k"), "left_outer")
      .select(left("id"))
    assert(optimized(partial).contains("Join"),
      "one equated key of two cannot prove uniqueness")
    val full = left.join(multi,
        left("fk") === multi("k") && left("fk") + 1 === multi("k2"),
        "left_outer")
      .select(left("id"))
    assert(!optimized(full).contains("Join"),
      s"both keys equated → unique → eliminate:\n${optimized(full)}")
  }

  // ---- InnerUniqueJoinToSemi (3rd rule) ----

  test("semi rewrite fires: inner join to a unique side, left-only select") {
    val joined = left.join(agg, left("fk") === agg("k"))
      .select(left("id"), left("fk"))
    val plan = optimized(joined)
    assert(plan.contains("LeftSemi"),
      s"inner × unique right × left-only must plan LeftSemi:\n$plan")
    assert(!plan.contains(" Inner"), s"no Inner join may remain:\n$plan")
    // the filter semantics are unchanged: fk 99 drops, nothing multiplies
    assert(joined.orderBy("id").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 20L)))
  }

  test("semi rewrite does not fire: right side not provably unique") {
    val joined = left.join(lookup, left("fk") === lookup("k"))
      .select(left("id"), left("fk"))
    val plan = optimized(joined)
    assert(!plan.contains("LeftSemi"), plan)
    // the inner join legitimately multiplies on duplicate k = 10
    assert(joined.count() === 3L)
  }

  test("semi rewrite does not fire: a right column is referenced") {
    val joined = left.join(agg, left("fk") === agg("k"))
      .select(left("id"), agg("sv"))
    assert(!optimized(joined).contains("LeftSemi"), optimized(joined))
  }
}
