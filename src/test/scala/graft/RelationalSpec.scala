package graft

import graft.queries.Relational

/** Spot-checks of the relational surface at sf0.001 — full
  * cross-engine verification runs through Verify + the DuckDB oracle;
  * these pin a few absolute values so regressions fail fast in
  * `sbt test`. */
class RelationalSpec extends SparkSpec {

  test("q01: lineitem count") {
    assert(Relational.q01Count(spark, sf).head().getLong(0) === 6000L)
  }

  test("q02: deterministic first rows") {
    val rows = Relational.q02ProjectCents(spark, sf).collect()
    assert(rows.length === 100)
    assert(rows.map(_.getLong(0)).toSeq === rows.map(_.getLong(0)).toSeq.sorted)
  }

  test("q06: 25 (region, nation) groups, customers sum to table size") {
    val rows = Relational.q06MultiJoin(spark, sf).collect()
    assert(rows.length === 25)
    assert(rows.map(_.getLong(2)).sum === 150L)
  }

  test("q07 left-anti count equals customers minus distinct order custkeys") {
    val n = Relational.q07LeftAnti(spark, sf).head().getLong(0)
    val custs = spark.read.parquet(s"$sf/customer.parquet").count()
    val active = Relational.q10CountDistinct(spark, sf).head().getLong(0)
    assert(n === custs - active)
  }

  test("q11 rollup: grand total row present with full count") {
    val rows = Relational.q11Rollup(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(grand.head.getLong(2) === 1500L)
  }

  test("q12: one row per customer with orders, capped at 100") {
    val rows = Relational.q12WindowRank(spark, sf).collect()
    assert(rows.length === 100)
    assert(rows.map(_.getLong(0)).distinct.length === 100)
  }

  test("q14 top-k is sorted descending") {
    val totals = Relational.q14TopkSort(spark, sf).collect().map(_.getLong(1)).toSeq
    assert(totals === totals.sorted.reverse)
    assert(totals.length === 10)
  }

  test("q18: one surviving event per user") {
    val rows = Relational.q18LastWinsDedup(spark, sf).collect()
    val users = spark.read.parquet(s"$sf/events.parquet").select("user_id").distinct().count()
    assert(rows.length.toLong === users)
  }
}
