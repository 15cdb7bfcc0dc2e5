package graft

/** Driver-contract smoke: entry() must return rows on sf0.001, every
  * declared query must build a plan, and every oracle key must have a
  * matching query. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on the smoke corpus") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
    assert(qs.forall(_.matches("[qx][0-9]{2,3}_[a-z0-9_]+")))
  }

  test("every declared query builds an executable plan at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.queryExecution.executedPlan != null, name)
    }
  }
}
