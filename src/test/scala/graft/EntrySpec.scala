package graft

/** Driver-contract smoke: entry() must return rows on sf0.001, every
  * declared query must build a plan, and every oracle key must have a
  * matching query. */
class EntrySpec extends SparkSpec with SlowSuite {

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

  test("board segments: disjoint ids in their declared ranges, counts pinned") {
    import graft.entry._
    val segs = Seq[(String, Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame], Map[String, String], String => Boolean)](
      ("BoardQ", BoardQ.queries, BoardQ.oracleSql, n => n.startsWith("q")),
      ("BoardX000", BoardX000.queries, BoardX000.oracleSql,
        n => n.startsWith("x") && n.drop(1).takeWhile(_.isDigit).toInt < 50),
      ("BoardX050", BoardX050.queries, BoardX050.oracleSql,
        n => n.startsWith("x") && { val i = n.drop(1).takeWhile(_.isDigit).toInt; i >= 50 && i < 100 }),
      ("BoardX100", BoardX100.queries, BoardX100.oracleSql,
        n => n.startsWith("x") && { val i = n.drop(1).takeWhile(_.isDigit).toInt; i >= 100 && i < 150 }),
      ("BoardX150", BoardX150.queries, BoardX150.oracleSql,
        n => n.startsWith("x") && { val i = n.drop(1).takeWhile(_.isDigit).toInt; i >= 150 && i < 208 }),
      ("BoardX200", BoardX200.queries, BoardX200.oracleSql,
        n => n.startsWith("x") && { val i = n.drop(1).takeWhile(_.isDigit).toInt; i >= 208 && i < 244 }),
      ("BoardX250", BoardX250.queries, BoardX250.oracleSql,
        n => n.startsWith("x") && { val i = n.drop(1).takeWhile(_.isDigit).toInt; i >= 244 && i < 297 }),
      ("BoardX300", BoardX300.queries, BoardX300.oracleSql,
        n => n.startsWith("x") && n.drop(1).takeWhile(_.isDigit).toInt >= 297))
    segs.foreach { case (tag, qs, os, inRange) =>
      assert(qs.keys.forall(inRange), s"$tag holds out-of-range query ids: ${qs.keys.filterNot(inRange)}")
      assert(os.keySet.subsetOf(qs.keySet), s"$tag oracle keys without a query: ${os.keySet -- qs.keySet}")
    }
    // segment concatenation must lose nothing: the driver board is the
    // exact disjoint union (a duplicate id would silently shadow one)
    assert(SparkEntry.queries.size === segs.map(_._2.size).sum)
    assert(SparkEntry.oracleSql.size === segs.map(_._3.size).sum)
    // the round-16 board: 353 queries, 340 oracle-compared (13 declared
    // rule-6 rows-only: the r12 eleven + x230 + x330, all
    // KMeans/sketch paths a cross-engine oracle cannot replay) —
    // growing the board updates these pins
    assert(SparkEntry.queries.size >= 353)
    assert(SparkEntry.queries.size - SparkEntry.oracleSql.size === 13,
      "rule-6 no-oracle set changed size — update the declared list")
  }
}
