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
  test("majority vote: deterministic tie-break, agreement permille") {
    import spark.implicits._
    val votes = Seq((1L, "b"), (1L, "a"), (1L, "b"), (1L, "a"),
      (2L, "z"), (2L, "z"), (2L, "y")).toDF("k", "v")
    val out = Relational.majorityVote(votes, "k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // k=1 ties 2-2: 'a' wins by vote-value ascending; k=2: 2 of 3
    assert(out.toSeq === Seq((1L, "a", 2L, 500L), (2L, "z", 2L, 666L)))
  }

  test("rank calibration: ties share a score, endpoints span 0..1000, singletons pin 0") {
    import spark.implicits._
    val df = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g1", 20L),
      (4L, "g1", 30L), (5L, "g2", 7L)).toDF("doc_id", "lang", "n_chars")
    val out = Relational.rankCalibrate(df, "lang", "n_chars", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === Map(1L -> 0L, 2L -> 333L, 3L -> 333L, 4L -> 1000L, 5L -> 0L))
  }

  test("groupingSetsReport: the three declared sets, grouping_id " +
    "disambiguation, totals consistent") {
    import spark.implicits._
    val out = Relational.groupingSetsReport(spark, sf)
      .as[(Option[String], Option[String], Long, Long)].collect().toSeq
    assert(out.map(_._3).toSet === Set(0L, 1L, 3L))
    val grand = out.filter(_._3 === 3L)
    assert(grand.size === 1 && grand.head._1.isEmpty && grand.head._2.isEmpty)
    // each coarser set's total re-aggregates the finer one exactly
    val full = out.filter(_._3 === 0L).map(_._4).sum
    val byFlag = out.filter(_._3 === 1L).map(_._4).sum
    assert(full === byFlag && byFlag === grand.head._4)
  }

  test("unpivotMeasures melts each row into one row per measure") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 10L, 100L), (2L, 20L, 200L)).toDF("id", "a", "b")
    val out = Relational.unpivotMeasures(df, Seq("id"),
      Seq("a" -> col("a"), "b" -> col("b")))
      .orderBy("id", "metric")
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "a", 10L), (1L, "b", 100L),
      (2L, "a", 20L), (2L, "b", 200L)))
  }

  test("groupedTopK: rank-window order through the bounded aggregate, no Window") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 50L), (1L, 2L, 70L), (1L, 3L, 70L), (1L, 4L, 10L),
      (2L, 9L, 5L))
      .toDF("g", "item", "score")
    val out = Relational.groupedTopK(df, "g", "item", "score", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // score DESC, id ASC — the tie at 70 resolves to the smaller item
    assert(out === Seq(
      (1L, 2L, 1L, 70L), (1L, 3L, 2L, 70L), (1L, 1L, 3L, 50L),
      (2L, 9L, 1L, 5L)))
    val p = Relational.groupedTopK(df, "g", "item", "score", k = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_topk_pairs") && !p.contains("Window"),
      "per-group top-k must pre-reduce map-side, never rank-window")
  }

  test("x285 Q5 star: revenue-desc order, local-supplier semantics, dims broadcast") {
    val df = Relational.regionalRevenue(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getLong(1)).toSeq
    assert(revs === revs.sorted.reverse, "revenue must sort descending")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"nation/region dims must broadcast:\n$p")
  }

  test("x297 Q4: semi join counts an order ONCE however many lines are late") {
    import org.apache.spark.sql.functions._
    val out = Relational.latePriorityCensus(spark, sf).collect()
    assert(out.nonEmpty)
    // replay with an inner join + countDistinct: if the semi form
    // multiplied rows, these two would diverge on multi-late orders
    val o = graft.core.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val expected = o.join(graft.core.Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_orderkey")).as("n_orders"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(expected(r.getString(0)) === r.getLong(1),
      s"priority ${r.getString(0)} diverges from the count-distinct replay"))
  }

  test("x298 Q13: zero-order customers survive into bucket 0; buckets sum to the table") {
    import org.apache.spark.sql.functions._
    val rows = Relational.orderCountDistribution(spark, sf).collect()
    val byOrders = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the LEFT OUTER form exists so unmatched customers land in bucket
    // 0 rather than vanish — assert the bucket matches a direct
    // anti-join count (sf0.001 happens to have zero such customers;
    // the identity, not the presence, is the contract)
    val zeroExpected = graft.core.Tables.customer(spark, sf)
      .join(graft.core.Tables.orders(spark, sf)
          .filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(byOrders.getOrElse(0L, 0L) === zeroExpected,
      "bucket 0 must equal the anti-join count of order-less customers")
    val nCust = graft.core.Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === nCust,
      "every customer must land in exactly one bucket")
  }

  test("x299 Q18: quantities are integral (the oracle cast contract); bar and order hold") {
    import org.apache.spark.sql.functions._
    val nonIntegral = graft.core.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") =!= floor(col("l_quantity"))).count()
    assert(nonIntegral === 0L,
      "x299's BIGINT cast is only exact while l_quantity stays integral — " +
        "if the generator ever ships fractions, move the cast to cents")
    val rows = Relational.largeVolumeOrders(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val qtys = rows.map(_.getLong(3)).toSeq
    assert(qtys === qtys.sorted.reverse)
    assert(qtys.forall(_ > 200L))
  }

  test("x300 Q2: every surviving row is at its part's true minimum; ties all survive") {
    import org.apache.spark.sql.functions._
    val rows = Relational.minCostSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val trueMin = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"))
      .agg(min(Relational.cents(col("l_extendedprice"))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(4) === trueMin(r.getLong(0)),
        s"part ${r.getLong(0)}: surfaced price is not the per-part minimum")
    }
    // tie survival: every (part, supplier) pair achieving the minimum
    // must be present — compare pair counts against a direct replay
    val expectPairs = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        Relational.cents(col("l_extendedprice")).as("pc"))
      .join(graft.core.Tables.part(spark, sf).filter(col("p_size") <= 5),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .collect()
      .groupBy(r => r.getLong(0))
      .map { case (pk, rs) =>
        val m = rs.map(_.getLong(2)).min
        pk -> rs.filter(_.getLong(2) == m).map(_.getLong(1)).distinct.size
      }
    assert(rows.groupBy(_.getLong(0)).map { case (pk, rs) => pk -> rs.length }
      === expectPairs)
  }

  test("x309 Q10: returned-revenue top-20, desc order, positive revenue") {
    val rows = Relational.returnedItemReport(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getLong(3)).toSeq
    assert(revs === revs.sorted.reverse)
    assert(revs.forall(_ > 0L))
  }

  test("x310 Q12: class split partitions the late-line census exactly") {
    import org.apache.spark.sql.functions._
    val rows = Relational.latePriorityClassCensus(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("A", "N", "R"))
    val totalLate = graft.core.Tables.orders(spark, sf)
      .join(graft.core.Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === totalLate,
      "high + low must partition the late lines — nothing double-counted or lost")
  }

  test("x311 Q14: share is the exact integer micro-ratio of the two sums") {
    val r = Relational.promoRevenueShare(spark, sf).head()
    val (promo, total, share) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(promo >= 0L && promo <= total)
    assert(share === (BigInt(promo) * 1000000 / BigInt(total)).toLong)
  }

  test("x313 Q21: window decorrelation ≡ an independent groupBy+join replay") {
    import org.apache.spark.sql.functions._
    val got = Relational.soleLateSuppliers(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got.map(_._2) === got.map(_._2).sorted.reverse)
    val lines = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("__late", col("l_shipdate") > col("o_orderdate")
        + expr("INTERVAL 60 DAYS"))
    val perOrder = lines.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("ns"),
        countDistinct(when(col("__late"), col("l_suppkey"))).as("nls"))
    val expect = lines.filter(col("__late"))
      .join(perOrder.filter(col("ns") >= 2 && col("nls") === 1),
        col("l_orderkey") === col("ok"))
      .join(graft.core.Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s_name")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expect,
      "the window form and the groupBy+join form must agree line for line")
  }

  test("x314 Q20: the window fair-share filter ≡ a second-aggregation replay") {
    import org.apache.spark.sql.functions._
    val got = Relational.dominantSuppliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val ps = graft.core.Tables.lineitem(spark, sf)
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("sq"))
    val pt = ps.groupBy(col("l_partkey").as("pk"))
      .agg(sum("sq").as("tq"), count(lit(1)).as("ns"))
    val expect = ps.join(pt, col("l_partkey") === col("pk"))
      .filter(col("sq") * col("ns") > col("tq") * 2)
      .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expect)
  }

  test("x315 Q22: the broadcast bar equals a driver-side exact average cut") {
    import org.apache.spark.sql.functions._
    val rows = Relational.dormantRichCustomers(spark, sf).collect()
    val cust = graft.core.Tables.customer(spark, sf)
      .filter(col("c_acctbal").isNotNull)
      .select(col("c_custkey"), col("c_mktsegment"),
        Relational.cents(col("c_acctbal")).as("b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (n, tot) = (cust.length.toLong, cust.map(_._3).sum)
    val active = graft.core.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val expect = cust.filter(c => c._3 * n > tot && !active(c._1))
      .groupBy(_._2).map { case (seg, cs) =>
        (seg, cs.length.toLong, cs.map(_._3).sum) }.toSeq.sortBy(_._1)
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === expect)
  }

  test("x301 Q11: every brand clears the exact total/30 bar; bar is binding") {
    val rows = Relational.revenueConcentration(spark, sf).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val all = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(Relational.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("rev"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bar = all.values.sum / 30L
    assert(rows.forall(r => r.getLong(1) > bar))
    assert(rows.length === all.count(_._2 > bar),
      "the filter must keep exactly the brands above the bar — no more, no fewer")
  }

  test("x319 Q17: the window threshold ≡ an aggregate-join replay of 0.2·avg") {
    import org.apache.spark.sql.functions._
    val got = Relational.smallQuantityRevenue(spark, sf).head()
    val li = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.part(spark, sf)
          .filter(col("p_brand") === "Brand#12").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("long")).as("tot"))
    val expect = li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity").cast("long") * 5 * col("cnt") < col("tot"))
      .agg(sum(Relational.cents(col("l_extendedprice"))).as("rev"),
        count(lit(1)).as("n"))
      .head()
    assert(got.getLong(0) === expect.getLong(0))
    assert(got.getLong(1) === expect.getLong(1))
    assert(got.getLong(1) > 0L, "the bar must be binding at sf0.001")
  }

  test("x320 Q15: winners hit the driver-computed max exactly; ties all survive") {
    import org.apache.spark.sql.functions._
    val rows = Relational.topRevenueSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val rev = graft.core.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(Relational.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mx = rev.values.max
    assert(rows.forall(_.getLong(2) === mx))
    assert(rows.length === rev.count(_._2 == mx),
      "every supplier at the max must surface — MAX-of-aggregate keeps ties")
  }

  test("x321 Q7: only the two cross directions appear; totals ≡ a residual-filter replay") {
    import org.apache.spark.sql.functions._
    val rows = Relational.volumeShipping(spark, sf).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("AMERICA", "ASIA"), ("ASIA", "AMERICA"))))
    // independent replay: full dimension joins, the OR predicate as a
    // plain post-join filter (the naive plan the pushed form must match)
    val nr = graft.core.Tables.nation(spark, sf)
      .join(graft.core.Tables.region(spark, sf),
        col("n_regionkey") === col("r_regionkey"))
    val sreg = nr.select(col("n_nationkey").as("snk"), col("r_name").as("sr"))
    val creg = nr.select(col("n_nationkey").as("cnk"), col("r_name").as("cr"))
    val expect = graft.core.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(graft.core.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(graft.core.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.core.Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(sreg, col("s_nationkey") === col("snk"))
      .join(creg, col("c_nationkey") === col("cnk"))
      .filter((col("sr") === "AMERICA" && col("cr") === "ASIA")
        || (col("sr") === "ASIA" && col("cr") === "AMERICA"))
      .groupBy(col("sr"), col("cr"), year(col("l_shipdate")).cast("long").as("y"))
      .agg(sum(Relational.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("rev"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
      .toMap === expect)
  }

  test("x322 Q8: share_micro is the exact cross-multiply; numerator bounded by total") {
    val rows = Relational.marketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot, share) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nat >= 0L && nat <= tot)
      assert(share === (BigInt(nat) * 1000000 / BigInt(tot)).toLong)
    }
  }

  test("x323 Q16: no blacklisted supplier is counted; counts ≡ a distinct-pair replay") {
    import org.apache.spark.sql.functions._
    val rows = Relational.supplierPartVariety(spark, sf).collect()
    assert(rows.nonEmpty)
    val counts = rows.map(_.getLong(3))
    assert(counts === counts.sorted.reverse.toSeq, "count-desc order")
    val black = graft.core.Tables.supplier(spark, sf)
      .filter(col("s_acctbal") < 0).collect().map(_.getLong(0)).toSet
    val pairs = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.part(spark, sf)
          .filter(col("p_brand") =!= "Brand#1" && col("p_size") <= 25),
        col("l_partkey") === col("p_partkey"))
      .select("p_brand", "p_type", "p_size", "l_suppkey").distinct()
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)), r.getLong(3)))
      .filterNot(p => black(p._2))
    val expect = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => ((r.getString(0), r.getString(1), r.getInt(2)),
      r.getLong(3))).toMap === expect)
  }

  test("x325 Q9: profit ≡ a driver-side exact replay; negative profit is semantics, not error") {
    import org.apache.spark.sql.functions._
    val rows = Relational.productProfit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    val lines = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.part(spark, sf).filter(col("p_name").like("%red%")),
        col("l_partkey") === col("p_partkey"))
      .join(graft.core.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(graft.core.Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(graft.core.Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).cast("long").as("y"),
        Relational.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev"),
        (Relational.cents(col("p_retailprice"))
          * col("l_quantity").cast("long")).as("cost"))
      .collect()
    val expect = lines.groupBy(r => (r.getString(0), r.getLong(1)))
      .view.mapValues(_.map(r => r.getLong(2) - r.getLong(3)).sum).toMap
    assert(rows === expect)
  }

  test("x326 Q6: all three range predicates reach the scan's PushedFilters") {
    val df = Relational.forecastRevenue(spark, sf)
    val got = df.head()
    assert(got.getLong(1) > 0L, "the band must be non-degenerate at sf0.001")
    // executedPlan.toString ELIDES long PushedFilters lists ("…") — the
    // formatted explain prints them in full, which this assertion needs
    val scan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (colName <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(scan.contains(s"GreaterThanOrEqual($colName")
        || scan.contains(s"LessThan($colName")
        || scan.contains(s"LessThanOrEqual($colName"),
        s"$colName's range must push to the parquet scan:\n$scan")
    // and the value is the filtered-sum replay
    import org.apache.spark.sql.functions._
    val expect = graft.core.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount") >= 0.045 && col("l_discount") <= 0.075
        && col("l_quantity") < 24.0)
      .select(Relational.cents(col("l_extendedprice") * col("l_discount")).as("c"))
      .collect().map(_.getLong(0))
    assert(got.getLong(0) === expect.sum)
    assert(got.getLong(1) === expect.length.toLong)
  }

  test("x324 Q19: pushed disjunction ≡ the naive post-join OR filter") {
    import org.apache.spark.sql.functions._
    val got = Relational.disjunctiveRevenue(spark, sf).head()
    val expect = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .filter((col("p_brand") === "Brand#12" && col("p_size").between(1, 10)
          && col("l_quantity").between(1.0, 15.0))
        || (col("p_brand") === "Brand#23" && col("p_size").between(1, 20)
          && col("l_quantity").between(10.0, 25.0))
        || (col("p_brand") === "Brand#3" && col("p_size").between(1, 30)
          && col("l_quantity").between(20.0, 35.0)))
      .agg(sum(Relational.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("rev"), count(lit(1)).as("n"))
      .head()
    assert(got.getLong(0) === expect.getLong(0))
    assert(got.getLong(1) === expect.getLong(1))
    assert(got.getLong(1) > 0L, "the branches must be non-degenerate at sf0.001")
  }
}
