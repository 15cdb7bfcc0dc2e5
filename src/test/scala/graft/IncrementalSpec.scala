package graft

import org.apache.spark.sql.functions._
import graft.operators.Incremental

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (1L, 10L), (1L, 5L), (2L, 7L), (3L, 1L), (3L, 2L), (3L, 3L), (4L, 0L)
  ).toDF("k", "v")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("merged split states equal one full aggregation (the refresh law)") {
    val full = Incremental.aggState(rows, Seq("k"), col("v"))
    val even = Incremental.aggState(rows.filter(col("v") % 2 === 0), Seq("k"), col("v"))
    val odd  = Incremental.aggState(rows.filter(col("v") % 2 =!= 0), Seq("k"), col("v"))
    assert(asMap(Incremental.merge(Seq(even, odd))) === asMap(full))
    // keys present on only one side survive untouched (k=4 is all-even)
    assert(asMap(Incremental.merge(Seq(even, odd)))(4L) === ((1L, 0L)))
  }

  test("merge is associative: merge(merge(a,b),c) == merge(a,b,c)") {
    val parts = Seq(0, 1, 2).map(m =>
      Incremental.aggState(rows.filter(pmod(col("v"), lit(3)) === m), Seq("k"), col("v")))
    val nested = Incremental.merge(Seq(Incremental.merge(parts.take(2)), parts(2)))
    assert(asMap(nested) === asMap(Incremental.merge(parts)))
  }

  test("merge validates schemas and rejects empty input") {
    intercept[IllegalArgumentException] { Incremental.merge(Nil) }
    val good = Incremental.aggState(rows, Seq("k"), col("v"))
    val bad = good.withColumnRenamed("k", "key2")
    intercept[IllegalArgumentException] { Incremental.merge(Seq(good, bad)) }
  }
  test("HLL distinct states merge losslessly: split == one-shot, error bounded") {
    val data = (1L to 400L).map(i => (i % 4, s"v${i % 97}")).toDF("k", "v")
    val oneShot = Incremental.distinctEstimate(
      Incremental.distinctState(data, Seq("k"), col("v")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Incremental.distinctEstimate(
      Incremental.mergeDistinct(Seq(
        Incremental.distinctState(data.filter(col("v") < "v5"), Seq("k"), col("v")),
        Incremental.distinctState(data.filter(col("v") >= "v5"), Seq("k"), col("v")))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === oneShot, "HLL union must be lossless, not approximately equal")
    // estimate error vs truth (97 distinct per key) within the HLL regime
    merged.values.foreach(est => assert(math.abs(est - 97L) <= 5L, s"est $est"))
  }

  test("applyChangelog: inserts add, deletes retract, n=0 keys vanish") {
    val base = Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v")
    val state = Incremental.aggState(base, Seq("k"), col("v"))
    val log = Seq(
      ("a", 10L, "D"),  // retract one of a's rows
      ("c", 7L, "I"),   // brand-new key
      ("b", 5L, "D"))   // b fully retracted → must disappear
      .toDF("k", "v", "op")
    val out = Incremental.applyChangelog(state, log, Seq("k"), col("v"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 1L, 20L), ("c", 1L, 7L)))
  }

  test("applyChangelog ≡ recompute of the post-change row set (the law)") {
    val all = (1 to 300).map(i => (s"k${i % 11}", i.toLong)).toDF("k", "v")
    val base = all.filter(col("v") % 3 =!= 0)
    val inserts = all.filter(col("v") % 3 === 0).withColumn("op", lit("I"))
    val deletes = base.filter(col("v") % 7 === 0).withColumn("op", lit("D"))
    val refreshed = Incremental.applyChangelog(
      Incremental.aggState(base, Seq("k"), col("v")),
      inserts.unionByName(deletes), Seq("k"), col("v"))
      .orderBy("k").collect().toSeq
    val recomputed = Incremental.aggState(
      all.filter(col("v") % 3 === 0 ||
        (col("v") % 3 =!= 0 && col("v") % 7 =!= 0)), Seq("k"), col("v"))
      .orderBy("k").collect().toSeq
    assert(refreshed === recomputed)
  }

  test("applyChangelog rejects unknown ops loudly (ANSI raise, no silent skip)") {
    val state = Incremental.aggState(Seq(("a", 1L)).toDF("k", "v"),
      Seq("k"), col("v"))
    val bad = Seq(("a", 1L, "X")).toDF("k", "v", "op")
    intercept[Exception] {
      Incremental.applyChangelog(state, bad, Seq("k"), col("v")).collect()
    }
  }

  test("paneSlidingCounts: hand-computed 3-pane windows, quiet panes report") {
    // minute panes: events in panes 0, 1, 4, 4 → window (wend, n):
    //   0→1, 1→2, 2→2, 3→1, 4→2 — pane 2..3 quiet but windowed
    val e = Seq(
      ("a", "1970-01-01 00:00:30"),
      ("a", "1970-01-01 00:01:10"),
      ("a", "1970-01-01 00:04:20"),
      ("a", "1970-01-01 00:04:50"),
      ("b", "1970-01-01 00:00:05"), // other type: isolated axis
      (null.asInstanceOf[String], "1970-01-01 00:00:06") // null type drops
    ).toDF("event_type", "__s")
      .withColumn("ts", to_timestamp(col("__s"))).select("event_type", "ts")
    val out = Incremental
      .paneSlidingCounts(e, paneMicros = 60L * 1000000L, windowPanes = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("a", -2L, 0L, 1L), ("a", -1L, 1L, 2L), ("a", 0L, 2L, 2L),
      ("a", 1L, 3L, 1L), ("a", 2L, 4L, 2L),
      ("b", -2L, 0L, 1L)))
  }

  test("paneSlidingDistinct: pane-union ≡ direct window sketch, exact at " +
    "spec scale") {
    // users spread so windows overlap with repeats: the pane-union
    // estimate must equal (a) sketching each window's rows directly —
    // the lossless-union law — and (b) the EXACT distinct count (HLL
    // sparse mode is exact at these cardinalities)
    val rows = Seq(
      (1L, 0L), (2L, 0L), (1L, 65L),            // panes 0, 0, 1
      (3L, 125L), (1L, 130L),                   // pane 2
      (4L, 250L), (4L, 255L), (5L, 260L))       // pane 4
      .map { case (u, s2) => ("a", u, s2 * 1000000L) }
    val e = rows.toDF("event_type", "user_id", "__us")
      .withColumn("ts", timestamp_micros(col("__us")))
      .select("event_type", "user_id", "ts")
    val out = Incremental
      .paneSlidingDistinct(e, paneMicros = 60L * 1000000L, windowPanes = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    val panes = rows.map { case (_, u, us) => (u, us / 60000000L) }
    out.foreach { case (_, ws, we, est) =>
      val exact = panes.collect { case (u, p) if p >= ws && p <= we => u }
        .distinct.size.toLong
      assert(est === exact, s"window [$ws, $we]")
      // the union LAW: sketching the window's raw rows directly gives
      // the identical estimate (union is lossless at equal lgK)
      val direct = e
        .filter(expr("unix_micros(ts) div 60000000") between (ws, we))
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
        .head().getLong(0)
      assert(est === direct, s"union law, window [$ws, $we]")
    }
    // quiet-window axis: pane 3 exists in the grid (wend 3 covers
    // panes 1..3 → users from panes 1-2), wend 5..6 would be off-grid
    assert(out.map(_._3) === (0L to 4L).toSeq)
  }

  test("paneSlidingCounts: decomposition ≡ the direct windowed count") {
    // property on an arbitrary spread: summing pane partials must give
    // exactly the same answer as re-counting each window from raw rows
    val micros = Seq(5L, 65L, 70L, 119L, 240L, 241L, 250L, 601L)
      .map(_ * 1000000L)
    val e = micros.map(("x", _)).toDF("event_type", "__us")
      .withColumn("ts", timestamp_micros(col("__us")))
      .select("event_type", "ts")
    val out = Incremental
      .paneSlidingCounts(e, paneMicros = 60L * 1000000L, windowPanes = 4)
      .as[(String, Long, Long, Long)].collect()
    val panes = micros.map(_ / (60L * 1000000L))
    out.foreach { case (_, ws, we, n) =>
      val direct = panes.count(p => p >= ws && p <= we)
      assert(n === direct, s"window [$ws, $we]")
    }
    assert(out.map(_._4).sum === micros.size.toLong * 4 -
      // edge windows: each pane feeds 4 windows minus those past max
      panes.map(p => (p + 3 - panes.max).max(0)).sum)
  }

  test("quantileState: merge(splits) ≡ one-shot — estimates identical, incl. an empty split") {
    import graft.operators.Incremental
    import org.apache.spark.sql.functions._
    val vals = (0L until 100L).toDF("v")
    val oneShot = Incremental.quantileState(vals, col("v"), 10L)
    val parts = Seq(
      Incremental.quantileState(vals.filter(col("v") % 3 === 0), col("v"), 10L),
      Incremental.quantileState(vals.filter(col("v") % 3 === 1), col("v"), 10L),
      Incremental.quantileState(vals.filter(col("v") % 3 === 2), col("v"), 10L),
      Incremental.quantileState(vals.filter(lit(false)), col("v"), 10L))
    val merged = Incremental.mergeQuantile(parts)
    assert(merged.orderBy("bin").collect().toSeq
      === oneShot.orderBy("bin").collect().toSeq,
      "histogram states must merge losslessly")
    // associativity: merging pre-merged pairs lands on the same state
    val paired = Incremental.mergeQuantile(Seq(
      Incremental.mergeQuantile(parts.take(2)),
      Incremental.mergeQuantile(parts.drop(2))))
    assert(paired.orderBy("bin").collect().toSeq
      === oneShot.orderBy("bin").collect().toSeq)
    // hand-checked estimates on the uniform 0..99, width 10: rank(p500)
    // = 50 → bin 4 (cum 50); rank(p990) = 99 → bin 9 (cum at 8 is 90)
    val est = Incremental.quantileEstimate(merged, 10L, Seq(500, 990, 10))
      .as[(Long, Long, Long)].collect().toSeq
    assert(est === Seq((10L, 0L, 0L), (500L, 4L, 40L), (990L, 9L, 90L)))
  }

  test("quantileState: negative values bin by FLOOR, not truncate-toward-zero") {
    import graft.operators.Incremental
    import org.apache.spark.sql.functions._
    // -15..-1: floor puts -15..-11 in bin -2 (5 values), -10..-1 in
    // bin -1 (10 values); truncation would corrupt both
    val vals = (-15L to -1L).toDF("v")
    val st = Incremental.quantileState(vals, col("v"), 10L)
      .as[(Long, Long)].collect().toMap
    assert(st === Map(-2L -> 5L, -1L -> 10L))
    // p500 of 15 values: rank 8 → bin -1, lower edge -10
    val est = Incremental.quantileEstimate(
      Incremental.quantileState(vals, col("v"), 10L), 10L, Seq(500))
      .as[(Long, Long, Long)].collect().toSeq
    assert(est === Seq((500L, -1L, -10L)))
  }

  test("quantileStateWeighted ≡ quantileState over weight-repeated rows") {
    import graft.operators.Incremental
    import org.apache.spark.sql.functions._
    val rows = Seq((5L, 3L), (17L, 1L), (25L, 2L), (25L, 0L), (7L, -1L))
    val weighted = Incremental.quantileStateWeighted(
      rows.toDF("v", "w"), col("v"), col("w"), 10L)
      .as[(Long, Long)].collect().toMap
    val repeated = Incremental.quantileState(
      rows.flatMap { case (v, w) => Seq.fill(math.max(w, 0L).toInt)(v) }
        .toDF("v"), col("v"), 10L)
      .as[(Long, Long)].collect().toMap
    assert(weighted === repeated,
      "weight w must place exactly the mass of w repeated rows")
    assert(weighted === Map(0L -> 3L, 1L -> 1L, 2L -> 2L))
  }

  test("paneSlidingQuantile: pane histograms add into every window they feed") {
    import graft.operators.Incremental
    import org.apache.spark.sql.functions._
    // pane width 100 µs; X: pane 0 values 5, 15 / pane 1 value 25;
    // W = 2 → windows ending 0 [5,15], 1 [5,15,25], 2 [25]
    val events = Seq((50L, "X", 5L), (60L, "X", 15L), (150L, "X", 25L))
      .toDF("us", "event_type", "v")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val out = Incremental.paneSlidingQuantile(events, paneMicros = 100L,
        windowPanes = 2, valueCol = col("v"), binWidth = 10L,
        permilles = Seq(500))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("X", -1L, 0L, 500L, 2L, 0L, 0L),   // rank 1 of [bin0, bin1]
      ("X", 0L, 1L, 500L, 3L, 1L, 10L),   // rank 2 of 3 → bin 1
      ("X", 1L, 2L, 500L, 1L, 2L, 20L)))  // rank 1 of [bin2]
    // empty windows emit nothing (the count twin reports zeros instead)
    assert(!out.exists(_._5 == 0L))
  }
}
