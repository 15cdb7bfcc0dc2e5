package graft

import graft.operators.Sessions
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, event_id, ts_ns, event_type, value)
  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("user_id", "event_id", "ts_ns", "event_type", "value")

  test("watermarkCurve: per-user running-max lateness, one count per delay") {
    // user 1 arrivals (event_id order): ts 100s, 50s (late 50s),
    // 200s, 90s (late 110s) → delays 0/60s/300s drop 2/1/0
    val events = Seq((1L, 1L, 100L), (1L, 2L, 50L), (1L, 3L, 200L),
        (1L, 4L, 90L))
      .toDF("user_id", "event_id", "s")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("s") * 1000000L).as("ts"))
    val out = Sessions.watermarkCurve(events,
        delaysUs = Seq(0L, 60000000L, 300000000L))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 4L, 2L, 500000L),
      (60000000L, 4L, 1L, 250000L),
      (300000000L, 4L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Sessions.watermarkCurve(events, delaysUs = Seq(60L, 0L))
    }
  }

  test("sessionize splits on gaps > gapNs and keeps runs together") {
    val events = ev(
      (1L, 1L, 0L, "a", 1.0), (1L, 2L, 50L, "a", 2.0),   // session 1
      (1L, 3L, 200L, "b", 4.0),                          // gap 150 > 100
      (2L, 4L, 0L, "a", 8.0))                            // separate user
    val out = Sessions.sessionize(events, gap = 100L)
      .orderBy("user_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, 2L, 0L, 50L, 300L),
      (1L, 2L, 1L, 200L, 200L, 400L),
      (2L, 1L, 1L, 0L, 0L, 800L)))
  }

  test("sessionLengthHistogram: session sizes bucket into counts") {
    val events = ev(
      (1L, 1L, 0L, "a", 0.0), (1L, 2L, 50L, "a", 0.0), (1L, 3L, 90L, "a", 0.0),
      (1L, 4L, 500L, "a", 0.0),                       // size-1 session
      (2L, 5L, 0L, "a", 0.0), (2L, 6L, 80L, "a", 0.0)) // size-2 session
    val out = Sessions.sessionLengthHistogram(events, gap = 100L)
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("sessionize gap exactly == gapNs stays in the session") {
    val out = Sessions.sessionize(
      ev((1L, 1L, 0L, "a", 0.0), (1L, 2L, 100L, "a", 0.0)), gap = 100L)
    assert(out.count() === 1L)
  }

  test("sessionize ties on ts_ns resolve by event_id — deterministic") {
    val out = Sessions.sessionize(
      ev((1L, 2L, 0L, "a", 0.0), (1L, 1L, 0L, "a", 0.0), (1L, 3L, 500L, "a", 0.0)),
      gap = 100L).orderBy("session_seq")
      .select("session_seq", "n_events").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L), (2L, 1L)))
  }

  test("scd2 compacts runs and closes intervals half-open") {
    val out = Sessions.scd2(ev(
      (1L, 1L, 0L, "a", 0.0), (1L, 2L, 10L, "a", 0.0),   // run of a
      (1L, 3L, 20L, "b", 0.0),                           // change
      (1L, 4L, 30L, "a", 0.0)))                          // back to a: new version
      .orderBy("version")
      .collect().map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      ("a", 0L, 20L, 1L), ("b", 20L, 30L, 2L), ("a", 30L, -1L, 3L)))
  }

  test("scd2 treats NULL states as runs (null-safe change detection)") {
    val out = Sessions.scd2(ev(
      (1L, 1L, 0L, null, 0.0), (1L, 2L, 10L, null, 0.0), (1L, 3L, 20L, "a", 0.0)))
      .orderBy("version")
      .collect().map(r => (Option(r.getString(1)), r.getLong(2), r.getLong(4)))
    assert(out.toSeq === Seq((None, 0L, 1L), (Some("a"), 20L, 2L)))
  }

  test("both operators run off ONE shuffle on the entity key") {
    val events = ev((1L, 1L, 0L, "a", 1.0), (1L, 2L, 50L, "b", 2.0))
    // sessionize: windows share one Exchange; the final agg adds its own
    val sPlan = Sessions.sessionize(events, 100L).queryExecution.executedPlan.toString
    assert(sPlan.split("Exchange").length - 1 <= 2,
      s"sessionize should shuffle at most twice (window + agg):\n$sPlan")
    val dPlan = Sessions.scd2(events).queryExecution.executedPlan.toString
    assert(dPlan.split("Exchange").length - 1 <= 1,
      s"scd2 should reuse the single user_id shuffle:\n$dPlan")
  }

  test("resampleLinear: exact / lerp / hold / backfill cases") {
    // user 1: events at t=100 (v=1.0) and t=300 (v=3.0)
    val out = Sessions.resampleLinear(
      ev((1L, 1L, 100L, "a", 1.0), (1L, 2L, 300L, "a", 3.0)),
      startTs = 0L, endTs = 400L, stepTs = 100L)
      .orderBy("g_ts")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, "backfill", 100L),    // before first -> first value 1.0
      (100L, "exact", 100L),
      (200L, "lerp", 200L),      // midpoint of 1.0..3.0 = 2.0
      (300L, "exact", 300L),
      (400L, "hold", 300L)))     // after last -> last value 3.0
  }

  test("resampleLinear: simultaneous events collapse latest-id-wins") {
    val out = Sessions.resampleLinear(
      ev((1L, 1L, 100L, "a", 1.0), (1L, 9L, 100L, "a", 7.0)),
      startTs = 100L, endTs = 100L, stepTs = 1L)
      .collect().map(r => (r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(("exact", 700L)))
  }

  test("resampleLinear grid covers only users with events") {
    val out = Sessions.resampleLinear(
      ev((1L, 1L, 0L, "a", 1.0), (2L, 2L, 50L, "a", 2.0)),
      startTs = 0L, endTs = 100L, stepTs = 50L)
    assert(out.count() === 6L)   // 2 users x 3 grid points
    assert(out.select("user_id").distinct().count() === 2L)
  }
  test("decayed counts: exact power-of-two weights, zero tail, future full weight") {
    val df = Seq(
      ("a", "2024-01-30 12:00:00"),  // age 0  -> 1000000
      ("a", "2024-01-28 01:00:00"),  // age 2, shift 1 -> 500000
      ("a", "2024-01-26 23:00:00"),  // age 4, shift 2 -> 250000
      ("b", "2024-01-29 00:00:00"),  // age 1, shift 0 -> 1000000
      ("b", "2020-01-01 00:00:00"))  // shift > 19 -> 0
      .toDF("event_type", "s").withColumn("ts", to_timestamp(col("s")))
    val out = Sessions.decayedCounts(df, halfLifeDays = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a", 3L, 1750000L), ("b", 2L, 1000000L)))
    // explicit anchor BEFORE an event: future events keep full weight
    val anchored = Sessions.decayedCounts(df, halfLifeDays = 2,
      anchor = Some(java.sql.Date.valueOf("2024-01-29")))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // a: ages -1(full),1(shift 0),2(shift 1) = 1000000+1000000+500000
    assert(anchored("a") === 2500000L)
  }

  test("intervalCoverage: overlaps merge and count once; touch joins") {
    // width 10: u1 opens [0,10) [5,15) [15,25) [40,50):
    // [5,15) overlaps the first; [15,25) TOUCHES (start = cummax end —
    // not >, so same island); [40,50) is separate
    val events = Seq(
      (1L, 0L, 1L), (1L, 5L, 2L), (1L, 15L, 3L), (1L, 40L, 4L),
      (2L, 100L, 5L))
      .toDF("user_id", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Sessions.intervalCoverage(events, widthUs = 10L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      // islands [0,25) + [40,50): covered 35 of span 50 → 700‰
      (1L, 4L, 2L, 35L, 50L, 700L),
      (2L, 1L, 1L, 10L, 10L, 1000L)))
    intercept[IllegalArgumentException] {
      Sessions.intervalCoverage(events, widthUs = 0L)
    }
  }

  test("intervalCoverage: an engulfed interval cannot reopen an island") {
    // [0,10) then [2,12) then [11,21): the cummax rule keeps island 1
    // open at 12, so [11,21) joins it — a lag(end)-based rule comparing
    // against the PREVIOUS row's end would also pass here only because
    // ends are monotone at fixed width; the spec pins the cummax form
    val events = Seq((1L, 0L, 1L), (1L, 2L, 2L), (1L, 11L, 3L))
      .toDF("user_id", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Sessions.intervalCoverage(events, widthUs = 10L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L, 1L, 21L, 21L, 1000L)))
  }

  test("sessionHandoffMatrix: entry/exit champions per session, " +
    "singletons on the diagonal, tie broken by event id") {
    // user 1, session 1: view(0) → click(5) → purchase(9)
    // user 1, session 2 (past the gap): single view(200)
    // user 2: two events at the SAME ts — entry/exit split by event_id
    val e = ev(
      (1L, 1L, 0L, "view", 0.0), (1L, 2L, 5L, "click", 0.0),
      (1L, 3L, 9L, "purchase", 0.0), (1L, 4L, 200L, "view", 0.0),
      (2L, 5L, 50L, "click", 0.0), (2L, 6L, 50L, "view", 0.0))
    val out = Sessions.sessionHandoffMatrix(e, gap = 100L)
      .as[(String, String, Long)].collect().toSeq
    assert(out === Seq(
      ("click", "view", 1L),      // user 2: id 5 enters, id 6 exits
      ("view", "purchase", 1L),   // user 1 session 1
      ("view", "view", 1L)))      // the singleton session
  }

  test("latenessProfile: disorder quantiles; decomposition is bucket-width invariant") {
    import org.apache.spark.sql.functions._
    // arrival order 1..5 with event times 100,50,200,150,300 micros:
    // running max 100,100,200,200,300 -> lateness 0,50,0,50,0
    val e = Seq((1L, 100L), (2L, 50L), (3L, 200L), (4L, 150L), (5L, 300L))
      .toDF("event_id", "us")
      .select(col("event_id"), lit("a").as("event_type"),
        expr("timestamp_micros(us)").as("ts"))
    val expected = Seq(("a", 500L, 0L), ("a", 900L, 50L),
      ("a", 990L, 50L), ("a", 1000L, 50L))
    for (w <- Seq(1L, 2L, 1000L)) {
      val out = graft.operators.Sessions.latenessProfile(e, bucketWidth = w)
        .as[(String, Long, Long)].collect().toSeq
      assert(out === expected, s"bucketWidth $w diverged")
    }
    // a perfectly in-order stream profiles all-zero lateness
    val ordered = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("event_id", "us")
      .select(col("event_id"), lit("b").as("event_type"),
        expr("timestamp_micros(us)").as("ts"))
    val zero = graft.operators.Sessions.latenessProfile(ordered)
      .as[(String, Long, Long)].collect().toSeq
    assert(zero.forall(_._3 == 0L))
  }

  test("latenessProfile approx flag: same shape, max quantile exact") {
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.events(spark, sf)
    val exact = graft.operators.Sessions.latenessProfile(e)
      .as[(String, Long, Long)].collect().toSeq
    val approx = graft.operators.Sessions.latenessProfile(e, approx = true)
      .as[(String, Long, Long)].collect().toSeq
    assert(approx.map(t => (t._1, t._2)) === exact.map(t => (t._1, t._2)),
      "approx ladder must cover the same (type, q) keys in the same order")
    // the sketch keeps the true maximum: the q=1000 watermark-sizing
    // anchor must be EXACT in both forms
    val maxE = exact.filter(_._2 == 1000L).toSet
    val maxA = approx.filter(_._2 == 1000L).toSet
    assert(maxA === maxE)
  }

  test("latenessProfile plan: no per-type single-window pass over raw events") {
    import org.apache.spark.sql.functions._
    val e = (1 to 50).map(i => (i.toLong, (i * 7 % 50).toLong))
      .toDF("event_id", "us")
      .select(col("event_id"), lit("a").as("event_type"),
        expr("timestamp_micros(us)").as("ts"))
    val wins = graft.operators.Sessions.latenessProfile(e, bucketWidth = 10L)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    // the raw-event window must be keyed by (type, bucket); windows
    // with a narrower key read only aggregates (bucket summary /
    // lateness weight table)
    wins.foreach { w =>
      if (w.partitionSpec.size < 2)
        assert(w.child.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.nonEmpty,
          "a narrow-keyed window must read an aggregate, not raw events")
    }
  }

  test("dupArrivalProfile: gap ladder, cumulative shares, null keys excluded") {
    val rows = Seq(
      (Option(1L), "a", 0L),          // key (1,a): arrivals at 0,
      (Option(1L), "a", 500000L),     //   +0.5 s  → bucket 0 (≤1 s)
      (Option(1L), "a", 5000000L),    //   +4.5 s  → bucket 1 (≤10 s)
      (Option(1L), "a", 30000000L),   //   +25 s   → bucket 2 (≤1 min)
      (Option(2L), "b", 0L),          // single arrival: no gap
      (Option.empty[Long], "a", 0L))  // unkeyable: excluded
      .toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Sessions.dupArrivalProfile(rows,
      keyCols = Seq("user_id", "event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (0L, 1000000L, 1L, 333333L, 333333L),
      (1L, 10000000L, 1L, 333333L, 666666L),
      (2L, 60000000L, 1L, 333333L, 1000000L)))
    // the open top bucket reports a NULL upper bound
    val far = Seq((1L, "a", 0L), (1L, "a", 90L * 86400000000L))
      .toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val top = Sessions.dupArrivalProfile(far,
      keyCols = Seq("user_id", "event_type")).head()
    assert(top.getLong(0) === 6L && top.isNullAt(1) &&
      top.getLong(4) === 1000000L)
  }

  test("arrivalIntegrity: backsteps measured against the producer sequence") {
    val rows = Seq(
      (1L, 1L, 1000000L), (1L, 2L, 2000000L),
      (1L, 3L, 1500000L),           // arrives after id 2 but 0.5 s earlier
      (1L, 4L, 3000000L),
      (2L, 10L, 5000000L))          // single event: zero steps, no NULLs
      .toDF("user_id", "event_id", "us")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val out = Sessions.arrivalIntegrity(rows)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 4L, 1L, 500000L, 250000L),
      (2L, 1L, 0L, 0L, 0L)))
  }

  test("rollingMedian: lower-median convention over the bounded frame, nulls excluded") {
    val events = ev(
      (1L, 1L, 10L, "a", 1.0),   // frame [100]            → 100
      (1L, 2L, 20L, "a", 5.0),   // frame [100,500]        → 100 (lower)
      (1L, 3L, 30L, "a", 3.0),   // frame [100,300,500]    → 300
      (1L, 4L, 40L, "a", 9.0),   // frame [300,500,900]    → 500 (e1 aged out)
      (2L, 5L, 10L, "a", 2.5))   // own partition          → 250
    val out = Sessions.rollingMedian(events, window = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 1L, 100L), (2L, 1L, 2L, 100L), (3L, 1L, 3L, 300L),
      (4L, 1L, 3L, 500L), (5L, 2L, 1L, 250L)))
    // a NULL value row contributes nothing — not even to n_window
    val withNull = ev((1L, 1L, 10L, "a", 1.0))
      .unionByName(Seq((1L, 2L, 20L, "a")).toDF("user_id", "event_id", "ts_ns", "event_type")
        .withColumn("value", lit(null).cast("double")))
    val n = Sessions.rollingMedian(withNull, window = 3).count()
    assert(n === 1L)
  }
}
