package graft

import graft.operators.Behavior
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec with SlowSuite {
  import spark.implicits._

  // (user_id, event_id, ts_ns, event_type, value)
  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("user_id", "event_id", "ts_ns", "event_type", "value")

  test("funnel counts strict-order conversions only") {
    val events = ev(
      // user 1: full ordered funnel
      (1L, 1L, 100L, "view", 0), (1L, 2L, 200L, "click", 0),
      (1L, 3L, 300L, "purchase", 0),
      // user 2: purchase BEFORE the view → reaches step 1 only
      (2L, 4L, 100L, "purchase", 0), (2L, 5L, 200L, "view", 0),
      // user 3: view then click, no purchase
      (3L, 6L, 100L, "view", 0), (3L, 7L, 150L, "click", 0),
      // user 4: never views → not even step 1
      (4L, 8L, 100L, "click", 0))
    val out = Behavior.funnel(events, Seq("view", "click", "purchase"))
      .select("step_idx", "step", "n_users")
      .as[(Int, String, Long)].collect().toSeq
    assert(out === Seq((1, "view", 3L), (2, "click", 2L),
      (3, "purchase", 1L)))
  }

  test("funnel: equal-timestamp step does NOT count (strictly after)") {
    val events = ev(
      (1L, 1L, 100L, "view", 0), (1L, 2L, 100L, "click", 0))
    val out = Behavior.funnel(events, Seq("view", "click"))
      .select("n_users").as[Long].collect().toSeq
    assert(out === Seq(1L, 0L))
  }

  test("funnel: re-view after champion does not reset the chain") {
    // champion view is t=100; click at 150 counts even though a later
    // view (t=200) is closer — champions are earliest, not latest
    val events = ev(
      (1L, 1L, 100L, "view", 0), (1L, 2L, 200L, "view", 0),
      (1L, 3L, 150L, "click", 0))
    val out = Behavior.funnel(events, Seq("view", "click"))
      .select("n_users").as[Long].collect().toSeq
    assert(out === Seq(1L, 1L))
  }

  test("funnel validates steps") {
    intercept[IllegalArgumentException] {
      Behavior.funnel(ev(), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Behavior.funnel(ev(), Seq("view", "view"))
    }
  }

  private def tsEvents(rows: (Long, String, Double)*) =
    rows.toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))

  test("funnelStepQuantiles: exact lower quantiles of champion gaps") {
    val events = ev(
      (1L, 1L, 100L, "view", 0), (1L, 2L, 150L, "click", 0),  // gap 50
      (1L, 3L, 250L, "purchase", 0),                          // gap 100
      (2L, 4L, 100L, "view", 0), (2L, 5L, 300L, "click", 0),  // gap 200
      (3L, 6L, 100L, "view", 0), (3L, 7L, 300L, "click", 0),  // gap 200
      (4L, 8L, 100L, "view", 0), (4L, 9L, 1000L, "click", 0), // gap 900
      (5L, 10L, 100L, "view", 0))                             // never converts
    val out = Behavior.funnelStepQuantiles(events,
      Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].collect().toSeq
    // step 2 gaps {50, 200, 200, 900}: p500 = 200 (cum 3 of 4),
    // p900/p990 = 900; step 3 has the single gap 100 at every q
    assert(out === Seq(
      (2L, 500L, 200L), (2L, 900L, 900L), (2L, 990L, 900L),
      (3L, 500L, 100L), (3L, 900L, 100L), (3L, 990L, 100L)))
    // the q=500 point must agree with funnelStepTimes' median
    val med = Behavior.funnelStepTimes(events, Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._2).toMap
    assert(out.filter(_._2 == 500L).map(t => t._1 -> t._3).toMap === med)
  }

  test("retentionCohorts: cohort by first week, offsets count distinct users") {
    val events = tsEvents(
      // user 1: weeks 0 and 2 (epoch 2024-01-01)
      (1L, "2024-01-02 10:00:00", 0), (1L, "2024-01-16 10:00:00", 0),
      // user 2: weeks 0, 0 (dup week collapses), 1
      (2L, "2024-01-03 10:00:00", 0), (2L, "2024-01-04 10:00:00", 0),
      (2L, "2024-01-10 10:00:00", 0),
      // user 3: cohort week 1 only
      (3L, "2024-01-09 10:00:00", 0))
    val out = Behavior.retentionCohorts(events)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }

  test("transitionMatrix counts per-user consecutive pairs, tie-broken by event_id") {
    val events = ev(
      (1L, 1L, 100L, "a", 0), (1L, 2L, 200L, "b", 0), (1L, 3L, 300L, "a", 0),
      // user 2: equal ts — order is event_id 4 then 5 → (a,b) not (b,a)
      (2L, 4L, 100L, "a", 0), (2L, 5L, 100L, "b", 0))
    val out = Behavior.transitionMatrix(events)
      .as[(String, String, Long)].collect().toSeq
    assert(out === Seq(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("gapFillInterpolate: interior gaps interpolate linearly in cents") {
    val events = tsEvents(
      // user 1 observes day 1 (200.00) and day 4 (500.00): days 2,3
      // interpolate to 300.00 and 400.00
      (1L, "2024-01-02 09:00:00", 200.0),
      (1L, "2024-01-05 09:00:00", 500.0),
      // user 1, day 1, second event: totals are per-day sums
      (1L, "2024-01-02 15:00:00", 0.005),
      // user 2: single day → no gaps
      (2L, "2024-01-10 12:00:00", 7.0))
    val out = Behavior.gapFillInterpolate(events)
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 20001L, 0),          // 200.00 + 0.005 rounds to 20001 cents
      (1L, 2L, 30001L, 1),          // 20001 + (50000-20001)/3 = 30000.67
      (1L, 3L, 40000L, 1),          // rounded toward the late observation
      (1L, 4L, 50000L, 0),
      (2L, 9L, 700L, 0)))
  }

  test("gapFillInterpolate emits one row per day in each user's span") {
    val events = tsEvents(
      (1L, "2024-01-02 09:00:00", 1.0), (1L, "2024-01-12 09:00:00", 1.0))
    val out = Behavior.gapFillInterpolate(events)
    assert(out.count() === 11L)
    assert(out.filter(col("interpolated") === 1).count() === 9L)
  }

  private def typedEvents(rows: (String, String)*) =
    rows.toDF("event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))

  test("dailyVolumeAnomaly: exact z from integer sums, spike flagged") {
    // type a: counts 2,2,2,2,7 over days 1..5 → d=5, Σn=15, Σn²=65,
    // rad=5·65−225=100, √=10; z(2)=(10−15)/10=−0.5 → −500 milli;
    // z(7)=(35−15)/10=2.0 → 2000 milli ≥ 1500 bar → flagged
    val rows =
      (1 to 4).flatMap(d => Seq.fill(2)(("a", f"2024-01-0${d + 1}%d 10:00:00"))) ++
        Seq.fill(7)(("a", "2024-01-06 10:00:00"))
    val out = Behavior.dailyVolumeAnomaly(typedEvents(rows: _*), zMilliBar = 1500L)
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    assert(out === Seq(
      ("a", 1L, 2L, -500L, 0), ("a", 2L, 2L, -500L, 0),
      ("a", 3L, 2L, -500L, 0), ("a", 4L, 2L, -500L, 0),
      ("a", 5L, 7L, 2000L, 1)))
  }

  test("dailyVolumeAnomaly: constant series pins z to 0, never flags") {
    val rows = (1 to 3).map(d => ("b", f"2024-01-0${d + 1}%d 10:00:00"))
    val out = Behavior.dailyVolumeAnomaly(typedEvents(rows: _*))
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    assert(out.map(_._4).forall(_ == 0L))
    assert(out.map(_._5).forall(_ == 0))
  }

  test("pathsTopK: sliding windows per user, frequency-then-path order") {
    val events = ev(
      // user 1: a→b→c→d yields paths abc, bcd
      (1L, 1L, 100L, "a", 0), (1L, 2L, 200L, "b", 0),
      (1L, 3L, 300L, "c", 0), (1L, 4L, 400L, "d", 0),
      // user 2: a→b→c again → abc count 2
      (2L, 5L, 100L, "a", 0), (2L, 6L, 200L, "b", 0),
      (2L, 7L, 300L, "c", 0))
    val out = Behavior.pathsTopK(events, k = 20, len = 3)
      .as[(String, String, String, Long)].collect().toSeq
    assert(out === Seq(("a", "b", "c", 2L), ("b", "c", "d", 1L)))
    // the top-k cut respects the (n DESC, path) order
    val top1 = Behavior.pathsTopK(events, k = 1, len = 3)
      .as[(String, String, String, Long)].collect().toSeq
    assert(top1 === Seq(("a", "b", "c", 2L)))
  }

  test("pathsTopK: equal timestamps order by event_id (deterministic)") {
    val events = ev(
      (1L, 1L, 100L, "x", 0), (1L, 2L, 100L, "y", 0), (1L, 3L, 100L, "z", 0))
    val out = Behavior.pathsTopK(events, k = 5, len = 3)
      .as[(String, String, String, Long)].collect().toSeq
    assert(out === Seq(("x", "y", "z", 1L)))
  }

  test("pathsTopK validates arguments") {
    intercept[IllegalArgumentException] { Behavior.pathsTopK(ev(), len = 1) }
    intercept[IllegalArgumentException] { Behavior.pathsTopK(ev(), k = 0) }
  }

  test("associationRules: hand-computed support/confidence/lift") {
    // baskets (user, day): u1d0={a,b}, u1d1={a}, u2d0={a,b}, u2d1={b}
    // N=4, cnt(a)=3, cnt(b)=3, cnt(ab)=2
    val events = tsEvents2(
      (1L, "2024-01-01 08:00:00", "a"), (1L, "2024-01-01 09:00:00", "b"),
      (1L, "2024-01-01 10:00:00", "a"), // duplicate item in basket collapses
      (1L, "2024-01-02 08:00:00", "a"),
      (2L, "2024-01-01 08:00:00", "a"), (2L, "2024-01-01 09:00:00", "b"),
      (2L, "2024-01-02 08:00:00", "b"))
    val out = Behavior.associationRules(events, minSupportPermille = 0L)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // support 2/4 = 500‰; confidence 2/3 = 666‰; lift 2·4/(3·3) = 888m
    assert(out === Seq(
      ("a", "b", 2L, 500L, 666L, 888L),
      ("b", "a", 2L, 500L, 666L, 888L)))
    // the support prune: 500‰ < 600‰ bar removes both directions
    assert(Behavior.associationRules(events, minSupportPermille = 600L)
      .count() === 0L)
    intercept[IllegalArgumentException] {
      Behavior.associationRules(events, minSupportPermille = 1001L)
    }
  }

  private def tsEvents2(rows: (Long, String, String)*) =
    rows.toDF("user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))

  test("debounce: keep-first-of-burst — every ≤gap step is suppressed") {
    // chain 0,9,18,27 with gap 10: bursts are maximal ≤gap-step chains,
    // so only the head (t=0) survives; 40 starts a new burst
    val events = ev(
      (1L, 1L, 0L, "click", 0), (1L, 2L, 9L, "click", 0),
      (1L, 3L, 18L, "click", 0), (1L, 4L, 27L, "click", 0),
      (1L, 5L, 40L, "click", 0))
    val out = Behavior.debounce(events, gapNs = 10L)
      .as[(Long, Long, String, Int)].collect().toSeq
    assert(out.map(e => e._1 -> e._4) ===
      Seq(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 0))
  }

  test("debounce: keys are (user, type) — other streams never interfere") {
    val events = ev(
      (1L, 1L, 0L, "click", 0), (1L, 2L, 5L, "view", 0), // different type
      (2L, 3L, 6L, "click", 0)) // different user
    val out = Behavior.debounce(events, gapNs = 10L)
      .as[(Long, Long, String, Int)].collect().toSeq
    assert(out.map(_._4) === Seq(0, 0, 0))
  }

  test("funnel within: steps beyond the budget do not convert") {
    val events = ev(
      // user 1: click 5ns after view — inside a 10ns budget
      (1L, 1L, 0L, "view", 0), (1L, 2L, 5L, "click", 0),
      // user 2: click 50ns after view — outside the budget
      (2L, 3L, 0L, "view", 0), (2L, 4L, 50L, "click", 0))
    val bounded = Behavior.funnel(events, Seq("view", "click"),
      within = Some(10L)).select("n_users").as[Long].collect().toSeq
    assert(bounded === Seq(2L, 1L))
    // the unbounded form still counts both
    val unbounded = Behavior.funnel(events, Seq("view", "click"))
      .select("n_users").as[Long].collect().toSeq
    assert(unbounded === Seq(2L, 2L))
    intercept[IllegalArgumentException] {
      Behavior.funnel(events, Seq("view"), within = Some(0L))
    }
  }

  test("funnelStepTimes: exact lower median of champion gaps per transition") {
    val events = ev(
      // user 1: view(0) → click(10) → purchase(30): gaps 10, 20
      (1L, 1L, 0L, "view", 0), (1L, 2L, 10L, "click", 0),
      (1L, 3L, 30L, "purchase", 0),
      // user 2: view(0) → click(30): step-2 gap 30, no purchase
      (2L, 4L, 0L, "view", 0), (2L, 5L, 30L, "click", 0))
    val out = Behavior.funnelStepTimes(events,
      Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].collect().toSeq
    // step 2 gaps {10, 30}: lower median 10 over 2 transitions
    assert(out === Seq((2L, 10L, 2L), (3L, 20L, 1L)))
    intercept[IllegalArgumentException] {
      Behavior.funnelStepTimes(events, Seq("view"))
    }
  }

  test("lastTouchAttribution: latest in-window touch wins, organic keeps NULLs") {
    val events = ev(
      // user 1: view(10), click(20) → purchase(25) credits click, gap 5
      (1L, 1L, 10L, "view", 0), (1L, 2L, 20L, "click", 0),
      (1L, 3L, 25L, "purchase", 0),
      // user 2: touch far outside the 50ns tolerance → organic
      (2L, 4L, 10L, "view", 0), (2L, 5L, 500L, "purchase", 0),
      // user 3: two touches at the SAME ts → higher event_id wins
      (3L, 6L, 30L, "view", 0), (3L, 7L, 30L, "click", 0),
      (3L, 8L, 40L, "purchase", 0))
    val out = Behavior.lastTouchAttribution(events,
      touchTypes = Seq("view", "click"), convType = "purchase",
      toleranceNs = 50L)
      .as[(Long, Long, Option[Long], Option[String], Option[Long])]
      .collect().toSeq
    assert(out === Seq(
      (3L, 1L, Some(2L), Some("click"), Some(5L)),
      (5L, 2L, None, None, None),
      (8L, 3L, Some(7L), Some("click"), Some(10L))))
    intercept[IllegalArgumentException] {
      Behavior.lastTouchAttribution(events, Seq("purchase"), "purchase", 1L)
    }
  }

  test("rollingActives: trailing-window distinct actives, max-day clipped") {
    val events = tsEvents(
      (1L, "2024-01-01 10:00:00", 0), // u1 day 0
      (2L, "2024-01-02 10:00:00", 0), // u2 day 1
      (1L, "2024-01-09 10:00:00", 0)) // u1 day 8 (clips at d1=8)
    val out = Behavior.rollingActives(events, windowDays = 7)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 1L, 1L), (1L, 1L, 2L), (2L, 0L, 2L), (3L, 0L, 2L),
      (4L, 0L, 2L), (5L, 0L, 2L), (6L, 0L, 2L), (7L, 0L, 1L),
      (8L, 1L, 1L)))
    // a day with no own activity still reports trailing actives (dau 0)
    assert(out.filter(_._2 == 0L).nonEmpty)
  }

  test("rollingActives: dense grid — a day with an empty trailing window reports zeros") {
    val events = tsEvents(
      (1L, "2024-01-01 10:00:00", 0), // day 0
      (1L, "2024-01-21 10:00:00", 0)) // day 20
    val out = Behavior.rollingActives(events, windowDays = 7)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.size === 21, "every day in [min, max] must report")
    // days 7..19 are outside BOTH activity windows: reported as (0, 0),
    // not silently absent — an outage reads as an outage
    assert(out.filter(d => d._1 >= 7 && d._1 <= 19)
      .forall(d => d._2 == 0L && d._3 == 0L))
    assert(out.head === ((0L, 1L, 1L)) && out.last === ((20L, 1L, 1L)))
  }

  private def typedTsEvents(rows: (Long, Long, String, String)*) =
    rows.toDF("user_id", "event_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))

  test("interArrivalStats: exact lower median and p90 of same-user same-type gaps") {
    val events = typedTsEvents(
      // user 1 clicks: gaps 10 s, 20 s, 70 s
      (1L, 1L, "2024-01-01 00:00:00", "click"),
      (1L, 2L, "2024-01-01 00:00:10", "click"),
      (1L, 3L, "2024-01-01 00:00:30", "click"),
      (1L, 4L, "2024-01-01 00:01:40", "click"),
      // user 2 clicks: gap 5 s — cross-user gaps never mix
      (2L, 5L, "2024-01-01 00:00:00", "click"),
      (2L, 6L, "2024-01-01 00:00:05", "click"),
      // one lonely view: no gap, type absent from the output
      (3L, 7L, "2024-01-01 00:00:00", "view"))
    val out = Behavior.interArrivalStats(events)
      .as[(String, Long, Long, Long)].collect().toSeq
    // gaps sorted: 5, 10, 20, 70 s → lower median = 10 s (2·cum ≥ 4 at
    // the 2nd), lower p90 = 70 s (10·cum ≥ 36 first at the 4th)
    assert(out === Seq(("click", 4L, 10000000L, 70000000L)))
  }

  test("interArrivalStats: equal timestamps order by event_id — zero gaps count") {
    val events = typedTsEvents(
      (1L, 1L, "2024-01-01 00:00:00", "click"),
      (1L, 2L, "2024-01-01 00:00:00", "click"))
    val out = Behavior.interArrivalStats(events)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("click", 1L, 0L, 0L)))
  }

  test("weeklyChurn: retained/churned/new ledger, last week clipped") {
    val events = tsEvents(
      // u1: weeks 0, 1, 2; u2: week 0 only; u3: week 1 only
      (1L, "2024-01-02 10:00:00", 0), (1L, "2024-01-09 10:00:00", 0),
      (1L, "2024-01-16 10:00:00", 0),
      (2L, "2024-01-03 10:00:00", 0),
      (3L, "2024-01-10 10:00:00", 0))
    val out = Behavior.weeklyChurn(events)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      // w0: {u1,u2} → w1 {u1,u3}: retained u1, churned u2, new u3
      (0L, 2L, 2L, 1L, 1L, 1L, 500L),
      // w1: {u1,u3} → w2 {u1}: retained u1, churned u3, no new
      (1L, 2L, 1L, 1L, 1L, 0L, 500L)))
    // w2 (the max week) is clipped — its successor is beyond the data
    assert(!out.exists(_._1 == 2L))
  }

  test("weeklyChurn: a fully-silent following week reports total churn, not a gap") {
    val events = tsEvents(
      (1L, "2024-01-02 10:00:00", 0),  // week 0
      (1L, "2024-01-25 10:00:00", 0))  // week 3
    val out = Behavior.weeklyChurn(events)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // only observed weeks below the max report; week 0's successor is
    // silent → everyone churned
    assert(out === Seq((0L, 1L, 0L, 0L, 1L, 0L, 0L)))
  }

  test("debounce: equal timestamps order by event_id, second is suppressed") {
    val events = ev(
      (1L, 1L, 100L, "click", 0), (1L, 2L, 100L, "click", 0))
    val out = Behavior.debounce(events, gapNs = 10L)
      .as[(Long, Long, String, Int)].collect().toSeq
    assert(out === Seq((1L, 1L, "click", 0), (2L, 1L, "click", 1)))
    intercept[IllegalArgumentException] { Behavior.debounce(ev(), gapNs = 0L) }
  }

  test("dailyStreaks: islands of consecutive days; same-day dups collapse") {
    val events = tsEvents(
      // user 1: days 0,1,2 then 5,6 — two streaks, longest 3
      (1L, "2024-01-01 08:00:00", 0), (1L, "2024-01-01 20:00:00", 0),
      (1L, "2024-01-02 10:00:00", 0), (1L, "2024-01-03 10:00:00", 0),
      (1L, "2024-01-06 10:00:00", 0), (1L, "2024-01-07 10:00:00", 0),
      // user 2: one isolated day 10
      (2L, "2024-01-11 10:00:00", 0))
    val out = Behavior.dailyStreaks(events)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 5L, 2L, 3L, 6L),
      (2L, 1L, 1L, 1L, 10L)))
  }

  test("dowProfile: ISO weekday, exact per-day milli and index permille") {
    // 2024-01-01 is a Monday; 2024-01-07 a Sunday
    val events = tsEvents(
      (1L, "2024-01-01 08:00:00", 0), (1L, "2024-01-01 09:00:00", 0),
      (1L, "2024-01-01 10:00:00", 0), // Mon #1: 3 events
      (1L, "2024-01-08 10:00:00", 0), // Mon #2: 1 event
      (1L, "2024-01-07 08:00:00", 0), (1L, "2024-01-07 09:00:00", 0),
      (1L, "2024-01-07 10:00:00", 0), (1L, "2024-01-07 11:00:00", 0))
    // totals: 8 events over 3 observed days
    val out = Behavior.dowProfile(events)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      // Mon: 4 events / 2 days = 2000 milli; index 4·3·1000/(2·8) = 750
      (1L, 2L, 4L, 2000L, 750L),
      // Sun: 4 events / 1 day = 4000 milli; index 4·3·1000/(1·8) = 1500
      (7L, 1L, 4L, 4000L, 1500L)))
  }

  test("cohortMatrix: first-week cohorts, offset-0 self-normalizes to 1000") {
    val events = tsEvents(
      // u1: cohort week 0, also active week 1
      (1L, "2024-01-02 10:00:00", 0), (1L, "2024-01-09 10:00:00", 0),
      // u2: cohort week 0 only
      (2L, "2024-01-03 10:00:00", 0),
      // u3: cohort week 1 only
      (3L, "2024-01-10 10:00:00", 0))
    val out = Behavior.cohortMatrix(events)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 2L, 1000L), // cohort 0: u1+u2
      (0L, 1L, 1L, 500L),  // only u1 returns
      (1L, 0L, 1L, 1000L))) // cohort 1: u3
  }

  test("cusumChangePoint: integer-scaled statistic, peak at the shift") {
    // counts by day: 1,1,3,3 → D=4, N=8; S = 4·cum − idx·8
    val events = tsEvents(
      (1L, "2024-01-01 10:00:00", 0),
      (1L, "2024-01-02 10:00:00", 0),
      (1L, "2024-01-03 08:00:00", 0), (1L, "2024-01-03 09:00:00", 0),
      (1L, "2024-01-03 10:00:00", 0),
      (1L, "2024-01-04 08:00:00", 0), (1L, "2024-01-04 09:00:00", 0),
      (1L, "2024-01-04 10:00:00", 0))
    val out = Behavior.cusumChangePoint(events)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (0L, 1L, -4L, false), (1L, 1L, -8L, true),
      (2L, 3L, -4L, false), (3L, 3L, 0L, false)))
  }

  test("cusumChangePoint: zero days densify; |S| ties flag the earliest day") {
    // days 0 and 2 active (2 events each), day 1 silent → counts 2,0,2
    // D=3, N=4: S = 3·cum − idx·4 → 2, −2, 0: tie |2|, earliest wins
    val events = tsEvents(
      (1L, "2024-01-01 08:00:00", 0), (1L, "2024-01-01 09:00:00", 0),
      (1L, "2024-01-03 08:00:00", 0), (1L, "2024-01-03 09:00:00", 0))
    val out = Behavior.cusumChangePoint(events)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 2L, true), (1L, 0L, -2L, false), (2L, 2L, 0L, false)))
    assert(out.count(_._4) === 1, "exactly one peak row")
  }

  test("basketPairs: apriori prune, basket-distinct counts, canonical order") {
    val rows = Seq(
      // baskets: {A,B,C}, {A,B}, {A,B}, {C,D} — D is infrequent (1
      // basket), so (C,D) can never qualify and must be pruned
      (1L, "A"), (1L, "B"), (1L, "C"), (1L, "C"), // dup fact collapses
      (2L, "A"), (2L, "B"),
      (3L, "B"), (3L, "A"),
      (4L, "C"), (4L, "D"))
      .toDF("basket", "item")
    val out = Behavior.basketPairs(rows, "basket", "item", minCount = 2L)
      .as[(String, String, Long)].collect().toSeq
    assert(out === Seq(("A", "B", 3L)))
    intercept[IllegalArgumentException] {
      Behavior.basketPairs(rows, "basket", "item", minCount = 0L)
    }
  }

  test("rfmSegments: quintile scores with recency inverted, exact thresholds") {
    // 5 customers, anchor = 2024-01-10; distinct metric values so each
    // lands in its own quintile
    val orders = Seq(
      (1L, "2024-01-10", 500.0), // recency 0 → r 5
      (1L, "2024-01-09", 400.0),
      (1L, "2024-01-08", 300.0),
      (1L, "2024-01-07", 200.0),
      (1L, "2024-01-06", 100.0), // freq 5, monetary 150000 → f 5, m 5
      (2L, "2024-01-09", 400.0), (2L, "2024-01-08", 300.0),
      (2L, "2024-01-07", 200.0), (2L, "2024-01-06", 100.0),
      (3L, "2024-01-08", 300.0), (3L, "2024-01-07", 200.0),
      (3L, "2024-01-06", 100.0),
      (4L, "2024-01-07", 200.0), (4L, "2024-01-06", 100.0),
      (5L, "2024-01-06", 100.0))
      .toDF("cust", "d", "amt")
      .withColumn("d", to_date(col("d")))
    val out = Behavior.rfmSegments(orders, "cust", "d",
      graft.queries.Relational.cents(col("amt")))
      .as[(Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().toSeq
    assert(out === Seq(
      (1L, 0L, 5L, 150000L, 5L, 5L, 5L, "555"),
      (2L, 1L, 4L, 100000L, 4L, 4L, 4L, "444"),
      (3L, 2L, 3L, 60000L, 3L, 3L, 3L, "333"),
      (4L, 3L, 2L, 30000L, 2L, 2L, 2L, "222"),
      (5L, 4L, 1L, 10000L, 1L, 1L, 1L, "111")))
  }

  test("rfmSegments approx flag: thresholds track exact on real orders") {
    val orders = graft.core.Tables.orders(spark, sf)
    val amt = graft.queries.Relational.cents(col("o_totalprice"))
    val exact = Behavior.rfmSegments(orders, "o_custkey", "o_orderdate", amt)
      .select("cust", "segment").as[(Long, String)].collect().toMap
    val approx = Behavior.rfmSegments(orders, "o_custkey", "o_orderdate", amt,
      approx = true)
      .select("cust", "segment").as[(Long, String)].collect().toMap
    assert(approx.keySet === exact.keySet)
    // sketch thresholds may differ from the exact lower-quantile by one
    // distinct value, shifting only boundary customers — the segment
    // maps must agree on the overwhelming majority
    val agree = exact.count { case (c, s) => approx(c) == s }
    assert(agree.toDouble / exact.size >= 0.9,
      s"approx RFM agrees on only $agree of ${exact.size} customers")
  }

  private def tsEv(rows: (String, String)*) =
    rows.toDF("event_type", "__s")
      .withColumn("ts", to_timestamp(col("__s")))
      .select("event_type", "ts")

  test("sessionFunnel: a gap resets the funnel; within-session converts; " +
    "two completing sessions count twice") {
    // gap 100 ns. user 1: view(0) … gap … click(200) — the plain
    // funnel converts step 2, the session funnel must NOT.
    // user 2: view(0) → click(50) in one session — both convert.
    // user 3: two complete view→click sessions → 2 session conversions.
    val e = ev(
      (1L, 1L, 0L, "view", 0.0), (1L, 2L, 200L, "click", 0.0),
      (2L, 3L, 0L, "view", 0.0), (2L, 4L, 50L, "click", 0.0),
      (3L, 5L, 0L, "view", 0.0), (3L, 6L, 10L, "click", 0.0),
      (3L, 7L, 500L, "view", 0.0), (3L, 8L, 510L, "click", 0.0))
    val sess = Behavior.sessionFunnel(e, Seq("view", "click"), gap = 100L)
      .as[(Int, String, Long)].collect().map { case (i, _, n) => (i, n) }.toMap
    // 4 sessions open with a view (u1's second session is click-only);
    // converting: u2's one + u3's two = 3
    assert(sess === Map(1 -> 4L, 2 -> 3L))
    val plain = Behavior.funnel(e, Seq("view", "click"))
      .as[(Int, String, Long)].collect().map { case (i, _, n) => (i, n) }.toMap
    assert(plain === Map(1 -> 3L, 2 -> 3L)) // per USER all three convert
  }

  test("stickiness: DAU/MAU permille; a fully idle trailing month is NULL, " +
    "not a divide-by-zero") {
    // users 1,2 on day 0; user 1 on day 1; user 1 again on day 40
    val e = Seq(
      (1L, "2024-01-01 08:00:00"), (2L, "2024-01-01 09:00:00"),
      (1L, "2024-01-02 08:00:00"), (1L, "2024-02-10 08:00:00")
    ).toDF("user_id", "__s")
      .withColumn("ts", to_timestamp(col("__s"))).select("user_id", "ts")
    val out = Behavior.stickiness(e, windowDays = 28)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) === ((2L, 2L, Some(1000L))))
    assert(out(1L) === ((1L, 2L, Some(500L))))
    assert(out(28L) === ((0L, 1L, Some(0L)))) // day 1 still in window
    assert(out(30L) === ((0L, 0L, None)))     // idle trailing month
    assert(out(40L) === ((1L, 1L, Some(1000L))))
  }

  test("newVsReturning: first-ever day classifies the mix; repeat " +
    "same-day events collapse") {
    // u1 active days 0, 1; u2 active day 1 only (twice — one fact);
    // u3 active days 0, 2:
    //   day0: active {1,3} all new → 1000‰
    //   day1: active {1,2}, new {2} → 500‰
    //   day2: active {3}, new none → 0‰
    val e = Seq(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-02 08:00:00"),
      (2L, "2024-01-02 09:00:00"), (2L, "2024-01-02 10:00:00"),
      (3L, "2024-01-01 07:00:00"), (3L, "2024-01-03 07:00:00")
    ).toDF("user_id", "__s")
      .withColumn("ts", to_timestamp(col("__s"))).select("user_id", "ts")
    val out = Behavior.newVsReturning(e)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 2L, 0L, 1000L),
      (1L, 2L, 1L, 1L, 500L),
      (2L, 1L, 0L, 1L, 0L)))
  }

  test("ewmaChart: hand-computed power-of-two baseline, flags, warm-up NULLs") {
    // type a: day0 4 events, day1 2, day2 8
    //   day1 baseline = 4 (only day0, weight 2^19)       → 4000 milli
    //   day2 num = 4·2^18 + 2·2^19 = 2097152, den = 786432 → 2666 milli
    //          spike: 8·786432 > 2·2097152                  → true
    val e = tsEv(
      Seq.fill(4)("a" -> "2024-01-01 10:00:00") ++
        Seq.fill(2)("a" -> "2024-01-02 10:00:00") ++
        Seq.fill(8)("a" -> "2024-01-03 10:00:00"): _*)
    val out = Behavior.ewmaChart(e)
      .as[(String, Long, Long, Option[Long], Option[Boolean], Option[Boolean])]
      .collect().toSeq
    assert(out === Seq(
      ("a", 0L, 4L, None, None, None),
      ("a", 1L, 2L, Some(4000L), Some(false), Some(false)),
      ("a", 2L, 8L, Some(2666L), Some(true), Some(false))))
  }

  test("ewmaChart: a silent day densifies to 0, weighs the baseline, and dips") {
    // type b: day0 1 event, day2 1 event — day1 is a REAL zero day:
    //   day1: baseline 1000 milli, dip (0 < 1/2)
    //   day2: num = 1·2^18 + 0·2^19 = 262144, den = 786432 → 333 milli,
    //         spike (1 > 2·0.333)
    val e = tsEv("b" -> "2024-01-01 09:00:00", "b" -> "2024-01-03 09:00:00")
    val out = Behavior.ewmaChart(e)
      .as[(String, Long, Long, Option[Long], Option[Boolean], Option[Boolean])]
      .collect().toSeq
    assert(out === Seq(
      ("b", 0L, 1L, None, None, None),
      ("b", 1L, 0L, Some(1000L), Some(false), Some(true)),
      ("b", 2L, 1L, Some(333L), Some(true), Some(false))))
  }

  test("theilSenTrend: exact slope on a linear series; n_days and n_pairs") {
    // counts 1, 3, 5, 7 on days 0..3 → every pairwise slope 2e6 exactly
    val rows = (0 to 3).flatMap(d =>
      Seq.fill(1 + 2 * d)("a" -> f"2024-01-0${d + 1} 12:00:00"))
    val out = Behavior.theilSenTrend(tsEv(rows: _*))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 4L, 6L, 2000000L)))
  }

  test("theilSenTrend: median shrugs off an outlier day an OLS fit would chase") {
    // counts 1,2,3,4,1000 on days 0..4: 6 of the 10 pairwise slopes are
    // exactly 1e6 → the median stays 1e6 despite the 1000-event spike
    val rows = Seq(1, 2, 3, 4, 1000).zipWithIndex.flatMap { case (n, d) =>
      Seq.fill(n)("a" -> f"2024-01-0${d + 1} 12:00:00") }
    val out = Behavior.theilSenTrend(tsEv(rows: _*))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 5L, 10L, 1000000L)))
  }

  test("olsTrend: exact slope/intercept/R2 on a perfectly linear series") {
    // counts 1,3,5,7 on days 0..3: d=4 sx=6 sy=16 sxy=34 sxx=14 syy=84
    // -> vx=20 vy=80 cov=40: slope 2e6, intercept 1e6, R2 = 1000 exactly
    val rows = (0 to 3).flatMap(d =>
      Seq.fill(1 + 2 * d)("a" -> f"2024-01-0${d + 1} 12:00:00"))
    val out = Behavior.olsTrend(tsEv(rows: _*))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 4L, 2000000L, 1000000L, 1000L)))
  }

  test("olsTrend: truncation-exact fractions on a non-linear series") {
    // counts 1,2,4 on days 0..2: cov=9 vx=6 vy=14 -> slope 1500000,
    // intercept (7e6-4.5e6)//3 = 833333 (trunc), R2 = 81000//84 = 964
    val rows = Seq(1, 2, 4).zipWithIndex.flatMap { case (n, d) =>
      Seq.fill(n)("a" -> f"2024-01-0${d + 1} 12:00:00") }
    val out = Behavior.olsTrend(tsEv(rows: _*))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 3L, 1500000L, 833333L, 964L)))
  }

  test("olsTrend: degenerate variances yield NULLs, never a crash") {
    // one-day series: vx=0 -> slope/intercept/R2 all NULL
    val one = Behavior.olsTrend(tsEv(Seq.fill(3)(
      "a" -> "2024-01-01 12:00:00"): _*))
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(one === Seq(("a", 1L, None, None, None)))
    // flat series over 3 days: slope 0 and intercept exact, vy=0 -> R2 NULL
    val flat = Behavior.olsTrend(tsEv((0 to 2).flatMap(d =>
      Seq.fill(2)("b" -> f"2024-01-0${d + 1} 12:00:00")): _*))
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(flat === Seq(("b", 3L, Some(0L), Some(2000000L), None)))
  }

  test("hazardCurve: censored users stay at risk but never die") {
    // u1 active day 0 only (lifetime 0, dies); u2 days 0-2, u3 days
    // 1-2, u4 day 2 only — all last-seen on the horizon (day 2), so
    // all three are CENSORED. at_risk suffix-sums the lifetime grid.
    val e = Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 11:00:00"),
      (2L, "2024-01-03 11:00:00"), (3L, "2024-01-02 09:00:00"),
      (3L, "2024-01-03 09:00:00"), (4L, "2024-01-03 23:00:00"))
      .toDF("user_id", "__s").withColumn("ts", to_timestamp(col("__s")))
    val out = Behavior.hazardCurve(e)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 4L, 1L, 1L, 250000L), // u1 dies at 0; u4 censored at 0
      (1L, 2L, 0L, 1L, 0L),      // u3 censored at lifetime 1
      (2L, 1L, 0L, 1L, 0L)))     // u2 censored at lifetime 2
  }

  test("hazardCurve: empty lifetimes densify; everyone-censored corpus has zero hazard") {
    // u1 lifetime 3 (censored at horizon), u2 lifetime 0 (also ends on
    // the horizon day -> censored): grid rows 1 and 2 exist with zero
    // deaths, at_risk still decays correctly
    val e = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-04 10:00:00"),
      (2L, "2024-01-04 12:00:00"))
      .toDF("user_id", "__s").withColumn("ts", to_timestamp(col("__s")))
    val out = Behavior.hazardCurve(e)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 0L, 1L, 0L), (1L, 1L, 0L, 0L, 0L),
      (2L, 1L, 0L, 0L, 0L), (3L, 1L, 0L, 1L, 0L)))
  }

  test("itemCosine: symmetric normalization ranks coupled pairs over hub pairs") {
    // baskets: {1,2} x2, {1,3}, {2,3}, {1,2,3} — n1=4 n2=4 n3=3;
    // pair 1-2 co-occurs 3x -> cos 3000/sqrt(16) = 750;
    // pairs 1-3 and 2-3 co-occur 2x -> cos 2000/sqrt(12) = 577 (floored)
    val baskets = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 3L),
      (13L, 2L), (13L, 3L), (14L, 1L), (14L, 2L), (14L, 3L))
      .toDF("basket", "item")
    val out = Behavior.itemCosine(baskets, "basket", "item",
      minCount = 2, k = 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 4L, 4L, 3L, 750L),
      (1L, 3L, 4L, 3L, 2L, 577L),
      (2L, 3L, 4L, 3L, 2L, 577L)))
  }

  test("itemCosine: below-min-count items and pairs are pruned; duplicates collapse") {
    // item 9 appears once -> pruned before pairing; the duplicated
    // (20, 1) fact collapses (DISTINCT facts); pair 1-2 seen once -> cut
    val baskets = Seq(
      (20L, 1L), (20L, 1L), (20L, 9L), (20L, 2L),
      (21L, 1L), (21L, 3L), (22L, 1L), (22L, 3L), (23L, 2L), (23L, 3L))
      .toDF("basket", "item")
    val out = Behavior.itemCosine(baskets, "basket", "item",
      minCount = 2, k = 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // only 1-3 reaches 2 shared baskets: cos = 2000/sqrt(3*3)=667
    assert(out === Seq((1L, 3L, 3L, 3L, 2L, 667L)))
  }

  test("seasonalVolumeAnomaly: Mondays z-score against Mondays only") {
    // 15 days; dow0 (days 0,7,14) counts 2,2,5 — z = -707,-707,+1414;
    // every other weekday is flat at 1 -> z 0. Bar 1000: only day 14
    // flags. dailyVolumeAnomaly on the same series would smear the
    // weekly shape into one distribution.
    val rows = (0 to 14).flatMap { d =>
      val n = if (d % 7 == 0) (if (d == 14) 5 else 2) else 1
      Seq.fill(n)("a" -> f"2024-01-${d + 1}%02d 12:00:00")
    }
    val out = Behavior.seasonalVolumeAnomaly(tsEv(rows: _*),
      zMilliBar = 1000L)
      .as[(String, Long, Long, Long, Long, Int)].collect().toSeq
    assert(out.size === 15)
    val byDay = out.map(r => r._2 -> ((r._3, r._4, r._5, r._6))).toMap
    assert(byDay(0L) === ((0L, 2L, -707L, 0)))
    assert(byDay(7L) === ((0L, 2L, -707L, 0)))
    assert(byDay(14L) === ((0L, 5L, 1414L, 1)))
    // flat weekdays: zero z, never flagged
    assert((1L to 6L).forall(d => byDay(d) === ((d, 1L, 0L, 0))))
    assert(out.count(_._6 == 1) === 1)
  }

  test("seasonalDecomposition: a perfect line is all trend — zero season, zero residual") {
    val rows = (0 to 3).flatMap(d =>
      Seq.fill(1 + 2 * d)("a" -> f"2024-01-0${d + 1} 12:00:00"))
    val out = Behavior.seasonalDecomposition(tsEv(rows: _*))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.size === 4)
    out.foreach { case (_, day, _, n, trend, dowEff, res) =>
      assert(trend === n * 1000000L, s"day $day: trend must equal the data")
      assert(dowEff === 0L && res === 0L)
    }
  }

  test("seasonalDecomposition: flat volume + symmetric weekly bump decomposes exactly") {
    // 14 days, n = 10 everywhere except dow3 (days 3, 10) where n = 17:
    // the bump is symmetric around the midpoint, so OLS slope = 0 and
    // trend = mean = 11; detrended = -1e6 / +6e6; dow effect absorbs
    // ALL of it -> residual 0 everywhere
    val rows = (0 to 13).flatMap { d =>
      val n = if (d % 7 == 3) 17 else 10
      Seq.fill(n)("a" -> f"2024-01-${d + 1}%02d 12:00:00")
    }
    val out = Behavior.seasonalDecomposition(tsEv(rows: _*))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.size === 14)
    out.foreach { case (_, day, dow, n, trend, dowEff, res) =>
      assert(trend === 11000000L, s"day $day: trend must be the flat mean")
      assert(dowEff === (if (dow == 3) 6000000L else -1000000L))
      assert(res === 0L, s"day $day: the weekly shape must absorb everything")
    }
  }

  test("seasonalDecomposition: a spike lands in the residual, not the season") {
    // same shape as above but day 12 (dow 5) triples: the residual —
    // and ONLY the residual of the affected dow — must move
    val rows = (0 to 13).flatMap { d =>
      val n = if (d == 12) 30 else if (d % 7 == 3) 17 else 10
      Seq.fill(n)("a" -> f"2024-01-${d + 1}%02d 12:00:00")
    }
    val out = Behavior.seasonalDecomposition(tsEv(rows: _*))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    // the spiked day carries a large positive residual; its dow twin
    // (day 5) a negative one (the dow mean rose); other dows' residuals
    // stay comparatively small
    assert(out(12L)._7 > 5000000L, s"spike residual: ${out(12L)}")
    assert(out(5L)._7 < 0L)
    assert(math.abs(out(4L)._7) < math.abs(out(12L)._7) / 2)
  }

  test("seasonalDecomposition: a single-day series reports NULL components") {
    val out = Behavior.seasonalDecomposition(tsEv(Seq.fill(3)(
      "z" -> "2024-01-01 12:00:00"): _*))
      .as[(String, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(out === Seq(("z", 0L, 0L, 3L, None, None, None)))
  }

  test("theilSenTrend: negative slopes TRUNCATE toward zero (the portable rule)") {
    // counts 2,0,0,1 on days 0..3 (middle days densified): sorted pair
    // slopes −2e6, −1e6, −333333, 0, 5e5, 1e6 → median −333333 — the
    // (0,3) pair is −10⁶/3, so a floor-division engine would emit
    // −333334 and hash-diverge; truncation is what both engines do
    val rows = Seq.fill(2)("c" -> "2024-01-01 08:00:00") :+
      ("c" -> "2024-01-04 08:00:00")
    val out = Behavior.theilSenTrend(tsEv(rows: _*))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("c", 4L, 6L, -333333L)))
  }

  test("dispersionIndex: steady cadence ~0, binge pattern high, exact integer micro") {
    // user 1: 2,2,2 per day -> var 0 -> dispersion 0
    // user 2: 1,1,10 per day -> mean 4, pop var 18 -> D = 4.5 = 4500000
    // user 3: 2 active days only -> excluded at minDays = 3
    def day(d: Int, n: Int, u: Long) =
      (1 to n).map(i => (u, s"2024-01-0$d 0$i:00:00"))
    val rows = (day(1, 2, 1L) ++ day(2, 2, 1L) ++ day(3, 2, 1L) ++
      day(1, 1, 2L) ++ day(2, 1, 2L) ++ day(3, 9, 2L) ++ Seq((2L, "2024-01-03 10:00:00")) ++
      day(1, 1, 3L) ++ day(2, 1, 3L))
    val events = rows.toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = Behavior.dispersionIndex(events, minDays = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 6L, 0L),
      (2L, 3L, 12L, 4500000L)))
  }

  test("eventTypeEntropy: monoculture 0, even split ln2, min-events gate") {
    // user 1: 5× one type → H = 0 exactly
    // user 2: 3×A + 3×B → H = ln6 − (2·3·⌊ln3·10⁶+½⌋)/6
    //       = 1791759 − 1098612 = 693147 µnat (= ln 2)
    // user 3: 4 events → below minEvents, excluded
    val rows = (1 to 5).map(_ => (1L, "a")) ++
      (1 to 3).map(_ => (2L, "a")) ++ (1 to 3).map(_ => (2L, "b")) ++
      (1 to 4).map(_ => (3L, "a"))
    val out = Behavior.eventTypeEntropy(
      rows.toDF("user_id", "event_type"), minEvents = 5L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 5L, 1L, 0L),
      (2L, 6L, 2L, 693147L)))
  }

  test("basketTypeEntropy: star-join diversity, one-SKU buyer reads 0") {
    val lineitem = Seq(
      (100L, 1L), (100L, 2L), (101L, 3L), (101L, 4L),  // cust 1: A A B B
      (102L, 1L), (102L, 2L), (103L, 1L),              // cust 2: A A A
      (104L, 1L), (104L, 3L))                          // cust 3: 2 items < min
      .toDF("l_orderkey", "l_partkey")
    val orders = Seq((100L, 1L), (101L, 1L), (102L, 2L), (103L, 2L),
      (104L, 3L)).toDF("o_orderkey", "o_custkey")
    val part = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("p_partkey", "p_type")
    val out = Behavior.basketTypeEntropy(lineitem, orders, part,
      minItems = 3L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 4L, 2L, 693147L),  // ln 4 − ln 2 = ln 2
      (2L, 3L, 1L, 0L)))      // single type: zero diversity
  }

  test("spendTierMigration: per-half quintiles, acquisition row 0, churn col 0") {
    // H1: custs 1..5 spend 100..500 → tiers 1..5 (distinct-value
    // ladder, each value its own quintile). H2: custs 2..5 reversed
    // (400/300/200/100 → tiers 4/3/2/1) + new cust 6 at 500 → tier 5.
    // Cust 1 buys nothing in H2 → (1, 0); cust 6 is new → (0, 5).
    val orders = (1L to 5L).map(c => (c, "1999-05-01", c * 100L)) ++ Seq(
      (2L, "2001-05-01", 400L), (3L, "2001-05-01", 300L),
      (4L, "2001-05-01", 200L), (5L, "2001-05-01", 100L),
      (6L, "2001-05-01", 500L))
    val df = orders.toDF("cust", "d", "amt")
    val out = Behavior.spendTierMigration(df, "cust", "d", col("amt"),
      boundaryDate = "2000-01-01")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 5L, 1L), (1L, 0L, 1L), (2L, 4L, 1L),
      (3L, 3L, 1L), (4L, 2L, 1L), (5L, 1L, 1L)))
  }

  test("liftTable: exact rates and milli lift per band") {
    // band 0: keys 1,2 (one positive) → rate 500000, lift 4000/6=666;
    // band 1: keys 3,4 (both positive) → rate 1000000, lift 1333
    val scored = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("k", "band")
    val pos = Seq(Tuple1(1L), Tuple1(3L), Tuple1(4L), Tuple1(3L))
      .toDF("k") // duplicate positive must not double-count
    val out = Behavior.liftTable(scored, pos, "k", "band")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 1L, 500000L, 666L),
      (1L, 2L, 2L, 1000000L, 1333L)))
  }

  test("topkChurn: day-over-day carry with k=2, first day excluded") {
    // day1 top {1,2}; day2 top {2,3} → carry 1, churn 500;
    // day3 top {4} alone → carry 0, churn 1000
    val day = 86400L
    val events = Seq(
      (1L, 10L), (2L, 20L),
      (2L, day + 10L), (3L, day + 20L),
      (4L, 2 * day + 10L))
      .toDF("user_id", "s")
      .select(col("user_id"), timestamp_micros(col("s") * 1000000L).as("ts"))
    val out = Behavior.topkChurn(events, k = 2)
      .select(col("n_top"), col("n_carry"), col("churn_permille"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 1L, 500L), (1L, 0L, 1000L)))
    intercept[IllegalArgumentException] {
      Behavior.topkChurn(events, k = 0)
    }
  }
}
