package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of picks latest right row at or before left time") {
    val left = Seq(
      (1L, 100L, "a"),  // matches t=100 (equality counts)
      (1L, 150L, "b"),  // matches t=100
      (1L, 250L, "c"),  // matches t=200
      (2L, 50L, "d"),   // no right row yet → null
      (3L, 500L, "e")   // key with no right rows at all → null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 100L, 10L),
      (1L, 200L, 20L),
      (2L, 60L, 30L)
    ).toDF("k", "t", "rid")

    val out = AsOfJoin.backward(left, right, "k", "t", "t", Seq("rid"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[Any]("rid")).map(_.asInstanceOf[Long])).toMap
    assert(out === Map(
      "a" -> Some(10L), "b" -> Some(10L), "c" -> Some(20L),
      "d" -> None, "e" -> None))
  }

  test("tie at identical times: highest tiebreak wins") {
    val left = Seq((1L, 100L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 99L, 5L)).toDF("k", "t", "rid")
    val out = AsOfJoin.backward(left, right, "k", "t", "t",
      Seq("rid"), tieBreak = Some("rid")).collect()
    assert(out.head.getAs[Long]("rid") === 9L)
  }

  test("fractional tieBreak types are rejected (long cast would collapse ties)") {
    val left = Seq((1L, 100L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 2.9), (1L, 100L, 2.1)).toDF("k", "t", "score")
    // 2.9 and 2.1 both truncate to 2 under cast("long") — 'highest wins'
    // would pick nondeterministically, so the guard must refuse upfront
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, "k", "t", "t",
        Seq("score"), tieBreak = Some("score"))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("multiple payload columns come from the same right row") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 90L, 1L, "old"), (1L, 95L, 2L, "new")).toDF("k", "t", "rid", "name")
    val out = AsOfJoin.backward(left, right, "k", "t", "t", Seq("rid", "name")).head()
    assert(out.getAs[Long]("rid") === 2L)
    assert(out.getAs[String]("name") === "new")
  }

  test("null keys never match (equi-join semantics, regression)") {
    val left = Seq((Some(1L), 100L, "keyed"), (None, 100L, "nullkey"))
      .map { case (k, t, tag) => (k.map(Long.box).orNull, t, tag) }
      .toDF("k", "t", "tag")
    val right = Seq((Some(1L), 50L, 10L), (None, 50L, 99L))
      .map { case (k, t, rid) => (k.map(Long.box).orNull, t, rid) }
      .toDF("k", "t", "rid")
    val out = AsOfJoin.backward(left, right, "k", "t", "t", Seq("rid"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[Any]("rid")).map(_.asInstanceOf[Long])).toMap
    assert(out === Map("keyed" -> Some(10L), "nullkey" -> None))
  }

  test("forward as-of picks earliest right row at or after left time") {
    val left = Seq(
      (1L, 100L, "a"),  // matches t=100 (equality counts)
      (1L, 150L, "b"),  // matches t=200
      (1L, 250L, "c"),  // nothing after → null
      (2L, 50L, "d"),   // matches t=60
      (3L, 500L, "e")   // key with no right rows at all → null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 100L, 10L),
      (1L, 200L, 20L),
      (2L, 60L, 30L)
    ).toDF("k", "t", "rid")
    val out = AsOfJoin.forward(left, right, "k", "t", "t", Seq("rid"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[Any]("rid")).map(_.asInstanceOf[Long])).toMap
    assert(out === Map(
      "a" -> Some(10L), "b" -> Some(20L), "c" -> None,
      "d" -> Some(30L), "e" -> None))
  }

  test("forward tie at identical times: highest tiebreak wins (mirror of backward)") {
    val left = Seq((1L, 100L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 101L, 5L)).toDF("k", "t", "rid")
    val out = AsOfJoin.forward(left, right, "k", "t", "t",
      Seq("rid"), tieBreak = Some("rid")).collect()
    assert(out.head.getAs[Long]("rid") === 9L)
  }

  test("nearest as-of picks least |Δt|; equal distance prefers backward") {
    val left = Seq(
      (1L, 100L, "exact"),   // right at 100 → distance 0
      (1L, 149L, "back"),    // 100 (Δ49) vs 200 (Δ51) → 100
      (1L, 151L, "fwd"),     // 100 (Δ51) vs 200 (Δ49) → 200
      (1L, 150L, "tie"),     // Δ50 both ways → backward (100)
      (1L, 999L, "tail"),    // only backward exists
      (2L, 10L, "head"),     // only forward exists
      (3L, 5L, "none")       // no right rows → null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 100L, 10L),
      (1L, 200L, 20L),
      (2L, 60L, 30L)
    ).toDF("k", "t", "rid")
    val out = AsOfJoin.nearest(left, right, "k", "t", "t", Seq("rid"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[Any]("rid")).map(_.asInstanceOf[Long])).toMap
    assert(out === Map(
      "exact" -> Some(10L), "back" -> Some(10L), "fwd" -> Some(20L),
      "tie" -> Some(10L), "tail" -> Some(20L), "head" -> Some(30L),
      "none" -> None))
  }

  test("nearest tiebreak: identical right times resolve by highest tieBreak both sides") {
    val left = Seq((1L, 100L, "bw"), (2L, 100L, "fw")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 90L, 7L), (1L, 90L, 9L),     // backward side tie at t=90
      (2L, 110L, 3L), (2L, 110L, 8L)    // forward side tie at t=110
    ).toDF("k", "t", "rid")
    val out = AsOfJoin.nearest(left, right, "k", "t", "t",
      Seq("rid"), tieBreak = Some("rid"))
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[Long]("rid")).toMap
    assert(out === Map("bw" -> 9L, "fw" -> 8L))
  }

  test("nearest on timestamp times uses exact epoch distance") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, ts("2024-01-01 00:00:10"), "x")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:07"), 1L),   // Δ3s
      (1L, ts("2024-01-01 00:00:12"), 2L))   // Δ2s → wins
      .toDF("k", "t", "rid")
    val out = AsOfJoin.nearest(left, right, "k", "t", "t", Seq("rid")).head()
    assert(out.getAs[Long]("rid") === 2L)
  }

  test("null TIMES never match: null-t left rows get null payload, null-t right rows are no champions") {
    // regression: NULLS-FIRST window sort used to treat null times as
    // "earliest" — forward handed a null-t left row a real match, and a
    // null-t right row could become every backward champion
    val left = Seq((Some(1L), Some(100L), "ok"), (Some(1L), None, "null_t"))
      .map { case (k, t, tag) => (k.map(Long.box).orNull, t.map(Long.box).orNull, tag) }
      .toDF("k", "t", "tag")
    val right = Seq((Some(1L), Some(90L), 1L), (Some(1L), None, 99L))
      .map { case (k, t, rid) => (k.map(Long.box).orNull, t.map(Long.box).orNull, rid) }
      .toDF("k", "t", "rid")
    def rids(df: org.apache.spark.sql.DataFrame): Map[String, Option[Long]] =
      df.collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[Any]("rid")).map(_.asInstanceOf[Long])).toMap
    assert(rids(AsOfJoin.backward(left, right, "k", "t", "t", Seq("rid")))
      === Map("ok" -> Some(1L), "null_t" -> None))
    assert(rids(AsOfJoin.forward(left, right, "k", "t", "t", Seq("rid")))
      === Map("ok" -> None, "null_t" -> None)) // nothing at/after 100 with a real time
    assert(rids(AsOfJoin.nearest(left, right, "k", "t", "t", Seq("rid")))
      === Map("ok" -> Some(1L), "null_t" -> None))
  }

  test("tolerance bounds the match distance in all three directions") {
    val left = Seq((1L, 100L, "x"), (1L, 500L, "far")).toDF("k", "t", "tag")
    val right = Seq((1L, 90L, 1L), (1L, 130L, 2L)).toDF("k", "t", "rid")
    def rids(df: org.apache.spark.sql.DataFrame): Map[String, Option[Long]] =
      df.collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[Any]("rid")).map(_.asInstanceOf[Long])).toMap
    // backward: 100 matches 90 (Δ10 ≤ 15); 500's nearest-before is 130 (Δ370 > 15) → null
    assert(rids(AsOfJoin.backward(left, right, "k", "t", "t", Seq("rid"),
      tolerance = Some(15L))) === Map("x" -> Some(1L), "far" -> None))
    // forward: 100 matches 130 only within Δ≥30
    assert(rids(AsOfJoin.forward(left, right, "k", "t", "t", Seq("rid"),
      tolerance = Some(15L))) === Map("x" -> None, "far" -> None))
    assert(rids(AsOfJoin.forward(left, right, "k", "t", "t", Seq("rid"),
      tolerance = Some(30L))) === Map("x" -> Some(2L), "far" -> None))
    // nearest: picks 90 (Δ10); with tolerance 5 nothing qualifies
    assert(rids(AsOfJoin.nearest(left, right, "k", "t", "t", Seq("rid"),
      tolerance = Some(10L))) === Map("x" -> Some(1L), "far" -> None))
    assert(rids(AsOfJoin.nearest(left, right, "k", "t", "t", Seq("rid"),
      tolerance = Some(5L))) === Map("x" -> None, "far" -> None))
  }

  test("plan shape: one exchange, no cartesian/range explosion") {
    val left = (1L to 1000L).map(i => (i % 10, i)).toDF("k", "t")
    val right = (1L to 1000L).map(i => (i % 10, i, i * 2)).toDF("k", "t", "rid")
    val df = AsOfJoin.backward(left, right, "k", "t", "t", Seq("rid"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
    assert(df.count() === 1000L)
  }

  test("matchRateReport: backward-within-tolerance coverage in integer ppm") {
    // u1 purchase@100 matches its click@90 (gap 10 <= 50); u1
    // purchase@5000's latest click (1000) is out of tolerance; u2 has
    // no clicks at all -> 1 of 3 matched
    val purchases = Seq((10L, 1L, 100L), (11L, 1L, 5000L), (12L, 2L, 100L))
      .toDF("pid", "user_id", "ts_us")
    val clicks = Seq((20L, 1L, 90L), (21L, 1L, 1000L))
      .toDF("cid", "user_id", "cts")
    val out = AsOfJoin.matchRateReport(purchases, clicks, "user_id",
      "ts_us", "cts", probe = "cid", tolerance = Some(50L))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((3L, 1L, 2L, 333333L)))
    // no tolerance: any backward click counts -> u1's both match
    val loose = AsOfJoin.matchRateReport(purchases, clicks, "user_id",
      "ts_us", "cts", probe = "cid", tolerance = None)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(loose === Seq((3L, 2L, 1L, 666666L)))
  }

  test("stalenessLadder: day buckets, unmatched bucket, shares") {
    // unitsPerDay = 10 → ages 5/80/1000 units = 0/8/100 days →
    // buckets 0 (<1), 2 (<30), 4 (>= 90); key 3 unmatched → -1
    val left = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L))
      .toDF("k", "t")
    val right = Seq((1L, 95L, 1L), (2L, 20L, 2L), (4L, -900L, 3L))
      .toDF("k", "t", "event_id")
    val out = AsOfJoin.stalenessLadder(left, right, "k", "t", "t",
        tieBreak = Some("event_id"), unitsPerDay = 10L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((-1L, 1L, 250L), (0L, 1L, 250L),
      (2L, 1L, 250L), (4L, 1L, 250L)))
    intercept[IllegalArgumentException] {
      AsOfJoin.stalenessLadder(left, right, "k", "t", "t",
        boundsDays = Seq(7L, 1L))
    }
  }
}
