package graft

import graft.operators.Governance
import org.apache.spark.sql.functions._

/** Hand-computed cases for the governance audits: deletion
  * blast-radius counts and TTL purge buckets, including the NULL and
  * boundary policies the scaladocs promise. */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("purgeAudit: per-table counts, null keys never match, ppm exact") {
    val events = Seq(Option(1L), Option(1L), Option(2L), Option(3L),
      Option.empty[Long]).toDF("user_id")
    val orders = Seq(1L, 9L, 9L).toDF("o_custkey")
    val ids = Seq(1L, 9L).toDF("id")
    val out = Governance.purgeAudit(
      Seq(("events", events, "user_id"), ("orders", orders, "o_custkey")),
      ids).as[(String, Long, Long, Long)].collect().toSeq
    // events: 5 rows, user 1 matches twice (null row counts in n_rows,
    // never in n_matched) -> 2/5 = 400000 ppm; orders: all 3 match
    assert(out === Seq(
      ("events", 5L, 2L, 400000L),
      ("orders", 3L, 3L, 1000000L)))
  }

  test("purgeAudit: duplicate ids in the request do not double-count rows") {
    val t = Seq(1L, 2L).toDF("k")
    val ids = Seq(1L, 1L, 1L).toDF("id")
    val out = Governance.purgeAudit(Seq(("t", t, "k")), ids)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("t", 2L, 1L, 500000L)))
  }

  test("purgeAudit validates its inputs") {
    val t = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      Governance.purgeAudit(Seq.empty, t)
    }
    intercept[IllegalArgumentException] {
      Governance.purgeAudit(Seq(("t", t, "k")), Seq((1L, 2L)).toDF("a", "b"))
    }
  }

  test("ttlAudit: 30-day buckets, boundary age purges, null ts is bucket -1") {
    // asOf 2024-12-31; ages: 0 (bucket 0), 30 (bucket 1), 365
    // (boundary - PURGES, bucket 12), 401 (bucket 13), null (bucket -1),
    // and a FUTURE-dated row (age -5: sentinel bucket -2, never bucket 0)
    val rows = Seq(Option("2024-12-31"), Option("2024-12-01"),
      Option("2024-01-01"), Option("2023-11-26"), Option.empty[String],
      Option("2025-01-05"))
      .toDF("d").withColumn("ts", to_timestamp(col("d")))
    val out = Governance.ttlAudit(rows, "ts", ttlDays = 365L,
      asOf = "2024-12-31").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (-2L, 1L, 0L, 0L),
      (-1L, 1L, 0L, 0L),
      (0L, 1L, 0L, 0L),
      (1L, 1L, 0L, 0L),
      (12L, 1L, 1L, 1000000L),
      (13L, 1L, 1L, 1000000L)))
  }

  test("subjectAccessReport: per-table counts and spans, ts-less table NULL") {
    val people = Seq((42L, "x"), (7L, "y")).toDF("pid", "name")
    val acts = Seq((42L, 10L), (42L, 30L), (7L, 5L))
      .toDF("pid", "s")
      .select(col("pid"), timestamp_micros(col("s") * 1000000L).as("ts"))
    val out = Governance.subjectAccessReport(42L, Seq(
        ("acts", acts, "pid", Some("ts")),
        ("people", people, "pid", None)))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(out === Seq(
      ("acts", 2L, 10000000L, 30000000L),
      ("people", 1L, -1L, -1L)))
    intercept[IllegalArgumentException] {
      Governance.subjectAccessReport(42L, Seq.empty)
    }
  }
}
