package graft

import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, String)*) =
    rows.toDF("k", "a", "b")

  test("diff classifies added / removed / changed and drops unchanged") {
    val old = snap((1L, "x", "y"), (2L, "x", "y"), (3L, "x", "y"))
    val neu = snap((2L, "x", "CHANGED"), (3L, "x", "y"), (4L, "x", "y"))
    val out = Snapshot.diff(old, neu, "k", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "removed", 2L -> "changed", 4L -> "added"))
  }

  test("diff separator prevents cross-column value smearing") {
    // ("ab","c") vs ("a","bc") must NOT collide into 'unchanged'
    val old = snap((1L, "ab", "c"))
    val neu = snap((1L, "a", "bc"))
    val out = Snapshot.diff(old, neu, "k", Seq("a", "b")).collect()
    assert(out.length === 1 && out.head.getString(1) === "changed")
  }

  test("diff fingerprints are computed scan-side (only key+fp shuffle)") {
    // parquet-backed input: a LocalRelation would constant-fold the
    // fingerprints away and prove nothing about the scan-side shape
    val docs = graft.core.Tables.documents(spark, sf)
    val plan = Snapshot.diff(docs, docs.limit(10), "doc_id", Seq("text"))
      .queryExecution.optimizedPlan.toString
    // the md5 projection must sit BELOW the join in the optimized plan
    val joinIdx = plan.indexOf("Join FullOuter")
    val md5Idx = plan.indexOf("md5")
    assert(joinIdx >= 0 && md5Idx > joinIdx,
      s"md5 fingerprint should be computed under the join:\n$plan")
    // and the join inputs carry only (key, fp) — the text column never
    // reaches the shuffle
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("AS status"),
      "sanity: substring starts at the join")
  }
}
