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

  test("cdcApply: last op wins, tombstones delete, seq breaks ts ties") {
    val log = Seq(
      (1L, 10L, 1L, "U", "a"), (1L, 20L, 2L, "U", "b"), // k1 → b
      (2L, 10L, 3L, "U", "a"), (2L, 20L, 4L, "D", "-"), // k2 deleted
      (3L, 10L, 5L, "D", "-"), (3L, 20L, 6L, "U", "c"), // k3 resurrected
      (4L, 50L, 7L, "U", "x"), (4L, 50L, 8L, "D", "-")) // same ts: seq 8 wins
      .toDF("k", "ts_us", "seq", "op", "payload")
    val out = Snapshot.cdcApply(log, "k", "ts_us", "seq", "op",
      Seq("payload")).as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq((1L, "b", 20L, 2L), (3L, "c", 20L, 6L)))
    intercept[IllegalArgumentException] {
      Snapshot.cdcApply(log, "k", "ts_us", "seq", "op", Seq.empty)
    }
  }

  test("cdcApply output equals a window-rank replay (champion agg ≡ sort)") {
    // randomized-ish larger case: the max(struct) champion must agree
    // with the explicit row_number formulation the oracle uses
    val log = (1 to 200).map { i =>
      (i % 7L, (i * 13 % 50).toLong, i.toLong,
        if (i % 10 == 0) "D" else "U", s"p$i")
    }.toDF("k", "ts_us", "seq", "op", "payload")
    val out = Snapshot.cdcApply(log, "k", "ts_us", "seq", "op",
      Seq("payload")).as[(Long, String, Long, Long)].collect().toSeq
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val w = Window.partitionBy("k")
      .orderBy(col("ts_us").desc, col("seq").desc)
    val replay = log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select("k", "payload", "ts_us", "seq")
      .orderBy("k").as[(Long, String, Long, Long)].collect().toSeq
    assert(out === replay)
  }

  test("bucketChecksumPlan: identical snapshots all in_sync; edits/drops/adds flag exactly their buckets") {
    import org.apache.spark.sql.functions.col
    val base = (1L to 200L).map(i => (i, s"name$i", s"seg${i % 5}"))
      .toDF("k", "name", "seg")
    // identical snapshots: every bucket in sync, counts equal,
    // checksums equal — and the checksum is ORDER-INDEPENDENT
    // (repartitioned/reversed input lands the same sums)
    val same = Snapshot.bucketChecksumPlan(
      base, base.repartition(7).orderBy(col("k").desc), "k", Seq("name", "seg"), 8)
      .collect()
    assert(same.length === 8 && same.forall(_.getLong(5) === 1L))
    assert(same.forall(r => r.getLong(1) === r.getLong(2)
      && r.getLong(3) === r.getLong(4)))
    // one edit, one drop, one add → only the touched buckets differ
    val changed = base
      .withColumn("seg",
        org.apache.spark.sql.functions.when(col("k") === 42L,
          org.apache.spark.sql.functions.lit("EDITED")).otherwise(col("seg")))
      .filter(col("k") =!= 99L)
      .unionByName(Seq((1000L, "new", "seg0")).toDF("k", "name", "seg"))
    val plan = Snapshot.bucketChecksumPlan(base, changed, "k",
      Seq("name", "seg"), 8).collect()
    val bad = plan.filter(_.getLong(5) === 0L).map(_.getLong(0)).toSet
    // buckets of keys 42 (edit), 99 (drop), 1000 (add), md5-derived
    def bucket(k: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 8
    }
    assert(bad === Set(42L, 99L, 1000L).map(bucket))
    intercept[IllegalArgumentException] {
      Snapshot.bucketChecksumPlan(base, base, "k", Seq.empty, 8)
    }
  }
}
