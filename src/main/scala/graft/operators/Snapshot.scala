package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — dataset versioning's core primitive: which
  * keys were added, removed, or changed between two corpus drops.
  * The reference's upsert sink (etl_connector.py load stage, key-based
  * last-write-wins) answers "what is current"; diff answers "what
  * moved", which is what incremental reprocessing and audit trails
  * consume.
  */
object Snapshot {

  /** Keyed diff of two snapshots: (key, status) for every key whose
    * status is `added` (new only), `removed` (old only) or `changed`
    * (both, fingerprint differs). Unchanged keys are dropped — at
    * 100 TB the overwhelmingly common case, and the reason the output
    * is a delta, not a copy.
    *
    * Rows are compared by md5 over the U+0001-joined value columns,
    * computed SCAN-SIDE: only (key, 32-char fp) pairs ever reach the
    * full-outer join's shuffle, so the network cost is keys, not rows.
    * With both snapshots bucketed on the key ([[graft.core.Layout
    * .writeBucketed]]) the join is zero-Exchange. Caveat of the
    * separator-join fingerprint: NULL and '' are indistinguishable
    * (concat_ws skips nulls) — acceptable for change DETECTION;
    * pair with [[graft.etl.Pipeline]] quarantine flows if null-vs-
    * empty must round-trip. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
           valCols: Seq[String]): DataFrame = {
    require(valCols.nonEmpty, "diff needs at least one value column")
    def fp(df: DataFrame, out: String) = df.select(
      col(keyCol).as("__k"),
      md5(concat_ws("\u0001", valCols.map(col): _*)).as(out))
    fp(oldDf, "__ofp").join(fp(newDf, "__nfp"), Seq("__k"), "full_outer")
      .withColumn("status",
        when(col("__ofp").isNull, lit("added"))
          .when(col("__nfp").isNull, lit("removed"))
          .when(col("__ofp") =!= col("__nfp"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("__k").as(keyCol), col("status"))
      .orderBy(keyCol, "status")
  }

  /** Bucket-checksum sync plan — anti-entropy repair's first read:
    * which of N key-buckets differ between two snapshots, WITHOUT
    * shuffling a single row. [[diff]] answers "which keys moved" and
    * pays a (key, fp) full-outer shuffle for it; at 100 TB the
    * question asked first is cheaper — "is anything out of sync, and
    * if so where do I re-ship" — and this answers it with two
    * scan-side passes: each row contributes an order-independent
    * 60-bit md5 digest (exact decimal SUM — commutative, so
    * partitioning and row order cannot change the checksum) to its
    * md5-assigned bucket, each side collapses to ≤N (bucket, count,
    * checksum) rows with map-side combine, and the plan is the
    * ≤N-row full-outer join of the two summaries. Re-sync exactly the
    * buckets with `in_sync = 0` — the rsync/Merkle-tier read between
    * "compare totals" (one bucket) and [[diff]] (every key).
    *
    * Checksums publish mod 10¹⁸ (BIGINT-exact in any engine; the sum
    * itself accumulates in DECIMAL(38,0), never floats). Same
    * fingerprint caveat as [[diff]]: concat_ws skips NULLs, so NULL
    * and '' are indistinguishable — acceptable for sync detection.
    * Value columns fingerprint through their string cast; keep
    * cross-engine-stable types (string/integer) in `valCols` when the
    * plan must be replayed by another engine.
    *
    * @return (bucket, n_old, n_new, old_checksum, new_checksum,
    *         in_sync) one row per occupied bucket, ordered. */
  def bucketChecksumPlan(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                         valCols: Seq[String], nBuckets: Int = 32): DataFrame = {
    require(valCols.nonEmpty, "bucketChecksumPlan needs at least one value column")
    require(nBuckets >= 1, s"nBuckets ($nBuckets) must be >= 1")
    def side(df: DataFrame, n: String, c: String) = df.select(
        conv(substring(md5(concat_ws("\u0001",
          (col(keyCol) +: valCols.map(col)): _*)), 1, 15), 16, 10)
          .cast("decimal(38,0)").as("__d"),
        pmod(conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(nBuckets.toLong)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as(n), sum("__d").as(c))
    side(oldDf, "n_old", "__co")
      .join(side(newDf, "n_new", "__cn"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        expr("CAST(coalesce(__co, 0) % 1000000000000000000 AS BIGINT)")
          .as("old_checksum"),
        expr("CAST(coalesce(__cn, 0) % 1000000000000000000 AS BIGINT)")
          .as("new_checksum"))
      .withColumn("in_sync",
        when(col("n_old") === col("n_new")
          && col("old_checksum") === col("new_checksum"), 1L).otherwise(0L))
      .orderBy("bucket")
  }

  /** CDC changelog apply: collapse an ordered stream of per-key
    * upsert ('U') and delete ('D') operations into the final table
    * state — last operation per key wins, and a key whose last
    * operation is a delete is ABSENT from the output. The
    * generalization of the reference's last-write-wins upsert
    * (etl_connector.py:167-191 has no tombstones; Debezium-style
    * changelogs do), and [[diff]]'s inverse: diff derives a changelog
    * from two snapshots, this replays a changelog into a snapshot.
    *
    * Winner selection is ONE map-side-combinable max(struct(ts, seq,
    * op, payload…)) aggregate per key — no window, no sort, no
    * row_number: at 100 TB the shuffle carries one candidate row per
    * key per map task, not the full history (the same champion
    * discipline as the funnel chain). (ts, seq) must totally order a
    * key's operations; seq breaks same-timestamp races
    * deterministically.
    *
    * @param payloadCols carried into the surviving state
    * @return (key, payloadCols…, op_ts, op_seq) — one row per live
    *         key, ordered by key. */
  def cdcApply(changelog: DataFrame, keyCol: String, tsCol: String,
               seqCol: String, opCol: String,
               payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "cdcApply needs at least one payload column")
    val champ = struct(
      col(tsCol).as("ts") +: col(seqCol).as("seq") +: col(opCol).as("op") +:
        payloadCols.map(c => col(c).as(c)): _*)
    changelog
      .groupBy(col(keyCol))
      .agg(max(champ).as("__w"))
      .filter(col("__w.op") =!= "D")
      .select(col(keyCol) +:
        payloadCols.map(c => col(s"__w.$c").as(c)) :+
        col("__w.ts").as("op_ts") :+ col("__w.seq").as("op_seq"): _*)
      .orderBy(keyCol)
  }
}
