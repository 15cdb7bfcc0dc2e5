package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-governance audits — the operational queries a 100 TB corpus
  * answers to regulators and retention policy, not to training: how
  * much data a subject-deletion request touches across tables, and
  * how much of a table a TTL would purge. Both are AUDIT-FIRST
  * (plan-then-verify, the compaction-planner contract): the report is
  * a queryable frame reviewed BEFORE any destructive rewrite, and the
  * actual purge is a broadcast anti-join the caller applies per table
  * — for incremental snapshots, [[graft.etl.Pipeline.purgeApply]]
  * executes it bucket-pruned, and its (nBefore, nPurged) return is
  * predicted exactly by this audit's counts.
  */
object Governance {

  /** Subject-access report — the data-subject-request read that comes
    * BEFORE [[purgeAudit]]/purge: for one subject key, how many rows
    * each table holds and the event-time span they cover, in one
    * bounded table a DSR response can quote. Each input is
    * (table_name, df, keyCol, tsCol or null); per table ONE
    * key-filtered aggregate — the key predicate pushes to the scan
    * (PushedFilters), so at 100 TB each table contributes a pruned
    * scan and a 1-row fold, and the report is |tables| rows.
    *
    * @return (table_name, n_rows, first_us, last_us) — ts columns
    *         absent → NULL span — ordered by table_name. */
  def subjectAccessReport(subject: Long,
                          tables: Seq[(String, DataFrame, String, Option[String])]): DataFrame = {
    require(tables.nonEmpty, "subjectAccessReport needs at least one table")
    tables.map { case (name, df, keyCol, tsCol) =>
      val base = df.filter(col(keyCol) === subject)
      val span = tsCol match {
        case Some(ts) => Seq(
          min(unix_micros(col(ts).cast("timestamp"))).as("first_us"),
          max(unix_micros(col(ts).cast("timestamp"))).as("last_us"))
        case None => Seq(lit(null).cast("long").as("first_us"),
          lit(null).cast("long").as("last_us"))
      }
      base.agg(count(lit(1)).as("n_rows"), span: _*)
        .select(lit(name).as("table_name"), col("n_rows"),
          col("first_us"), col("last_us"))
    }.reduce(_ unionByName _).orderBy("table_name")
  }

  /** Subject-deletion (right-to-be-forgotten) PROPAGATION audit: for
    * each (table, key column) pair, how many rows the id list touches
    * — the blast-radius report a deletion request gets answered with
    * before any rewrite runs (a 0-matched table in the report is also
    * evidence: the subject key does not propagate there, documented,
    * not assumed). One row per audited table with exact counts and
    * integer ppm share.
    *
    * Shape: per table ONE aggregate over a broadcast LEFT-SEMI-style
    * membership test — `ids` is a deletion request (thousands, not
    * millions) so it broadcasts; the fact tables are scanned once
    * each, count-only, nothing shuffles but the 1-row summaries. The
    * actual purge is `table.join(broadcast(ids), keys, "left_anti")`
    * — same plan shape, certified by the audit's counts (purged =
    * n_rows − n_matched).
    *
    * @param tables (table_name, frame, key column) per audited table
    * @param ids one-column frame of subject ids to delete
    * @return (table_name, n_rows, n_matched, matched_ppm) ordered by
    *         table_name. */
  def purgeAudit(tables: Seq[(String, DataFrame, String)],
                 ids: DataFrame): DataFrame = {
    require(tables.nonEmpty, "purgeAudit needs at least one table")
    require(ids.columns.length == 1,
      s"ids must be a one-column frame, got ${ids.columns.toSeq}")
    val idCol = ids.columns.head
    val key = ids.select(col(idCol).as("__k")).distinct()
    tables.map { case (name, df, keyCol) =>
      df.join(broadcast(key), col(keyCol) === col("__k"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("__k").isNotNull, 1L).otherwise(0L)).as("n_matched"))
        .select(lit(name).as("table_name"), col("n_rows"), col("n_matched"),
          when(col("n_rows") === 0L, lit(0L))
            .otherwise(expr("(n_matched * 1000000) div n_rows"))
            .as("matched_ppm"))
    }.reduce(_ unionByName _).orderBy("table_name")
  }

  /** Retention/TTL audit: per 30-day age bucket (age measured back
    * from `asOf`), the row count and how much of it a `ttlDays`
    * policy would purge — the "what does this retention policy
    * actually delete" report, reviewed before the rewrite. Buckets
    * are exact integer `age div 30`; the purge flag is the half-open
    * rule age ≥ ttlDays (a row exactly at the boundary purges —
    * retention windows are conventionally exclusive of the boundary
    * day). Anomalous rows surface in sentinel buckets rather than
    * blending with real data: NULL timestamps in bucket −1, and
    * FUTURE-dated rows (age < 0 — clock skew, bad parses past `asOf`)
    * in bucket −2, both with purge 0 — each needs a POLICY decision,
    * not a silent default (trunc division would otherwise have mixed
    * skewed rows into bucket 0 alongside the freshest data).
    *
    * Shape: ONE map-side-combined aggregation keyed by the bucket —
    * the report is (max age)/30 + 2 rows, never data-scale.
    *
    * @return (age_bucket, n_rows, purged, purge_ppm) ordered. */
  def ttlAudit(df: DataFrame, tsCol: String, ttlDays: Long,
               asOf: String): DataFrame = {
    require(ttlDays > 0, s"ttlDays ($ttlDays) must be > 0")
    val age = datediff(to_date(lit(asOf)), to_date(col(tsCol))).cast("long")
    df.select(age.as("__age"))
      .select(
        when(col("__age").isNull, lit(-1L))
          .when(col("__age") < 0L, lit(-2L))
          .otherwise(expr("__age div 30")).as("age_bucket"),
        when(col("__age").isNotNull && col("__age") >= ttlDays, 1L)
          .otherwise(0L).as("__purge"))
      .groupBy("age_bucket")
      .agg(count(lit(1)).as("n_rows"), sum("__purge").as("purged"))
      .select(col("age_bucket"), col("n_rows"), col("purged"),
        expr("(purged * 1000000) div n_rows").as("purge_ppm"))
      .orderBy("age_bucket")
  }
}
