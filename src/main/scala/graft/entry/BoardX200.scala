package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, TextAnalysis}
import graft.entry.EntryLib.{weightedContainmentOracle, weightedPrefixPlanOracle}

/** Board segment: capability rows x208+ — query registrations and their
  * DuckDB oracle texts, concatenated into the driver contract by
  * [[graft.SparkEntry]] (which documents the rules; EntrySpec pins
  * the 1:1 id/alias/oracle-key invariants across segments). */
private[graft] object BoardX200 {

  /** x208's probe corpus: every ≥16-token document split into two
    * "pages" sharing an 8-token boundary region — the pagination
    * artifact [[Dedup.tailHeadStitch]] exists to detect, derived
    * DETERMINISTICALLY from `documents` (array slices on the split
    * token list) so DuckDB replays the construction exactly. Page ids
    * are 2·doc_id / 2·doc_id+1: collision-free and reversible. The
    * raw corpus has no tail==head pairs at overlap 8 (probed at all
    * three scales), so an un-derived registration would certify the
    * operator on an empty result — this one stitches ~2·|long docs|
    * pages back together, plus the cross-doc matches the corpus'
    * near-dup clusters contribute (n_heads > 1 rows). */
  private def splitPages(s: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= 16)
      .select(col("doc_id"), col("ts"),
        size(col("ts")).cast("long").as("n"))
      .withColumn("h", expr("n div 2"))
    t.select((col("doc_id") * 2).as("doc_id"),
        array_join(slice(col("ts"), lit(1), (col("h") + lit(4)).cast("int")), " ")
          .as("text"))
      .unionByName(t.select((col("doc_id") * 2 + 1).as("doc_id"),
        array_join(slice(col("ts"), (col("h") - lit(3)).cast("int"),
          (col("n") - col("h") + lit(4)).cast("int")), " ").as("text")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // directed tail→head stitch pairs over the split-page corpus —
    // exact literal-text join key, n_heads is the boilerplate alarm
    "x208_tail_head_stitch" -> ((s, d) =>
      Dedup.tailHeadStitch(splitPages(s, d), overlapTokens = 8)),
    // doc-INITIAL shared-prefix boilerplate report — the positional
    // signal global n-gram counts wash out; exact prefix text keys
    "x209_boilerplate_prefix" -> ((s, d) =>
      TextAnalysis.boilerplatePrefixReport(Tables.documents(s, d),
        prefixTokens = 4, minDocs = 2)),
    // weighted PPJoin: prefix-filtered IDF-weighted containment at
    // the operating point x211's WEIGHTED planner recommends for this
    // corpus (k=4: weighted prefix mass 140k vs 1.04M at x103's k=3,
    // measured at sf0.1) — same oracle FORM as x103 at its own k
    // (candidate recall 1.0 + exact verification ⇒ bit-identical to
    // the naive plan at the same operating point; DedupSpec pins the
    // k=3 equivalence by direct comparison), the x74/x65 discipline
    "x210_wcontain_prefix" -> ((s, d) =>
      Dedup.weightedContainmentPairsPrefix(Tables.documents(s, d),
        shingleK = 4, minPermille = 900)),
    // weighted prefix-filter operating-point planner — prices the
    // weighted prefix the x210 plan actually joins, per candidate k
    "x211_wprefix_plan" -> ((s, d) =>
      Dedup.weightedPrefixFilterPlan(Tables.documents(s, d),
        shingleKs = Seq(2, 3, 4, 5), minPermille = 500)),
    // x202's 100 TB form: IVF cell probe pools the neighbors, exact
    // cosine rescoring inside the pool, identical audit tail — rule-6
    // no_oracle (KMeans quantizer; SimilaritySpec pins full-probe
    // equivalence to the exact audit row for row)
    "x212_knn_audit_ann" -> ((s, d) =>
      graft.operators.Similarity.knnLabelAuditAnn(
        Tables.embeddings(s, d).filter(col("vec_id") < 100),
        Tables.embeddings(s, d), k = 10, nlist = 16, nprobe = 4)),
  )

  def oracleSql: Map[String, String] = Map(
    // x208: the identical split-page construction (list slices), then
    // tail/head keys as literal rejoined text, head-key df as n_heads
    "x208_tail_head_stitch" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
             FROM documents WHERE text IS NOT NULL),
         lg AS (SELECT doc_id, ts, len(ts) AS n, len(ts) // 2 AS h
             FROM t WHERE len(ts) >= 16),
         parts AS (
           SELECT doc_id * 2 AS doc_id, ts[1:h+4] AS ts FROM lg
           UNION ALL
           SELECT doc_id * 2 + 1 AS doc_id, ts[h-3:n] AS ts FROM lg),
         b AS (SELECT doc_id, ts FROM parts WHERE len(ts) >= 8),
         heads AS (SELECT doc_id AS doc_b,
             array_to_string(ts[1:8], ' ') AS k FROM b),
         tails AS (SELECT doc_id AS doc_a,
             array_to_string(ts[len(ts)-7:len(ts)], ' ') AS k FROM b),
         hd AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_heads
             FROM heads GROUP BY k)
         SELECT doc_a, doc_b, CAST(8 AS BIGINT) AS overlap_tokens, n_heads
         FROM tails JOIN heads USING (k) JOIN hd USING (k)
         WHERE doc_a <> doc_b
         ORDER BY doc_a, doc_b""",
    // x209: full-prefix docs only, prefix-keyed counts, ppm of the
    // qualifying-doc total by trunc division
    "x209_boilerplate_prefix" ->
      """WITH t AS (SELECT string_split(text, ' ') AS ts
             FROM documents WHERE text IS NOT NULL),
         b AS (SELECT array_to_string(ts[1:4], ' ') AS prefix
             FROM t WHERE len(ts) >= 4),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM b),
         g AS (SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs
             FROM b GROUP BY prefix HAVING COUNT(*) >= 2)
         SELECT prefix, n_docs,
           CAST((n_docs * 1000000) // tt AS BIGINT) AS share_ppm
         FROM g, tot ORDER BY n_docs DESC, prefix""",
    // x210: x103's oracle FORM at the x211-recommended k=4 — the
    // prefix filter must not move a single row vs the naive plan
    "x210_wcontain_prefix" -> weightedContainmentOracle(4, 900),
    // x211: per-k weighted-prefix masses + closed-form recommendation
    "x211_wprefix_plan" -> weightedPrefixPlanOracle(Seq(2, 3, 4, 5), 500),
  )
}
