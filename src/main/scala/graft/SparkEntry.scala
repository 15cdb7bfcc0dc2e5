package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.queries.Relational

/** Driver contract — SURVEY.md §2.4 queries + LLM-pipeline extension
  * operators, each paired with DuckDB oracle SQL where the semantics
  * are cross-engine-expressible (rows-only check otherwise, per the
  * driver protocol).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan + filter + multi-key hash agg (SURVEY §2.4 Q9). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q09Tpch1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Twelve entries are deliberately `no_oracle` (SURVEY §2.4 rule 6 —
    * their outputs depend on engine-specific hash seeds, trained
    * models, or sketch internals no cross-engine SQL can replay).
    * Each one's correctness is carried by a named Spark-side spec:
    *
    *  - x10_ann_lsh — hyperplane-LSH top-k; recall of the SHIPPED
    *    config certified by RecallSpec "x29: shipped LSH top-k recall
    *    clears its floor" (via the x29 scalar below).
    *  - x20_approx_distinct — HLL++ sketch; SkewSpec
    *    "approx_count_distinct lands within the 2% error bound (x20)".
    *  - x23_embed_neardup — LSH near-dup pairs; RecallSpec "x31:
    *    near-dup pair recall at the shipped x23 parameters is total".
    *  - x25_ivf_topk — Spark-ML-KMeans cell probe; RecallSpec "x30:
    *    shipped IVF top-k recall clears its floor" (via x30).
    *  - x29/x30/x31_recall_* — the certification scalars themselves
    *    (recall of shipped ANN configs vs exact in-Spark baselines);
    *    floors asserted by the three RecallSpec cases above.
    *  - x37_heavy_hitters_cms — count-min sketch; TextAnalysisSpec
    *    "heavyHittersCms: no false negatives vs exact; estimates
    *    within eps*N".
    *  - x78_incremental_distinct — mergeable HLL states;
    *    IncrementalSpec "HLL distinct states merge losslessly: split
    *    == one-shot, error bounded".
    *  - x179_pane_distinct — HLL pane sketches; IncrementalSpec
    *    "paneSlidingDistinct: pane-union ≡ direct window sketch,
    *    exact at spec scale".
    *  - x212_knn_audit_ann — IVF-pooled label audit (Spark-ML KMeans
    *    quantizer); SimilaritySpec "knnLabelAuditAnn: full probe
    *    equals the exact audit" pins the nprobe = nlist row-for-row
    *    equivalence to the oracle-certified x202.
    *  - x230_mutual_topk_ann — √n-auto-sized IVF reciprocal-NN;
    *    SimilaritySpec pins it ≡ the oracle-certified exact x215 at
    *    nprobe = nlist.
    */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val segs = Seq(graft.entry.BoardQ.queries, graft.entry.BoardX000.queries,
      graft.entry.BoardX050.queries, graft.entry.BoardX100.queries,
      graft.entry.BoardX150.queries, graft.entry.BoardX200.queries,
      graft.entry.BoardX250.queries, graft.entry.BoardX300.queries)
    val all = segs.reduce(_ ++ _)
    // a duplicate id across segments would silently drop a query from
    // the board — fail loudly instead (EntrySpec pins the exact count)
    require(all.size == segs.map(_.size).sum,
      s"duplicate query ids across board segments: ${
        segs.flatMap(_.keys).groupBy(identity).collect { case (k, v) if v.size > 1 => k }.toSeq.sorted.mkString(", ")}")
    all
  }

  /** DuckDB oracle SQL, same parquet tables. Column aliases match the
    * Spark output column names exactly (driver sorts columns by name
    * before hashing). Keys absent here → rows-only check. */
  lazy val oracleSql: Map[String, String] = {
    val segs = Seq(graft.entry.BoardQ.oracleSql, graft.entry.BoardX000.oracleSql,
      graft.entry.BoardX050.oracleSql, graft.entry.BoardX100.oracleSql,
      graft.entry.BoardX150.oracleSql, graft.entry.BoardX200.oracleSql,
      graft.entry.BoardX250.oracleSql, graft.entry.BoardX300.oracleSql)
    val all = segs.reduce(_ ++ _)
    require(all.size == segs.map(_.size).sum,
      s"duplicate oracle ids across board segments: ${
        segs.flatMap(_.keys).groupBy(identity).collect { case (k, v) if v.size > 1 => k }.toSeq.sorted.mkString(", ")}")
    require((all.keySet -- queries.keySet).isEmpty,
      s"oracle keys with no query: ${(all.keySet -- queries.keySet).toSeq.sorted.mkString(", ")}")
    all
  }
}
