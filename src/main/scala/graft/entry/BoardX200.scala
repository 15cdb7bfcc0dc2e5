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
    // metadata-vs-content agreement: Cohen's kappa between the
    // declared lang column and the x05 marker-token language guess —
    // kappa near 0 means the metadata must not stratify a mixture
    "x213_lang_kappa" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.operators.Profiling.cohenKappa(
        docs.select(col("doc_id"), col("lang"))
          .join(TextAnalysis.languageIdDefault(docs), Seq("doc_id")),
        "lang", "pred_lang")
    },
    // reciprocal-NN pairs over the full embedding corpus — the
    // asymmetry filter that keeps hub edges out of semantic-dedup
    // pair sets; one exact top-k pass, eagerly materialized, semi-join
    "x215_mutual_topk" -> ((s, d) =>
      graft.operators.Similarity.mutualTopK(Tables.embeddings(s, d), k = 5)),
    // x215's 100 TB form: the per-vector top-k pools from the IVF
    // cell probe with √n-sized cells (fixed nlist stays quadratic —
    // measured 18.6× at 10×; auto-sizing keeps pool mass ~n^1.5),
    // identical mutuality tail — rule-6 no_oracle (KMeans quantizer;
    // SimilaritySpec pins nprobe=nlist ≡ x215)
    "x230_mutual_topk_ann" -> ((s, d) =>
      graft.operators.Similarity.mutualTopKAnn(Tables.embeddings(s, d),
        k = 5)),
    // per-cluster quality audit of the x07/x34 near-dup graph —
    // density (mined vs possible pairs) + min/mean pair similarity,
    // the clique-vs-chain read at cluster granularity
    "x216_cluster_quality" -> ((s, d) =>
      Dedup.clusterQualityReport(
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2,
          minPermille = 300))),
    // per-source exact-dedup attrition — which feed loses most to
    // global dedup; digests shuffle, bodies never
    "x217_dedup_attrition" -> ((s, d) =>
      Dedup.dedupAttrition(Tables.documents(s, d))),
    // rank-biased overlap between a BM25 ranking and its length-
    // normalization-off twin — top-weighted list agreement in exact
    // integer micro (truncating weight recurrence, no pow/libm)
    "x218_rank_rbo" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      def ranked(b: Double) =
        graft.operators.Retrieval.bm25TopK(docs,
          Seq("vector", "stream", "join"), k = 20, b = b)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("score_milli").desc, col("doc_id"))))
      graft.operators.Retrieval.rankBiasedOverlap(
        ranked(0.75), ranked(0.0))
    },
    // token-budget corpus cut: highest-priority docs until 50k tokens
    // — threshold find over the bounded priority-value table, only
    // the single boundary class pays a per-doc running sum
    "x219_budget_cut" -> ((s, d) =>
      graft.operators.Sampling.budgetCut(Tables.documents(s, d), 50000L)),
    // per-user burstiness: Fano factor of daily event counts — the
    // bot-vs-human activity-shape signal; exact integer micro
    "x220_burstiness" -> ((s, d) =>
      graft.operators.Behavior.dispersionIndex(Tables.events(s, d))),
    // cross-source quantile calibration of doc length — the mapping
    // table that lets one global threshold treat every source's p-th
    // percentile alike; windows only over bounded value tables
    "x221_quantile_calibrate" -> ((s, d) =>
      graft.operators.Profiling.quantileCalibrate(Tables.documents(s, d),
        "source", "n_chars")),
    // embedding-column hygiene pre-flight over the corpus PLUS four
    // planted anomalies (null/empty/NaN/zero-norm-ragged — the raw
    // corpus is clean, and an all-zero audit would certify the
    // operator on nothing; the x208 derived-corpus discipline)
    "x214_embed_hygiene" -> { (s, d) =>
      import s.implicits._
      val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val planted = Seq(
        (-1L, null.asInstanceOf[Array[Float]]),
        (-2L, Array.empty[Float]),
        (-3L, Array(Float.NaN, 1.0f)),
        (-4L, Array(0.0f, 0.0f, 0.0f))
      ).toDF("vec_id", "embedding")
      graft.operators.Similarity.embeddingHygiene(base.unionByName(planted))
    },
    // semantic decontamination: every corpus vector's nearest
    // BENCHMARK vector (vec_id % 25 = 0 plays the eval suite) + flag
    // at τ=400‰ — benchmark broadcasts, corpus scored in place, one
    // map-side max(struct) argmax; the embedding-space sibling of x41
    "x222_semantic_decon" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.operators.Similarity.semanticDecontamination(
        emb.filter(col("vec_id") % 25 =!= 0),
        emb.filter(col("vec_id") % 25 === 0), tauPermille = 400)
    },
    // mixture epoch planner: 4-source target mixture against the
    // corpus' available tokens under a 20k budget — src0 is data-
    // constrained (cap bites), srczz is missing (NULL epochs, full
    // shortfall); exact integers, one token-sum scan
    "x223_epoch_plan" -> ((s, d) =>
      graft.operators.Sampling.mixtureEpochPlan(Tables.documents(s, d),
        Seq(("src0", 400000L), ("src1", 300000L), ("src2", 200000L),
          ("srczz", 100000L)),
        budgetTokens = 20000L, maxEpochsMilli = 4000L)),
    // exact tie-corrected ROC-AUC of doc length predicting exact-dup
    // membership — "is my cheap signal worth gating on", the audit
    // every filter threshold owes; midranks over the value-bounded
    // distinct-length table
    "x224_rank_auc" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // n_chars-null rows drop BEFORE the dup window so both engines
      // label over the same row set (the oracle's WHERE runs first);
      // the window partitions by md5(text), not raw text — identical
      // groups (same text ⇒ same digest; NULLs group together either
      // way), but digests shuffle, bodies never (the x01 discipline)
      val lbl = Tables.documents(s, d)
        .filter(col("n_chars").isNotNull)
        .withColumn("is_dup",
          when(count(lit(1)).over(Window.partitionBy(md5(col("text")))) > 1, 1L)
            .otherwise(0L))
      graft.operators.Profiling.rankAuc(lbl, "n_chars", "is_dup")
    },
    // source novelty curve: vocabulary attribution over the
    // alphabetical source walk — which feed still adds language,
    // which only repeats its predecessors'
    "x225_source_novelty" -> ((s, d) =>
      TextAnalysis.sourceNoveltyReport(Tables.documents(s, d))),
    // duplicate re-arrival gap ladder at (user, type) identity — the
    // measurement that sizes a streaming dedup window; cum_ppm row =
    // "this window catches this share of re-deliveries"
    "x226_dup_arrival" -> ((s, d) =>
      graft.operators.Sessions.dupArrivalProfile(Tables.events(s, d),
        keyCols = Seq("user_id", "event_type"))),
    // per-user event-type entropy — activity DIVERSITY next to x220's
    // activity SHAPE; integer micronat terms, no float Σ-order haze
    "x227_type_entropy" -> ((s, d) =>
      graft.operators.Behavior.eventTypeEntropy(Tables.events(s, d),
        minEvents = 5L)),
    // quantization-recall audit: exact top-5 on float vs int8-image
    // embeddings, per-probe overlap — "does the 4×-smaller index
    // return the same neighbors", measured on the shipped quantizer
    "x228_quant_recall" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.operators.Similarity.quantizationRecall(
        emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    // Kendall τ between x218's two BM25 rankings — the uniform-weight
    // pair-agreement number next to RBO's top-weighted one
    "x229_kendall_tau" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      def ranked(b: Double) =
        graft.operators.Retrieval.bm25TopK(docs,
          Seq("vector", "stream", "join"), k = 20, b = b)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("score_milli").desc, col("doc_id"))))
      graft.operators.Retrieval.kendallTau(ranked(0.75), ranked(0.0))
    },
    // pairwise source-vocabulary Jaccard — which FEEDS speak the same
    // language (syndication candidates for cross-source dedup); the
    // pair matrix next to x225's cumulative novelty walk
    "x231_src_vocab_overlap" -> ((s, d) =>
      TextAnalysis.sourceVocabOverlap(Tables.documents(s, d))),
    // token-weighted dedup attrition — x217 in the unit training
    // spends: which source loses TOKENS (coverage), not just docs
    "x232_token_attrition" -> ((s, d) =>
      Dedup.tokenAttrition(Tables.documents(s, d))),
    // per-label centroid geometry: member count, centroid cosine to
    // the global centroid, centroid norm — the class-separability
    // pre-flight before the k-NN label audits lean on these labels
    "x233_label_centroids" -> ((s, d) =>
      graft.operators.Similarity.labelCentroids(Tables.embeddings(s, d))),
    // per-source PII density over a PLANTED corpus (raw corpus has
    // zero regex hits at all three scales — the x214 derived-anomaly
    // discipline: doc_id%7 gets an email, else %11 a URL, both
    // deterministic concats DuckDB replays verbatim)
    "x234_pii_density" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val probed = docs.withColumn("text",
        when(col("text").isNotNull && col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact bob@example.com")))
          .when(col("text").isNotNull && col("doc_id") % 11 === 0,
            concat(col("text"), lit(" see https://data.example.com/item?id=7")))
          .otherwise(col("text")))
      TextAnalysis.piiDensityReport(probed)
    },
    // chunk-position duplication profile: dup share per 32-token chunk
    // index — header boilerplate vs whole-doc dup vs footer text, read
    // on the exact chunks an embedding pipeline would pay for
    "x235_chunk_dup_profile" -> ((s, d) =>
      TextAnalysis.chunkDupProfile(Tables.documents(s, d), chunkTokensN = 32)),
    // threshold-sensitivity histogram of the x07 near-dup pair set —
    // on this corpus the answer is BIMODAL (near-exact mass at 900+,
    // thin tail below), which is exactly the "nothing fragile near
    // the threshold" read a cutoff review wants; rides the 1.2s x07
    // mining (an exact k=2 sweep wide enough for more deciles costs
    // 24s of df² join mass at sf0.1 — measured and rejected; the
    // multi-decile walk is certified by DedupSpec's hand case)
    "x236_pair_jac_hist" -> ((s, d) =>
      Dedup.pairSimilarityHistogram(
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2,
          minPermille = 300))),
    // per-source hapax share — the gibberish/OCR smoke detector:
    // corpus-frequency-1 vocabulary share per feed, order-free
    "x237_hapax_share" -> ((s, d) =>
      TextAnalysis.hapaxShareReport(Tables.documents(s, d))),
    // dedup mixture shift: per-language corpus share before vs among
    // survivors — the "dedup is not free" bias audit feeding x223
    "x238_dedup_mixture_shift" -> ((s, d) =>
      Dedup.dedupMixtureShift(Tables.documents(s, d))),
    // batch-vs-store novelty per source (even docs play the standing
    // fingerprint store, odd docs the arriving batch) — the per-feed
    // "is this crawl still yielding" ingest-scheduler number
    "x239_batch_novelty" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.batchNoveltyReport(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0)
          .select(md5(col("text")).as("fp")))
    },
    // per-source unigram KL from the corpus mixture — the scalar "does
    // this feed's weight buy diversity" next to x231's pairwise sets;
    // every ln takes an integer count (the x227 micronat discipline)
    "x240_source_kl" -> ((s, d) =>
      TextAnalysis.sourceKlReport(Tables.documents(s, d))),
    // which feed fails which quality filter: x43's reason bitmask
    // rolled up per source — the filter-stage companion to x217's
    // dedup-stage attrition
    "x241_gate_attrition" -> ((s, d) =>
      TextAnalysis.gateAttrition(Tables.documents(s, d))),
    // arrival-order integrity per user over a PLANTED reordering
    // (every 97th event arrives a day late — the raw feed is perfectly
    // ordered at all three scales, and a zero-row audit would certify
    // nothing; the x208/x234 derived-fixture discipline)
    "x242_arrival_integrity" -> { (s, d) =>
      val ev = Tables.events(s, d)
      graft.operators.Sessions.arrivalIntegrity(
        ev.withColumn("ts",
          when(col("event_id") % 97 === 0,
            col("ts") - expr("INTERVAL 1 DAY")).otherwise(col("ts"))))
    },
    // band-bucket skew histogram at the x07 banding parameters — the
    // MEASURED candidate-mass distribution the closed-form x95 planner
    // assumes away; the open class firing is the salt-the-keys trigger
    "x243_band_bucket_skew" -> ((s, d) =>
      Dedup.bandBucketSkew(Tables.documents(s, d))),
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
    // x213: the x05 argmax CTEs + exact integer kappa (pe in HUGEINT,
    // trunc division matching Spark's div)
    "x213_lang_kappa" ->
      """WITH tok0 AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
         cnt AS (SELECT doc_id,
           COUNT(CASE WHEN tok = 'data' THEN 1 END) AS c0,
           COUNT(CASE WHEN tok = 'table' THEN 1 END) AS c1,
           COUNT(CASE WHEN tok = 'row' THEN 1 END) AS c2
           FROM tok0 GROUP BY doc_id),
         pred AS (SELECT doc_id,
           CASE WHEN c0 >= c1 AND c0 >= c2 THEN 'en'
                WHEN c1 >= c0 AND c1 >= c2 THEN 'fr' ELSE 'de' END AS pred_lang
           FROM cnt),
         j AS (SELECT d.lang AS a, p.pred_lang AS b
           FROM documents d JOIN pred p USING (doc_id)
           WHERE d.lang IS NOT NULL AND p.pred_lang IS NOT NULL),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN a = b THEN 1 END) AS BIGINT) AS agree FROM j),
         na AS (SELECT a AS k, COUNT(*) AS na FROM j GROUP BY 1),
         nb AS (SELECT b AS k, COUNT(*) AS nb FROM j GROUP BY 1),
         pe AS (SELECT COALESCE(SUM(na.na * nb.nb), 0) AS pesum
           FROM na JOIN nb USING (k)),
         r AS (SELECT n,
           CASE WHEN n > 0 THEN CAST((agree * 1000000) // n AS BIGINT) END AS po_ppm,
           CASE WHEN n > 0 THEN CAST((pesum * 1000000) // (n * n) AS BIGINT) END AS pe_ppm
           FROM tot, pe)
         SELECT n AS n_rows, po_ppm, pe_ppm,
           CAST(CASE WHEN pe_ppm = 1000000 OR n = 0 THEN NULL
                ELSE ((po_ppm - pe_ppm) * 1000000) // (1000000 - pe_ppm)
                END AS BIGINT) AS kappa_ppm
         FROM r""",
    // x215: the x202 dot/norm/rank spelling over ALL vector pairs,
    // then the reciprocal self-join on the rank-k table
    "x215_mutual_topk" ->
      """WITH v AS (SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xv
         FROM embeddings),
       s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_zip(a.xv, b.xv), p -> p[1] * p[2])),
             (x, y) -> x + y) AS d,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(a.xv, x -> x * x)), (x, y) -> x + y)) *
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(b.xv, x -> x * x)), (x, y) -> x + y)) AS n
         FROM v a, v b WHERE a.vec_id <> b.vec_id),
       r AS (SELECT query_id, neighbor_id,
           CAST(FLOOR((CASE WHEN n = 0 THEN 0.0 ELSE d / n END) * 1000
             + 0.5) AS BIGINT) AS cos_permille,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY (CASE WHEN n = 0 THEN 0.0 ELSE d / n END) DESC,
               neighbor_id) AS rank
         FROM s),
       t AS (SELECT query_id, neighbor_id, cos_permille
         FROM r WHERE rank <= 5)
       SELECT f.query_id AS da, f.neighbor_id AS db, f.cos_permille
       FROM t f JOIN t g
         ON f.query_id = g.neighbor_id AND f.neighbor_id = g.query_id
       WHERE f.query_id < f.neighbor_id
       ORDER BY da, db""",
    // x216: the x34 closure CTEs + per-cluster pair aggregation, all
    // trunc-div integer arithmetic
    "x216_cluster_quality" ->
      s"""WITH RECURSIVE ${EntryLib.minHashPairsCtes},
       sym AS (SELECT da AS s, db AS d FROM pairs
               UNION SELECT db AS s, da AS d FROM pairs),
       verts AS (SELECT DISTINCT s AS v FROM sym),
       reach AS (SELECT v AS a, v AS b FROM verts
                 UNION SELECT r.a, s.d FROM reach r JOIN sym s ON r.b = s.s),
       lab AS (SELECT a AS doc_id, MIN(b) AS cluster_id
               FROM reach GROUP BY a),
       sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size
              FROM lab GROUP BY 1),
       pc AS (SELECT l.cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(p.jac_permille) AS BIGINT) AS min_jac_permille,
           SUM(p.jac_permille) AS sj
         FROM pairs p JOIN lab l ON p.da = l.doc_id GROUP BY 1)
       SELECT CAST(s.cluster_id AS BIGINT) AS cluster_id, s.size,
         pc.n_pairs,
         CAST((pc.n_pairs * 2000000) // (s.size * (s.size - 1)) AS BIGINT)
           AS density_ppm,
         pc.min_jac_permille,
         CAST(pc.sj // pc.n_pairs AS BIGINT) AS mean_jac_permille
       FROM sz s JOIN pc ON s.cluster_id = pc.cluster_id
       ORDER BY cluster_id""",
    // x217: md5 fingerprints, min-id survivors, per-source counts —
    // NULL texts group as one fingerprint class in both engines
    "x217_dedup_attrition" ->
      """WITH fp AS (SELECT doc_id, source, md5(text) AS f FROM documents),
         surv AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f),
         per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(s.doc_id) AS BIGINT) AS n_survivors
           FROM fp LEFT JOIN surv s USING (doc_id) GROUP BY source)
         SELECT source, n_docs, n_survivors,
           n_docs - n_survivors AS n_dropped,
           CAST(((n_docs - n_survivors) * 1000000) // n_docs AS BIGINT)
             AS drop_ppm
         FROM per ORDER BY source""",
    // x218: the x47 scoring CTEs instantiated at b=.75 and b=0, ranks
    // replayed, then the integer pw recurrence and trunc-div RBO tail
    "x218_rank_rbo" ->
      """WITH RECURSIVE dl AS (SELECT doc_id,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS dl
           FROM documents),
         stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
         tf AS (SELECT doc_id, tok, COUNT(*) AS tf
           FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
           WHERE tok IN ('vector', 'stream', 'join') GROUP BY doc_id, tok),
         dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         s75 AS (SELECT tf.doc_id AS doc_id, CAST(FLOOR(SUM(
             ln(1 + (stats.n_docs - dfq.df + 0.5::DOUBLE) / (dfq.df + 0.5::DOUBLE))
             * tf.tf * (1.2::DOUBLE + 1)
             / (tf.tf + 1.2::DOUBLE * ((1 - 0.75::DOUBLE) + 0.75::DOUBLE * dl.dl / stats.avgdl))
           ) * 1000 + 0.5) AS BIGINT) AS sc
           FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
           GROUP BY tf.doc_id ORDER BY sc DESC, doc_id LIMIT 20),
         s0 AS (SELECT tf.doc_id AS doc_id, CAST(FLOOR(SUM(
             ln(1 + (stats.n_docs - dfq.df + 0.5::DOUBLE) / (dfq.df + 0.5::DOUBLE))
             * tf.tf * (1.2::DOUBLE + 1)
             / (tf.tf + 1.2::DOUBLE * ((1 - 0.0::DOUBLE) + 0.0::DOUBLE * dl.dl / stats.avgdl))
           ) * 1000 + 0.5) AS BIGINT) AS sc
           FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
           GROUP BY tf.doc_id ORDER BY sc DESC, doc_id LIMIT 20),
         r75 AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY sc DESC, doc_id) AS rank FROM s75),
         r0 AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY sc DESC, doc_id) AS rank FROM s0),
         pw AS (SELECT 1 AS d, 1000000 AS pw
                UNION ALL SELECT d + 1, (pw * 900) // 1000 FROM pw WHERE d < 20),
         j AS (SELECT GREATEST(a.rank, b.rank) AS m
               FROM r75 a JOIN r0 b USING (doc_id)),
         ov AS (SELECT d, pw,
             (SELECT COUNT(*) FROM j WHERE j.m <= pw.d) AS overlap FROM pw)
         SELECT CAST(20 AS BIGINT) AS depth,
           CAST((100 * (SELECT SUM((pw * overlap) // d) FROM ov)) // 1000
             AS BIGINT) AS rbo_micro""",
    // x219: priority-value weight table, running sum + boundary class
    // prefix fill by doc_id — trunc-exact integer throughout
    "x219_budget_cut" ->
      """WITH t AS (SELECT doc_id, n_chars AS priority,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
           FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL),
         w AS (SELECT priority, SUM(n_tokens) AS vtok FROM t GROUP BY priority),
         c AS (SELECT priority, vtok,
             SUM(vtok) OVER (ORDER BY priority DESC) AS cum FROM w),
         c2 AS (SELECT *, cum - vtok AS cumb FROM c),
         fullc AS (SELECT priority FROM c2 WHERE cum <= 50000),
         bnd AS (SELECT priority, 50000 - cumb AS r FROM c2
                 WHERE cumb < 50000 AND cum > 50000),
         s1 AS (SELECT t.doc_id, t.priority, t.n_tokens
                FROM t JOIN fullc USING (priority)),
         s2 AS (SELECT doc_id, priority, n_tokens FROM
                 (SELECT t.doc_id, t.priority, t.n_tokens, bnd.r,
                    SUM(t.n_tokens) OVER (PARTITION BY t.priority
                      ORDER BY t.doc_id ROWS UNBOUNDED PRECEDING) AS cs
                  FROM t JOIN bnd USING (priority))
                WHERE cs <= r)
         SELECT doc_id, CAST(priority AS BIGINT) AS priority, n_tokens
         FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
         ORDER BY priority DESC, doc_id""",
    // x220: daily counts, the (n·Σc² − (Σc)²) variance identity in
    // HUGEINT, trunc division
    "x220_burstiness" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         agg AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(c) AS s1, SUM(c * c) AS s2 FROM daily GROUP BY 1)
         SELECT user_id, n_days, CAST(s1 AS BIGINT) AS n_events,
           CAST(((n_days * s2 - s1 * s1) * 1000000) // (n_days * s1)
             AS BIGINT) AS dispersion_micro
         FROM agg WHERE n_days >= 3 ORDER BY user_id""",
    // x221: per-source and global inclusive-permille CDFs over the
    // distinct-value tables, min-selection percentile match
    "x221_quantile_calibrate" ->
      """WITH t AS (SELECT source, n_chars AS v FROM documents
           WHERE source IS NOT NULL AND n_chars IS NOT NULL),
         sc AS (SELECT source, v, COUNT(*) AS c FROM t GROUP BY 1, 2),
         sn AS (SELECT source, SUM(c) AS n FROM sc GROUP BY 1),
         scdf AS (SELECT sc.source, sc.v,
             (SUM(sc.c) OVER (PARTITION BY sc.source ORDER BY sc.v)
               * 1000) // sn.n AS p
           FROM sc JOIN sn USING (source)),
         gc AS (SELECT v, COUNT(*) AS c FROM t GROUP BY 1),
         gn AS (SELECT SUM(c) AS n FROM gc),
         gcdf AS (SELECT v AS gv,
             (SUM(c) OVER (ORDER BY v) * 1000) // gn.n AS gp
           FROM gc, gn)
         SELECT source, CAST(v AS BIGINT) AS value,
           CAST(p AS BIGINT) AS src_permille,
           CAST(MIN(gv) AS BIGINT) AS calibrated_value
         FROM scdf JOIN gcdf ON gp >= p
         GROUP BY source, v, p ORDER BY source, value""",
    // x214: identical planted rows, row-local double norms (the x202
    // left-fold order), pure selections for the envelopes
    "x214_embed_hygiene" ->
      """WITH planted AS (
           SELECT NULL::FLOAT[] AS embedding
           UNION ALL SELECT []::FLOAT[]
           UNION ALL SELECT ['NaN'::FLOAT, 1.0::FLOAT]
           UNION ALL SELECT [0.0::FLOAT, 0.0::FLOAT, 0.0::FLOAT]),
         u AS (SELECT embedding FROM embeddings
           UNION ALL SELECT embedding FROM planted),
         p AS (SELECT
           CASE WHEN embedding IS NULL THEN NULL
                ELSE CAST(len(embedding) AS BIGINT) END AS d,
           (embedding IS NOT NULL AND len(embedding) > 0 AND
            len(list_filter(embedding,
              x -> NOT isfinite(CAST(x AS DOUBLE)))) > 0) AS nf,
           CASE WHEN embedding IS NOT NULL AND len(embedding) > 0 AND
             len(list_filter(embedding,
               x -> NOT isfinite(CAST(x AS DOUBLE)))) = 0
           THEN CAST(FLOOR(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             (a, b) -> a + b)) * 1000000 + 0.5) AS BIGINT) END AS nm
           FROM u)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN d IS NULL THEN 1 END) AS BIGINT) AS n_null_vec,
           CAST(COUNT(CASE WHEN d = 0 THEN 1 END) AS BIGINT) AS n_empty_vec,
           CAST(COUNT(CASE WHEN nf THEN 1 END) AS BIGINT) AS n_nonfinite,
           CAST(COUNT(CASE WHEN nm = 0 THEN 1 END) AS BIGINT) AS n_zero_norm,
           MIN(CASE WHEN d > 0 THEN d END) AS dim_min,
           MAX(CASE WHEN d > 0 THEN d END) AS dim_max,
           MIN(nm) AS min_norm_micro,
           MAX(nm) AS max_norm_micro
         FROM p""",
    // x222: the x09 dot/norm spelling corpus×benchmark, champion by
    // (score DESC, bench_id) rank, permille floor AFTER the argmax
    "x222_semantic_decon" ->
      """WITH b AS (SELECT vec_id AS bench_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS bv
         FROM embeddings WHERE vec_id % 25 = 0),
       c AS (SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
         FROM embeddings WHERE vec_id % 25 <> 0),
       s AS (SELECT vec_id, bench_id,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_zip(cv, bv), p -> p[1] * p[2])),
             (x, y) -> x + y) AS d,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(cv, x -> x * x)), (x, y) -> x + y)) *
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(bv, x -> x * x)), (x, y) -> x + y)) AS n
         FROM c, b),
       r AS (SELECT vec_id, bench_id,
           (CASE WHEN n = 0 THEN 0.0 ELSE d / n END) AS score,
           ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY (CASE WHEN n = 0 THEN 0.0 ELSE d / n END) DESC,
               bench_id) AS rn
         FROM s)
       SELECT vec_id, bench_id,
         CAST(FLOOR(score * 1000 + 0.5) AS BIGINT) AS cos_permille,
         CAST(CASE WHEN FLOOR(score * 1000 + 0.5) >= 400 THEN 1 ELSE 0 END
           AS BIGINT) AS contaminated
       FROM r WHERE rn = 1 ORDER BY vec_id""",
    // x223: VALUES-table weights, one token-sum per source, exact
    // HUGEINT cross-multiplies with trunc division matching div
    "x223_epoch_plan" ->
      """WITH w(source, weight_ppm) AS (VALUES
           ('src0', CAST(400000 AS BIGINT)), ('src1', CAST(300000 AS BIGINT)),
           ('src2', CAST(200000 AS BIGINT)), ('srczz', CAST(100000 AS BIGINT))),
         av AS (SELECT source,
             SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS a
           FROM documents GROUP BY source),
         j AS (SELECT w.source, w.weight_ppm,
             CAST(COALESCE(av.a, 0) AS BIGINT) AS available_tokens,
             CAST((20000 * w.weight_ppm) // 1000000 AS BIGINT) AS target_tokens
           FROM w LEFT JOIN av USING (source)),
         e AS (SELECT *,
             CASE WHEN available_tokens = 0 THEN NULL
               ELSE CAST((target_tokens * 1000) // available_tokens AS BIGINT)
             END AS epochs_milli FROM j),
         k AS (SELECT *,
             CASE WHEN epochs_milli IS NULL THEN NULL
               ELSE LEAST(epochs_milli, 4000) END AS epochs_capped_milli
           FROM e),
         p AS (SELECT *,
             CASE WHEN epochs_capped_milli IS NULL THEN CAST(0 AS BIGINT)
               ELSE CAST((available_tokens * epochs_capped_milli) // 1000
                 AS BIGINT) END AS planned_tokens
           FROM k)
         SELECT source, weight_ppm, available_tokens, target_tokens,
           epochs_milli, epochs_capped_milli, planned_tokens,
           target_tokens - planned_tokens AS shortfall_tokens
         FROM p ORDER BY source""",
    // x224: dup label from the per-text count window, doubled-midrank
    // Mann-Whitney over the distinct-length table, HUGEINT exact
    "x224_rank_auc" ->
      """WITH t AS (SELECT n_chars AS s,
           CASE WHEN COUNT(*) OVER (PARTITION BY text) > 1
             THEN 1 ELSE 0 END AS y
         FROM documents WHERE n_chars IS NOT NULL),
       per AS (SELECT s, SUM(y) AS n1, SUM(1 - y) AS n0 FROM t GROUP BY s),
       c AS (SELECT s, n1, n0, n1 + n0 AS cnt,
           SUM(n1 + n0) OVER (ORDER BY s) AS cum FROM per),
       m AS (SELECT n1, n0, 2 * (cum - cnt) + cnt + 1 AS mr2 FROM c),
       a AS (SELECT SUM(n1) AS n_pos, SUM(n0) AS n_neg,
           SUM(n1 * mr2) AS r2 FROM m)
       SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
         CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
         CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
           ELSE ((r2 - n_pos * (n_pos + 1)) * 1000000) // (2 * n_pos * n_neg)
           END AS BIGINT) AS auc_micro
       FROM a""",
    // x225: distinct (source, token) pass, first-source by MIN, then
    // the |sources|-bounded cumulative walk
    "x225_source_novelty" ->
      """WITH tok0 AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok
           FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
       ts AS (SELECT DISTINCT source, tok FROM tok0),
       own AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS own_vocab
           FROM ts GROUP BY 1),
       fs AS (SELECT tok, MIN(source) AS source FROM ts GROUP BY 1),
       nw AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS new_vocab
           FROM fs GROUP BY 1),
       j AS (SELECT own.source, own.own_vocab,
           CAST(COALESCE(nw.new_vocab, 0) AS BIGINT) AS new_vocab
         FROM own LEFT JOIN nw USING (source))
       SELECT source, own_vocab, new_vocab,
         CAST(SUM(new_vocab) OVER (ORDER BY source) AS BIGINT) AS cum_vocab,
         CAST((new_vocab * 1000000) // own_vocab AS BIGINT) AS novelty_ppm
       FROM j ORDER BY source""",
    // x226: per-identity lag gaps at epoch µs (gap multiset is tie-
    // order invariant), CASE ladder, bounded cumulative window
    "x226_dup_arrival" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL
             AND ts IS NOT NULL),
       g AS (SELECT us - lag(us) OVER (PARTITION BY user_id, event_type
             ORDER BY us) AS gap_us FROM e),
       b AS (SELECT CASE WHEN gap_us <= 1000000 THEN 0
           WHEN gap_us <= 10000000 THEN 1
           WHEN gap_us <= 60000000 THEN 2
           WHEN gap_us <= 600000000 THEN 3
           WHEN gap_us <= 3600000000 THEN 4
           WHEN gap_us <= 86400000000 THEN 5 ELSE 6 END AS bucket
         FROM g WHERE gap_us IS NOT NULL),
       c AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps
           FROM b GROUP BY 1),
       t AS (SELECT SUM(n_gaps) AS tot FROM c)
       SELECT CAST(bucket AS BIGINT) AS bucket,
         CAST(CASE bucket WHEN 0 THEN 1000000 WHEN 1 THEN 10000000
           WHEN 2 THEN 60000000 WHEN 3 THEN 600000000
           WHEN 4 THEN 3600000000 WHEN 5 THEN 86400000000 END AS BIGINT)
           AS gap_le_us,
         n_gaps,
         CAST((n_gaps * 1000000) // tot AS BIGINT) AS share_ppm,
         CAST((SUM(n_gaps) OVER (ORDER BY bucket) * 1000000) // tot
           AS BIGINT) AS cum_ppm
       FROM c, t ORDER BY bucket""",
    // x227: per-(user, type) integer micronat terms c·⌊ln c·10⁶+½⌋,
    // one truncating div — no float accumulation to reorder
    "x227_type_entropy" ->
      """WITH per AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
           FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1, 2),
       t AS (SELECT user_id, c,
           c * CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
             AS clc FROM per),
       u AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types, SUM(clc) AS s
         FROM t GROUP BY 1)
       SELECT user_id, n_events, n_types,
         CAST(FLOOR(ln(CAST(n_events AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           - CAST(s // n_events AS BIGINT) AS entropy_micronat
       FROM u WHERE n_events >= 5 ORDER BY user_id""",
    // x228: the x53 quantizer + two x09 top-k replays (identical tie
    // discipline), overlap left-join per probe
    "x228_quant_recall" ->
      """WITH f AS (SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       qz AS (SELECT vec_id, CASE WHEN s = 0 THEN list_transform(v, e -> 0.0)
           ELSE list_transform(v, e -> FLOOR(e * 127 / s + 0.5)) END AS v
         FROM (SELECT vec_id, v,
             list_max(list_transform(v, e -> ABS(e))) AS s FROM f)),
       sf AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])),
             (x, y) -> x + y) AS d,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(a.v, x -> x * x)), (x, y) -> x + y)) *
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(b.v, x -> x * x)), (x, y) -> x + y)) AS n
         FROM f a, f b WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
       rf AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY (CASE WHEN n = 0 THEN 0.0 ELSE d / n END) DESC,
               neighbor_id) AS rk FROM sf) WHERE rk <= 5),
       sq AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])),
             (x, y) -> x + y) AS d,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(a.v, x -> x * x)), (x, y) -> x + y)) *
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(b.v, x -> x * x)), (x, y) -> x + y)) AS n
         FROM qz a, qz b WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
       rq AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY (CASE WHEN n = 0 THEN 0.0 ELSE d / n END) DESC,
               neighbor_id) AS rk FROM sq) WHERE rk <= 5)
       SELECT rf.query_id, CAST(COUNT(*) AS BIGINT) AS n_ref,
         CAST(COUNT(rq.neighbor_id) AS BIGINT) AS n_hits,
         CAST((COUNT(rq.neighbor_id) * 1000) // COUNT(*) AS BIGINT)
           AS recall_permille
       FROM rf LEFT JOIN rq ON rf.query_id = rq.query_id
         AND rf.neighbor_id = rq.neighbor_id
       GROUP BY rf.query_id ORDER BY rf.query_id""",
    // x229: the x218 scoring CTEs verbatim, then the bounded pair
    // self-join and one trunc division (toward zero, both engines)
    "x229_kendall_tau" ->
      """WITH dl AS (SELECT doc_id,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS dl
           FROM documents),
         stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
         tf AS (SELECT doc_id, tok, COUNT(*) AS tf
           FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
           WHERE tok IN ('vector', 'stream', 'join') GROUP BY doc_id, tok),
         dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         s75 AS (SELECT tf.doc_id AS doc_id, CAST(FLOOR(SUM(
             ln(1 + (stats.n_docs - dfq.df + 0.5::DOUBLE) / (dfq.df + 0.5::DOUBLE))
             * tf.tf * (1.2::DOUBLE + 1)
             / (tf.tf + 1.2::DOUBLE * ((1 - 0.75::DOUBLE) + 0.75::DOUBLE * dl.dl / stats.avgdl))
           ) * 1000 + 0.5) AS BIGINT) AS sc
           FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
           GROUP BY tf.doc_id ORDER BY sc DESC, doc_id LIMIT 20),
         s0 AS (SELECT tf.doc_id AS doc_id, CAST(FLOOR(SUM(
             ln(1 + (stats.n_docs - dfq.df + 0.5::DOUBLE) / (dfq.df + 0.5::DOUBLE))
             * tf.tf * (1.2::DOUBLE + 1)
             / (tf.tf + 1.2::DOUBLE * ((1 - 0.0::DOUBLE) + 0.0::DOUBLE * dl.dl / stats.avgdl))
           ) * 1000 + 0.5) AS BIGINT) AS sc
           FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
           GROUP BY tf.doc_id ORDER BY sc DESC, doc_id LIMIT 20),
         r75 AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY sc DESC, doc_id) AS rank FROM s75),
         r0 AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY sc DESC, doc_id) AS rank FROM s0),
         j AS (SELECT a.doc_id AS i, a.rank AS ra, b.rank AS rb
           FROM r75 a JOIN r0 b USING (doc_id)),
         nn AS (SELECT COUNT(*) AS n_items FROM j),
         p AS (SELECT
             COALESCE(SUM(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0
               THEN 1 END), 0) AS concordant,
             COALESCE(SUM(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0
               THEN 1 END), 0) AS discordant
           FROM j x JOIN j y ON x.i < y.i)
         SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST((n_items * (n_items - 1)) // 2 AS BIGINT) AS n_pairs,
           CAST(concordant AS BIGINT) AS concordant,
           CAST(discordant AS BIGINT) AS discordant,
           CAST(CASE WHEN n_items < 2 THEN NULL
             ELSE ((concordant - discordant) * 2000000)
               // (n_items * (n_items - 1)) END AS BIGINT) AS tau_micro
         FROM nn, p""",
    // x231: x225's distinct (source, token) pass, token-keyed pair
    // self-join (src_a < src_b), exact integer Jaccard
    "x231_src_vocab_overlap" ->
      """WITH tok0 AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok
           FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
       ts AS (SELECT DISTINCT source, tok FROM tok0),
       own AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab
           FROM ts GROUP BY 1),
       pr AS (SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
         FROM ts a JOIN ts b ON a.tok = b.tok AND a.source < b.source
         GROUP BY 1, 2)
       SELECT src_a, src_b, oa.vocab AS vocab_a, ob.vocab AS vocab_b,
         n_shared,
         CAST((n_shared * 1000) // (oa.vocab + ob.vocab - n_shared)
           AS BIGINT) AS jaccard_permille
       FROM pr JOIN own oa ON oa.source = pr.src_a
         JOIN own ob ON ob.source = pr.src_b
       ORDER BY src_a, src_b""",
    // x232: the x217 fingerprint/survivor CTEs with token weights —
    // NULL text is one fingerprint class and zero tokens
    "x232_token_attrition" ->
      """WITH fp AS (SELECT doc_id, source, md5(text) AS f,
           CASE WHEN text IS NULL THEN 0
             ELSE LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 END AS t
         FROM documents),
       surv AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f),
       per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(t) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN s.doc_id IS NOT NULL THEN t ELSE 0 END)
             AS BIGINT) AS n_kept_tokens
         FROM fp LEFT JOIN surv s USING (doc_id) GROUP BY source)
       SELECT source, n_docs, n_tokens, n_kept_tokens,
         n_tokens - n_kept_tokens AS n_dropped_tokens,
         CAST(CASE WHEN n_tokens = 0 THEN NULL
           ELSE ((n_tokens - n_kept_tokens) * 1000000) // n_tokens END
           AS BIGINT) AS token_drop_ppm
       FROM per ORDER BY source""",
    // x233: micro-quantized per-(label, dim) integer sums, list
    // assembly ordered by dim, the x09 double fold for cosine/norm
    "x233_label_centroids" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
           UNNEST(embedding) AS x, UNNEST(range(len(embedding))) AS i
         FROM embeddings WHERE label IS NOT NULL),
       q AS (SELECT label, i,
           CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qq
         FROM e),
       per AS (SELECT label, i, CAST(SUM(qq) AS BIGINT) AS s
         FROM q GROUP BY 1, 2),
       lv AS (SELECT label, list(CAST(s AS DOUBLE) ORDER BY i) AS v
         FROM per GROUP BY 1),
       g0 AS (SELECT i, CAST(SUM(s) AS BIGINT) AS s FROM per GROUP BY 1),
       gv AS (SELECT list(CAST(s AS DOUBLE) ORDER BY i) AS g FROM g0),
       nv AS (SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
         FROM embeddings WHERE label IS NOT NULL GROUP BY 1),
       c AS (SELECT label,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_zip(v, g), p -> p[1] * p[2])),
             (a, b) -> a + b) AS d,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nvv,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(g, x -> x * x)), (a, b) -> a + b)) AS ngg
         FROM lv, gv)
       SELECT c.label, nv.n_vecs,
         CAST(FLOOR((CASE WHEN c.nvv * c.ngg = 0 THEN 0.0
           ELSE c.d / (c.nvv * c.ngg) END) * 1000 + 0.5) AS BIGINT)
           AS cos_global_permille,
         CAST(FLOOR(c.nvv / nv.n_vecs + 0.5) AS BIGINT) AS norm_micro
       FROM c JOIN nv USING (label) ORDER BY label""",
    // x234: identical planted concats, regexp_extract_all lengths for
    // the counts (RE2 ∩ Java dialect), per-megachar trunc division
    "x234_pii_density" ->
      """WITH probed AS (SELECT source,
           CASE WHEN text IS NOT NULL AND doc_id % 7 = 0
                  THEN text || ' contact bob@example.com'
                WHEN text IS NOT NULL AND doc_id % 11 = 0
                  THEN text || ' see https://data.example.com/item?id=7'
                ELSE text END AS text
         FROM documents),
       p AS (SELECT source,
           CASE WHEN text IS NULL THEN 0 ELSE LENGTH(text) END AS chars,
           CASE WHEN text IS NULL THEN 0 ELSE len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) END AS ne,
           CASE WHEN text IS NULL THEN 0 ELSE len(regexp_extract_all(text,
             'https?://[^ ]+')) END AS nu
         FROM probed),
       g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(chars) AS BIGINT) AS n_chars,
           CAST(SUM(ne) AS BIGINT) AS n_email,
           CAST(SUM(nu) AS BIGINT) AS n_url
         FROM p GROUP BY 1)
       SELECT source, n_docs, n_chars, n_email, n_url,
         CAST(CASE WHEN n_chars = 0 THEN NULL
           ELSE (n_email * 1000000) // n_chars END AS BIGINT)
           AS email_per_mchar,
         CAST(CASE WHEN n_chars = 0 THEN NULL
           ELSE (n_url * 1000000) // n_chars END AS BIGINT)
           AS url_per_mchar
       FROM g ORDER BY source""",
    // x235: the chunkTokens layout replayed as list slices (stride 32,
    // no overlap, short docs keep one partial chunk), md5 fingerprint
    // counts, per-position dup share
    "x235_chunk_dup_profile" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
           FROM documents WHERE text IS NOT NULL),
       n AS (SELECT doc_id, ts,
           GREATEST((len(ts) + 31) // 32, 1) AS nch FROM t),
       ch AS (SELECT doc_id, UNNEST(range(nch)) AS cid, ts FROM n),
       cx AS (SELECT CAST(cid AS BIGINT) AS chunk_id,
           md5(array_to_string(ts[cid*32+1 : cid*32+32], ' ')) AS f
         FROM ch),
       cnt AS (SELECT f, COUNT(*) AS c FROM cx GROUP BY 1),
       g AS (SELECT chunk_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup
         FROM cx JOIN cnt USING (f) GROUP BY 1)
       SELECT chunk_id, n_chunks, n_dup,
         CAST((n_dup * 1000000) // n_chunks AS BIGINT) AS dup_ppm
       FROM g ORDER BY chunk_id""",
    // x236: the x07 pair CTEs, decile bucketing with the 1000-permille
    // fold into the top bucket, cumulative from the top
    "x236_pair_jac_hist" ->
      s"""WITH RECURSIVE ${EntryLib.minHashPairsCtes},
       b AS (SELECT LEAST(jac_permille // 100, 9) * 100
           AS bucket_lo_permille FROM pairs),
       c AS (SELECT bucket_lo_permille, CAST(COUNT(*) AS BIGINT) AS n_pairs
           FROM b GROUP BY 1),
       t AS (SELECT SUM(n_pairs) AS tot FROM c)
       SELECT CAST(bucket_lo_permille AS BIGINT) AS bucket_lo_permille,
         n_pairs,
         CAST((n_pairs * 1000000) // tot AS BIGINT) AS share_ppm,
         CAST((SUM(n_pairs) OVER (ORDER BY bucket_lo_permille DESC)
           * 1000000) // tot AS BIGINT) AS cum_from_top_ppm
       FROM c, t ORDER BY bucket_lo_permille DESC""",
    // x237: one (source, token) count table doubling as the occurrence
    // table, token totals over it, per-source hapax rollup
    "x237_hapax_share" ->
      """WITH tok0 AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok
           FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
       st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
           FROM tok0 GROUP BY 1, 2),
       tt AS (SELECT tok, SUM(n) AS t FROM st GROUP BY 1)
       SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(CASE WHEN tt.t = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax,
         CAST((SUM(CASE WHEN tt.t = 1 THEN 1 ELSE 0 END) * 1000000)
           // COUNT(*) AS BIGINT) AS hapax_ppm
       FROM st JOIN tt USING (tok) GROUP BY source ORDER BY source""",
    // x238: the x217 fingerprint/survivor CTEs, per-lang before/after
    // shares against the two scalar totals, signed delta
    "x238_dedup_mixture_shift" ->
      """WITH fp AS (SELECT doc_id, lang, md5(text) AS f FROM documents),
       surv AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f),
       per AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(s.doc_id) AS BIGINT) AS n_survivors
         FROM fp LEFT JOIN surv s USING (doc_id) GROUP BY lang),
       t AS (SELECT SUM(n_docs) AS tb, SUM(n_survivors) AS ta FROM per)
       SELECT lang, n_docs,
         CAST((n_docs * 1000000) // tb AS BIGINT) AS share_before_ppm,
         n_survivors,
         CAST((n_survivors * 1000000) // ta AS BIGINT) AS share_after_ppm,
         CAST((n_survivors * 1000000) // ta - (n_docs * 1000000) // tb
           AS BIGINT) AS delta_ppm
       FROM per, t ORDER BY lang""",
    // x239: even docs' distinct digests play the store, odd docs the
    // batch; NULL-text batch rows match nothing (SQL equality) = new
    "x239_batch_novelty" ->
      """WITH store AS (SELECT DISTINCT md5(text) AS fp FROM documents
           WHERE doc_id % 2 = 0),
       batch AS (SELECT source, md5(text) AS fp FROM documents
           WHERE doc_id % 2 = 1),
       j AS (SELECT b.source,
           CASE WHEN s.fp IS NULL THEN 1 ELSE 0 END AS isnew
         FROM batch b LEFT JOIN store s ON b.fp = s.fp)
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(isnew) AS BIGINT) AS n_new,
         CAST((SUM(isnew) * 1000000) // COUNT(*) AS BIGINT)
           AS novelty_ppm
       FROM j GROUP BY source ORDER BY source""",
    // x240: one (source, token) count table, per-token/source/corpus
    // totals from it, integer micronat ln terms, HUGEINT sum, one
    // truncating div per source
    "x240_source_kl" ->
      """WITH tok0 AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok
           FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
       st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok0 GROUP BY 1, 2),
       ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS nsum FROM st GROUP BY 1),
       ct AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS ctot FROM st GROUP BY 1),
       tt AS (SELECT CAST(SUM(nsum) AS BIGINT) AS n FROM ns),
       t AS (SELECT st.source,
           st.c * (CAST(FLOOR(ln(CAST(st.c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
             - CAST(FLOOR(ln(CAST(ns.nsum AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
             - CAST(FLOOR(ln(CAST(ct.ctot AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
             + CAST(FLOOR(ln(CAST(tt.n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT))
             AS term
         FROM st JOIN ct USING (tok) JOIN ns USING (source), tt),
       g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
           SUM(term) AS s FROM t GROUP BY 1)
       SELECT g.source, ns.nsum AS n_tokens, g.vocab,
         CAST(g.s // ns.nsum AS BIGINT) AS kl_micronat
       FROM g JOIN ns ON g.source = ns.source ORDER BY g.source""",
    // x241: the x43 gate CTEs (token/awl formulas + the x39 repetition
    // chain) with source carried, reason bits rolled up per feed
    "x241_gate_attrition" ->
      s"""WITH ${EntryLib.shingleCtes(3)},
       nd AS (SELECT doc_id, COUNT(*) AS ndist FROM sh GROUP BY doc_id),
       tot AS (SELECT doc_id, len(ts) - 2 AS total FROM le),
       rep AS (SELECT nd.doc_id AS doc_id,
           1000 - (nd.ndist * 1000) // tot.total AS rp
         FROM nd JOIN tot ON nd.doc_id = tot.doc_id),
       m AS (SELECT d.source,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS BIGINT) * 1000
             // (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS awl_permille,
           CAST(COALESCE(rep.rp, 0) AS BIGINT) AS rep_permille
         FROM documents d LEFT JOIN rep ON d.doc_id = rep.doc_id),
       g AS (SELECT source,
           CASE WHEN n_tokens < 32 THEN 1 ELSE 0 END AS b1,
           CASE WHEN rep_permille > 10 THEN 1 ELSE 0 END AS b2,
           CASE WHEN awl_permille < 4200 OR awl_permille > 4800 THEN 1 ELSE 0 END AS b4
         FROM m),
       r AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN b1 = 0 AND b2 = 0 AND b4 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_pass,
           CAST(SUM(b1) AS BIGINT) AS n_fail_short,
           CAST(SUM(b2) AS BIGINT) AS n_fail_rep,
           CAST(SUM(b4) AS BIGINT) AS n_fail_awl
         FROM g GROUP BY 1)
       SELECT source, n_docs, n_pass, n_fail_short, n_fail_rep, n_fail_awl,
         CAST((n_pass * 1000000) // n_docs AS BIGINT) AS pass_ppm
       FROM r ORDER BY source""",
    // x242: identical planted day-late shift, user-partitioned lag on
    // the producer sequence, per-user rollup
    "x242_arrival_integrity" ->
      """WITH e AS (SELECT user_id, event_id,
           epoch_us(CASE WHEN event_id % 97 = 0 THEN ts - INTERVAL 1 DAY
             ELSE ts END) AS us
         FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       l AS (SELECT user_id, us,
           lag(us) OVER (PARTITION BY user_id ORDER BY event_id) AS pus
         FROM e),
       b AS (SELECT user_id,
           CASE WHEN pus IS NOT NULL AND us < pus THEN pus - us END AS back
         FROM l),
       g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(back) AS BIGINT) AS n_backsteps,
           CAST(COALESCE(MAX(back), 0) AS BIGINT) AS max_backstep_us
         FROM b GROUP BY 1)
       SELECT user_id, n_events, n_backsteps, max_backstep_us,
         CAST((n_backsteps * 1000000) // n_events AS BIGINT) AS backstep_ppm
       FROM g ORDER BY user_id""",
    // x243: the x07 signature/banding CTEs (md5-derived — replayable),
    // bucket counts, exact CASE size ladder, pair mass s(s-1)/2
    "x243_band_bucket_skew" ->
      s"""WITH ${EntryLib.shingleCtes(2)},
       mins AS (SELECT doc_id, ${EntryLib.minhashSigCols(16)}
           FROM sh GROUP BY doc_id),
       banded AS (${EntryLib.minhashBandSelects("mins", 16, 4)}),
       bs AS (SELECT band, bucket, CAST(COUNT(*) AS BIGINT) AS s
           FROM banded GROUP BY 1, 2),
       c AS (SELECT CASE WHEN s <= 1 THEN 0 WHEN s <= 2 THEN 1
           WHEN s <= 4 THEN 2 WHEN s <= 8 THEN 3 WHEN s <= 16 THEN 4
           WHEN s <= 64 THEN 5 ELSE 6 END AS bucket_class, s FROM bs),
       g AS (SELECT bucket_class, CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(s) AS BIGINT) AS n_doc_slots,
           CAST(SUM((s * (s - 1)) // 2) AS BIGINT) AS candidate_pairs
         FROM c GROUP BY 1),
       t AS (SELECT SUM(candidate_pairs) AS tot FROM g)
       SELECT CAST(bucket_class AS BIGINT) AS bucket_class,
         CAST(CASE bucket_class WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
           WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 64 END AS BIGINT)
           AS size_le,
         n_buckets, n_doc_slots, candidate_pairs,
         CAST(CASE WHEN tot = 0 THEN NULL
           ELSE (candidate_pairs * 1000000) // tot END AS BIGINT)
           AS pair_share_ppm
       FROM g, t ORDER BY bucket_class""",
  )
}
