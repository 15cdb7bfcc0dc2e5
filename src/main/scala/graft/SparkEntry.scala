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
    * Ten entries are deliberately `no_oracle` (SURVEY §2.4 rule 6 —
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
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // —— core relational surface (SURVEY §2.4 Q1–Q22) ——
    "q01_count"           -> (Relational.q01Count _),
    "q02_project_cents"   -> (Relational.q02ProjectCents _),
    "q03_filter_pred"     -> (Relational.q03FilterPred _),
    "q04_null_filter"     -> (Relational.q04NullFilter _),
    "q05_join_agg"        -> (Relational.q05JoinAgg _),
    "q06_multi_join"      -> (Relational.q06MultiJoin _),
    "q07_left_anti"       -> (Relational.q07LeftAnti _),
    "q08_semi_join"       -> (Relational.q08SemiJoin _),
    "q09_tpch1_agg"       -> (Relational.q09Tpch1Agg _),
    "q10_count_distinct"  -> (Relational.q10CountDistinct _),
    "q11_rollup"          -> (Relational.q11Rollup _),
    "q12_window_rank"     -> (Relational.q12WindowRank _),
    "q13_window_frame"    -> (Relational.q13WindowFrame _),
    "q14_topk_sort"       -> (Relational.q14TopkSort _),
    "q15_intersect"       -> (Relational.q15Intersect _),
    "q16_except"          -> (Relational.q16Except _),
    "q17_string_funcs"    -> (Relational.q17StringFuncs _),
    "q18_last_wins_dedup" -> (Relational.q18LastWinsDedup _),
    "q19_date_agg"        -> (Relational.q19DateAgg _),
    "q20_json_extract"    -> (Relational.q20JsonExtract _),
    "q21_text_agg"        -> (Relational.q21TextAgg _),
    "q22_embed_group"     -> (Relational.q22EmbedGroup _),
    // —— LLM-pipeline extensions ——
    "x01_dedup_exact"     -> ((s, d) => Dedup.exact(Tables.documents(s, d))),
    "x02_fingerprint_md5" -> ((s, d) => TextAnalysis.fingerprintMd5(Tables.documents(s, d))),
    "x03_token_count"     -> ((s, d) => TextAnalysis.tokenCount(Tables.documents(s, d))),
    "x04_quality_score"   -> ((s, d) => TextAnalysis.qualityScore(Tables.documents(s, d))),
    "x05_langid"          -> ((s, d) => TextAnalysis.languageIdDefault(Tables.documents(s, d))),
    "x06_jaccard_pairs"   -> ((s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d).filter(col("doc_id") < 50), 0)),
    "x07_minhash_lsh"     -> ((s, d) =>
      Dedup.minHashLsh(Tables.documents(s, d), shingleK = 2, minPermille = 300)),
    "x08_simhash_pairs"   -> ((s, d) => Dedup.simHashPairs(Tables.documents(s, d))),
    // low-threshold EXACT near-dup sweep: content-blocked, recall 1.0.
    // shingleK=3 is the operator's own scale lever applied: 3-shingles
    // cut the shared-shingle join mass ~30× vs k=2 on this corpus with
    // the same result pairs (rarer blocks, same dups)
    "x38_jaccard_sweep" -> ((s, d) =>
      Dedup.jaccardSweep(Tables.documents(s, d), shingleK = 3, minPermille = 200)),
    // x34 is a COMPOSITE pipeline (full x07 minhash dedup + the
    // cluster fixpoint): its wall time ≈ x07 + rounds×(join+agg), and
    // at toy scale the per-round cost is job scheduling, not data —
    // the fixpoint is 1 job/round (lazy checkpoint; the convergence
    // count materializes it) regardless of corpus size
    "x34_dup_clusters"    -> ((s, d) =>
      Dedup.connectedComponents(
        // the sort-free pair form: the fixpoint re-shuffles by node id
        // anyway, so x07's presentation orderBy would be pure overhead
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2, minPermille = 300))),
    "x35_stratified_sample" -> ((s, d) =>
      graft.operators.Sampling.stratifiedHashSample(
        Tables.documents(s, d), strataCol = "lang", keyCol = "doc_id",
        rates = Map("en" -> 300L, "fr" -> 800L, "zh" -> 500L),
        defaultPermille = 100L)
        .select("doc_id", "lang").orderBy("doc_id", "lang")),
    "x36_heavy_hitters"   -> ((s, d) =>
      TextAnalysis.heavyHitters(Tables.documents(s, d), minCount = 500L)),
    // loopy-text quality signal: 1000·(1 − distinct/total 3-grams)
    "x39_repetition"      -> ((s, d) =>
      TextAnalysis.repetitionScore(Tables.documents(s, d), k = 3)),
    // concatenate-and-cut training layout: md5-sharded running token
    // offsets, seq = start div budget
    "x40_pack_sequences"  -> ((s, d) =>
      TextAnalysis.packSequences(Tables.documents(s, d), budgetTokens = 2048L, numShards = 8)),
    // eval-set decontamination: corpus docs sharing ≥3 3-shingles with
    // a (stand-in) benchmark slice; benchmark side broadcasts
    "x41_contamination"   -> ((s, d) =>
      Dedup.contamination(
        Tables.documents(s, d).filter(col("doc_id") >= 20),
        Tables.documents(s, d).filter(col("doc_id") < 20),
        shingleK = 3, minShared = 3L)),
    // deterministic 900/50/50 split assignment, md5-keyed (leak-free
    // under retries and dataset growth)
    "x42_split_assign"    -> ((s, d) =>
      graft.operators.Sampling.splitAssign(Tables.documents(s, d), "doc_id",
        Seq("train" -> 900L, "val" -> 50L, "test" -> 50L))
        .select("doc_id", "split").orderBy("doc_id", "split")),
    // composite keep/drop gate with auditable reason bits — thresholds
    // chosen to exercise every reason class on this corpus
    "x43_quality_gate"    -> ((s, d) =>
      TextAnalysis.qualityGate(Tables.documents(s, d))),
    // epoch composition: down-sample to 50/30/20 en/fr/zh (other langs
    // drop); rates derived from counts, bottleneck stratum sets the total
    "x44_rebalance"       -> ((s, d) =>
      graft.operators.Sampling.rebalance(Tables.documents(s, d), "lang", "doc_id",
        Map("en" -> 500L, "fr" -> 300L, "zh" -> 200L))
        .select("doc_id", "lang").orderBy("doc_id", "lang")),
    // retrieval/embedding window layout: 32-token chunks, 8 overlap
    "x45_chunk_tokens"    -> ((s, d) =>
      TextAnalysis.chunkTokens(Tables.documents(s, d), chunkTokens = 32, overlapTokens = 8)),
    // corpus-level novelty: permille of a doc's 3-grams with df = 1
    "x46_novelty"         -> ((s, d) =>
      TextAnalysis.noveltyScore(Tables.documents(s, d), k = 3)),
    // lexical retrieval: BM25 top-20 for a 3-term query — postings
    // filtered before any shuffle, score ranked on rounded millis
    "x47_bm25_topk"       -> ((s, d) =>
      graft.operators.Retrieval.bm25TopK(Tables.documents(s, d),
        Seq("vector", "stream", "join"), k = 20)),
    // batch gap sessionization (12 h gap; median inter-event gap is
    // ~7 h, p90 ~25 h → real multi-session splits per user). Runs at
    // epoch MICROS: DuckDB truncates the parquet ns timestamps to µs
    // at scan, so µs is the finest cross-engine-comparable resolution
    // (Tables.events' `ts` is the matching floor-µs conversion).
    "x48_sessionize"      -> ((s, d) =>
      graft.operators.Sessions.sessionize(
        Tables.events(s, d).withColumn("ts_us", expr("unix_micros(ts)")),
        gap = 43_200_000_000L, tsCol = "ts_us")
        .orderBy("user_id", "session_seq")),
    // SCD2 compaction of the event_type history into validity
    // intervals (µs resolution — same oracle constraint as x48)
    "x49_scd2"            -> ((s, d) =>
      graft.operators.Sessions.scd2(
        Tables.events(s, d).withColumn("ts_us", expr("unix_micros(ts)")),
        tsCol = "ts_us")
        .orderBy("user_id", "version")),
    // outlier-robust mean of the value signal, clipped at [p05, p95]
    "x50_winsorize"       -> (Relational.winsorizedMean _),
    // LM-quality proxy: corpus-fit unigram model, per-doc mean
    // negative log-prob in millinats
    "x51_surprisal"       -> ((s, d) =>
      TextAnalysis.unigramSurprisal(Tables.documents(s, d))),
    // mixture health: Shannon entropy of each language's source
    // distribution
    "x52_source_entropy"  -> ((s, d) =>
      TextAnalysis.sourceEntropy(Tables.documents(s, d))),
    // regular-grid resample of the value signal (31 daily instants over
    // the event month, µs resolution), composed from backward+forward
    // as-of joins with linear interpolation between brackets
    "x54_resample"        -> ((s, d) =>
      graft.operators.Sessions.resampleLinear(
        Tables.events(s, d).withColumn("ts_us", expr("unix_micros(ts)")),
        startTs = 1704067200000000L, endTs = 1706659200000000L,
        stepTs = 86_400_000_000L, tsCol = "ts_us")
        .orderBy("user_id", "g_ts")),
    // PageRank centrality over the x07 near-dup pair graph — 10 fixed
    // power iterations (hub documents of duplication neighborhoods)
    "x55_pagerank"        -> ((s, d) =>
      graft.operators.Graph.pageRank(
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2, minPermille = 300),
        iterations = 10)),
    // int8 embedding quantization — scalar projections only (the
    // driver's pandas compare cannot hash array cells; the array form
    // is covered by SimilaritySpec)
    "x53_quantize_int8"   -> ((s, d) =>
      graft.operators.Similarity.quantizeInt8(Tables.embeddings(s, d))
        .select("vec_id", "q_csv", "q_l1")),
    // sketch twin of x36: same bar, estimated counts (CMS is one-sided:
    // superset of the exact result, overshoot ≤ ε·N). Estimates are
    // sketch-seed-specific → rows-only driver check (rule 6); the ε
    // bound is spec-asserted against x36's exact counts.
    "x37_heavy_hitters_cms" -> ((s, d) =>
      TextAnalysis.heavyHittersCms(Tables.documents(s, d), minCount = 500L,
        eps = 0.0001, confidence = 0.99)),
    "x09_cosine_topk"     -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.cosineTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    "x10_ann_lsh"         -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    "x11_media_meta"      -> ((s, d) => TextAnalysis.mediaMeta(Tables.documents(s, d))),
    "x12_rolling_hash"    -> ((s, d) => TextAnalysis.rollingHash(Tables.documents(s, d))),
    "x13_cosine_native"   -> { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      Similarity.cosineTopKNative(emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    "x14_label_centroid"  -> { (s, d) =>
      graft.functions.VectorAgg.register(s)
      // Project SCALARS from the centroid, never the raw array: the
      // driver's pandas compare cannot sort/hash ndarray cells. The
      // full-array contract is covered by FunctionsSpec goldens.
      Tables.embeddings(s, d).groupBy("label")
        .agg(expr("vec_avg(embedding)").as("centroid"), count(lit(1)).as("n_vecs"))
        .select(col("label"), col("n_vecs"),
          size(col("centroid")).cast("long").as("dim"),
          floor(sqrt(aggregate(col("centroid"), lit(0.0d),
            (acc, x) => acc + x * x)) * 1000 + 0.5).cast("long").as("norm_permille"))
        .orderBy(col("label").asc_nulls_first)
    },
    "x15_cube"            -> (Relational.cube _),
    "x19_scalar_funcs"    -> (Relational.scalarFuncs _),
    "x20_approx_distinct" -> (Relational.approxDistinct _),
    "x21_salted_agg"      -> ((s, d) =>
      graft.operators.Skew.saltedAgg(
        Tables.lineitem(s, d).select(col("l_returnflag"),
          floor(col("l_quantity") * 100 + 0.5).cast("long").as("qty_c")),
        keys = Seq("l_returnflag"), aggs = Map("qty_c" -> "sum"))
        .orderBy(col("l_returnflag").asc_nulls_first)),
    "x16_full_join"       -> (Relational.fullJoin _),
    "x17_theta_join"      -> (Relational.thetaJoin _),
    "x18_asof_join"       -> (Relational.asofJoin _),
    "x32_asof_forward"    -> (Relational.asofForward _),
    "x33_asof_nearest"    -> (Relational.asofNearest _),
    "x26_percentile"      -> (Relational.percentiles _),
    "x28_variant"         -> (Relational.variantExtract _),
    "x27_pivot"           -> (Relational.pivotCounts _),
    // x23 operates hyperplane LSH at its honest operating point: a HIGH
    // threshold (900 permille), where ≤-multiProbe-bit signature
    // agreement has real recall and the candidate volume stays
    // ~n²·137·T/2^16 — linear-ish in n, never the all-pairs join a
    // 16-bucket (4-plane) config degrades to. The corpus's natural
    // cosine ceiling is ~0.51 (no qualifying pairs), so the demo plants
    // deterministic near-identical copies (ids +1e6) and recovers them;
    // low-threshold sweeps belong to the exact scorers (see
    // nearDupPairs scaladoc). Recall at these parameters is certified
    // by x31 + RecallSpec.
    "x23_embed_neardup"   -> ((s, d) =>
      Similarity.nearDupPairs(embeddingsWithPlantedDups(s, d), minPermille = 900,
        numPlanes = 16, numTables = 2, multiProbe = 2)),
    "x24_bpeish_tokens"   -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.bpeishTokenCountCol(col("text")).as("n_bpeish"))
        .orderBy("doc_id")),
    "x25_ivf_topk"        -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    "x22_range_join_banded" -> { (s, d) =>
      val supplierIntervals = Tables.supplier(s, d).select(
        col("s_suppkey"), col("s_suppkey").as("lo"), (col("s_suppkey") + 20).as("hi"))
      graft.operators.RangeJoin.banded(
        Tables.part(s, d), supplierIntervals, "p_size", "lo", "hi", binWidth = 16)
        .agg(count(lit(1)).as("n"))
    },
    // —— recall certification (x29–x31): the `no_oracle` ANN entries'
    //    driver-level assertion surface. Each emits one deterministic
    //    scalar row = recall of the SHIPPED config (x10/x25/x23) vs the
    //    exact seeded baseline; RecallSpec asserts calibrated floors. ——
    "x29_recall_lsh"      -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
      graft.operators.Recall.pairRecall(
        Similarity.cosineTopK(q, emb, k = 5),
        Similarity.lshTopK(q, emb, k = 5),
        Seq("query_id", "neighbor_id"))
    },
    "x30_recall_ivf"      -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
      graft.operators.Recall.pairRecall(
        Similarity.cosineTopK(q, emb, k = 5),
        Similarity.ivfTopK(q, emb, k = 5),
        Seq("query_id", "neighbor_id"))
    },
    "x31_recall_neardup"  -> { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val demo = embeddingsWithPlantedDups(s, d)
      val base = demo.select(col("vec_id").as("id"), col("embedding").cast("array<float>").as("v"))
      // exact all-pairs baseline at the same 900-permille threshold —
      // bounded demo scale only (n ≈ 2k ⇒ ~2M native-scored pairs);
      // certification at larger corpora restricts to a probe subset
      val a = base.select(col("id").as("da"), col("v").as("va"))
      val b = base.select(col("id").as("db"), col("v").as("vb"))
      val exactPairs = a.crossJoin(b).filter(col("da") < col("db"))
        .filter(floor(call_function("cosine_f32", col("va"), col("vb")) * 1000 + 0.5) >= 900)
        .select("da", "db")
      val found = Similarity.nearDupPairs(demo, minPermille = 900,
        numPlanes = 16, numTables = 2, multiProbe = 2)
      graft.operators.Recall.pairRecall(exactPairs, found, Seq("da", "db"))
    },
    // fixed-point integer k-means (4 clusters, 2 Lloyd rounds) —
    // integer state makes the whole trajectory, not just the labels,
    // exactly oracle-replayable
    "x56_kmeans"          -> ((s, d) =>
      graft.operators.Clustering.kmeans(Tables.embeddings(s, d),
        idCol = "vec_id", vecCol = "embedding", k = 4, iterations = 2)),
    // robust per-language length outliers. The fence is pinned at
    // 1.9·MAD for THIS query: the synthetic corpus has no heavy tail
    // (max deviation ≈ 2.76·MAD), so the conventional 3.5 default
    // would "pass" vacuously on an empty result at every SF
    "x57_outliers_mad"    -> ((s, d) =>
      TextAnalysis.madOutliers(Tables.documents(s, d), kMilli = 1900L)),
    // Morton (Z-order) layout key over the low 8 bits of
    // (custkey, orderkey) — the write-time sort key for
    // two-dimensional min/max file skipping
    "x58_zorder"          -> ((s, d) =>
      Tables.orders(s, d).select(col("o_orderkey"),
        graft.core.Layout.zValue(
          pmod(col("o_custkey"), lit(256L)), pmod(col("o_orderkey"), lit(256L)),
          bits = 8).as("zval"))
        .orderBy("zval", "o_orderkey").limit(200)),
    // one-pass per-column corpus profile (rows / nulls / exact distincts)
    "x59_profile"         -> ((s, d) =>
      graft.operators.Profiling.profile(Tables.documents(s, d),
        Seq("doc_id", "text", "lang", "source", "n_chars"))),
    // hybrid retrieval: RRF fusion of the x47 lexical pool and a dense
    // cosine pool (query = vec 0), both at depth 50, fused top-20
    "x60_hybrid_rrf"      -> ((s, d) =>
      graft.operators.Retrieval.hybridRrf(
        Tables.documents(s, d), Tables.embeddings(s, d),
        Seq("vector", "stream", "join"), queryVecId = 0L, k = 20)),
    // frequency-ranked vocabulary (V=512) + per-doc token-id encoding
    "x61_vocab_encode"    -> ((s, d) =>
      TextAnalysis.vocabEncode(Tables.documents(s, d), vocabSize = 512)),
    // deterministic 5-per-language sample (md5-permutation rank)
    "x62_group_sample"    -> ((s, d) =>
      graft.operators.Sampling.groupSample(Tables.documents(s, d),
        groupCol = "lang", keyCol = "doc_id", n = 5)
        .select("doc_id", "lang").orderBy("doc_id", "lang")),
    // snapshot diff vs a simulated next drop: doc_id%97 removed,
    // doc_id%53 text-changed, 4 high-id rows added
    "x63_snapshot_diff"   -> { (s, d) =>
      val base = Tables.documents(s, d)
      graft.operators.Snapshot.diff(base, nextDrop(base), "doc_id", Seq("text"))
    },
    // 12-bin fixed-range histogram of n_chars over [0, 600)
    "x64_histogram"       -> ((s, d) =>
      graft.operators.Profiling.histogram(Tables.documents(s, d), "n_chars",
        lo = 0L, hi = 600L, nbins = 12)),
    // asymmetric near-dup: shingle containment (quote/partial-copy
    // detection) with Jaccard alongside to expose the asymmetry gap.
    // shingleK=3 is the same content-block scale lever as x38: 3-shingle
    // blocks are ~30x rarer than 2-shingles on this corpus, same pairs
    "x65_containment"     -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), shingleK = 3,
        minPermille = 700)),
    // materialized-view refresh: per-customer (count, sum-of-cents)
    // state split at 1999-01-01, merged — must equal one full groupBy
    "x66_incremental_agg" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val cut = lit("1999-01-01").cast("date")
      def part(f: DataFrame) = graft.operators.Incremental.aggState(
        f, Seq("o_custkey"), Relational.cents(col("o_totalprice")))
      graft.operators.Incremental.merge(Seq(
        part(o.filter(col("o_orderdate") < cut)),
        part(o.filter(col("o_orderdate") >= cut))))
        .orderBy("o_custkey")
    },
    // padding-waste accounting per power-of-two length bucket
    "x67_length_buckets"  -> ((s, d) =>
      TextAnalysis.lengthBuckets(Tables.documents(s, d))),
    // span-level dedup: maximal shared token runs ≥ 15 via positional
    // 5-gram diagonals (the substring-dedup signal set scores miss)
    "x68_shared_runs"     -> ((s, d) =>
      Dedup.sharedRuns(Tables.documents(s, d), gramK = 5,
        minRunTokens = 15, maxDf = 8)),
    // deterministic JL sign projection 64→8: exact integer sums over
    // micro-quantized elements, md5-parity sign matrix (seed 42)
    "x69_random_project"  -> ((s, d) =>
      Similarity.randomProject(Tables.embeddings(s, d), inDims = 64,
        outDims = 8)),
    // per-user majority event type + agreement (annotation-vote shape)
    "x70_majority_vote"   -> ((s, d) =>
      Relational.majorityVote(Tables.events(s, d), "user_id", "event_type")),
    // per-language integer percent-rank of n_chars (score calibration)
    "x71_rank_calibrate"  -> ((s, d) =>
      Relational.rankCalibrate(Tables.documents(s, d), "lang", "n_chars",
        "doc_id")),
    // trending event types: exact power-of-two half-life decay (2 days)
    "x72_decayed_counts"  -> ((s, d) =>
      graft.operators.Sessions.decayedCounts(Tables.events(s, d))),
    // SemDeDup: k-means pre-bin (k=16) → within-cluster cosine ≥ 900‰
    // → component survivors — paraphrase-level dedup, cluster-bounded.
    // The corpus has no natural ≥900‰ pairs (ceiling ~0.51), so the
    // demo plants md5-perturbed copies (the ORACLE-replayable variant
    // of x23's xxhash64 planting) of the first 64 vectors — the drop
    // set is non-empty and every stage is still exactly replayed
    "x73_semantic_dedup"  -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // two-step select: the output column is ALSO named vec_id, and
      // Spark's lateral column alias resolution would silently bind
      // the lambda's vec_id to the just-shifted value (DuckDB binds
      // the input) — hashing from the distinctly-named orig_id keeps
      // both engines perturbing from the SAME key
      val planted = emb.filter(col("vec_id") < 64)
        .select(col("vec_id").as("orig_id"), col("embedding"), col("label"))
        .select(
          (col("orig_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x.cast("double") + lit(0.02d) *
              (conv(substring(md5(concat_ws(":", col("orig_id"), i)), 1, 15), 16, 10)
                .cast("double") / lit(1152921504606846976.0d))).cast("float"))
            .as("embedding"),
          col("label"))
      graft.operators.Clustering.semanticDedup(emb.unionByName(planted),
        idCol = "vec_id", vecCol = "embedding", k = 16, iterations = 2,
        minPermille = 900L)
    },
    // PPJoin-style prefix-filtered containment: same parameters and
    // same ORACLE FORM as x65 — candidate recall 1.0 + exact
    // verification make the output bit-identical, certifying the
    // web-scale plan (see the operator scaladoc for the measured
    // df-distribution dependence of the prefix bound's payoff)
    "x74_containment_prefix" -> ((s, d) =>
      Dedup.containmentPairsPrefix(Tables.documents(s, d), shingleK = 3,
        minPermille = 700)),
    // PII-pattern redaction with audit counts; the corpus has no
    // natural emails/URLs, so the query plants deterministic ones
    "x75_redact"          -> { (s, d) =>
      val planted = Tables.documents(s, d).select(
        col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(7L)) === 0L,
            concat(lit(" contact user"), pmod(col("doc_id"), lit(100L)).cast("string"),
              lit("@example.com now"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(13L)) === 0L,
            concat(lit(" see https://ex.org/p"), col("doc_id").cast("string")))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.redact(planted)
    },
    // incremental-corpus dedup: the x63 drop's CONTENT-new rows only —
    // the re-keyed copies (added under new ids, same text) are dups
    // here, the content-changed rows are not; contrast with x63's
    // keyed view of the same drop
    "x76_new_docs"        -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.newAgainstBase(nextDrop(docs),
        TextAnalysis.fingerprintMd5(docs).select("fp"))
        .select("doc_id")
    },
    // context-aware LM-quality proxy: add-one-smoothed bigram NLL
    "x77_bigram_surprisal" -> ((s, d) =>
      TextAnalysis.bigramSurprisal(Tables.documents(s, d))),
    // incremental DISTINCT maintenance: HLL states split at the same
    // date cut as x66, merged losslessly (sketch internals are
    // engine-specific -> rows-only check, rule 6; the merge-law
    // identity and error bound are IncrementalSpec-asserted)
    "x78_incremental_distinct" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val cut = lit("1999-01-01").cast("date")
      def st(f: DataFrame) = graft.operators.Incremental.distinctState(
        f, Seq("o_custkey"), col("o_orderdate").cast("date").cast("string"))
      graft.operators.Incremental.distinctEstimate(
        graft.operators.Incremental.mergeDistinct(Seq(
          st(o.filter(col("o_orderdate") < cut)),
          st(o.filter(col("o_orderdate") >= cut)))))
    },
    // distribution-drift gate on the same simulated drop x63/x76 view:
    // PSI over text-length bins (x64's binning rule), add-one smoothed
    // across the full support, per-bin signed contributions in
    // micronats — sums to the headline index
    "x79_psi_drift"       -> { (s, d) =>
      val docs = Tables.documents(s, d)
      def lens(f: DataFrame) = f.select(length(col("text")).as("len"))
      graft.operators.Profiling.psiDrift(lens(docs), lens(nextDrop(docs)),
        "len", lo = 0L, hi = 600L, nbins = 12)
    },
    // NEAR-dup eval decontamination (x41's exact-overlap complement):
    // the benchmark slice is a re-keyed, half-perturbed copy of docs
    // 10-24, so every bench doc's corpus source must be caught even
    // where the ' heldout' edit breaks exact matching. Two-step select
    // (distinct intermediate name) — the lateral-alias resolution trap
    "x80_cross_neardup"   -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") >= 10 && col("doc_id") < 25)
        .select(col("doc_id").as("orig_id"),
          when(pmod(col("doc_id"), lit(2L)) === 0L,
            concat(col("text"), lit(" heldout"))).otherwise(col("text")).as("text"))
        .select((col("orig_id") + lit(9000000L)).as("doc_id"), col("text"))
      Dedup.crossNearDup(docs.filter(col("doc_id") >= 10), bench,
        shingleK = 2, numHashes = 16, rowsPerBand = 4, minPermille = 600)
    },
    // multilingual epoch mixing at temperature α=0.5 (mT5 rule):
    // stratum budget ∝ √n_l — tail languages up-weighted vs x44's
    // fixed shares; sqrt is the ONE correctly-rounded IEEE op both
    // engines share, everything after is exact integer division
    "x81_temperature_mix" -> ((s, d) =>
      graft.operators.Sampling.temperatureMix(Tables.documents(s, d), "lang",
        "doc_id", alpha = 0.5, budget = 500L)
        .select("doc_id", "lang").orderBy("doc_id", "lang")),
    // DSIR importance weights toward the long-doc slice (length as the
    // classic weak-quality proxy): hashed-bigram multinomial
    // log-likelihood ratio, add-one smoothed over 4096 buckets
    "x82_dsir_weights"    -> { (s, d) =>
      val docs = Tables.documents(s, d)
      TextAnalysis.dsirWeights(docs, docs.filter(col("n_chars") >= 300),
        gramK = 2, buckets = 4096)
    },
    // hard-negative mining (DPR/ANCE): per probe query, top-5 most
    // cosine-similar vectors with a DIFFERENT label — same broadcast
    // scoring shape as x09/x13, plus the negatives-only filter
    "x83_hard_negatives"  -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.hardNegatives(emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    // fuzzy-exact dedup via C4/Dolma normalization: planted case/punct
    // variants of docs 0-7 must collapse onto their originals where
    // md5-exact dedup (x01) keeps them apart
    "x84_dedup_normalized" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val planted = docs.filter(col("doc_id") < 8)
        .select((col("doc_id") + lit(8000000L)).as("doc_id"),
          concat(upper(col("text")), lit("!!")).as("text"))
      Dedup.exactNormalized(docs.select("doc_id", "text").unionByName(planted))
    },
    // quality-aware survivor selection on the x34 cluster graph: keep
    // the LONGEST member per near-dup cluster (ties -> min id), not
    // the min id — "which copy survives" as a curation decision
    "x85_survivor_quality" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.survivorsByScore(
        Dedup.minHashLshPairs(docs, shingleK = 2, minPermille = 300),
        docs.select(col("doc_id"), col("n_chars").as("score")))
    },
    // per-language token census: top-10 tokens per lang — the
    // per-stratum boilerplate/stopword view a global census drowns
    "x86_group_heavy_hitters" -> ((s, d) =>
      TextAnalysis.heavyHittersByGroup(Tables.documents(s, d), "lang", m = 10)),
    // tokenizer fertility per language: chars/kilotoken decides token
    // budgets (α-sampling over raw doc counts misbudgets without it)
    "x87_fertility"       -> ((s, d) =>
      TextAnalysis.fertilityStats(Tables.documents(s, d), "lang")),
    // mix-design review table: per-lang token shares, √-tempered token
    // quotas out of a 500k budget, and the effective-epoch pressure
    // each quota implies (epochs > 1000 milli = data repeats)
    "x88_mixture_report"  -> ((s, d) =>
      graft.operators.Sampling.mixtureReport(Tables.documents(s, d), "lang",
        alpha = 0.5, budgetTokens = 500000L)),
    // dedup report: the cluster-size distribution of the x07 pair
    // graph, unpaired corpus remainder reported as size-1 clusters
    "x89_cluster_sizes"   -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.clusterSizeHistogram(docs,
        Dedup.minHashLshPairs(docs, shingleK = 2, minPermille = 300))
    }),
    // provenance view of the same pair graph: which (source, source)
    // cells the verified near-dups straddle
    "x90_source_overlap"  -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.sourceOverlapMatrix(
        Dedup.minHashLshPairs(docs, shingleK = 2, minPermille = 300), docs)
    }),
    // tokenizer-vocab sizing curve: top-25 tokens with cumulative
    // corpus coverage permille
    "x91_vocab_coverage"  -> ((s, d) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, d), m = 25)),
    // per-language dynamic quality bar: keep each language's top
    // quartile by length — the group-aware form of a global cutoff
    "x92_top_quantile"    -> ((s, d) =>
      graft.operators.Sampling.topQuantileByGroup(Tables.documents(s, d),
        "lang", "n_chars", "doc_id", keepPermille = 250L)),
    // per-dimension z-scoring of the embedding table (milli-rounded
    // CSV, the x53 output discipline)
    "x93_standardize"     -> ((s, d) =>
      Similarity.standardizeDims(Tables.embeddings(s, d))),
    // doc-scoped span duplication: what fraction of each doc's 40-char
    // windows (every 10 chars) appears verbatim in another doc — the
    // per-document boilerplate score the x68 pairwise runs roll up to
    "x94_span_dedup"      -> ((s, d) =>
      Dedup.spanDedupStats(Tables.documents(s, d), k = 40, stride = 10)),
    // closed-form S-curve banding planner at x07's signature width:
    // the fp/fn cost of every bands×rows split of 16 minhashes at the
    // 300‰ operating threshold — pure generated compute, no scan
    "x95_lsh_plan"        -> ((s, _) =>
      Dedup.lshBandingPlan(s, numHashes = 16, thresholdPermille = 300)),
    // feature-redundancy scan: Pearson corr over the four lineitem
    // measure columns from EXACT integer moments (decimal sums), one
    // aggregation pass, milli-rounded
    "x96_corr_matrix"     -> ((s, d) =>
      graft.operators.Profiling.corrMatrix(
        Tables.lineitem(s, d).select(
          Relational.cents(col("l_quantity")).as("qty_c"),
          Relational.cents(col("l_extendedprice")).as("price_c"),
          Relational.cents(col("l_discount")).as("disc_c"),
          Relational.cents(col("l_tax")).as("tax_c")),
        Seq("qty_c", "price_c", "disc_c", "tax_c"))),
    // lang×source association: per-cell PMI in micronats over the
    // vocabulary-bounded contingency table
    "x97_pmi_cells"       -> ((s, d) =>
      graft.operators.Profiling.pmiCells(Tables.documents(s, d),
        "lang", "source")),
    // equi-depth deciles of line price: exact NTILE anchor (global
    // sort at test scale; approxQuantile bounds are the 100 TB path)
    "x98_equidepth"       -> ((s, d) =>
      graft.operators.Profiling.equidepthHistogram(
        Tables.lineitem(s, d).select(
          Relational.cents(col("l_extendedprice")).as("price_c"),
          col("l_orderkey"), col("l_linenumber")),
        "price_c", nbins = 10, tieBreakCols = Seq("l_orderkey", "l_linenumber"))),
    // embedding covariance upper triangle (PCA/whitening precursor),
    // chained-explode cross moments, milli-rounded
    "x99_covariance"      -> ((s, d) =>
      Similarity.covarianceMatrix(Tables.embeddings(s, d))),
    // per-node triangle counts over the x07 pair graph — local
    // density: triangle-supported pairs are corroborated dups,
    // triangle-free ones deserve re-verification
    "x100_triangles"      -> ((s, d) =>
      graft.operators.Graph.triangleCounts(
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2, minPermille = 300))),
    // one-row structural headline of the same graph (wedges,
    // triangles, global clustering coefficient — exact integers)
    "x101_graph_summary"  -> ((s, d) =>
      graft.operators.Graph.graphSummary(
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2, minPermille = 300))),
    // Efraimidis–Spirakis weighted k-sample by doc length — the
    // quality-weighted subset primitive; float confined to ranking
    "x102_weighted_sample" -> ((s, d) =>
      graft.operators.Sampling.weightedSample(
        Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
        "doc_id", "n_chars", k = 50)),
    // IDF-weighted containment: shared-shingle mass weighted by
    // rarity (micronat ln(N/df)) — boilerplate scores 0 by
    // construction; integer arithmetic after one ln per shingle
    "x103_weighted_containment" -> ((s, d) =>
      Dedup.weightedContainmentPairs(Tables.documents(s, d), shingleK = 3,
        minPermille = 500)),
    // hashing-trick featurization: vocabulary-free signed bucket sums
    // (one md5 draw per token → bucket + ±1 sign), exact-int CSV
    "x104_feature_hash"   -> ((s, d) =>
      TextAnalysis.featureHash(Tables.documents(s, d), dim = 16)),
    // sketch calibration: minhash-estimated vs exact Jaccard per x07
    // pair — the "can we drop the verification join at scale" report
    "x105_jaccard_estimate" -> ((s, d) =>
      Dedup.jaccardEstimateReport(Tables.documents(s, d), shingleK = 2,
        numHashes = 16, rowsPerBand = 4, minPermille = 300)),
    // leakage-safe splits: hash-split by near-dup CLUSTER so dup
    // families never straddle train/test
    "x106_cluster_split"  -> ((s, d) =>
      graft.operators.Sampling.clusterSplitAssign(
        Tables.documents(s, d),
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2, minPermille = 300),
        "doc_id", Seq("train" -> 800L, "val" -> 100L, "test" -> 100L))),
    // native table-generating expression (the UDTF leg): positional
    // trigram rows straight from GenerateExec — no intermediate array
    "x107_ngram_table"    -> { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("ngrams_gen(split(text, ' '), 3)").as(Seq("pos", "gram")))
        .orderBy("doc_id", "pos")
    },
    // bloom-pruned incremental dedup: same drop, same answer as x76 —
    // the oracle SQL is byte-identical, proving the sketch prune is
    // lossless while the exact anti-join sees only might-contain rows
    "x108_bloom_newdocs"  -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.newAgainstBaseBloom(nextDrop(docs),
        TextAnalysis.fingerprintMd5(docs).select("fp"),
        expectedItems = 1L << 16)
        .select("doc_id")
    },
    // ordered conversion funnel over the event log (strict time order,
    // champion chaining — one user-keyed join+agg per step)
    "x109_funnel"         -> ((s, d) =>
      graft.operators.Behavior.funnel(Tables.events(s, d),
        Seq("view", "click", "purchase"))),
    // weekly retention cohorts (integer epoch-anchored weeks)
    "x110_retention"      -> ((s, d) =>
      graft.operators.Behavior.retentionCohorts(Tables.events(s, d))),
    // first-order event-type transition counts (lag over the per-user
    // (ts_ns, event_id)-total-ordered stream)
    "x111_transitions"    -> ((s, d) =>
      graft.operators.Behavior.transitionMatrix(Tables.events(s, d))),
    // dense per-user daily spend series: gap-fill + linear
    // interpolation between nearest observed days, exact integer cents
    "x112_gapfill"        -> ((s, d) =>
      graft.operators.Behavior.gapFillInterpolate(Tables.events(s, d))),
    // sorted-neighbourhood record linkage: customers vs a planted-typo
    // probe side (last char mutated), blocked on the 16-char prefix,
    // window-8 neighbourhood, levenshtein <= 1
    "x113_sorted_linkage" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val probe = cust.filter(pmod(col("c_custkey"), lit(7L)) === 3L)
        .withColumn("c_name",
          concat(substring(col("c_name"), 1, 17), lit("X")))
      graft.operators.Linkage.sortedNeighborhood(cust, probe,
        idCol = "c_custkey", nameCol = "c_name")
    },
    // directional window-3 token co-occurrence (word2vec/GloVe prep):
    // pair derivation rides the scan row-locally, ONE vocabulary²-
    // bounded groupBy, minCount prunes after counting (no false negs)
    "x114_skipgram"       -> ((s, d) =>
      TextAnalysis.skipgramCounts(Tables.documents(s, d), window = 3,
        minCount = 5L)),
    // one-row Zipf power-law fit over the top-100 token frequencies —
    // the corpus-health slope (natural text ≈ −1); top-V cut BEFORE
    // the rank window so the regression sees ≤V rows
    "x115_zipf_fit"       -> ((s, d) =>
      TextAnalysis.zipfFit(Tables.documents(s, d), topV = 100)),
    // per-type daily volume z-gate (feed went dark / double-send
    // detector): one (type, day) agg, stats window over that bounded
    // table, exact-integer z ingredients, flag column kept auditable
    "x116_daily_anomaly"  -> ((s, d) =>
      graft.operators.Behavior.dailyVolumeAnomaly(Tables.events(s, d),
        zMilliBar = 1500L)),
    // top-20 three-step event paths (sequence mining beyond x111's
    // pairs): one user-keyed window shuffle, TakeOrderedAndProject cut
    "x117_event_paths"    -> ((s, d) =>
      graft.operators.Behavior.pathsTopK(Tables.events(s, d), k = 20,
        len = 3)),
    // burst debounce (double-click/retry-storm suppression): keep the
    // first event of each ≤1-day-step burst per (user, type); flag,
    // don't drop, so the operator is its own audit
    "x118_debounce"       -> ((s, d) =>
      graft.operators.Behavior.debounce(Tables.events(s, d),
        gapNs = 86400L * 1000 * 1000 * 1000)),
    // referential-integrity audit over the star schema; the orders
    // parent is deliberately holed (every 100th key dropped) so the
    // lineitem edge shows real orphans while the intact edges read 0
    "x119_fk_audit"       -> { (s, d) =>
      val orders = Tables.orders(s, d)
      graft.operators.Profiling.fkAudit(Seq(
        ("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
          orders.filter(pmod(col("o_orderkey"), lit(100L)) =!= 0L), "o_orderkey"),
        ("orders->customer", orders, "o_custkey",
          Tables.customer(s, d), "c_custkey"),
        ("customer->nation", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey")))
    },
    // time-boxed funnel (1-day budget per step): the marketing-default
    // variant of x109 — unbounded funnels overstate conversion
    "x120_funnel_windowed" -> ((s, d) =>
      graft.operators.Behavior.funnel(Tables.events(s, d),
        Seq("view", "click", "purchase"),
        within = Some(86400L * 1000 * 1000 * 1000))),
    // last-touch attribution: AsOfJoin.backward composition (7-day
    // lookback) — organic conversions keep NULL touch columns
    "x121_attribution"    -> ((s, d) =>
      graft.operators.Behavior.lastTouchAttribution(Tables.events(s, d),
        touchTypes = Seq("view", "click"), convType = "purchase",
        toleranceNs = 7L * 86400 * 1000 * 1000 * 1000)),
    // rolling 7-day actives: exact WAU/DAU via contribution explode —
    // no sliding self-join, no per-row distinct-over-range window
    "x122_rolling_actives" -> ((s, d) =>
      graft.operators.Behavior.rollingActives(Tables.events(s, d))),
    // per-language mass-weighted median doc length: the length v where
    // half the CHARACTER mass sits in docs ≤ v — cumulative-histogram
    // form, exact integers, no raw-row sort
    "x123_weighted_median" -> ((s, d) =>
      graft.operators.Profiling.weightedMedian(Tables.documents(s, d),
        groupCol = "lang", valueCol = "n_chars", weightCol = "n_chars")),
    // market-basket rules over (user, day) baskets: within-basket
    // self-join pair support, exact-integer support/confidence/lift
    "x124_assoc_rules"    -> ((s, d) =>
      graft.operators.Behavior.associationRules(Tables.events(s, d),
        minSupportPermille = 50L)),
    // join elimination: the query CONTAINS a left join to a per-key
    // customer aggregate that nothing references; the oracle OMITS the
    // join entirely — RedundantLeftJoinElimination must make the two
    // identical (and PlanSpec asserts the optimized plan is join-free)
    "x125_join_elim"      -> { (s, d) =>
      val orders = Tables.orders(s, d)
      val custStats = Tables.customer(s, d)
        .groupBy("c_custkey").agg(count(lit(1)).as("cnt"))
      orders.join(custStats,
          orders("o_custkey") === custStats("c_custkey"), "left_outer")
        .select(orders("o_orderkey"), orders("o_custkey"))
        .orderBy("o_orderkey").limit(1000)
    },
    // id-continuity audit over a deliberately-holed event stream
    // (every id ≡ 7 mod 1000 removed): each hole surfaces as a
    // 1-wide missing range — the "silently failed page" detector.
    // Runs the BUCKETED data-scale form (per-bucket partitioned lag +
    // bucket-summary boundary scan — no un-partitioned window over raw
    // ids); bucketSize 4096 spans several buckets at sf0.01 so the
    // within/cross-bucket split is exercised, and the oracle is the
    // direct lag-over-distinct-ids SQL — equivalence IS the check
    "x126_id_gaps"        -> ((s, d) =>
      graft.operators.Profiling.idGapsBucketed(
        Tables.events(s, d).filter(pmod(col("event_id"), lit(1000L)) =!= 7L),
        "event_id", bucketSize = 4096L)),
    // collocation mining: top-50 window-2 pairs by PMI (micronats,
    // one ln per surviving pair), minCount 10 noise floor
    "x127_collocations"   -> ((s, d) =>
      TextAnalysis.collocations(Tables.documents(s, d), window = 2,
        minCount = 10L, topK = 50)),
    // median time-to-convert per funnel transition — the x109 champion
    // chain joined per user, exact lower median via the x123
    // cumulative-histogram discipline
    "x128_funnel_times"   -> ((s, d) =>
      graft.operators.Behavior.funnelStepTimes(Tables.events(s, d),
        Seq("view", "click", "purchase"))),
    // per-doc keyword extraction: top-3 tokens by the EXACT-integer
    // tf/df rarity score (tf·10⁶ div df) — tf-idf's ranking without
    // tf-idf's float log, so the whole output hash-compares
    "x129_keywords"       -> ((s, d) =>
      TextAnalysis.keywordsTopK(Tables.documents(s, d), k = 3)),
    // per-type cadence profile: exact lower median + lower p90 of
    // same-user same-type inter-arrival gaps (µs) — the empirical
    // basis for session gaps and debounce windows
    "x130_interarrival"   -> ((s, d) =>
      graft.operators.Behavior.interArrivalStats(Tables.events(s, d))),
    // session-size distribution at the x48 gap (12 h in µs) — the
    // bounce-vs-engagement shape readout over the same session table
    "x131_session_hist"   -> ((s, d) =>
      graft.operators.Sessions.sessionLengthHistogram(
        Tables.events(s, d).withColumn("ts_us", expr("unix_micros(ts)")),
        gap = 43_200_000_000L, tsCol = "ts_us")),
    // degree distribution of the x07 pair graph — hub-vs-pairs shape
    "x132_degree_dist"    -> ((s, d) =>
      graft.operators.Graph.degreeHistogram(
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2,
          minPermille = 300))),
    // distinct 2-hop neighborhood sizes on the same graph — the
    // transitive-growth cost signal before loosening the threshold
    "x133_two_hop"        -> ((s, d) =>
      graft.operators.Graph.twoHopCounts(
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2,
          minPermille = 300))),
    // per-language length moments (mean/var/skew/kurtosis, milli) —
    // exact integer power sums, one deterministic float expression
    "x134_moments"        -> ((s, d) =>
      graft.operators.Profiling.momentsBy(Tables.documents(s, d),
        "lang", "n_chars")),
    // week-over-week churn ledger: active/retained/churned/new per
    // week + retention permille, last week clipped
    "x135_weekly_churn"   -> ((s, d) =>
      graft.operators.Behavior.weeklyChurn(Tables.events(s, d))),
    // per-user consecutive-day streaks via the day − row_number
    // gaps-and-islands identity — no self-join, no explode
    "x136_streaks"        -> ((s, d) =>
      graft.operators.Behavior.dailyStreaks(Tables.events(s, d))),
    // ISO-weekday seasonality: events/day (milli) + index vs the
    // all-week mean (permille), exact cross-multiplied integers
    "x137_dow_profile"    -> ((s, d) =>
      graft.operators.Behavior.dowProfile(Tables.events(s, d))),
    // first-active-week cohort retention triangle, self-normalizing
    // (offset-0 rows are the cohort sizes)
    "x138_cohort_matrix"  -> ((s, d) =>
      graft.operators.Behavior.cohortMatrix(Tables.events(s, d))),
    // CUSUM level-shift scan over the densified daily count series;
    // integer-scaled statistic, exactly one peak row flagged
    "x139_cusum"          -> ((s, d) =>
      graft.operators.Behavior.cusumChangePoint(Tables.events(s, d))),
    // merge-overlapping interval coverage (30-min activity windows):
    // covered-once time vs span per user, cummax islands
    "x140_interval_cover" -> ((s, d) =>
      graft.operators.Sessions.intervalCoverage(Tables.events(s, d),
        widthUs = 1_800_000_000L)),
    // functional-dependency audit on lineitem: which "key" columns
    // actually determine which others (orderkey↛suppkey etc.)
    "x141_fd_audit"       -> ((s, d) =>
      graft.operators.Profiling.functionalDependencies(
        Tables.lineitem(s, d), fdRules)),
    // Benford first-digit screen over order totals (cents) — the
    // expected shares are public literal constants, all-integer output
    "x142_benford"        -> ((s, d) =>
      graft.operators.Profiling.benfordDigits(Tables.orders(s, d),
        Relational.cents(col("o_totalprice")))),
    // k-anonymity audit over the (nation, mktsegment) quasi-tuple:
    // per-class sizes + at-risk flag at k = 5
    "x143_k_anonymity"    -> ((s, d) =>
      graft.operators.Profiling.kAnonymity(Tables.customer(s, d),
        Seq("c_nationkey", "c_mktsegment"), k = 5L)),
    // key-skew scalar: Gini of l_partkey's frequency distribution
    // from the f-of-f closed form — no |keys|-wide window anywhere
    "x144_key_skew"       -> ((s, d) =>
      graft.operators.Profiling.keySkewGini(Tables.lineitem(s, d),
        "l_partkey")),
    // CDC changelog apply: synthetic U/D ops over the event stream
    // (every 10th event a tombstone), champion-struct winner per key
    "x145_cdc_apply"      -> ((s, d) =>
      graft.operators.Snapshot.cdcApply(
        cdcChangelog(Tables.events(s, d)), keyCol = "user_id",
        tsCol = "ts_us", seqCol = "event_id", opCol = "op",
        payloadCols = Seq("event_type"))),
    // per-node local clustering coefficient over the x07 pair graph —
    // template-star vs mutual-copy-clique separation, exact milli
    "x146_local_cluster"  -> ((s, d) =>
      graft.operators.Graph.localClustering(
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2,
          minPermille = 300))),
    // winnowing (MOSS) fingerprint summary: windowed-min gram hashes,
    // packed (hash, pos) argmin, selection checksum per doc
    "x147_winnowing"      -> ((s, d) =>
      TextAnalysis.winnowingFingerprints(Tables.documents(s, d),
        k = 3, w = 4)),
    // bought-together projection over the LARGE part vocabulary —
    // apriori-pruned within-basket self-join, never vocabulary²
    "x148_basket_pairs"   -> ((s, d) =>
      graft.operators.Behavior.basketPairs(Tables.lineitem(s, d),
        "l_orderkey", "l_partkey", minCount = 2L)),
    // RFM quintile segmentation of customers by order history —
    // exact cumulative-histogram thresholds, cents-integer monetary
    "x149_rfm"            -> ((s, d) =>
      graft.operators.Behavior.rfmSegments(Tables.orders(s, d),
        "o_custkey", "o_orderdate", Relational.cents(col("o_totalprice")))),
    // retractable MV refresh: base state + signed changelog ≡ full
    // recompute of the post-change row set (the x66 law with deletes)
    "x150_retract_agg"    -> ((s, d) => {
      val o = Tables.orders(s, d)
      val cents = Relational.cents(col("o_totalprice"))
      val base = o.filter(pmod(col("o_orderkey"), lit(3L)) =!= 0L)
      val state = graft.operators.Incremental.aggState(
        base, Seq("o_custkey"), cents)
      val log = o.filter(pmod(col("o_orderkey"), lit(3L)) === 0L)
        .withColumn("op", lit("I"))
        .unionByName(base.filter(pmod(col("o_orderkey"), lit(7L)) === 0L)
          .withColumn("op", lit("D")))
      graft.operators.Incremental.applyChangelog(
        state, log, Seq("o_custkey"), cents).orderBy("o_custkey")
    }),
    // exact quoted-phrase retrieval — the consecutive-token query
    // BM25's bag of words cannot express; gram equality rides the scan
    "x151_phrase_topk"    -> ((s, d) =>
      graft.operators.Retrieval.phraseTopK(Tables.documents(s, d),
        Seq("join", "column"), k = 20)),
    // per-language Tukey fences over doc length — 2×-scaled integer
    // fences, quartiles off the distinct-value weight table
    "x152_iqr_fences"     -> ((s, d) =>
      graft.operators.Profiling.iqrOutliers(Tables.documents(s, d),
        "lang", "n_chars")),
    // synchronous label-propagation communities over the x07 pair
    // graph — locally-dense groups where the CC closure would glue
    // bridged cliques into one blob; fixed rounds, min-label ties
    "x153_label_prop"     -> ((s, d) =>
      graft.operators.Graph.labelPropagation(
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2,
          minPermille = 300), iterations = 4)),
    // nearest-centroid confusion matrix over the labeled embeddings —
    // integer-micro centroids as plan literals, scan-side scoring
    "x154_centroid_eval"  -> ((s, d) =>
      graft.operators.Clustering.nearestCentroidEval(
        Tables.embeddings(s, d), "vec_id", "embedding", "label")),
    // χ² independence screen: event mix vs ISO weekday — exact
    // decimal(38,0) per-cell terms over the densified |X|·|Y| grid
    "x155_chi_square"     -> ((s, d) =>
      graft.operators.Profiling.chiSquare(Tables.events(s, d),
        col("event_type"),
        (weekday(col("ts").cast("date")) + 1).cast("long"))),
    // SymSpell deletion-neighborhood join — FULL recall at ed ≤ 1
    // (x113's window-recall complement), exact levenshtein verify
    "x156_deletion_join"  -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val probe = cust.filter(pmod(col("c_custkey"), lit(7L)) === 3L)
        .withColumn("c_name",
          concat(substring(col("c_name"), 1, 17), lit("X")))
      graft.operators.Linkage.deletionJoin(cust, probe,
        idCol = "c_custkey", nameCol = "c_name")
    },
    // Heaps-law vocabulary-growth curve + fitted β — x115's companion
    // corpus-health statistic (template corpora flatten early)
    "x157_heaps_growth"   -> ((s, d) =>
      TextAnalysis.heapsGrowth(Tables.documents(s, d), steps = 10)),
    // deterministic 5-fold CV assignment under the md5 hash contract
    "x158_kfold"          -> ((s, d) =>
      graft.operators.Sampling.kfoldAssign(Tables.documents(s, d),
        "doc_id", k = 5)
        .select(col("doc_id"), col("fold")).orderBy("doc_id")),
    // top-20 vocabulary-drift movers between the even/odd doc halves —
    // exact ppm rates, the token-level "what changed" report
    "x159_vocab_drift"    -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.vocabDrift(
        docs.filter(pmod(col("doc_id"), lit(2L)) === 0L),
        docs.filter(pmod(col("doc_id"), lit(2L)) === 1L), topK = 20)
    }),
    // EWMA control chart — each day flagged against the power-of-two-
    // weighted baseline of its previous 20 days; exact integer flags
    "x160_ewma_chart"     -> ((s, d) =>
      graft.operators.Behavior.ewmaChart(Tables.events(s, d))),
    // pane-decomposed sliding windows (Li et al.): events aggregate
    // ONCE into hourly panes, each 6-pane window sums its partials
    "x161_pane_windows"   -> ((s, d) =>
      graft.operators.Incremental.paneSlidingCounts(Tables.events(s, d),
        paneMicros = 3600L * 1000000L, windowPanes = 6)),
    // 4-round 2-core peel of the x07 pair graph — mutual-copy cliques
    // survive, LSH chains and pendant stars peel away
    "x162_k_core"         -> ((s, d) =>
      graft.operators.Graph.kCore(
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2,
          minPermille = 300), k = 2, rounds = 4)),
    // Theil–Sen robust trend per event type — truncation-exact micro
    // slopes over the densified day grid, cumulative-histogram median
    "x163_theil_sen"      -> ((s, d) =>
      graft.operators.Behavior.theilSenTrend(Tables.events(s, d))),
    // multimodal storage-budget report — payload bytes never shuffle,
    // only per-modality (count, sum) partials; exact integer shares
    "x164_media_storage"  -> ((s, d) =>
      graft.operators.Multimodal.storageReport(
        graft.operators.Multimodal.fromDocuments(Tables.documents(s, d)),
        oversizeBytes = 400L)),
    // Dirichlet query-likelihood retrieval — the LM scorer on BM25's
    // inverted-index probe shape; background mass for missing terms
    "x165_ql_topk"        -> ((s, d) =>
      graft.operators.Retrieval.qlTopK(Tables.documents(s, d),
        Seq("vector", "stream", "join"), k = 20)),
    // Hill tail-index of the doc-length distribution — is the tail a
    // power law, and is a mean-based gate even meaningful
    "x166_hill_tail"      -> ((s, d) =>
      graft.operators.Profiling.hillTailIndex(Tables.documents(s, d),
        "n_chars", "doc_id", kTop = 100)),
    // wide→long melt via Spark's NATIVE unpivot (Expand, one pass) —
    // the inverse of x27's pivot, completing the reshape pair
    "x167_unpivot"        -> ((s, d) =>
      Relational.unpivotMeasures(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_linenumber"),
        Seq("disc_c" -> Relational.cents(col("l_discount")),
          "price_c" -> Relational.cents(col("l_extendedprice")),
          "qty_c" -> Relational.cents(col("l_quantity"))))
        .orderBy("l_orderkey", "l_linenumber", "metric", "value")
        .limit(300)),
    // exact per-language quantile ladder — the x123 selection
    // generalized to an arbitrary q-list in one bounded pass
    "x168_quantile_ladder" -> ((s, d) =>
      graft.operators.Profiling.exactQuantiles(Tables.documents(s, d),
        "lang", "n_chars", Seq(100L, 250L, 500L, 750L, 900L, 990L))),
    // daily new-vs-returning user split — the acquisition/retention
    // decomposition a raw DAU curve hides
    "x169_new_returning"  -> ((s, d) =>
      graft.operators.Behavior.newVsReturning(Tables.events(s, d))),
    // interval×interval overlap join, bin-decomposed — "which sessions
    // ran during the 5 longest sessions" (incident-window shape)
    "x170_interval_overlap" -> { (s, d) =>
      val ev = Tables.events(s, d).withColumn("ts_us", expr("unix_micros(ts)"))
      val a = graft.operators.Sessions
        .sessionize(ev, gap = 43_200_000_000L, tsCol = "ts_us")
        .select((col("user_id") * lit(1000000L) + col("session_seq"))
            .as("a_id"),
          col("start_ts").as("a_lo"), col("end_ts").as("a_hi"))
      val b = a.orderBy((col("a_hi") - col("a_lo")).desc, col("a_id"))
        .limit(5)
        .select(col("a_id").as("b_id"), col("a_lo").as("b_lo"),
          col("a_hi").as("b_hi"))
      graft.operators.RangeJoin
        .intervalOverlap(a, b, binWidth = 7L * 86_400_000_000L)
        .filter(col("a_id") =!= col("b_id"))
    },
    // per-column entropy/evenness audit in ONE melted pass — the
    // constant-column and key-balance screen
    "x171_column_entropy" -> ((s, d) =>
      graft.operators.Profiling.columnEntropy(Tables.lineitem(s, d),
        entropyCols)),
    // duplicate-key audit over (l_orderkey, l_linenumber) — the
    // uniqueness pre-flight that would have caught the q02 regression
    "x172_dup_audit"      -> ((s, d) =>
      graft.operators.Profiling.duplicateRows(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_linenumber"))),
    // session-scoped funnel — walking past the 12 h gap RESETS the
    // funnel; counts converting SESSIONS on the shared champion chain
    "x173_session_funnel" -> ((s, d) =>
      graft.operators.Behavior.sessionFunnel(
        Tables.events(s, d).withColumn("ts_us", expr("unix_micros(ts)")),
        Seq("view", "click", "purchase"), gap = 43_200_000_000L,
        tsCol = "ts_us")),
    // DAU/MAU stickiness per day — engagement frequency; NULL when the
    // trailing month is fully idle (never a divide-by-zero)
    "x174_stickiness"     -> ((s, d) =>
      graft.operators.Behavior.stickiness(Tables.events(s, d),
        windowDays = 28)),
    // more-like-this: doc 0's top-3 rarity keywords seed BM25, the
    // seed doc excluded — two certified operators composed
    "x175_more_like_this" -> ((s, d) =>
      graft.operators.Retrieval.moreLikeThis(Tables.documents(s, d),
        docId = 0L, kTerms = 3, k = 10)),
    // explicit GROUPING SETS + grouping_id via the native Spark 4 API
    // — the arbitrary-combination member of the grouping trio
    "x176_grouping_sets"  -> ((s, d) =>
      Relational.groupingSetsReport(s, d)),
    // two-sample KS test: en-vs-fr doc-length distributions — exact
    // cross-multiplied CDF statistic, one sqrt for the critical value
    "x177_ks_test"        -> ((s, d) =>
      graft.operators.Profiling.ksTest(Tables.documents(s, d),
        "lang", "n_chars", groupA = "en", groupB = "fr")),
    // session entry × exit type matrix at the 12 h gap — what sessions
    // DO at the edges (sessionLengthHistogram says how long they are)
    "x178_session_handoff" -> ((s, d) =>
      graft.operators.Sessions.sessionHandoffMatrix(
        Tables.events(s, d).withColumn("ts_us", expr("unix_micros(ts)")),
        gap = 43_200_000_000L, tsCol = "ts_us")),
    // sliding distinct users per 6 h window via HLL pane sketches —
    // the distinct-count twin of x161 (sketch internals → rule 6,
    // IncrementalSpec carries pane-union ≡ direct + exactness)
    "x179_pane_distinct"  -> ((s, d) =>
      graft.operators.Incremental.paneSlidingDistinct(Tables.events(s, d),
        paneMicros = 3600L * 1000000L, windowPanes = 6)),
    // per-type OLS daily trend — slope/intercept/R² from exact integer
    // power sums; read NEXT TO x163's robust slope (disagreement = outliers)
    "x180_ols_trend"      -> ((s, d) =>
      graft.operators.Behavior.olsTrend(Tables.events(s, d))),
    // discrete churn hazard with right-censoring — WHERE in the
    // lifetime users leave (x135's churn count, resolved per day)
    "x181_hazard_curve"   -> ((s, d) =>
      graft.operators.Behavior.hazardCurve(Tables.events(s, d))),
    // item-item cosine over order baskets — x148's co-occurrence
    // counts symmetrically normalized; niche pairs beat bestseller noise
    "x182_item_cosine"    -> ((s, d) =>
      graft.operators.Behavior.itemCosine(Tables.lineitem(s, d),
        "l_orderkey", "l_partkey", minCount = 2, k = 50)),
    // rendezvous vs mod shard-resize cost, measured on real keys —
    // the minimal-movement argument for HRW, quantified
    "x183_shard_rebalance" -> ((s, d) =>
      graft.operators.Sharding.rebalanceReport(Tables.documents(s, d),
        "doc_id", nBefore = 4, nAfter = 5)),
    // zone-map skip report over an UNSORTED key layout — the honest
    // ~0 skip fraction that indicts a shuffled table (StatsSpec shows
    // the sorted contrast); ship_day anchored at the corpus epoch
    "x184_zone_map"       -> ((s, d) =>
      graft.operators.Profiling.zoneMapReport(
        Tables.lineitem(s, d).withColumn("ship_day",
          datediff(to_date(col("l_shipdate")), to_date(lit("1995-01-01")))
            .cast("long")),
        "l_orderkey", "ship_day", zoneWidth = 1000L,
        predLo = 0L, predHi = 365L)),
    // day-of-week-adjusted volume gate — Mondays z-score against
    // Mondays; the seasonal fix to x116's one-distribution z
    "x185_seasonal_anomaly" -> ((s, d) =>
      graft.operators.Behavior.seasonalVolumeAnomaly(Tables.events(s, d))),
    // source-concentration Pareto report over document bytes — which
    // sources carry the corpus; 80/20 head flag
    "x186_pareto_sources" -> ((s, d) =>
      graft.operators.Profiling.paretoReport(Tables.documents(s, d),
        "source", col("n_chars"))),
    // join-skew pre-flight on the events⋈events user self-join — the
    // per-key output mass a sessionize/path join would materialize
    "x187_join_skew"      -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.operators.Profiling.joinSkewPreflight(ev, ev,
        "user_id", "user_id", k = 20)
    }),
    // per-type freshness/lag report — the "did a feed go dark" check
    // that sees a dark source at the first comparison, not a day later
    "x188_freshness"      -> ((s, d) =>
      graft.operators.Profiling.freshnessReport(Tables.events(s, d),
        "event_type", "ts", staleSecs = 3600L)),
    // train/test contamination matrix: x07's near-dup pairs × x42's
    // per-doc split rule — every off-diagonal cell is leakage (the
    // measurement that motivates x106's cluster-keyed splits)
    "x189_split_leakage"  -> ((s, d) =>
      graft.operators.Sampling.splitLeakageAudit(
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2,
          minPermille = 300),
        Seq("train" -> 900L, "val" -> 50L, "test" -> 50L))),
    // 2-D Pareto frontier (cheapest-earliest orders) via the bucketed
    // two-level prefix-min — no O(n²) dominance join, no global sort
    "x190_skyline"        -> ((s, d) =>
      graft.operators.Skyline.frontier2d(
        Tables.orders(s, d).select(
          Relational.cents(col("o_totalprice")).as("price_cents"),
          datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
            .cast("long").as("order_day")),
        "price_cents", "order_day", bucketWidth = 100000L)),
    // 1-D earth-mover's distance between the en/fr length
    // distributions — KS's integral sibling, zero floats end to end
    "x191_emd"            -> ((s, d) =>
      graft.operators.Profiling.emd1d(Tables.documents(s, d),
        "lang", "n_chars", "en", "fr")),
    // per-column profile diff across the simulated next drop — the
    // schema-level "what changed" a keyed diff can't see
    "x192_profile_diff"   -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.operators.Profiling.profileDiff(docs, nextDrop(docs),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
    },
    // greedy zone-merge compaction plan at a byte target — the
    // small-file maintenance pass, planned as an auditable frame
    "x193_compaction_plan" -> ((s, d) =>
      graft.core.Layout.compactionPlan(Tables.documents(s, d),
        "doc_id", octet_length(col("text")), zoneWidth = 50L,
        targetBytes = 40000L)),
    // per-language percentile-rank map over doc lengths — the
    // quantile-normalization table (and the exact CDF x177/x191 read)
    "x194_percentile_rank" -> ((s, d) =>
      graft.operators.Profiling.percentileRank(Tables.documents(s, d),
        "lang", "n_chars")),
    // JSON key-presence profile over a 4-shape synthetic payload —
    // semi-structured schema inference; malformed rows are a row, not
    // an exception (R16 quarantine discipline)
    "x195_json_profile"   -> { (s, d) =>
      val m = pmod(col("event_id"), lit(4L))
      val j = when(m === 0L,
          concat(lit("{\"uid\": "), col("user_id").cast("string"), lit("}")))
        .when(m === 1L,
          concat(lit("{\"uid\": "), col("user_id").cast("string"),
            lit(", \"geo\": {\"cc\": \"US\"}}")))
        .when(m === 2L,
          concat(lit("{\"uid\": "), col("user_id").cast("string"),
            lit(", \"tag\": \""), col("event_type"), lit("\", \"v\": 1}")))
        .otherwise(lit("oops"))
      graft.operators.Profiling.jsonKeyProfile(
        Tables.events(s, d).select(j.as("j")), "j")
    },
    // event-time disorder (lateness) quantiles per type — the measured
    // basis for every withWatermark delay; bucketed two-level running
    // max, oracle runs the direct one-window spelling
    "x196_lateness"       -> ((s, d) =>
      graft.operators.Sessions.latenessProfile(Tables.events(s, d),
        bucketWidth = 1000L)),
    // as-of enrichment coverage: purchases attributed to a click
    // within the hour — the ppm that separates sparse from broken
    "x197_asof_match_rate" -> { (s, d) =>
      val ev = Tables.events(s, d).withColumn("ts_us",
        expr("unix_micros(ts)"))
      graft.operators.AsOfJoin.matchRateReport(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id"), col("ts_us")),
        ev.filter(col("event_type") === "click")
          .select(col("event_id").as("cid"), col("user_id"),
            col("ts_us").as("cts")),
        key = "user_id", leftTime = "ts_us", rightTime = "cts",
        probe = "cid", tolerance = Some(3600L * 1000000L))
    },
    // purged time split: train < Jan 20, a 2-day embargo absorbs
    // windowed-feature lookback, test beyond — the x42 rule for series
    "x198_time_split"     -> ((s, d) =>
      graft.operators.Sampling.timeSplitAssign(Tables.events(s, d), "ts",
        cutoffUs = 1705708800000000L, embargoUs = 2L * 86400L * 1000000L)
        .select("event_id", "split").orderBy("event_id", "split")),
    // label mix per split over the x42 assignment — the
    // training-readiness audit (drifted test mix invalidates the eval)
    "x199_class_balance"  -> ((s, d) =>
      graft.operators.Profiling.classBalance(
        graft.operators.Sampling.splitAssign(Tables.embeddings(s, d),
          "vec_id", Seq("train" -> 900L, "val" -> 50L, "test" -> 50L)),
        "split", "label")),
    // trend + weekday + residual decomposition of daily volume — the
    // residual series is the RIGHT input to any anomaly gate
    "x200_seasonal_decomp" -> ((s, d) =>
      graft.operators.Behavior.seasonalDecomposition(Tables.events(s, d))),
  )

  /** x171's audited column set — ONE list feeds both the Spark call
    * and the generated oracle union (the x141 fdRules discipline). */
  private val entropyCols: Seq[String] =
    Seq("l_linestatus", "l_returnflag", "l_suppkey")

  /** x141's audited FD rules — ONE list feeds both the Spark call and
    * the generated oracle union so the two sides cannot drift. */
  private val fdRules: Seq[(String, String)] = Seq(
    "l_orderkey" -> "l_suppkey",
    "l_partkey" -> "l_suppkey",
    "l_orderkey" -> "l_returnflag",
    "l_suppkey" -> "l_linestatus")

  /** x141 oracle: per rule, the same null-safe fan-out subquery
    * (COUNT(DISTINCT rhs) + MAX(rhs IS NULL)) rolled to one summary
    * row, UNION ALL across rules, ordered by rule name. */
  private def fdAuditOracle: String =
    fdRules.map { case (lhs, rhs) =>
      s"""SELECT '$lhs->$rhs' AS rule, CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN fan > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
         CAST(MAX(fan) AS BIGINT) AS max_fanout,
         (CAST(SUM(CASE WHEN fan > 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000)
           // COUNT(*) AS violation_permille
       FROM (SELECT $lhs, COUNT(DISTINCT $rhs) +
               MAX(CASE WHEN $rhs IS NULL THEN 1 ELSE 0 END) AS fan
             FROM lineitem WHERE $lhs IS NOT NULL GROUP BY $lhs)"""
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY rule")

  /** x149 oracle: the RFM base aggregate plus one quantile-ladder CTE
    * block PER METRIC, generated from a single template exactly like
    * the Scala `thresholds()` helper — 20/40/60/80% lower-quantile
    * cuts off the distinct-value weight table, scores = 1 + #cuts
    * strictly below the value, recency inverted. */
  private def rfmOracle: String = {
    def ladder(metric: String, p: String): String =
      s"""${p}v AS (SELECT $metric AS v, CAST(COUNT(*) AS BIGINT) AS w
           FROM rfm GROUP BY 1),
         ${p}c AS (SELECT v, SUM(w) OVER (ORDER BY v ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(w) OVER () AS tot FROM ${p}v),
         ${p}q AS (SELECT MIN(CASE WHEN cum * 5 >= tot THEN v END) AS q1,
             MIN(CASE WHEN cum * 5 >= tot * 2 THEN v END) AS q2,
             MIN(CASE WHEN cum * 5 >= tot * 3 THEN v END) AS q3,
             MIN(CASE WHEN cum * 5 >= tot * 4 THEN v END) AS q4
           FROM ${p}c)"""
    def score(metric: String, p: String): String =
      s"""(1 + CASE WHEN $metric > ${p}q.q1 THEN 1 ELSE 0 END
          + CASE WHEN $metric > ${p}q.q2 THEN 1 ELSE 0 END
          + CASE WHEN $metric > ${p}q.q3 THEN 1 ELSE 0 END
          + CASE WHEN $metric > ${p}q.q4 THEN 1 ELSE 0 END)"""
    s"""WITH facts AS (SELECT o_custkey AS cust,
           CAST(o_orderdate AS DATE) AS d,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS amt
         FROM orders),
       anchor AS (SELECT MAX(d) AS ad FROM facts),
       rfm AS (SELECT cust, CAST(MIN(ad - d) AS BIGINT) AS recency_days,
           CAST(COUNT(*) AS BIGINT) AS frequency,
           CAST(SUM(amt) AS BIGINT) AS monetary_cents
         FROM facts CROSS JOIN anchor GROUP BY cust),
       ${ladder("recency_days", "r")},
       ${ladder("frequency", "f")},
       ${ladder("monetary_cents", "m")}
       SELECT cust, recency_days, frequency, monetary_cents,
         CAST(6 - ${score("recency_days", "r")} AS BIGINT) AS r_score,
         CAST(${score("frequency", "f")} AS BIGINT) AS f_score,
         CAST(${score("monetary_cents", "m")} AS BIGINT) AS m_score,
         CAST(6 - ${score("recency_days", "r")} AS VARCHAR)
           || CAST(${score("frequency", "f")} AS VARCHAR)
           || CAST(${score("monetary_cents", "m")} AS VARCHAR) AS segment
       FROM rfm CROSS JOIN rq CROSS JOIN fq CROSS JOIN mq
       ORDER BY cust"""
  }

  /** x145's synthetic changelog view of `events`: every 10th event_id
    * is a tombstone ('D'), the rest upserts — deterministic, and the
    * oracle CTE replays the same derivation verbatim. */
  private def cdcChangelog(events: DataFrame): DataFrame =
    events.select(col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"),
      when(pmod(col("event_id"), lit(10L)) === 0L, lit("D"))
        .otherwise(lit("U")).as("op"),
      col("event_type"))

  /** The simulated "next drop" x63 (keyed diff) and x76 (content
    * dedup) both view: doc_id%97 removed, doc_id%53 text-changed, the
    * 4 lowest ids re-keyed high (same text). ONE copy — the two
    * queries' commentary claims they are two views of the SAME drop,
    * and each Scala spelling must stay in sync with its oracle CTE. */
  private def nextDrop(base: DataFrame): DataFrame =
    base.filter(pmod(col("doc_id"), lit(97L)) =!= 0L)
      .withColumn("text", when(pmod(col("doc_id"), lit(53L)) === 0L,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
      .unionByName(base.filter(col("doc_id") < 4)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))

  /** x23/x31 demo corpus: the embeddings table has a natural cosine
    * ceiling of ~0.51 — no true near-dups — so the near-dup demo
    * plants one deterministic near-identical copy (per-dimension
    * perturbation ~N·0.02, xxhash64-derived, reproducible) of each of
    * the first 64 vectors under id+1 000 000. Planted cosines are
    * ≥ ~0.99; every qualifying pair is (i, i+1e6). */
  private def embeddingsWithPlantedDups(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val planted = emb.filter(col("vec_id") < 64).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x.cast("double") + lit(0.02d) *
          (call_function("xxhash64", col("vec_id"), i).cast("double")
            / lit(Long.MaxValue.toDouble))).cast("float")).as("embedding"),
      col("label"))
    emb.unionByName(planted)
  }

  /** DuckDB oracle SQL, same parquet tables. Column aliases match the
    * Spark output column names exactly (driver sorts columns by name
    * before hashing). Keys absent here → rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q01_count" ->
      "SELECT COUNT(*) AS n FROM lineitem",
    "q02_project_cents" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS net_cents
         FROM lineitem ORDER BY l_orderkey, l_linenumber, net_cents LIMIT 100""",
    "q03_filter_pred" ->
      "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity > 45.0 AND l_returnflag = 'R'",
    "q04_null_filter" ->
      "SELECT COUNT(*) AS n FROM events WHERE value IS NOT NULL AND props IS NOT NULL",
    "q05_join_agg" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST""",
    "q06_multi_join" ->
      """SELECT r_name, n_name, COUNT(*) AS customers FROM customer
         JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
    "q07_left_anti" ->
      """SELECT COUNT(*) AS n FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         WHERE o_orderkey IS NULL""",
    "q08_semi_join" ->
      """SELECT COUNT(*) AS n FROM part p WHERE EXISTS
         (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49.0)""",
    "q09_tpch1_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_c
         FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q10_count_distinct" ->
      "SELECT COUNT(DISTINCT o_custkey) AS active_customers FROM orders",
    "q11_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM orders
         GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
         ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST, n""",
    "q12_window_rank" ->
      """SELECT o_custkey, o_orderkey FROM
         (SELECT o_custkey, o_orderkey,
            ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
         WHERE rn = 1 ORDER BY o_custkey LIMIT 100""",
    "q13_window_frame" ->
      """SELECT event_id,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           AS BIGINT) AS roll_c
         FROM events ORDER BY event_id LIMIT 200""",
    "q14_topk_sort" ->
      """SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS total_c
         FROM orders ORDER BY total_c DESC, o_orderkey LIMIT 10""",
    "q15_intersect" ->
      """SELECT c_nationkey AS k FROM customer INTERSECT
         SELECT s_nationkey AS k FROM supplier ORDER BY k""",
    "q16_except" ->
      """SELECT n_nationkey FROM nation EXCEPT SELECT c_nationkey FROM customer
         ORDER BY n_nationkey""",
    "q17_string_funcs" ->
      """SELECT UPPER(SUBSTR(p_name, 1, 4)) AS pre, LENGTH(p_name) AS len, COUNT(*) AS n
         FROM part GROUP BY 1, 2 ORDER BY pre NULLS FIRST, len, n""",
    "q18_last_wins_dedup" ->
      """SELECT user_id, event_id FROM
         (SELECT user_id, event_id,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
         WHERE rn = 1 ORDER BY user_id""",
    "q19_date_agg" ->
      """SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n FROM events
         GROUP BY 1, 2 ORDER BY d NULLS FIRST, event_type NULLS FIRST""",
    "q20_json_extract" ->
      """SELECT CAST(SUM(CAST(SUBSTR(props, 7, LENGTH(props) - 7) AS BIGINT)) AS BIGINT) AS k_sum
         FROM events WHERE props LIKE '{"k": %}'""",
    "q21_text_agg" ->
      """SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS chars, COUNT(*) AS docs FROM documents
         GROUP BY lang ORDER BY lang NULLS FIRST""",
    "q22_embed_group" ->
      """SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
         ORDER BY label NULLS FIRST""",
    // —— extensions (cross-engine-expressible subset) ——
    "x01_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count FROM documents
         GROUP BY MD5(text) ORDER BY keep_id, dup_count""",
    "x02_fingerprint_md5" ->
      "SELECT doc_id, MD5(text) AS fp FROM documents ORDER BY doc_id, fp",
    "x03_token_count" ->
      """SELECT doc_id,
         CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
         FROM documents ORDER BY doc_id, n_tokens""",
    "x04_quality_score" ->
      """SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars_m,
         CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         CAST(LENGTH(REPLACE(text, ' ', '')) * 1000 AS BIGINT)
           // (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS awl_permille,
         CAST(LENGTH(text) - LENGTH(REPLACE(text, 'the', '')) AS BIGINT) // 3 AS the_cnt
         FROM documents ORDER BY doc_id""",
    "x05_langid" ->
      """WITH tok0 AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
         cnt AS (SELECT doc_id,
           COUNT(CASE WHEN tok = 'data' THEN 1 END) AS c0,
           COUNT(CASE WHEN tok = 'table' THEN 1 END) AS c1,
           COUNT(CASE WHEN tok = 'row' THEN 1 END) AS c2
           FROM tok0 GROUP BY doc_id)
         SELECT doc_id,
           CASE WHEN c0 >= c1 AND c0 >= c2 THEN 'en'
                WHEN c1 >= c0 AND c1 >= c2 THEN 'fr' ELSE 'de' END AS pred_lang
         FROM cnt ORDER BY doc_id, pred_lang""",
    "x06_jaccard_pairs" ->
      """WITH tok0 AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                       FROM documents WHERE doc_id < 50),
         t AS (SELECT DISTINCT doc_id, tok FROM tok0),
         s AS (SELECT doc_id, COUNT(*) AS sz FROM t GROUP BY doc_id),
         c AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common
               FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
         SELECT da, db, (common * 1000) // (sa.sz + sb.sz - common) AS jac_permille
         FROM c JOIN s sa ON da = sa.doc_id JOIN s sb ON db = sb.doc_id
         ORDER BY da, db, jac_permille""",
    "x11_media_meta" ->
      """SELECT doc_id, CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes, SHA256(text) AS sha
         FROM documents ORDER BY doc_id""",
    "x15_cube" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM orders
         GROUP BY CUBE(o_orderpriority, o_orderstatus)
         ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST, n""",
    "x16_full_join" ->
      "SELECT COUNT(*) AS n FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey",
    "x19_scalar_funcs" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(ABS(FLOOR(l_discount * 100 + 0.5)) AS BIGINT) AS disc_c,
         CAST(DATE_TRUNC('month', CAST(l_shipdate AS DATE)) AS DATE) AS ship_month,
         CONCAT(l_returnflag, '-', l_linestatus) AS rf_ls,
         REPLACE(UPPER(l_returnflag), 'R', 'X') AS rf_x,
         l_orderkey % 7 AS m7
         FROM lineitem WHERE l_orderkey < 100
         ORDER BY l_orderkey, l_linenumber""",
    "x26_percentile" ->
      """SELECT lang,
         CAST(FLOOR(QUANTILE_CONT(n_chars, 0.5) * 100 + 0.5) AS BIGINT) AS p50_c,
         CAST(FLOOR(QUANTILE_CONT(n_chars, 0.9) * 100 + 0.5) AS BIGINT) AS p90_c
         FROM documents GROUP BY lang ORDER BY lang NULLS FIRST""",
    "x28_variant" ->
      """SELECT event_id, CAST(props::JSON->>'k' AS BIGINT) AS k
         FROM events WHERE props LIKE '{"k": %}' ORDER BY event_id""",
    // generated from the same PivotSources list the query pivots on —
    // query and oracle cannot cover different source subsets
    "x27_pivot" ->
      s"""SELECT lang,
         ${Relational.PivotSources.map(s =>
           s"COUNT(CASE WHEN source = '$s' THEN 1 END) AS $s").mkString(",\n         ")}
         FROM documents GROUP BY lang ORDER BY lang NULLS FIRST""",
    "x21_salted_agg" ->
      """SELECT l_returnflag,
         CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_c_sum
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST""",
    // x14: per-position centroid means computed independently (DuckDB
    // zipped-UNNEST AVG vs the Spark UDAF); both accumulate in double.
    // The permille-rounded L2 norm is empirically stable at the tested
    // scale factors — NOT guaranteed bit-identical: summation order
    // differs between engines, so a norm landing within an ULP of a
    // .0005 boundary could flip the rounding (selfcheck flags that case
    // as a WARN; coarsen the rounding if it ever fires).
    "x14_label_centroid" ->
      """WITH pos AS (
           SELECT label, UNNEST(embedding) AS e, UNNEST(range(len(embedding))) AS i
           FROM embeddings),
         c AS (SELECT label, i, AVG(e) AS m FROM pos GROUP BY label, i),
         n AS (SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY label)
         SELECT c.label, CAST(n.n_vecs AS BIGINT) AS n_vecs,
           CAST(COUNT(*) AS BIGINT) AS dim,
           CAST(FLOOR(SQRT(SUM(m * m)) * 1000 + 0.5) AS BIGINT) AS norm_permille
         FROM c JOIN n ON c.label = n.label
         GROUP BY c.label, n.n_vecs ORDER BY c.label NULLS FIRST""",
    "x17_theta_join" ->
      """SELECT COUNT(*) AS n FROM part p JOIN supplier s
         ON p.p_size >= s.s_suppkey AND p.p_size <= s.s_suppkey + 20""",
    // x22: same semantics as x17, executed through the banded equi-join
    // plan instead of the nested loop — the oracle certifies equality
    "x22_range_join_banded" ->
      """SELECT COUNT(*) AS n FROM part p JOIN supplier s
         ON p.p_size >= s.s_suppkey AND p.p_size <= s.s_suppkey + 20""",
    "x18_asof_join" ->
      """WITH pairs AS (
           SELECT o.o_orderkey, e.event_id, e.ts
           FROM orders o LEFT JOIN events e
             ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate),
         r AS (
           SELECT o_orderkey, event_id,
             ROW_NUMBER() OVER (PARTITION BY o_orderkey
               ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
           FROM pairs)
         SELECT o_orderkey, event_id FROM r WHERE rn = 1
         ORDER BY o_orderkey, event_id""",
    // x32/x33: forward and nearest as-of twins of x18 — same tables,
    // same ns-exact comparison, tie rules spelled out in the ORDER BY
    "x32_asof_forward" ->
      """WITH pairs AS (
           SELECT o.o_orderkey, e.event_id, e.ts
           FROM orders o LEFT JOIN events e
             ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate),
         r AS (
           SELECT o_orderkey, event_id,
             ROW_NUMBER() OVER (PARTITION BY o_orderkey
               ORDER BY ts ASC NULLS LAST, event_id DESC NULLS LAST) AS rn
           FROM pairs)
         SELECT o_orderkey, event_id FROM r WHERE rn = 1
         ORDER BY o_orderkey, event_id""",
    "x33_asof_nearest" ->
      """WITH pairs AS (
           SELECT o.o_orderkey, e.event_id,
             epoch_ns(e.ts) AS tn,
             epoch_ns(CAST(o.o_orderdate AS TIMESTAMP)) AS od
           FROM orders o LEFT JOIN events e ON e.user_id = o.o_custkey),
         r AS (
           SELECT o_orderkey, event_id,
             ROW_NUMBER() OVER (PARTITION BY o_orderkey
               ORDER BY ABS(tn - od) ASC NULLS LAST,
                 (CASE WHEN tn <= od THEN 0 ELSE 1 END) ASC,
                 event_id DESC NULLS LAST) AS rn
           FROM pairs)
         SELECT o_orderkey, event_id FROM r WHERE rn = 1
         ORDER BY o_orderkey, event_id""",
    // x12: the per-token value is md5-derived (first 8 hex digits),
    // bit-identical in both engines; the polynomial fold is the same
    // mod-2³¹−1 recurrence (DuckDB list_reduce ≡ Spark aggregate).
    "x12_rolling_hash" ->
      """SELECT doc_id,
         CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(text, ' '),
               t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 2147483647)),
           (acc, x) -> (acc * 1000003 + x) % 2147483647) AS BIGINT) AS roll_fp
         FROM documents ORDER BY doc_id""",
    // x24: the lookaround split isn't RE2-expressible, but its fragment
    // count is exactly (# maximal alnum runs) + (# non-alnum non-space
    // chars) — both RE2-computable, so the oracle checks the same count.
    "x24_bpeish_tokens" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) +
              length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_bpeish
         FROM documents ORDER BY doc_id""",
    // x09/x13: cosine scores are bit-identical cross-engine because both
    // engines fold the zipped products left-to-right in double (Spark
    // `aggregate` ≡ DuckDB `list_reduce`), so rank and permille match
    // exactly — verified at sf0.001 and sf0.01.
    "x09_cosine_topk" -> cosineTopKOracle,
    "x13_cosine_native" -> cosineTopKOracle,
    // x08: pigeonhole banding has recall 1.0, so the LSH result set is
    // plan-independent — the oracle certifies it by brute-force
    // all-pairs Hamming filtering over md5-keyed 60-bit signatures.
    "x08_simhash_pairs" -> simHashOracle,
    // x07: the ENTIRE MinHash+LSH pipeline — shingles, 16 seeded
    // md5-keyed minhashes, 4-band buckets, candidate join, exact-Jaccard
    // verification — replicated step for step in DuckDB. Unlike x08 the
    // candidate set is probabilistic (S-curve), so the oracle must run
    // the same hashes; md5 keying makes that possible.
    "x07_minhash_lsh" -> minHashLshOracle,
    "x38_jaccard_sweep" -> jaccardSweepOracle,
    "x39_repetition" -> repetitionOracle,
    // x46: df over the same distinct shingle chain, then the per-doc
    // unique fraction — pure integer arithmetic
    "x46_novelty" ->
      (s"""WITH ${shingleCtes(3)},
         dfreq AS (SELECT sh AS shv, COUNT(*) AS df FROM sh GROUP BY sh)
         SELECT s.doc_id AS doc_id,
           CAST((CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000)
             // COUNT(*) AS BIGINT) AS novel_permille
         FROM sh s JOIN dfreq d ON s.sh = d.shv
         GROUP BY s.doc_id ORDER BY doc_id, novel_permille"""),
    // x47: the BM25 formula replayed term for term — every constant
    // forced ::DOUBLE (a bare 1.2 is DECIMAL in DuckDB, and decimal
    // arithmetic would diverge from Spark's doubles); milli rounding
    // absorbs summation-order ulps
    "x47_bm25_topk" ->
      """WITH dl AS (SELECT doc_id,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS dl
           FROM documents),
         stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
         tf AS (SELECT doc_id, tok, COUNT(*) AS tf
           FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
           WHERE tok IN ('vector', 'stream', 'join') GROUP BY doc_id, tok),
         dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok)
         SELECT tf.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit,
           CAST(FLOOR(SUM(
             ln(1 + (stats.n_docs - dfq.df + 0.5::DOUBLE) / (dfq.df + 0.5::DOUBLE))
             * tf.tf * (1.2::DOUBLE + 1)
             / (tf.tf + 1.2::DOUBLE * ((1 - 0.75::DOUBLE) + 0.75::DOUBLE * dl.dl / stats.avgdl))
           ) * 1000 + 0.5) AS BIGINT) AS score_milli
         FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
         GROUP BY tf.doc_id
         ORDER BY score_milli DESC, doc_id LIMIT 20""",
    // x48: gaps-and-islands at epoch µs (DuckDB's scan already
    // floor-truncated the ns parquet type, mirroring Tables.events);
    // explicit ROWS frame (event_id is unique so RANGE would equal
    // ROWS, but say what we mean); cents guard on the value total
    "x48_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tn, value FROM events),
         g AS (SELECT *, CASE WHEN lag(tn) OVER w IS NULL
               OR tn - lag(tn) OVER w > 43200000000 THEN 1 ELSE 0 END AS nw
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tn, event_id)),
         s AS (SELECT *, SUM(nw) OVER (PARTITION BY user_id ORDER BY tn, event_id
             ROWS UNBOUNDED PRECEDING) AS session_seq FROM g)
         SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(tn) AS start_ts, MAX(tn) AS end_ts,
           CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS value_cents
         FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""",
    // x49: change points via null-safe inequality (IS DISTINCT FROM ≡
    // Spark's <=> negation), intervals closed by lead over survivors
    "x49_scd2" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tn, event_type FROM events),
         m AS (SELECT *, lag(event_type) OVER w AS prev, row_number() OVER w AS rn
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tn, event_id)),
         c AS (SELECT * FROM m WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
         SELECT user_id, event_type, tn AS valid_from_ts,
           lead(tn) OVER w2 AS valid_to_ts,
           CAST(row_number() OVER w2 AS BIGINT) AS version
         FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY tn, event_id)
         ORDER BY user_id, version""",
    // x50: exact-percentile clip bands (same interop contract as x26),
    // cents guard on the clipped mean
    "x50_winsorize" ->
      """WITH b AS (SELECT event_type, quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
           FROM events GROUP BY event_type)
         SELECT e.event_type AS event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(FLOOR(AVG(LEAST(GREATEST(e.value, b.lo), b.hi)) * 100 + 0.5) AS BIGINT)
             AS wmean_cents
         FROM events e JOIN b USING (event_type)
         GROUP BY e.event_type ORDER BY event_type NULLS FIRST""",
    // x51: the unigram NLL replayed with the same double shapes
    // (BIGINT/BIGINT division is true division in DuckDB, matching
    // Spark's long/long → double); millinat rounding absorbs
    // summation-order ulps
    "x51_surprisal" ->
      """WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
         c AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
         t AS (SELECT SUM(cnt) AS total FROM c)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(FLOOR(SUM(-ln(c.cnt / t.total)) / COUNT(*) * 1000 + 0.5) AS BIGINT)
             AS nll_millinats
         FROM tok JOIN c USING (tok) CROSS JOIN t
         GROUP BY doc_id ORDER BY doc_id""",
    // x52: H = ln N − Σ n·ln n / N — the exact identity the Spark side
    // computes from the same group totals
    "x52_source_entropy" ->
      """WITH per AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2)
         SELECT lang, CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(FLOOR((ln(SUM(n)) - SUM(n * ln(n)) / SUM(n)) * 1000 + 0.5) AS BIGINT)
             AS entropy_millinats
         FROM per GROUP BY lang ORDER BY lang NULLS FIRST""",
    // x54: DuckDB's native ASOF JOIN replays both bracket lookups
    // (largest t ≤ g and smallest t ≥ g); the tie collapse, the lerp
    // arithmetic shape and the cents guard mirror the Spark side
    "x54_resample" ->
      """WITH ev0 AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
         ded AS (SELECT user_id, t, value FROM (
             SELECT *, row_number() OVER (
               PARTITION BY user_id, t ORDER BY event_id DESC) AS rn FROM ev0)
           WHERE rn = 1),
         grid AS (SELECT u.user_id, g.g_ts
           FROM (SELECT DISTINCT user_id FROM ev0) u
           CROSS JOIN (SELECT UNNEST(generate_series(
             1704067200000000, 1706659200000000, 86400000000)) AS g_ts) g),
         bw AS (SELECT grid.user_id, grid.g_ts, ded.t AS bt, ded.value AS bv
           FROM grid ASOF LEFT JOIN ded
           ON grid.user_id = ded.user_id AND ded.t <= grid.g_ts),
         fw AS (SELECT grid.user_id, grid.g_ts, ded.t AS ft, ded.value AS fv
           FROM grid ASOF LEFT JOIN ded
           ON grid.user_id = ded.user_id AND ded.t >= grid.g_ts)
         SELECT bw.user_id AS user_id, bw.g_ts AS g_ts,
           CASE WHEN bt = ft THEN 'exact'
                WHEN bt IS NOT NULL AND ft IS NOT NULL THEN 'lerp'
                WHEN bt IS NOT NULL THEN 'hold' ELSE 'backfill' END AS kind,
           CAST(FLOOR((CASE WHEN bt = ft THEN bv
                WHEN bt IS NOT NULL AND ft IS NOT NULL
                  THEN bv + (fv - bv) * (bw.g_ts - bt) / (ft - bt)
                WHEN bt IS NOT NULL THEN bv ELSE fv END) * 100 + 0.5) AS BIGINT)
             AS val_cents
         FROM bw JOIN fw ON bw.user_id = fw.user_id AND bw.g_ts = fw.g_ts
         ORDER BY user_id, g_ts""",
    // x53: per-vector max-abs int8 quantization — floor(x·127/s + 0.5)
    // is exact on the parquet floats widened to double, so the CSV
    // form and l1 norm replay bit for bit
    "x53_quantize_int8" ->
      """WITH s AS (SELECT vec_id, embedding,
             list_max(list_transform(embedding, e -> ABS(CAST(e AS DOUBLE)))) AS scale
           FROM embeddings)
         SELECT vec_id,
           array_to_string(CASE WHEN scale = 0 THEN
               list_transform(embedding, e -> 0)
             ELSE
               list_transform(embedding, e ->
                 CAST(FLOOR(CAST(e AS DOUBLE) * 127 / scale + 0.5) AS INTEGER))
             END, ',') AS q_csv,
           CAST(list_sum(CASE WHEN scale = 0 THEN
               list_transform(embedding, e -> 0)
             ELSE
               list_transform(embedding, e ->
                 CAST(ABS(FLOOR(CAST(e AS DOUBLE) * 127 / scale + 0.5)) AS INTEGER))
             END) AS BIGINT) AS q_l1
         FROM s ORDER BY vec_id""",
    "x40_pack_sequences" -> packSequencesOracle,
    "x41_contamination" -> contaminationOracle,
    // x42: the same md5-permille uniform as x35, cut into cumulative
    // slices — the assignment replays bit for bit
    "x42_split_assign" ->
      """SELECT doc_id,
           CASE WHEN h < 900 THEN 'train' WHEN h < 950 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000 AS h
           FROM documents)
         ORDER BY doc_id, split""",
    "x43_quality_gate" -> qualityGateOracle,
    // x44: the whole rate derivation is integer arithmetic over the
    // stratum counts — bottleneck total, per-stratum rates, md5 filter
    "x44_rebalance" ->
      """WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         t AS (SELECT lang, n, CASE lang WHEN 'en' THEN 500 WHEN 'fr' THEN 300
             WHEN 'zh' THEN 200 END AS tgt FROM cnt),
         tm AS (SELECT MIN(n * 1000 // tgt) AS tmax FROM t WHERE tgt IS NOT NULL),
         r AS (SELECT lang, (tgt * (SELECT tmax FROM tm)) // n AS rate
           FROM t WHERE tgt IS NOT NULL)
         SELECT d.doc_id AS doc_id, d.lang AS lang FROM documents d JOIN r ON d.lang = r.lang
         WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000 < r.rate
         ORDER BY d.doc_id, d.lang""",
    // x45: chunk boundaries are integer arithmetic; both engines slice
    // the same 1-based inclusive windows and join with single spaces
    "x45_chunk_tokens" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         n AS (SELECT doc_id, ts, GREATEST((len(ts) - 8 + 24 - 1) // 24, 1) AS nchunks FROM t),
         c AS (SELECT doc_id, ts, UNNEST(range(0, nchunks)) AS i FROM n)
         SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           CAST(len(ts[i*24+1 : i*24+32]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(ts[i*24+1 : i*24+32], ' ') AS chunk_text
         FROM c ORDER BY doc_id, chunk_id""",
    // x34: connected components over the x07 pair graph — the oracle
    // re-derives the pairs and closes them with a recursive CTE
    "x34_dup_clusters" -> dupClustersOracle,
    "x55_pagerank" -> pageRankOracle,
    // x35: md5-keyed sampling is engine-portable by construction —
    // the oracle replays the keep decision bit for bit
    "x35_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000
           < (CASE lang WHEN 'en' THEN 300 WHEN 'fr' THEN 800 WHEN 'zh' THEN 500 ELSE 100 END)
         ORDER BY doc_id, lang""",
    "x36_heavy_hitters" ->
      """SELECT tok, COUNT(*) AS n
         FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
         GROUP BY tok HAVING COUNT(*) >= 500 ORDER BY tok, n""",
    // x56: the ENTIRE fixed-point k-means trajectory — micro-quantized
    // coords, integer argmin assignments (ties → lowest index), rounded
    // integer centroid updates — replayed iteration for iteration
    "x56_kmeans" -> kmeansOracle,
    // x57: exact interpolated medians over integers are x.0/x.5 —
    // every quantity in the MAD fence is an exact double
    "x57_outliers_mad" ->
      """WITH t AS (SELECT doc_id, lang,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tok
           FROM documents),
         m AS (SELECT lang, median(n_tok) AS med FROM t GROUP BY lang),
         d AS (SELECT t.doc_id, t.lang, t.n_tok, ABS(t.n_tok - m.med) AS dev
           FROM t JOIN m ON t.lang = m.lang),
         md AS (SELECT lang, median(dev) AS mad FROM d GROUP BY lang)
         SELECT d.doc_id AS doc_id, d.lang AS lang, d.n_tok AS n_tok,
           CAST(FLOOR(d.dev * 1000.0) AS BIGINT) AS dev_milli
         FROM d JOIN md ON d.lang = md.lang
         WHERE d.dev * 1000.0 > 1900.0 * md.mad
         ORDER BY doc_id, lang, n_tok, dev_milli""",
    // x58: bit interleave is pure integer shift/mask arithmetic —
    // identical spelling both engines
    "x58_zorder" -> zOrderOracle,
    "x59_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map(c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
            COUNT(*) - COUNT($c) AS n_null,
            COUNT(DISTINCT $c) AS n_distinct FROM documents""")
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")
    },
    // x60: both pools replayed (x47's BM25 at depth 50; x09's cosine
    // restricted to query 0), then the two-term RRF sum — ranks are
    // integers, the fusion is two IEEE divisions + one addition in a
    // fixed order, rounded to micros
    "x60_hybrid_rrf" -> hybridRrfOracle,
    // x61: the vocabulary rank (count DESC, token ASC) and the OOV→0
    // encoding are pure integer/string operations
    "x61_vocab_encode" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         tk AS (SELECT doc_id, UNNEST(range(1, len(ts) + 1)) AS i, ts FROM t),
         tt AS (SELECT doc_id, i, ts[CAST(i AS INT)] AS tok FROM tk),
         cnt AS (SELECT tok, COUNT(*) AS n FROM tt GROUP BY tok),
         v AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS id
               FROM cnt ORDER BY n DESC, tok LIMIT 512),
         e AS (SELECT tt.doc_id, tt.i, COALESCE(v.id, 0) AS id
               FROM tt LEFT JOIN v USING (tok))
         SELECT doc_id, string_agg(CAST(id AS VARCHAR), ',' ORDER BY i) AS ids_csv,
           COUNT(*) AS n_tok,
           CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         FROM e GROUP BY doc_id ORDER BY doc_id""",
    // x62: the md5 permutation rank replayed per group
    "x62_group_sample" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
               % 1000000007, doc_id) AS rn
           FROM documents) WHERE rn <= 5 ORDER BY doc_id, lang""",
    // x63: same simulated next drop, same md5 fingerprints
    "x63_snapshot_diff" ->
      """WITH o AS (SELECT doc_id AS k, md5(text) AS fp FROM documents),
         nn AS (SELECT doc_id AS k, md5(text) AS fp FROM (
           SELECT doc_id, CASE WHEN doc_id % 53 = 0 THEN text || ' v2' ELSE text END AS text
           FROM documents WHERE doc_id % 97 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 4)),
         f AS (SELECT COALESCE(o.k, nn.k) AS doc_id,
             CASE WHEN o.fp IS NULL THEN 'added' WHEN nn.fp IS NULL THEN 'removed'
                  WHEN o.fp <> nn.fp THEN 'changed' ELSE 'unchanged' END AS status
           FROM o FULL OUTER JOIN nn ON o.k = nn.k)
         SELECT doc_id, status FROM f WHERE status <> 'unchanged'
         ORDER BY doc_id, status""",
    // x64: integer bin arithmetic; negative-numerator div differences
    // are clamped into bin 0 in both engines
    "x64_histogram" ->
      """SELECT LEAST(GREATEST((n_chars - 0) * 12 // 600, 0), 11) AS bin,
           COUNT(*) AS n
         FROM documents WHERE n_chars IS NOT NULL GROUP BY 1 ORDER BY bin""",
    // x65: same shingle chain as x06/x38; containment normalizes by
    // the SMALLER set, Jaccard by the union — both integer permille
    "x65_containment" -> containmentOracle(3),
    // x74: the prefix-filtered plan answers to the same oracle FORM
    // (at its own shingleK) — plan-independence is the claim certified
    "x74_containment_prefix" -> containmentOracle(3),
    // x77: same exact-integer ratios, same ln shapes as x51; millinat
    // rounding absorbs summation-order ulps
    "x77_bigram_surprisal" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         le AS (SELECT doc_id, ts FROM t WHERE len(ts) >= 2),
         pos AS (SELECT doc_id, ts, UNNEST(range(1, len(ts))) AS i FROM le),
         bi AS (SELECT doc_id, ts[i] AS w1, ts[i] || ' ' || ts[i + 1] AS bg FROM pos),
         c2 AS (SELECT bg, COUNT(*) AS c2 FROM bi GROUP BY bg),
         tokt AS (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
         c1 AS (SELECT tok, COUNT(*) AS c1 FROM tokt GROUP BY tok),
         v AS (SELECT COUNT(*) AS v FROM c1)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(FLOOR(SUM(ln((c1.c1 + v.v) / (c2.c2 + 1))) / COUNT(*) * 1000 + 0.5)
             AS BIGINT) AS nll_millinats
         FROM bi JOIN c2 USING (bg) JOIN c1 ON bi.w1 = c1.tok CROSS JOIN v
         GROUP BY doc_id ORDER BY doc_id""",
    // x76: NOT EXISTS on the md5 fingerprint — content identity, not
    // key identity (the added-but-copied rows vanish, unlike x63)
    "x76_new_docs" ->
      """WITH nn AS (
           SELECT doc_id, CASE WHEN doc_id % 53 = 0 THEN text || ' v2' ELSE text END AS text
           FROM documents WHERE doc_id % 97 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 4)
         SELECT doc_id FROM nn n
         WHERE NOT EXISTS (SELECT 1 FROM documents b WHERE md5(b.text) = md5(n.text))
         ORDER BY doc_id""",
    // x75: same planted text, same RE2-and-Java-common patterns;
    // counts pre-redaction, replacements in rule order
    "x75_redact" ->
      """WITH t AS (SELECT doc_id,
           text || CASE WHEN doc_id % 7 = 0
               THEN ' contact user' || CAST(doc_id % 100 AS VARCHAR) || '@example.com now'
               ELSE '' END
             || CASE WHEN doc_id % 13 = 0
               THEN ' see https://ex.org/p' || CAST(doc_id AS VARCHAR)
               ELSE '' END AS text2
           FROM documents)
         SELECT doc_id,
           regexp_replace(regexp_replace(text2,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^ ]+', '<URL>', 'g') AS clean,
           CAST(len(regexp_extract_all(text2,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text2, 'https?://[^ ]+')) AS BIGINT) AS n_url
         FROM t ORDER BY doc_id""",
    // x66: the merge law — split-state merge must equal one full
    // aggregation over all rows (same cents spelling as q02)
    "x66_incremental_agg" ->
      """SELECT o_custkey, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS tot
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    // x67: smallest power-of-two rung ≥ token count; integer waste
    "x67_length_buckets" ->
      """WITH t AS (SELECT LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tok
           FROM documents),
         b AS (SELECT CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32
             WHEN n_tok <= 64 THEN 64 WHEN n_tok <= 128 THEN 128
             WHEN n_tok <= 256 THEN 256 WHEN n_tok <= 512 THEN 512
             ELSE 1024 END AS bucket, n_tok FROM t)
         SELECT bucket, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           CAST(1000 - (SUM(n_tok) * 1000) // (COUNT(*) * bucket) AS BIGINT)
             AS waste_permille
         FROM b GROUP BY bucket ORDER BY bucket""",
    // x68: positional 5-gram diagonals → islands; i is 1-based in the
    // CTE chain, start offsets re-based to 0 to match posexplode
    "x68_shared_runs" -> sharedRunsOracle,
    // x69: the same ±1 literals (generated from the same md5-parity
    // function) baked into SQL — every yj an exact integer sum
    "x69_random_project" -> randomProjectOracle,
    // x70: count → window total + deterministic tie-break replayed
    "x70_majority_vote" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
                    FROM events GROUP BY 1, 2),
         t AS (SELECT user_id, event_type, n,
                 SUM(n) OVER (PARTITION BY user_id) AS total,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY n DESC, event_type) AS rn
               FROM c)
         SELECT user_id, event_type AS winner, n AS votes,
           CAST((n * 1000) // total AS BIGINT) AS agreement_permille
         FROM t WHERE rn = 1 ORDER BY user_id""",
    // x71: RANK ties share a calibrated score; 1-row groups pin to 0
    "x71_rank_calibrate" ->
      """WITH t AS (SELECT doc_id, lang, n_chars,
             RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS r,
             COUNT(*) OVER (PARTITION BY lang) AS cnt
           FROM documents)
         SELECT doc_id, lang, n_chars,
           CAST(CASE WHEN cnt = 1 THEN 0
                ELSE ((r - 1) * 1000) // (cnt - 1) END AS BIGINT) AS pr_permille
         FROM t ORDER BY doc_id, lang""",
    // x73: kmeans chain + x09-parity cosine + x34-style closure
    "x73_semantic_dedup" -> semanticDedupOracle,
    // x72: same floor-div shift, same power-of-two weights — integers
    // end to end, so the decayed totals hash-match
    "x72_decayed_counts" ->
      """WITH a AS (SELECT MAX(CAST(ts AS DATE)) AS ad FROM events),
         e AS (SELECT event_type,
                 date_diff('day', CAST(ts AS DATE), (SELECT ad FROM a)) AS age
               FROM events),
         w AS (SELECT event_type,
                 CASE WHEN age // 2 <= 19 THEN 1000000 // (1 << (age // 2))
                      ELSE 0 END AS wt
               FROM e)
         SELECT event_type, COUNT(*) AS n_raw,
           CAST(SUM(wt) AS BIGINT) AS decayed_micro
         FROM w GROUP BY event_type ORDER BY event_type""",
    // x88: token totals via the x03 identity; sqrt weights (x81 rule);
    // HUGEINT quota/share/epoch arithmetic mirrors Spark's DECIMAL(38,0)
    "x88_mixture_report" ->
      """WITH c AS (SELECT lang AS grp, COUNT(*) AS n_docs,
             CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS BIGINT) AS n_tokens
           FROM documents WHERE lang IS NOT NULL GROUP BY lang),
         w AS (SELECT grp, n_docs, n_tokens,
             CAST(FLOOR(sqrt(n_tokens) * 1000000) AS BIGINT) AS w FROM c),
         t AS (SELECT CAST(SUM(n_tokens) AS HUGEINT) AS tot_tokens,
             CAST(SUM(w) AS HUGEINT) AS tot_w FROM w),
         q AS (SELECT grp, n_docs, n_tokens,
             CAST((CAST(n_tokens AS HUGEINT) * 1000) // tot_tokens AS BIGINT) AS share_permille,
             CAST((CAST(500000 AS HUGEINT) * w) // tot_w AS BIGINT) AS quota_tokens
           FROM w CROSS JOIN t)
         SELECT grp, n_docs, n_tokens, share_permille, quota_tokens,
           CAST((CAST(quota_tokens AS HUGEINT) * 1000) // n_tokens AS BIGINT) AS epochs_milli
         FROM q ORDER BY grp""",
    // x89: the x34 recursive-CTE closure, then pure integer histogram
    // arithmetic; the singleton row replays Spark's two-scalar
    // complement exactly
    "x89_cluster_sizes" ->
      s"""WITH RECURSIVE $minHashPairsCtes,
         sym AS (SELECT da AS s, db AS d FROM pairs
                 UNION SELECT db AS s, da AS d FROM pairs),
         verts AS (SELECT DISTINCT s AS v FROM sym),
         reach AS (SELECT v AS a, v AS b FROM verts
                   UNION SELECT r.a, s.d FROM reach r JOIN sym s ON r.b = s.s),
         lab AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
         csizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id),
         multi AS (SELECT cluster_size, COUNT(*) AS n_clusters FROM csizes GROUP BY cluster_size),
         tot AS (SELECT COUNT(doc_id) AS n FROM documents),
         labn AS (SELECT COUNT(*) AS n FROM lab)
         SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(n_clusters AS BIGINT) AS n_clusters FROM (
           SELECT cluster_size, n_clusters FROM multi
           UNION ALL
           SELECT 1, tot.n - labn.n FROM tot CROSS JOIN labn WHERE tot.n > labn.n)
         ORDER BY cluster_size""",
    // x90: the x07 pair CTEs joined to each endpoint's source, then
    // the unordered (LEAST, GREATEST) cell count
    "x90_source_overlap" ->
      s"""WITH $minHashPairsCtes,
         ga AS (SELECT p.da, p.db, d.source AS sa
                FROM pairs p JOIN documents d ON p.da = d.doc_id),
         gb AS (SELECT g.da, g.db, g.sa, d.source AS sb
                FROM ga g JOIN documents d ON g.db = d.doc_id)
         SELECT LEAST(sa, sb) AS source_a, GREATEST(sa, sb) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
         FROM gb GROUP BY 1, 2 ORDER BY source_a, source_b""",
    // x91: integer counts, ROW_NUMBER + running sum over the
    // vocabulary-bounded counts table, integer permille
    "x91_vocab_coverage" ->
      """WITH c AS (SELECT tok, COUNT(*) AS n
           FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
           GROUP BY tok),
         t AS (SELECT SUM(n) AS total FROM c),
         r AS (SELECT tok, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rank,
             SUM(n) OVER (ORDER BY n DESC, tok) AS cum FROM c)
         SELECT CAST(rank AS BIGINT) AS rank, tok, n,
           CAST((cum * 1000) // total AS BIGINT) AS cum_permille
         FROM r CROSS JOIN t WHERE rank <= 25 ORDER BY rank""",
    // x92: x71's histogram percent-rank, filtered to the top band —
    // ties share a rank so tie classes keep/drop atomically
    "x92_top_quantile" ->
      """WITH t AS (SELECT doc_id, lang, n_chars,
             RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS r,
             COUNT(*) OVER (PARTITION BY lang) AS cnt
           FROM documents),
         p AS (SELECT doc_id, lang, n_chars,
             CAST(CASE WHEN cnt = 1 THEN 0
                  ELSE ((r - 1) * 1000) // (cnt - 1) END AS BIGINT) AS pr_permille
           FROM t)
         SELECT doc_id, lang, n_chars, pr_permille FROM p
         WHERE pr_permille >= 750 ORDER BY doc_id""",
    // x93: population mean/σ per dimension in DOUBLE, z milli-rounded
    // half-up — the x53 CSV output discipline; constant dims → 0
    "x93_standardize" ->
      """WITH pos AS (SELECT vec_id, UNNEST(embedding) AS e,
             UNNEST(range(len(embedding))) AS i FROM embeddings),
         st AS (SELECT i, AVG(CAST(e AS DOUBLE)) AS m,
             AVG(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)) AS m2
           FROM pos GROUP BY i),
         sd AS (SELECT i, m, sqrt(GREATEST(m2 - m * m, 0)) AS s FROM st)
         SELECT p.vec_id,
           string_agg(CASE WHEN sd.s = 0 THEN '0'
             ELSE CAST(CAST(FLOOR((CAST(p.e AS DOUBLE) - sd.m) / sd.s * 1000 + 0.5)
               AS BIGINT) AS VARCHAR) END, ',' ORDER BY p.i) AS z_csv
         FROM pos p JOIN sd ON p.i = sd.i
         GROUP BY p.vec_id ORDER BY vec_id""",
    // x87: x03's LENGTH-difference token identity summed per lang;
    // pure integer division
    "x87_fertility" ->
      """SELECT lang AS grp, COUNT(*) AS n_docs,
           CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS BIGINT) AS n_tokens,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
           CAST((SUM(LENGTH(text)) * 1000)
             // SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS BIGINT)
             AS chars_per_kilotoken
         FROM documents WHERE lang IS NOT NULL
         GROUP BY lang ORDER BY grp""",
    // x86: integer counts + deterministic (n DESC, tok) rank replay
    "x86_group_heavy_hitters" ->
      """WITH t AS (SELECT lang AS grp, UNNEST(string_split(text, ' ')) AS tok
           FROM documents WHERE lang IS NOT NULL),
         c AS (SELECT grp, tok, COUNT(*) AS n FROM t GROUP BY grp, tok),
         r AS (SELECT grp, tok, n, ROW_NUMBER() OVER (PARTITION BY grp
                 ORDER BY n DESC, tok) AS rank FROM c)
         SELECT grp, tok, n, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 10 ORDER BY grp, rank, tok, n""",
    // x85: x34's recursive-CTE closure, then the argmax replayed as a
    // rank window over (n_chars DESC, doc_id)
    "x85_survivor_quality" ->
      s"""WITH RECURSIVE $minHashPairsCtes,
         sym AS (SELECT da AS s, db AS d FROM pairs
                 UNION SELECT db AS s, da AS d FROM pairs),
         verts AS (SELECT DISTINCT s AS v FROM sym),
         reach AS (SELECT v AS a, v AS b FROM verts
                   UNION SELECT r.a, s.d FROM reach r JOIN sym s ON r.b = s.s),
         cc AS (SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS cluster_id
                FROM reach GROUP BY a),
         sc AS (SELECT cc.doc_id, cc.cluster_id, d.n_chars
                FROM cc JOIN documents d ON cc.doc_id = d.doc_id),
         r AS (SELECT cluster_id, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY cluster_id
                   ORDER BY n_chars DESC, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
               FROM sc)
         SELECT cluster_id, doc_id AS keep_id,
           CAST(n_members AS BIGINT) AS n_members
         FROM r WHERE rn = 1 ORDER BY cluster_id, keep_id, n_members""",
    // x84: normalization chain replayed with 'g'-flagged RE2∩Java
    // patterns (x75 discipline); ASCII lower parity
    "x84_dedup_normalized" ->
      """WITH u AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 8000000 AS doc_id, upper(text) || '!!' AS text
           FROM documents WHERE doc_id < 8)
         SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count FROM u
         GROUP BY MD5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
         ORDER BY keep_id, dup_count""",
    // x83: the x09/x13 double-fold cosine replay with the label filter;
    // null labels excluded both sides, ties broken by neighbor id
    "x83_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id < 10 AND label IS NOT NULL),
         c AS (SELECT vec_id AS neighbor_id, label AS clabel,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
           FROM embeddings WHERE label IS NOT NULL),
         s AS (SELECT query_id, neighbor_id,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list_zip(qv, cv), p -> p[1] * p[2])), (a, b) -> a + b) AS d,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(qv, x -> x * x)), (a, b) -> a + b)) *
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(cv, x -> x * x)), (a, b) -> a + b)) AS n
           FROM q, c WHERE qlabel <> clabel),
         r AS (SELECT query_id, neighbor_id,
             CASE WHEN n = 0 THEN 0.0 ELSE d / n END AS score,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY (CASE WHEN n = 0 THEN 0.0 ELSE d / n END) DESC, neighbor_id) AS rank
           FROM s)
         SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
           CAST(FLOOR(score * 1000 + 0.5) AS BIGINT) AS cos_permille
         FROM r WHERE rank <= 5
         ORDER BY query_id, rank, neighbor_id, cos_permille""",
    // x82: the gram chain replays gram_hashes (multiplicity kept);
    // bucket = h % 4096 exact; ONE ln per bucket, factors cast to
    // DOUBLE before the multiply (exact below 2^53, same IEEE product
    // above — and never an ANSI Long overflow on the Spark side);
    // per-doc SUM(ln) absorbed by millinat floor (x77)
    "x82_dsir_weights" ->
      s"""WITH ${gramCtes(2, "documents", "r")},
         ${gramCtes(2, "(SELECT * FROM documents WHERE n_chars >= 300)", "t")},
         rb AS (SELECT doc_id, h % 4096 AS b FROM rgr),
         tb AS (SELECT h % 4096 AS b FROM tgr),
         qc AS (SELECT b, COUNT(*) AS qcnt FROM rb GROUP BY b),
         tc AS (SELECT b, COUNT(*) AS tcnt FROM tb GROUP BY b),
         tot AS (SELECT (SELECT SUM(tcnt) FROM tc) AS ttot,
                 (SELECT SUM(qcnt) FROM qc) AS qtot),
         lnr AS (SELECT qc.b,
             ln((CAST(COALESCE(tc.tcnt, 0) + 1 AS DOUBLE) * CAST(tot.qtot + 4096 AS DOUBLE))
                / (CAST(qc.qcnt + 1 AS DOUBLE) * CAST(tot.ttot + 4096 AS DOUBLE))) AS lnr
           FROM qc LEFT JOIN tc ON qc.b = tc.b CROSS JOIN tot)
         SELECT rb.doc_id AS doc_id, COUNT(*) AS n_grams,
           CAST(FLOOR(SUM(lnr.lnr) * 1000 + 0.5) AS BIGINT) AS logw_millinats
         FROM rb JOIN lnr ON rb.b = lnr.b
         GROUP BY rb.doc_id ORDER BY doc_id""",
    // x81: floor(sqrt(n)·10⁶) is reproducible because IEEE sqrt is
    // correctly rounded in both engines; quota/rate arithmetic is
    // integer (HUGEINT here, BigInt in Spark); selection replays the
    // x35/x44 md5 hash decision bit-for-bit at PERMILLION granularity
    // (permille would floor sub-n/1000 quotas to zero)
    "x81_temperature_mix" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents
             WHERE lang IS NOT NULL GROUP BY lang),
         w AS (SELECT lang, n, CAST(FLOOR(sqrt(n) * 1000000) AS BIGINT) AS w FROM c),
         t AS (SELECT SUM(w) AS tw FROM w),
         q AS (SELECT lang, n, LEAST(CAST(n AS HUGEINT), (500 * w) // tw) AS quota
               FROM w CROSS JOIN t),
         r AS (SELECT lang, (quota * 1000000) // n AS rate FROM q)
         SELECT d.doc_id AS doc_id, d.lang AS lang
         FROM documents d JOIN r ON d.lang = r.lang
         WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 < r.rate
         ORDER BY d.doc_id, d.lang""",
    // x80: the x07 full-replay discipline over two tables — signatures,
    // banding, candidates and verification all re-derived in SQL
    "x80_cross_neardup" -> crossNearDupOracle,
    // x79: bin rule is x64's exact integer arithmetic; ONE ln per bin
    // over a ratio of exact integer products, p-differences are single
    // IEEE divisions, floor-rounded micronats absorb ulp skew (x51/x77
    // discipline). Same nn CTE as x76 — the same simulated drop.
    "x79_psi_drift" ->
      """WITH nn AS (
           SELECT doc_id, CASE WHEN doc_id % 53 = 0 THEN text || ' v2' ELSE text END AS text
           FROM documents WHERE doc_id % 97 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 4),
         a AS (SELECT LEAST(GREATEST(length(text) * 12 // 600, 0), 11) AS bin
               FROM documents WHERE text IS NOT NULL),
         b AS (SELECT LEAST(GREATEST(length(text) * 12 // 600, 0), 11) AS bin
               FROM nn WHERE text IS NOT NULL),
         ca AS (SELECT bin, COUNT(*) AS n_base FROM a GROUP BY bin),
         cb AS (SELECT bin, COUNT(*) AS n_next FROM b GROUP BY bin),
         spine AS (SELECT UNNEST(range(12)) AS bin),
         j AS (SELECT spine.bin,
                 COALESCE(ca.n_base, 0) AS n_base,
                 COALESCE(cb.n_next, 0) AS n_next
               FROM spine LEFT JOIN ca USING (bin) LEFT JOIN cb USING (bin)),
         t AS (SELECT CAST(SUM(n_base) AS BIGINT) AS tot_base,
                 CAST(SUM(n_next) AS BIGINT) AS tot_next FROM j)
         SELECT bin, n_base, n_next,
           CAST(FLOOR(((n_base + 1) / (tot_base + 12) - (n_next + 1) / (tot_next + 12))
             * ln(((n_base + 1) * (tot_next + 12)) / ((n_next + 1) * (tot_base + 12)))
             * 1000000 + 0.5) AS BIGINT) AS psi_micronats
         FROM j CROSS JOIN t ORDER BY bin""",
    // x94: the span table is a lateral unnest over stride positions,
    // substr is char-based 1-indexed in both engines; duplicated =
    // distinct-doc frequency ≥ 2; integer permille
    "x94_span_dedup" ->
      """WITH sp AS (
           SELECT doc_id, substr(text, CAST(p AS INTEGER), 40) AS span
           FROM documents, UNNEST(range(1, LENGTH(text) - 40 + 2, 10)) AS t(p)
           WHERE LENGTH(text) >= 40),
         df AS (SELECT span, COUNT(DISTINCT doc_id) AS df FROM sp GROUP BY span)
         SELECT s.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) * 1000 // COUNT(*) AS BIGINT)
             AS dup_permille
         FROM sp s JOIN df ON s.span = df.span
         GROUP BY s.doc_id ORDER BY doc_id""",
    // x95: same S-curve replay — power on integer-valued exponents,
    // milli-rounded averages over the 100-cell permille grid
    "x95_lsh_plan" ->
      """WITH f AS (SELECT CAST(b AS INTEGER) AS bands,
             CAST(16 // b AS INTEGER) AS rows_per_band
           FROM UNNEST(range(1, 16)) AS t(b)
           WHERE 16 % b = 0 AND b < 16 AND 16 // b > 1),
         g AS (SELECT bands, rows_per_band,
             CAST(c * 10 + 5 AS DOUBLE) / 1000.0 AS s
           FROM f, UNNEST(range(0, 100)) AS u(c)),
         p AS (SELECT bands, rows_per_band, s,
             1.0 - power(1.0 - power(s, CAST(rows_per_band AS DOUBLE)),
               CAST(bands AS DOUBLE)) AS p
           FROM g),
         a AS (SELECT bands, rows_per_band,
             CAST(FLOOR(AVG(CASE WHEN s < 0.3 THEN p END) * 1000 + 0.5) AS BIGINT)
               AS fp_milli,
             CAST(FLOOR(AVG(CASE WHEN s >= 0.3 THEN 1.0 - p END) * 1000 + 0.5) AS BIGINT)
               AS fn_milli
           FROM p GROUP BY bands, rows_per_band)
         SELECT bands, rows_per_band, fp_milli, fn_milli,
           fp_milli + fn_milli AS err_milli
         FROM a ORDER BY bands""",
    // x96: moments stay exact (HUGEINT sums ≡ Spark decimal(38,0)),
    // the double conversion/subtraction/sqrt/divide tree is spelled
    // identically to the Spark side, then milli-rounded
    "x96_corr_matrix" -> corrMatrixOracle,
    // x97: integer contingency counts, window marginals, ONE ln per
    // cell over a ratio of exact integer products, micronat floor
    "x97_pmi_cells" ->
      """WITH cells AS (SELECT lang AS x, source AS y, COUNT(*) AS n_xy
           FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
           GROUP BY 1, 2),
         m AS (SELECT x, y, n_xy,
             SUM(n_xy) OVER (PARTITION BY x) AS n_x,
             SUM(n_xy) OVER (PARTITION BY y) AS n_y,
             SUM(n_xy) OVER () AS n
           FROM cells)
         SELECT x, y, n_xy,
           CAST(FLOOR(ln(CAST(n * n_xy AS DOUBLE) / CAST(n_x * n_y AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS pmi_micronats
         FROM m ORDER BY x, y""",
    // x98: NTILE over the same explicit total order (value + key tie
    // breaks) is the SQL-standard bucket rule in both engines
    "x98_equidepth" ->
      """WITH c AS (SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
             l_orderkey, l_linenumber FROM lineitem),
         t AS (SELECT price_c,
             NTILE(10) OVER (ORDER BY price_c, l_orderkey, l_linenumber) AS bucket
           FROM c)
         SELECT CAST(bucket AS INTEGER) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(price_c) AS lo, MAX(price_c) AS hi
         FROM t GROUP BY bucket ORDER BY bucket""",
    // x99: zipped-unnest position table (x93's pos CTE), self-join per
    // vector for cross moments, milli-rounded cov absorbs AVG
    // summation-order ulps
    "x99_covariance" ->
      """WITH pos AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS e,
             UNNEST(range(len(embedding))) AS i FROM embeddings),
         mm AS (SELECT i, AVG(e) AS m FROM pos GROUP BY i),
         x AS (SELECT a.i AS i, b.i AS j, AVG(a.e * b.e) AS m2
           FROM pos a JOIN pos b USING (vec_id) WHERE a.i <= b.i
           GROUP BY a.i, b.i)
         SELECT CAST(x.i AS BIGINT) AS i, CAST(x.j AS BIGINT) AS j,
           CAST(FLOOR((x.m2 - ma.m * mb.m) * 1000 + 0.5) AS BIGINT) AS cov_milli
         FROM x JOIN mm ma ON x.i = ma.i JOIN mm mb ON x.j = mb.i
         ORDER BY i, j""",
    // x100: the x07 pair CTEs → canonical low→high edges → oriented
    // wedge join (a<b<c, each triangle once) → per-corner explode
    "x100_triangles" ->
      s"""WITH $minHashPairsCtes,
         e AS (SELECT LEAST(da, db) AS a, GREATEST(da, db) AS b
               FROM pairs GROUP BY 1, 2),
         tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
                 FROM e e1 JOIN e e2 ON e1.b = e2.a
                 JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
         FROM (SELECT a AS doc_id FROM tri UNION ALL
               SELECT b AS doc_id FROM tri UNION ALL
               SELECT c AS doc_id FROM tri)
         GROUP BY doc_id ORDER BY doc_id""",
    // x101: same edge/triangle CTEs; every output is exact integer
    // arithmetic (wedges = Σ deg·(deg−1) div 2, gcc milli by int div)
    "x101_graph_summary" ->
      s"""WITH $minHashPairsCtes,
         e AS (SELECT LEAST(da, db) AS a, GREATEST(da, db) AS b
               FROM pairs GROUP BY 1, 2),
         deg AS (SELECT doc_id, COUNT(*) AS deg FROM
                 (SELECT a AS doc_id FROM e UNION ALL SELECT b AS doc_id FROM e)
                 GROUP BY doc_id),
         ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                  CAST(SUM(deg) // 2 AS BIGINT) AS n_edges,
                  CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
                FROM deg),
         tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
                 FROM e e1 JOIN e e2 ON e1.b = e2.a
                 JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri)
         SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges = 0 THEN NULL
                ELSE CAST((3 * n_triangles * 1000) // n_wedges AS BIGINT)
           END AS gcc_milli
         FROM ne CROSS JOIN nt""",
    // x102: the A-ES key replayed — md5-uniform (+1, so ln never sees
    // 0) over 2⁶⁰, ONE ln per row, ranking only (output is integers)
    "x102_weighted_sample" ->
      """WITH w AS (SELECT doc_id, lang, n_chars,
             ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                   AS BIGINT) AS DOUBLE) + 1.0) / 1152921504606846976.0)
               / CAST(n_chars AS DOUBLE) AS es
           FROM documents),
         t AS (SELECT doc_id, lang, n_chars FROM w ORDER BY es DESC, doc_id LIMIT 50)
         SELECT doc_id, lang, n_chars FROM t ORDER BY doc_id""",
    // x103: the x65 shingle CTEs + micronat IDF weights (ONE ln per
    // distinct shingle over exact integer counts), then pure integer
    // weighted-containment arithmetic
    "x103_weighted_containment" ->
      s"""WITH ${shingleCtes(3)},
         nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         dfq AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
         w AS (SELECT dfq.sh AS sh,
             CAST(FLOOR(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) AS wt
           FROM dfq CROSS JOIN nd),
         wr AS (SELECT s.doc_id AS doc_id, s.sh AS sh, w.wt AS wt
                FROM sh s JOIN w ON s.sh = w.sh),
         tw AS (SELECT doc_id, SUM(wt) AS tw FROM wr GROUP BY doc_id),
         pw AS (SELECT a.doc_id AS da, b.doc_id AS db, SUM(a.wt) AS cw
                FROM wr a JOIN wr b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
         SELECT da, db, CAST(cw AS BIGINT) AS common_w,
           CAST((cw * 1000) // LEAST(ta.tw, tb.tw) AS BIGINT) AS wcont_permille
         FROM pw JOIN tw ta ON pw.da = ta.doc_id JOIN tw tb ON pw.db = tb.doc_id
         WHERE LEAST(ta.tw, tb.tw) > 0
           AND (cw * 1000) // LEAST(ta.tw, tb.tw) >= 500
         ORDER BY da, db""",
    // x105: one md5 draw per token (the x35 hash contract), signed
    // bucket sums, zero-filled CSV over a doc×dim spine
    "x104_feature_hash" ->
      """WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
           FROM documents),
         c AS (SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 32 AS m
           FROM tok),
         s AS (SELECT doc_id, m % 16 AS idx,
             SUM(CASE WHEN m >= 16 THEN 1 ELSE -1 END) AS v
           FROM c GROUP BY doc_id, m % 16),
         g AS (SELECT d.doc_id, t.i FROM documents d, UNNEST(range(16)) AS t(i)),
         j AS (SELECT g.doc_id, g.i, COALESCE(s.v, 0) AS v
               FROM g LEFT JOIN s ON g.doc_id = s.doc_id AND g.i = s.idx)
         SELECT doc_id, string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS fh_csv
         FROM j GROUP BY doc_id ORDER BY doc_id""",
    // x106: the x07 CTEs + per-position signature equality over the
    // replayed h0..h15 columns; integer permille throughout
    "x105_jaccard_estimate" -> jaccardEstimateOracle,
    // x107: the x34 recursive closure labels + singleton fallback,
    // then the x42 md5 split rule keyed by cluster_id
    "x106_cluster_split" ->
      s"""WITH RECURSIVE $minHashPairsCtes,
         sym AS (SELECT da AS s, db AS d FROM pairs
                 UNION SELECT db AS s, da AS d FROM pairs),
         verts AS (SELECT DISTINCT s AS v FROM sym),
         reach AS (SELECT v AS a, v AS b FROM verts
                   UNION SELECT r.a, s.d FROM reach r JOIN sym s ON r.b = s.s),
         lab AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
         f AS (SELECT d.doc_id,
                 CAST(COALESCE(l.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
               FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
         h AS (SELECT doc_id, cluster_id,
                 CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)
                   AS BIGINT) % 1000 AS h
               FROM f)
         SELECT doc_id, cluster_id,
           CASE WHEN h < 800 THEN 'train' WHEN h < 900 THEN 'val' ELSE 'test'
           END AS split
         FROM h ORDER BY doc_id""",
    // x107: the x68 gram position chain with STRING grams (1-based i
    // shifted to the generator's 0-based pos), list-slice join
    "x107_ngram_table" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         le AS (SELECT doc_id, ts FROM toks WHERE len(ts) >= 3),
         pos AS (SELECT doc_id, ts, UNNEST(range(1, len(ts) - 3 + 2)) AS i FROM le)
         SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
           array_to_string(ts[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') AS gram
         FROM pos ORDER BY doc_id, pos""",
    // x108: byte-identical to x76 — the bloom prune must be invisible
    // in the result (no false negatives; false positives fall to the
    // exact anti-join)
    "x108_bloom_newdocs" ->
      """WITH nn AS (
           SELECT doc_id, CASE WHEN doc_id % 53 = 0 THEN text || ' v2' ELSE text END AS text
           FROM documents WHERE doc_id % 97 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 4)
         SELECT doc_id FROM nn n
         WHERE NOT EXISTS (SELECT 1 FROM documents b WHERE md5(b.text) = md5(n.text))
         ORDER BY doc_id""",
    // x109: champion chaining — each step's earliest event STRICTLY
    // after the previous champion, compared as integer nanos
    "x109_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(epoch_ns(ts)) AS t FROM events
             WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t FROM events e
             JOIN s1 ON e.user_id = s1.user_id AND epoch_ns(e.ts) > s1.t
             WHERE e.event_type = 'click' GROUP BY 1),
         s3 AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t FROM events e
             JOIN s2 ON e.user_id = s2.user_id AND epoch_ns(e.ts) > s2.t
             WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT 1 AS step_idx, 'view' AS step, (SELECT COUNT(*) FROM s1) AS n_users
         UNION ALL
         SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
         UNION ALL
         SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
         ORDER BY step_idx""",
    // x110: integer epoch-anchored weeks ((date - epoch) // 7), cohort
    // = each user's min week, one count per (cohort, offset) cell
    "x110_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
             CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS BIGINT) AS week
           FROM events),
         c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1)
         SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
           COUNT(*) AS n_users
         FROM uw JOIN c ON uw.user_id = c.user_id
         GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",
    // x111: lag over the per-user (ns, event_id) total order
    "x111_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_ns(ts), event_id) AS prev
           FROM events)
         SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
         FROM o WHERE prev IS NOT NULL
         GROUP BY 1, 2 ORDER BY from_type, to_type""",
    // x112: per-event cents (order-independent), dense day grid via
    // stop-exclusive range, nearest-observation windows with IGNORE
    // NULLS, interpolation from exact integers rounded back to cents
    "x112_gapfill" ->
      """WITH daily AS (
           SELECT user_id,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS obs
           FROM events GROUP BY 1, 2),
         span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
           FROM daily GROUP BY 1),
         grid AS (SELECT user_id, UNNEST(range(d0, d1 + 1)) AS day FROM span),
         j AS (SELECT g.user_id, g.day, d.obs
           FROM grid g LEFT JOIN daily d
             ON g.user_id = d.user_id AND g.day = d.day),
         n AS (SELECT user_id, day, obs,
             last_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
               OVER wp AS pd,
             last_value(obs IGNORE NULLS) OVER wp AS pc,
             first_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
               OVER wn AS nd,
             first_value(obs IGNORE NULLS) OVER wn AS nc
           FROM j
           WINDOW wp AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT user_id, day,
           CASE WHEN obs IS NOT NULL THEN obs
             ELSE CAST(FLOOR(pc + (nc - pc) * (day - pd) / (nd - pd) + 0.5) AS BIGINT)
           END AS cents,
           CASE WHEN obs IS NOT NULL THEN 0 ELSE 1 END AS interpolated
         FROM n ORDER BY user_id, day""",
    // x113: the sorted-neighbourhood replay — same block key, same
    // (name, side, id) sort, same window-8 candidate band, same
    // levenshtein gate
    "x113_sorted_linkage" ->
      """WITH u AS (
           SELECT c_custkey AS id, c_name AS name, 'base' AS side FROM customer
           UNION ALL
           SELECT c_custkey, substr(c_name, 1, 17) || 'X', 'probe'
           FROM customer WHERE c_custkey % 7 = 3),
         r AS (SELECT *, substr(name, 1, 16) AS blk,
             ROW_NUMBER() OVER (PARTITION BY substr(name, 1, 16)
               ORDER BY name, side, id) AS rn
           FROM u),
         pairs AS (SELECT a.id, a.name, a.side, b.id AS id_b,
             b.name AS name_b, b.side AS side_b,
             levenshtein(a.name, b.name) AS dist
           FROM r a JOIN r b
             ON a.blk = b.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + 8)
         SELECT CASE WHEN side = 'base' THEN id ELSE id_b END AS base_id,
           CASE WHEN side = 'base' THEN id_b ELSE id END AS probe_id,
           CAST(dist AS BIGINT) AS dist
         FROM pairs
         WHERE side <> side_b AND dist <= 1
         ORDER BY base_id, probe_id""",
    // x114: positional token table via the x107 range-UNNEST chain,
    // offsets 1..3 as a second UNNEST, pair counts with the same
    // HAVING bar as the Spark minCount
    "x114_skipgram" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
         pos AS (SELECT ts, UNNEST(range(1, len(ts) + 1)) AS i FROM toks),
         off AS (SELECT ts, i, UNNEST(range(1, 4)) AS o FROM pos)
         SELECT ts[CAST(i AS INTEGER)] AS a,
           ts[CAST(i + o AS INTEGER)] AS b, COUNT(*) AS n
         FROM off WHERE i + o <= len(ts)
         GROUP BY 1, 2 HAVING COUNT(*) >= 5
         ORDER BY a, b""",
    // x115: identical regression-sum tree — ONE ln per kept row, five
    // sums, one divide each for slope/intercept, milli floor
    "x115_zipf_fit" ->
      """WITH c AS (SELECT tok, COUNT(*) AS n
           FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
           GROUP BY 1),
         top AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS r
           FROM c ORDER BY n DESC, tok LIMIT 100),
         xy AS (SELECT ln(CAST(r AS DOUBLE)) AS x,
                       ln(CAST(n AS DOUBLE)) AS y FROM top),
         s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS d, SUM(x) AS sx,
                 SUM(y) AS sy, SUM(x*x) AS sxx, SUM(x*y) AS sxy FROM xy),
         f AS (SELECT d, sx, sy,
                 (d*sxy - sx*sy) / (d*sxx - sx*sx) AS slope FROM s)
         SELECT CAST(d AS BIGINT) AS v,
           CAST(FLOOR(slope * 1000 + 0.5) AS BIGINT) AS slope_milli,
           CAST(FLOOR((sy - slope*sx) / d * 1000 + 0.5) AS BIGINT)
             AS intercept_milli
         FROM f""",
    // x116: exact-integer z ingredients (n·d − Σn, d·Σn² − (Σn)²),
    // one sqrt + one divide, milli floor; zero-variance series pin 0
    "x116_daily_anomaly" ->
      """WITH daily AS (SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
             COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, day, n,
             n * (COUNT(*) OVER w) - (SUM(n) OVER w) AS num,
             (COUNT(*) OVER w) * (SUM(n*n) OVER w)
               - (SUM(n) OVER w) * (SUM(n) OVER w) AS rad
           FROM daily WINDOW w AS (PARTITION BY event_type)),
         z AS (SELECT event_type, day, n,
             CASE WHEN rad = 0 THEN 0
               ELSE CAST(FLOOR(1000 * num / SQRT(CAST(rad AS DOUBLE)) + 0.5)
                 AS BIGINT) END AS z_milli
           FROM st)
         SELECT event_type, day, n, z_milli,
           CASE WHEN ABS(z_milli) >= 1500 THEN 1 ELSE 0 END AS is_anomaly
         FROM z ORDER BY event_type, day""",
    // x117: two leads over the x111 (ns, event_id) total order; the
    // LIMIT boundary is deterministic via the full (n DESC, path)
    // tie-break
    "x117_event_paths" ->
      """WITH o AS (SELECT event_type AS step1,
             lead(event_type, 1) OVER w AS step2,
             lead(event_type, 2) OVER w AS step3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id))
         SELECT step1, step2, step3, COUNT(*) AS n
         FROM o WHERE step2 IS NOT NULL AND step3 IS NOT NULL
         GROUP BY 1, 2, 3
         ORDER BY n DESC, step1, step2, step3
         LIMIT 20""",
    // x118: the same lag rule over the same (user, type, ns, id) total
    // order; keep-first-of-burst ≡ "within gap of predecessor"
    "x118_debounce" ->
      """WITH o AS (SELECT event_id, user_id, event_type,
             epoch_ns(ts) AS t,
             lag(epoch_ns(ts)) OVER (PARTITION BY user_id, event_type
               ORDER BY epoch_ns(ts), event_id) AS prev
           FROM events)
         SELECT event_id, user_id, event_type,
           CASE WHEN prev IS NOT NULL AND t - prev <= 86400000000000
             THEN 1 ELSE 0 END AS suppressed
         FROM o ORDER BY event_id""",
    // x119: per-edge NOT IN over the same holed parent; COUNT FILTER
    // keeps every column BIGINT (no HUGEINT→float drift), integer
    // permille with the all-null guard
    "x119_fk_audit" ->
      """WITH po AS (SELECT DISTINCT o_orderkey AS k FROM orders
             WHERE o_orderkey % 100 <> 0),
         e1 AS (SELECT 'lineitem->orders' AS relation,
             COUNT(*) AS n_rows,
             COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS n_null_keys,
             COUNT(*) FILTER (WHERE l_orderkey IS NOT NULL
               AND l_orderkey NOT IN (SELECT k FROM po)) AS n_orphans
           FROM lineitem),
         e2 AS (SELECT 'orders->customer', COUNT(*),
             COUNT(*) FILTER (WHERE o_custkey IS NULL),
             COUNT(*) FILTER (WHERE o_custkey IS NOT NULL
               AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                     WHERE c_custkey IS NOT NULL))
           FROM orders),
         e3 AS (SELECT 'customer->nation', COUNT(*),
             COUNT(*) FILTER (WHERE c_nationkey IS NULL),
             COUNT(*) FILTER (WHERE c_nationkey IS NOT NULL
               AND c_nationkey NOT IN (SELECT n_nationkey FROM nation
                                       WHERE n_nationkey IS NOT NULL))
           FROM customer),
         u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
               UNION ALL SELECT * FROM e3)
         SELECT relation, n_rows, n_null_keys, n_orphans,
           CASE WHEN n_rows = n_null_keys THEN 0
             ELSE (n_orphans * 1000) // (n_rows - n_null_keys) END
             AS orphan_permille
         FROM u ORDER BY relation""",
    // x120: the x109 champion chain with the 1-day budget on each
    // step's join condition
    "x120_funnel_windowed" ->
      """WITH s1 AS (SELECT user_id, MIN(epoch_ns(ts)) AS t FROM events
             WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t FROM events e
             JOIN s1 ON e.user_id = s1.user_id AND epoch_ns(e.ts) > s1.t
               AND epoch_ns(e.ts) <= s1.t + 86400000000000
             WHERE e.event_type = 'click' GROUP BY 1),
         s3 AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t FROM events e
             JOIN s2 ON e.user_id = s2.user_id AND epoch_ns(e.ts) > s2.t
               AND epoch_ns(e.ts) <= s2.t + 86400000000000
             WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT 1 AS step_idx, 'view' AS step, (SELECT COUNT(*) FROM s1) AS n_users
         UNION ALL
         SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
         UNION ALL
         SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
         ORDER BY step_idx""",
    // x121: the as-of champion as a rank over in-window touches —
    // latest time then highest id, the backward-join tie rule; the
    // outer left join keeps organic conversions with NULLs
    "x121_attribution" ->
      """WITH p AS (SELECT event_id AS conversion_id, user_id,
             epoch_ns(ts) AS pt
           FROM events WHERE event_type = 'purchase'),
         t AS (SELECT user_id, event_id, event_type, epoch_ns(ts) AS tt
           FROM events WHERE event_type IN ('view', 'click')),
         j AS (SELECT p.conversion_id, t.event_id AS touch_id,
             t.event_type AS touch_type, p.pt - t.tt AS gap_ns,
             ROW_NUMBER() OVER (PARTITION BY p.conversion_id
               ORDER BY t.tt DESC, t.event_id DESC) AS rn
           FROM p JOIN t ON p.user_id = t.user_id
             AND t.tt <= p.pt AND t.tt >= p.pt - 604800000000000)
         SELECT p.conversion_id, p.user_id, j.touch_id, j.touch_type,
           j.gap_ns
         FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
           ON p.conversion_id = j.conversion_id
         ORDER BY p.conversion_id""",
    // x122: same contribution explode (each user-day counts toward its
    // windowDays trailing days), exact distincts, max-day clip, and
    // the same DENSE [min_day, max_day] grid (zero-activity days
    // report dau = 0, wau = 0 instead of going silent)
    "x122_rolling_actives" ->
      """WITH ud AS (SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day
           FROM events),
         b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
         g AS (SELECT UNNEST(range(d0, d1 + 1)) AS day FROM b),
         c AS (SELECT user_id, day + o AS day
           FROM ud, UNNEST(range(7)) AS t(o)),
         w AS (SELECT c.day, COUNT(DISTINCT c.user_id) AS wau
           FROM c, b WHERE c.day <= b.d1 GROUP BY 1),
         dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau
           FROM ud GROUP BY 1)
         SELECT g.day, COALESCE(dau.dau, 0) AS dau,
           COALESCE(w.wau, 0) AS wau
         FROM g LEFT JOIN w ON g.day = w.day
         LEFT JOIN dau ON g.day = dau.day
         ORDER BY g.day""",
    // x123: the same cumulative-histogram selection — 2·cum ≥ total on
    // the (lang, n_chars) weight table, lower median via MIN
    "x123_weighted_median" ->
      """WITH vals AS (SELECT lang AS grp, n_chars AS v,
             CAST(SUM(n_chars) AS BIGINT) AS w
           FROM documents
           WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           GROUP BY 1, 2),
         c AS (SELECT grp, v, w,
             SUM(w) OVER (PARTITION BY grp ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(w) OVER (PARTITION BY grp) AS tot
           FROM vals)
         SELECT grp, MIN(v) AS wmedian, CAST(MAX(tot) AS BIGINT) AS total_weight
         FROM c WHERE cum * 2 >= tot
         GROUP BY grp ORDER BY grp""",
    // x124: the same basket derivation, within-basket self-join, both
    // rule directions, exact integer measures, same support prune
    "x124_assoc_rules" ->
      """WITH items AS (SELECT DISTINCT user_id AS u,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             event_type AS item
           FROM events),
         nb AS (SELECT COUNT(*) AS n_baskets
           FROM (SELECT DISTINCT u, d FROM items)),
         s1 AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM items GROUP BY 1),
         p AS (SELECT a.item AS a, b.item AS b,
             CAST(COUNT(*) AS BIGINT) AS cnt_ab
           FROM items a JOIN items b ON a.u = b.u AND a.d = b.d
             AND a.item < b.item
           GROUP BY 1, 2),
         dr AS (SELECT a AS ant, b AS cons, cnt_ab FROM p
           UNION ALL SELECT b, a, cnt_ab FROM p)
         SELECT dr.ant, dr.cons, dr.cnt_ab AS support_cnt,
           (dr.cnt_ab * 1000) // nb.n_baskets AS support_permille,
           (dr.cnt_ab * 1000) // sa.cnt AS confidence_permille,
           (dr.cnt_ab * nb.n_baskets * 1000) // (sa.cnt * sb.cnt)
             AS lift_milli
         FROM dr
         JOIN s1 sa ON dr.ant = sa.item
         JOIN s1 sb ON dr.cons = sb.item
         CROSS JOIN nb
         WHERE dr.cnt_ab * 1000 >= nb.n_baskets * 50
         ORDER BY ant, cons""",
    // x125: the join-free form — if the elimination were unsound the
    // hashes would diverge (the Spark query text DOES contain the join)
    "x125_join_elim" ->
      """SELECT o_orderkey, o_custkey FROM orders
         ORDER BY o_orderkey LIMIT 1000""",
    // x126: the same lag-over-distinct-ids scan on the same holed view
    "x126_id_gaps" ->
      """WITH ids AS (SELECT DISTINCT event_id AS id FROM events
             WHERE event_id % 1000 <> 7),
         l AS (SELECT id, lag(id) OVER (ORDER BY id) AS prev FROM ids)
         SELECT prev + 1 AS gap_start, id - 1 AS gap_end,
           id - prev - 1 AS n_missing
         FROM l WHERE prev IS NOT NULL AND id - prev > 1
         ORDER BY gap_start""",
    // x127: the x114 pair chain at window 2 (UNFILTERED totals), then
    // the identical left-associated double tree — ONE ln per pair,
    // micronat floor — and the same (pmi DESC, a, b) LIMIT order
    "x127_collocations" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
         pos AS (SELECT ts, UNNEST(range(1, len(ts) + 1)) AS i FROM toks),
         off AS (SELECT ts, i, UNNEST(range(1, 3)) AS o FROM pos),
         pairs AS (SELECT ts[CAST(i AS INTEGER)] AS a,
             ts[CAST(i + o AS INTEGER)] AS b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
           FROM off WHERE i + o <= len(ts) GROUP BY 1, 2),
         uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
           FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
           GROUP BY 1),
         nt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM uni),
         pt AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS pp FROM pairs)
         SELECT p.a, p.b, p.n_ab,
           CAST(FLOOR(ln(CAST(p.n_ab AS DOUBLE) * nt.nn * nt.nn /
             (CAST(pt.pp AS DOUBLE) * na.n * nb.n)) * 1000000 + 0.5)
             AS BIGINT) AS pmi_micro
         FROM pairs p
         JOIN uni na ON p.a = na.tok
         JOIN uni nb ON p.b = nb.tok
         CROSS JOIN nt CROSS JOIN pt
         WHERE p.n_ab >= 10
         ORDER BY pmi_micro DESC, a, b LIMIT 50""",
    // x128: the x109 champion CTEs, per-user consecutive-stage joins,
    // then the x123 cumulative-median selection per transition
    "x128_funnel_times" ->
      """WITH s1 AS (SELECT user_id, MIN(epoch_ns(ts)) AS t FROM events
             WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t FROM events e
             JOIN s1 ON e.user_id = s1.user_id AND epoch_ns(e.ts) > s1.t
             WHERE e.event_type = 'click' GROUP BY 1),
         s3 AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t FROM events e
             JOIN s2 ON e.user_id = s2.user_id AND epoch_ns(e.ts) > s2.t
             WHERE e.event_type = 'purchase' GROUP BY 1),
         g AS (SELECT 2 AS step_idx, s2.t - s1.t AS gap
             FROM s2 JOIN s1 ON s2.user_id = s1.user_id
           UNION ALL
           SELECT 3, s3.t - s2.t
             FROM s3 JOIN s2 ON s3.user_id = s2.user_id),
         v AS (SELECT step_idx, gap, CAST(COUNT(*) AS BIGINT) AS w
           FROM g GROUP BY 1, 2),
         c AS (SELECT step_idx, gap, w,
             SUM(w) OVER (PARTITION BY step_idx ORDER BY gap
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(w) OVER (PARTITION BY step_idx) AS tot
           FROM v)
         SELECT CAST(step_idx AS BIGINT) AS step_idx,
           MIN(gap) AS median_gap_ns,
           CAST(MAX(tot) AS BIGINT) AS n_transitions
         FROM c WHERE cum * 2 >= tot
         GROUP BY step_idx ORDER BY step_idx""",
    // x129: identical tf/df derivation; the score is exact integer
    // division so rank, tie-break, and values all hash-compare
    "x129_keywords" ->
      """WITH tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                 FROM documents)
           GROUP BY doc_id, tok),
         dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
           FROM tf GROUP BY tok),
         sc AS (SELECT t.doc_id, t.tok, t.tf, d.df,
             (t.tf * 1000000) // d.df AS score_micro
           FROM tf t JOIN dfq d USING (tok)),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY score_micro DESC, tok) AS BIGINT) AS rank FROM sc)
         SELECT doc_id, rank, tok, tf, df, score_micro
         FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",
    // x130: the same (user, type)-partitioned lag, then the x123/x128
    // cumulative-histogram selections — exact integer thresholds
    "x130_interarrival" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
             epoch_us(ts) AS tn FROM events),
         g AS (SELECT event_type, tn - lag(tn) OVER
             (PARTITION BY user_id, event_type ORDER BY tn, event_id)
             AS gap_us FROM e),
         gg AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL),
         v AS (SELECT event_type, gap_us, CAST(COUNT(*) AS BIGINT) AS w
           FROM gg GROUP BY 1, 2),
         c AS (SELECT event_type, gap_us, w,
             SUM(w) OVER (PARTITION BY event_type ORDER BY gap_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(w) OVER (PARTITION BY event_type) AS tot FROM v),
         med AS (SELECT event_type, MIN(gap_us) AS median_gap_us
           FROM c WHERE cum * 2 >= tot GROUP BY 1),
         p90 AS (SELECT event_type, MIN(gap_us) AS p90_gap_us
           FROM c WHERE cum * 10 >= tot * 9 GROUP BY 1),
         n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps
           FROM gg GROUP BY 1)
         SELECT n.event_type, n.n_gaps, med.median_gap_us, p90.p90_gap_us
         FROM n JOIN med USING (event_type) JOIN p90 USING (event_type)
         ORDER BY event_type""",
    // x131: the x48 session CTEs verbatim, then the size histogram
    "x131_session_hist" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tn, value FROM events),
         g AS (SELECT *, CASE WHEN lag(tn) OVER w IS NULL
               OR tn - lag(tn) OVER w > 43200000000 THEN 1 ELSE 0 END AS nw
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tn, event_id)),
         s AS (SELECT *, SUM(nw) OVER (PARTITION BY user_id ORDER BY tn, event_id
             ROWS UNBOUNDED PRECEDING) AS session_seq FROM g),
         sess AS (SELECT user_id, session_seq,
             CAST(COUNT(*) AS BIGINT) AS n_events
           FROM s GROUP BY user_id, session_seq)
         SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_sessions
         FROM sess GROUP BY n_events ORDER BY n_events""",
    // x132: same canonical edges, same double-unioned degree table
    "x132_degree_dist" ->
      s"""WITH $minHashPairsCtes,
         e AS (SELECT LEAST(da, db) AS a, GREATEST(da, db) AS b
               FROM pairs GROUP BY 1, 2),
         deg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM
                 (SELECT a AS doc_id FROM e UNION ALL SELECT b AS doc_id FROM e)
                 GROUP BY doc_id)
         SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
         FROM deg GROUP BY deg ORDER BY deg""",
    // x133: symmetrized middle-vertex join, distinct endpoints, 1-hop
    // shortcuts removed by NOT EXISTS, zero-reporting via left join
    "x133_two_hop" ->
      s"""WITH $minHashPairsCtes,
         sym AS (SELECT da AS src, db AS dst FROM pairs
                 UNION SELECT db, da FROM pairs),
         hop AS (SELECT DISTINCT a.src AS src, b.dst AS dst
                 FROM sym a JOIN sym b ON a.dst = b.src
                 WHERE a.src <> b.dst),
         twoh AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_two_hop
                  FROM hop h
                  WHERE NOT EXISTS (SELECT 1 FROM sym s
                    WHERE s.src = h.src AND s.dst = h.dst)
                  GROUP BY src)
         SELECT n.src AS doc_id,
           CAST(COALESCE(t.n_two_hop, 0) AS BIGINT) AS n_two_hop
         FROM (SELECT DISTINCT src FROM sym) n
         LEFT JOIN twoh t ON n.src = t.src
         ORDER BY doc_id""",
    // x134: power sums as exact integers (S3/S4 in HUGEINT ≡ Spark's
    // DECIMAL(38,0)), then the SAME left-associated double expressions
    // — m2^1.5 spelled m2·sqrt(m2) in both engines (sqrt is IEEE-exact)
    "x134_moments" ->
      """WITH b AS (SELECT lang AS grp, CAST(n_chars AS BIGINT) AS v,
             CAST(n_chars * n_chars AS BIGINT) AS x2
           FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
         s AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(v) AS s1, SUM(x2) AS s2,
             SUM(CAST(x2 AS HUGEINT) * v) AS s3,
             SUM(CAST(x2 AS HUGEINT) * x2) AS s4
           FROM b GROUP BY grp),
         m1 AS (SELECT grp, n, CAST(n AS DOUBLE) AS nd,
             CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
             CAST(s3 AS DOUBLE) AS s3d, CAST(s4 AS DOUBLE) AS s4d
           FROM s),
         m2t AS (SELECT *, s1d / nd AS mean FROM m1),
         m3t AS (SELECT *,
             s2d / nd - mean * mean AS m2,
             s3d / nd - 3.0 * mean * (s2d / nd)
               + 2.0 * mean * mean * mean AS m3,
             s4d / nd - 4.0 * mean * (s3d / nd)
               + 6.0 * mean * mean * (s2d / nd)
               - 3.0 * mean * mean * mean * mean AS m4
           FROM m2t)
         SELECT grp, n,
           CAST(FLOOR(mean * 1000 + 0.5) AS BIGINT) AS mean_milli,
           CAST(FLOOR(m2 * 1000 + 0.5) AS BIGINT) AS var_milli,
           CASE WHEN m2 <= 0.0 THEN NULL ELSE
             CAST(FLOOR(m3 / (m2 * sqrt(m2)) * 1000 + 0.5) AS BIGINT)
           END AS skew_milli,
           CASE WHEN m2 <= 0.0 THEN NULL ELSE
             CAST(FLOOR((m4 / (m2 * m2) - 3.0) * 1000 + 0.5) AS BIGINT)
           END AS kurt_milli
         FROM m3t ORDER BY grp""",
    // x135: distinct (user, week) facts, the week-shifted self-join,
    // zero-coalesced ledger, last week clipped — exact integers
    "x135_weekly_churn" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) // 7 AS week
           FROM events),
         act AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS n_active
           FROM uw GROUP BY week),
         ret AS (SELECT a.week, CAST(COUNT(*) AS BIGINT) AS n_retained
           FROM uw a JOIN uw b ON a.u = b.u AND b.week = a.week + 1
           GROUP BY a.week),
         mx AS (SELECT MAX(week) AS wmax FROM uw)
         SELECT act.week, act.n_active,
           CAST(COALESCE(nx.n_active, 0) AS BIGINT) AS n_next,
           CAST(COALESCE(ret.n_retained, 0) AS BIGINT) AS n_retained,
           act.n_active - COALESCE(ret.n_retained, 0) AS n_churned,
           COALESCE(nx.n_active, 0) - COALESCE(ret.n_retained, 0) AS n_new,
           (COALESCE(ret.n_retained, 0) * 1000) // act.n_active
             AS retained_permille
         FROM act CROSS JOIN mx
         LEFT JOIN act nx ON nx.week = act.week + 1
         LEFT JOIN ret ON ret.week = act.week
         WHERE act.week < mx.wmax
         ORDER BY act.week""",
    // x136: the day − row_number() gaps-and-islands identity verbatim
    "x136_streaks" ->
      """WITH ud AS (SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day
           FROM events),
         r AS (SELECT user_id, day, day - row_number() OVER
             (PARTITION BY user_id ORDER BY day) AS isl FROM ud),
         i AS (SELECT user_id, isl, CAST(COUNT(*) AS BIGINT) AS len,
             MAX(day) AS iend FROM r GROUP BY 1, 2)
         SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           MAX(iend) AS last_day
         FROM i GROUP BY user_id ORDER BY user_id""",
    // x137: isodow ≡ Spark weekday()+1; every ratio cross-multiplied
    "x137_dow_profile" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
         pd AS (SELECT CAST(isodow(d) AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(n) AS BIGINT) AS n_events FROM daily GROUP BY 1),
         t AS (SELECT CAST(SUM(n_days) AS BIGINT) AS days_all,
             CAST(SUM(n_events) AS BIGINT) AS n_all FROM pd)
         SELECT dow, n_days, n_events,
           (n_events * 1000) // n_days AS events_per_day_milli,
           (n_events * days_all * 1000) // (n_days * n_all)
             AS index_permille
         FROM pd CROSS JOIN t ORDER BY dow""",
    // x138: same distinct (user, week) facts as x135; cohort = min
    // week per user; offset-0 rows are the self-normalizing sizes
    "x138_cohort_matrix" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) // 7 AS week
           FROM events),
         c AS (SELECT u, MIN(week) AS cohort_week FROM uw GROUP BY u),
         cells AS (SELECT c.cohort_week,
             uw.week - c.cohort_week AS week_offset,
             CAST(COUNT(*) AS BIGINT) AS n_active
           FROM uw JOIN c USING (u) GROUP BY 1, 2),
         sz AS (SELECT cohort_week, n_active AS csize FROM cells
           WHERE week_offset = 0)
         SELECT cells.cohort_week, cells.week_offset, cells.n_active,
           (cells.n_active * 1000) // sz.csize AS retained_permille
         FROM cells JOIN sz USING (cohort_week)
         ORDER BY cohort_week, week_offset""",
    // x139: densified daily counts, the D-scaled integer CUSUM, the
    // earliest |S|-argmax day flagged — all exact integers
    "x139_cusum" ->
      """WITH c AS (SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
             AS day, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
         b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM c),
         grid AS (SELECT UNNEST(range(d0, d1 + 1)) AS day FROM b),
         dense AS (SELECT g.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
           FROM grid g LEFT JOIN c ON g.day = c.day),
         t AS (SELECT CAST(COUNT(*) AS BIGINT) AS days,
             CAST(SUM(n) AS BIGINT) AS tot FROM dense),
         s AS (SELECT day, n,
             t.days * SUM(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW)
               - row_number() OVER (ORDER BY day) * t.tot AS cs
           FROM dense CROSS JOIN t),
         p AS (SELECT MAX(ABS(cs)) AS peak FROM s),
         pd AS (SELECT MIN(day) AS pday FROM s CROSS JOIN p
           WHERE ABS(cs) = p.peak)
         SELECT s.day, s.n, CAST(s.cs AS BIGINT) AS cusum_scaled,
           s.day = pd.pday AS is_peak
         FROM s CROSS JOIN pd ORDER BY s.day""",
    // x140: cummax-over-preceding island starts — the same frame
    // bounds, the same (s, event_id) total order
    "x140_interval_cover" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + 1800000000 AS e, event_id FROM events),
         cm AS (SELECT *, MAX(e) OVER (PARTITION BY user_id
             ORDER BY s, event_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING) AS cme FROM iv),
         fl AS (SELECT *, CASE WHEN cme IS NULL OR s > cme THEN 1
             ELSE 0 END AS nw FROM cm),
         li AS (SELECT *, SUM(nw) OVER (PARTITION BY user_id
             ORDER BY s, event_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) AS isl FROM fl),
         isle AS (SELECT user_id, isl, CAST(COUNT(*) AS BIGINT) AS n,
             MIN(s) AS istart, MAX(e) AS iend FROM li GROUP BY 1, 2)
         SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(iend - istart) AS BIGINT) AS covered_us,
           CAST(MAX(iend) - MIN(istart) AS BIGINT) AS span_us,
           (CAST(SUM(iend - istart) AS BIGINT) * 1000)
             // (MAX(iend) - MIN(istart)) AS utilization_permille
         FROM isle GROUP BY user_id ORDER BY user_id""",
    // x141: one fan-out subquery per declared rule, null-safe fan
    // (countDistinct + max(isnull)), unioned — generated below
    "x141_fd_audit" -> fdAuditOracle,
    // x142: the q02 cents spelling, string-derived leading digit,
    // literal Benford expectations — zero runtime logs
    "x142_benford" ->
      """WITH v AS (SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
             AS v FROM orders),
         t AS (SELECT CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
             CAST(SUM(CASE WHEN v > 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_excl
           FROM v),
         d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT)
             AS digit, CAST(COUNT(*) AS BIGINT) AS n
           FROM v WHERE v > 0 GROUP BY 1),
         e AS (SELECT * FROM (VALUES (1, 301), (2, 176), (3, 125), (4, 97),
             (5, 79), (6, 67), (7, 58), (8, 51), (9, 46))
             AS exp(digit, expected))
         SELECT CAST(e.digit AS BIGINT) AS digit,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n,
           (COALESCE(d.n, 0) * 1000) // t.n_pos AS observed_permille,
           CAST(e.expected AS BIGINT) AS expected_permille,
           (COALESCE(d.n, 0) * 1000) // t.n_pos - e.expected
             AS dev_permille,
           t.n_excl AS n_excluded
         FROM e CROSS JOIN t LEFT JOIN d ON e.digit = d.digit
         ORDER BY digit""",
    // x143: plain quasi-tuple group sizes; NULLS FIRST pins the
    // Spark sort convention should a quasi value ever be null
    "x143_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           COUNT(*) < 5 AS at_risk
         FROM customer GROUP BY 1, 2
         ORDER BY c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST""",
    // x144: the frequency-of-frequencies closed form — rank-block
    // doubled contribution c·m·(2a+m+1) in HUGEINT ≡ Spark DECIMAL(38,0)
    "x144_key_skew" ->
      """WITH f AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
           FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
         ff AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM f GROUP BY c),
         bl AS (SELECT c, m, CAST(COALESCE(SUM(m) OVER (ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS a FROM ff),
         ag AS (SELECT SUM(CAST(c AS HUGEINT) * m * (2 * a + m + 1)) AS s2,
             CAST(SUM(c * m) AS BIGINT) AS n, CAST(SUM(m) AS BIGINT) AS k,
             CAST(MAX(c) AS BIGINT) AS max_count FROM bl)
         SELECT k AS n_keys, n AS n_rows, max_count,
           (max_count * 1000) // n AS top_share_permille,
           CAST(((s2 - (k + 1) * CAST(n AS HUGEINT)) * 1000)
             // (CAST(k AS HUGEINT) * n) AS BIGINT) AS gini_permille
         FROM ag""",
    // x145: the same synthetic changelog derivation (event_id % 10
    // tombstones), last-(ts, seq) winner, tombstoned keys absent
    "x145_cdc_apply" ->
      """WITH cl AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op,
             event_type FROM events),
         w AS (SELECT user_id, ts_us, event_id, op, event_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts_us DESC, event_id DESC) AS rn FROM cl)
         SELECT user_id, event_type, ts_us AS op_ts, event_id AS op_seq
         FROM w WHERE rn = 1 AND op <> 'D' ORDER BY user_id""",
    // x146: x100's triangle CTEs, corners exploded per node, zero-
    // and NULL-reporting split by the deg ≥ 2 wedge condition
    "x146_local_cluster" ->
      s"""WITH $minHashPairsCtes,
         e AS (SELECT LEAST(da, db) AS a, GREATEST(da, db) AS b
               FROM pairs GROUP BY 1, 2),
         deg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM
                 (SELECT a AS doc_id FROM e UNION ALL SELECT b AS doc_id FROM e)
                 GROUP BY doc_id),
         tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
                 FROM e e1 JOIN e e2 ON e1.b = e2.a
                 JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         tc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS t FROM
                (SELECT a AS doc_id FROM tri UNION ALL
                 SELECT b AS doc_id FROM tri UNION ALL
                 SELECT c AS doc_id FROM tri) GROUP BY doc_id)
         SELECT deg.doc_id, deg.deg,
           CAST(COALESCE(tc.t, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.deg < 2 THEN NULL ELSE
             (COALESCE(tc.t, 0) * 2 * 1000) // (deg.deg * (deg.deg - 1))
           END AS lcc_milli
         FROM deg LEFT JOIN tc USING (doc_id) ORDER BY doc_id""",
    // x147: the x107 gram idiom + the packed (hash·2²⁰ + pos) argmin —
    // windows over ALL gram rows, start rows filtered AFTER
    "x147_winnowing" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         le AS (SELECT doc_id, ts FROM t WHERE len(ts) >= 3 + 4 - 1),
         pos AS (SELECT doc_id, ts, UNNEST(range(1, len(ts) - 3 + 2)) AS i
           FROM le),
         g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
             CAST('0x' || substr(md5(array_to_string(
               ts[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ')), 1, 10)
               AS BIGINT) * 1048576 + (i - 1) AS key
           FROM pos),
         n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
           FROM g GROUP BY 1),
         wv AS (SELECT doc_id, pos, MIN(key) OVER (PARTITION BY doc_id
             ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS selkey,
             COUNT(*) OVER (PARTITION BY doc_id) AS ng FROM g),
         sel AS (SELECT DISTINCT doc_id, selkey FROM wv WHERE pos <= ng - 4),
         fp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps,
             CAST(SUM(selkey // 1048576) AS BIGINT) AS sel_sum
           FROM sel GROUP BY 1)
         SELECT n.doc_id, n.n_grams, fp.n_fps,
           (fp.n_fps * 1000) // n.n_grams AS density_permille, fp.sel_sum
         FROM n JOIN fp USING (doc_id) ORDER BY doc_id""",
    // x148: same apriori prune (HAVING ≥ minCount) before the
    // within-basket self-join; canonical a < b pair order
    "x148_basket_pairs" ->
      """WITH facts AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
           FROM lineitem),
         freq AS (SELECT i FROM facts GROUP BY i HAVING COUNT(*) >= 2),
         pruned AS (SELECT f.b, f.i FROM facts f JOIN freq USING (i))
         SELECT x.i AS item_a, y.i AS item_b,
           CAST(COUNT(*) AS BIGINT) AS n_baskets
         FROM pruned x JOIN pruned y ON x.b = y.b AND x.i < y.i
         GROUP BY 1, 2 HAVING COUNT(*) >= 2
         ORDER BY item_a, item_b""",
    // x149: three metric quantile ladders generated from one template
    // (the Scala thresholds() discipline) — see rfmOracle
    "x149_rfm" -> rfmOracle,
    // x150: the ORACLE IS THE RECOMPUTE — state ⊕ signed changelog
    // must equal a fresh aggregation of the post-change row set
    "x150_retract_agg" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS tot
         FROM orders
         WHERE o_orderkey % 3 = 0
            OR (o_orderkey % 3 <> 0 AND o_orderkey % 7 <> 0)
         GROUP BY o_custkey ORDER BY o_custkey""",
    // x151: the x107 gram idiom at m = 2, equality filter, top-k
    "x151_phrase_topk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         le AS (SELECT doc_id, ts FROM t WHERE len(ts) >= 2),
         g AS (SELECT doc_id, array_to_string(
             ts[CAST(i AS INTEGER):CAST(i + 1 AS INTEGER)], ' ') AS gram
           FROM (SELECT doc_id, ts, UNNEST(range(1, len(ts))) AS i FROM le))
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
         FROM g WHERE gram = 'join column'
         GROUP BY doc_id ORDER BY n_occurrences DESC, doc_id LIMIT 20""",
    // x152: quartiles via the x123 cumulative-histogram selections;
    // fences compared at 2× scale so ×1.5 stays integer
    "x152_iqr_fences" ->
      """WITH b AS (SELECT lang AS grp, CAST(n_chars AS BIGINT) AS v
           FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
         vals AS (SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS w
           FROM b GROUP BY 1, 2),
         c AS (SELECT grp, v, w,
             SUM(w) OVER (PARTITION BY grp ORDER BY v ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(w) OVER (PARTITION BY grp) AS tot FROM vals),
         q1 AS (SELECT grp, MIN(v) AS q1 FROM c WHERE cum * 4 >= tot
           GROUP BY 1),
         q3 AS (SELECT grp, MIN(v) AS q3 FROM c WHERE cum * 4 >= tot * 3
           GROUP BY 1),
         f AS (SELECT q1.grp, q1.q1, q3.q3, q3.q3 - q1.q1 AS iqr
           FROM q1 JOIN q3 USING (grp))
         SELECT b.grp, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(f.q1) AS q1, MIN(f.q3) AS q3, MIN(f.iqr) AS iqr,
           CAST(SUM(CASE WHEN b.v * 2 < f.q1 * 2 - f.iqr * 3
             THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           CAST(SUM(CASE WHEN b.v * 2 > f.q3 * 2 + f.iqr * 3
             THEN 1 ELSE 0 END) AS BIGINT) AS n_above
         FROM b JOIN f ON b.grp = f.grp GROUP BY b.grp ORDER BY b.grp""",
    // x153: the x07 pair CTEs + the same 4 synchronous LPA rounds
    // unrolled as chained CTEs (the x55 discipline), neighbor-label
    // argmax replayed as (count DESC, label) row_number
    "x153_label_prop" -> labelPropOracle,
    // x154: the x56 quantize/dist spelling with per-LABEL centroids —
    // rounded integer-micro means, integer squared-L2 argmin, lowest
    // label on ties, then the confusion-matrix rollup
    "x154_centroid_eval" -> centroidEvalOracle,
    // x155: densified |X|·|Y| grid, window marginals OVER CELLS, the
    // exact HUGEINT ≡ decimal(38,0) per-cell term floored BEFORE the
    // sum — order-independent integer end to end
    "x155_chi_square" ->
      """WITH base AS (SELECT event_type AS x,
             CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS y
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
         obs AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS o
           FROM base GROUP BY 1, 2),
         grid AS (SELECT xs.x, ys.y, COALESCE(obs.o, 0) AS o
           FROM (SELECT DISTINCT x FROM obs) xs
           CROSS JOIN (SELECT DISTINCT y FROM obs) ys
           LEFT JOIN obs ON obs.x = xs.x AND obs.y = ys.y),
         m AS (SELECT x, y, o,
             SUM(o) OVER (PARTITION BY x) AS nx,
             SUM(o) OVER (PARTITION BY y) AS ny,
             SUM(o) OVER () AS nn FROM grid),
         t AS (SELECT
             ((CAST(o AS HUGEINT) * nn - CAST(nx AS HUGEINT) * ny)
              * (CAST(o AS HUGEINT) * nn - CAST(nx AS HUGEINT) * ny)
              * 1000000) // (CAST(nn AS HUGEINT) * nx * ny) AS term,
             x, y, nn FROM m)
         SELECT CAST(MAX(nn) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT x) AS BIGINT) AS n_x,
           CAST(COUNT(DISTINCT y) AS BIGINT) AS n_y,
           CAST((COUNT(DISTINCT x) - 1) * (COUNT(DISTINCT y) - 1) AS BIGINT)
             AS dof,
           CAST(SUM(term) AS BIGINT) AS chi2_micro
         FROM t""",
    // x156: the same deletion variants generated positionally (range is
    // 0-based, Spark's lambda 1-based — substr arithmetic aligned),
    // variant equi-join candidates, exact levenshtein ≤ 1 verify
    "x156_deletion_join" ->
      """WITH b AS (SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name
           FROM customer WHERE c_name IS NOT NULL),
         p AS (SELECT CAST(c_custkey AS BIGINT) AS id,
             substr(c_name, 1, 17) || 'X' AS name
           FROM customer WHERE c_custkey % 7 = 3 AND c_name IS NOT NULL),
         bv AS (SELECT id, name, name AS v FROM b
           UNION ALL
           SELECT id, name, substr(name, 1, CAST(i AS INTEGER)) ||
             substr(name, CAST(i + 2 AS INTEGER)) AS v
           FROM (SELECT id, name, UNNEST(range(0, len(name))) AS i FROM b)),
         pv AS (SELECT id, name, name AS v FROM p
           UNION ALL
           SELECT id, name, substr(name, 1, CAST(i AS INTEGER)) ||
             substr(name, CAST(i + 2 AS INTEGER)) AS v
           FROM (SELECT id, name, UNNEST(range(0, len(name))) AS i FROM p)),
         cand AS (SELECT DISTINCT bv.id AS base_id, pv.id AS probe_id,
             bv.name AS na, pv.name AS nb FROM bv JOIN pv ON bv.v = pv.v)
         SELECT base_id, probe_id, CAST(levenshtein(na, nb) AS BIGINT) AS dist
         FROM cand WHERE levenshtein(na, nb) <= 1
         ORDER BY base_id, probe_id""",
    // x157: ladder from max(doc_id), both checkpoint rollups as ≤-joins
    // against it, then the x115 regression-sum tree (ONE ln per point)
    "x157_heaps_growth" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         dt AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS nt FROM t),
         tok AS (SELECT doc_id, UNNEST(ts) AS tok FROM t),
         fd AS (SELECT tok, MIN(doc_id) AS fd FROM tok GROUP BY tok),
         mx AS (SELECT MAX(doc_id) AS m FROM documents),
         ladder AS (SELECT CAST(k AS BIGINT) AS k, (mx.m * k) // 10 AS d_max
           FROM (SELECT UNNEST(range(1, 11)) AS k) CROSS JOIN mx),
         ct AS (SELECT l.k, l.d_max, CAST(SUM(dt.nt) AS BIGINT) AS cum_tokens
           FROM ladder l JOIN dt ON dt.doc_id <= l.d_max GROUP BY 1, 2),
         vc AS (SELECT l.k, l.d_max, CAST(COUNT(*) AS BIGINT) AS vocab
           FROM ladder l JOIN fd ON fd.fd <= l.d_max GROUP BY 1, 2),
         pts AS (SELECT ct.k, ct.d_max, ct.cum_tokens, vc.vocab
           FROM ct JOIN vc USING (k, d_max)),
         xy AS (SELECT ln(CAST(cum_tokens AS DOUBLE)) AS x,
                       ln(CAST(vocab AS DOUBLE)) AS y FROM pts),
         s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS d, SUM(x) AS sx,
                 SUM(y) AS sy, SUM(x*x) AS sxx, SUM(x*y) AS sxy FROM xy),
         f AS (SELECT CAST(FLOOR((d*sxy - sx*sy) / (d*sxx - sx*sx) * 1000
                 + 0.5) AS BIGINT) AS beta_milli FROM s)
         SELECT p.k, p.d_max, p.cum_tokens, p.vocab, f.beta_milli
         FROM pts p CROSS JOIN f ORDER BY k""",
    // x158: the md5 hash contract replayed mod k — the x35 spelling
    "x158_kfold" ->
      """SELECT doc_id,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             % 5 AS fold
         FROM documents ORDER BY doc_id""",
    // x159: per-side vocabulary counts, scalar totals, zero-coalesced
    // full outer join, exact integer ppm rates, |delta|-ranked LIMIT
    "x159_vocab_drift" ->
      """WITH ta AS (SELECT UNNEST(string_split(text, ' ')) AS tok
           FROM documents WHERE doc_id % 2 = 0),
         tb AS (SELECT UNNEST(string_split(text, ' ')) AS tok
           FROM documents WHERE doc_id % 2 = 1),
         ca AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS na FROM ta GROUP BY 1),
         cb AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS nb FROM tb GROUP BY 1),
         tot AS (SELECT (SELECT SUM(na) FROM ca) AS tta,
                        (SELECT SUM(nb) FROM cb) AS ttb),
         j AS (SELECT COALESCE(ca.tok, cb.tok) AS tok,
             COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
           FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok),
         r AS (SELECT tok, CAST((na * 1000000) // tta AS BIGINT) AS rate_a_ppm,
             CAST((nb * 1000000) // ttb AS BIGINT) AS rate_b_ppm
           FROM j CROSS JOIN tot)
         SELECT tok, rate_a_ppm, rate_b_ppm,
           rate_b_ppm - rate_a_ppm AS delta_ppm
         FROM r ORDER BY abs(rate_b_ppm - rate_a_ppm) DESC, tok LIMIT 20""",
    // x160: the x139 day-grid densify, a ×20 gap explode with 1<<(20−g)
    // weights, integer baseline and flags — no floats anywhere
    "x160_ewma_chart" ->
      """WITH c AS (SELECT event_type AS t,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2),
         b AS (SELECT t, MIN(day) AS d0, MAX(day) AS d1 FROM c GROUP BY 1),
         grid AS (SELECT t, UNNEST(range(d0, d1 + 1)) AS day FROM b),
         dense AS (SELECT g.t, g.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
           FROM grid g LEFT JOIN c ON c.t = g.t AND c.day = g.day),
         h AS (SELECT d.t, d.day + g.g AS day,
             CAST(SUM(d.n * (CAST(1 AS BIGINT) << CAST(20 - g.g AS INTEGER)))
               AS BIGINT) AS num,
             CAST(SUM(CAST(1 AS BIGINT) << CAST(20 - g.g AS INTEGER))
               AS BIGINT) AS den
           FROM dense d CROSS JOIN (SELECT UNNEST(range(1, 21)) AS g) g
           GROUP BY 1, 2)
         SELECT d.t AS event_type, d.day, d.n,
           CASE WHEN h.den IS NULL THEN NULL
             ELSE CAST((h.num * 1000) // h.den AS BIGINT) END AS ewma_milli,
           CASE WHEN h.den IS NULL THEN NULL
             ELSE d.n * h.den > 2 * h.num END AS spike,
           CASE WHEN h.den IS NULL THEN NULL
             ELSE 2 * d.n * h.den < h.num END AS dip
         FROM dense d LEFT JOIN h ON h.t = d.t AND h.day = d.day
         ORDER BY 1, 2""",
    // x161: the DIRECT windowed count (grid ⋈ events theta join) — a
    // hash match proves the pane decomposition is semantics-preserving
    "x161_pane_windows" ->
      """WITH p AS (SELECT event_type AS t,
             epoch_us(ts) // 3600000000 AS pane
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
         b AS (SELECT t, MIN(pane) AS p0, MAX(pane) AS p1 FROM p GROUP BY 1),
         grid AS (SELECT t, UNNEST(range(p0, p1 + 1)) AS wend FROM b),
         j AS (SELECT g.t, g.wend, COUNT(p.pane) AS n
           FROM grid g LEFT JOIN p
             ON p.t = g.t AND p.pane BETWEEN g.wend - 5 AND g.wend
           GROUP BY 1, 2)
         SELECT t AS event_type, CAST(wend - 5 AS BIGINT) AS win_start_pane,
           CAST(wend AS BIGINT) AS win_end_pane, CAST(n AS BIGINT) AS n
         FROM j ORDER BY event_type, win_end_pane""",
    // x162: the x07 pair CTEs + 4 peel rounds unrolled — degree, keep,
    // edge-restrict per round — the x55/x153 fixed-unroll discipline
    "x162_k_core" -> kCoreOracle,
    // x163: densified per-type day grid, trunc-div micro slopes (both
    // engines truncate toward zero) over all day pairs, x123 median
    "x163_theil_sen" ->
      """WITH c AS (SELECT event_type AS t,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2),
         b AS (SELECT t, MIN(day) AS d0, MAX(day) AS d1 FROM c GROUP BY 1),
         grid AS (SELECT t, UNNEST(range(d0, d1 + 1)) AS day FROM b),
         dense AS (SELECT g.t, g.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
           FROM grid g LEFT JOIN c ON c.t = g.t AND c.day = g.day),
         pr AS (SELECT a.t, ((b2.n - a.n) * 1000000) // (b2.day - a.day) AS s
           FROM dense a JOIN dense b2 ON a.t = b2.t AND a.day < b2.day),
         wt AS (SELECT t, s, CAST(COUNT(*) AS BIGINT) AS w FROM pr
           GROUP BY 1, 2),
         cm AS (SELECT t, s, w,
             SUM(w) OVER (PARTITION BY t ORDER BY s ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS cum,
             SUM(w) OVER (PARTITION BY t) AS tot FROM wt),
         med AS (SELECT t, CAST(MIN(s) AS BIGINT) AS slope_micro,
             CAST(MAX(tot) AS BIGINT) AS n_pairs
           FROM cm WHERE cum * 2 >= tot GROUP BY t),
         nd AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_days
           FROM dense GROUP BY t)
         SELECT med.t AS event_type, nd.n_days, med.n_pairs, med.slope_micro
         FROM med JOIN nd ON med.t = nd.t ORDER BY event_type""",
    // x164: the fromDocuments modality derivation replayed (doc_id%3
    // indexes the same 3-element list), octet_length over encoded text,
    // exact integer shares — the x101 1-row grand-total combine
    "x164_media_storage" ->
      """WITH m AS (SELECT doc_id,
             ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)]
               AS modality,
             CAST(octet_length(encode(text)) AS BIGINT) AS b
           FROM documents),
         per AS (SELECT modality, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(b) AS BIGINT) AS total_bytes,
             CAST(SUM(CASE WHEN b > 400 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oversize
           FROM m GROUP BY 1),
         g AS (SELECT CAST(SUM(total_bytes) AS BIGINT) AS alltot FROM per)
         SELECT modality, n, total_bytes,
           CAST((total_bytes * 1000) // n AS BIGINT) AS avg_bytes_milli,
           CAST((total_bytes * 1000) // alltot AS BIGINT) AS share_permille,
           n_oversize
         FROM per CROSS JOIN g ORDER BY modality""",
    // x165: the same candidate × query-term grid — postings probe, cf
    // from those postings, |C| from lengths, ONE ln pair per grid row,
    // micronat floor, (score DESC, doc_id) top-k
    "x165_ql_topk" ->
      """WITH q AS (SELECT UNNEST(['vector', 'stream', 'join']) AS tok),
         dl AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
           FROM documents),
         tf AS (SELECT t.doc_id, t.tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                 FROM documents) t
           JOIN q ON t.tok = q.tok GROUP BY 1, 2),
         cf AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
         ct AS (SELECT CAST(SUM(dl) AS BIGINT) AS ctot FROM dl),
         cand AS (SELECT DISTINCT doc_id FROM tf),
         grid AS (SELECT c.doc_id, f.tok, f.cf, COALESCE(tf.tf, 0) AS tf
           FROM cand c CROSS JOIN cf f
           LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.tok = f.tok),
         s AS (SELECT g.doc_id,
             CAST(SUM(CASE WHEN g.tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit,
             SUM(ln(CAST(g.tf AS DOUBLE) + 2000.0 * g.cf / ct.ctot)
               - ln(CAST(dl.dl AS DOUBLE) + 2000.0)) AS score
           FROM grid g JOIN dl ON dl.doc_id = g.doc_id CROSS JOIN ct
           GROUP BY 1)
         SELECT doc_id, n_hit,
           CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) AS score_micronat
         FROM s ORDER BY score_micronat DESC, doc_id LIMIT 20""",
    // x166: top-(k+1) total order, ONE ln per kept row under the
    // micronat half-up floor, α by integer division
    "x166_hill_tail" ->
      """WITH top AS (SELECT CAST(n_chars AS BIGINT) AS v, doc_id AS tie
           FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
           ORDER BY v DESC, tie LIMIT 101),
         r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v DESC, tie) AS rn
           FROM top),
         ref AS (SELECT v AS x_ref FROM r WHERE rn = 101),
         s AS (SELECT x_ref,
             CAST(FLOOR(ln(CAST(r.v AS DOUBLE) / x_ref) * 1000000 + 0.5)
               AS BIGINT) AS t
           FROM r CROSS JOIN ref WHERE rn <= 100)
         SELECT CAST(COUNT(*) AS BIGINT) AS k, MIN(x_ref) AS x_ref,
           CAST(SUM(t) AS BIGINT) AS sum_ln_micro,
           CASE WHEN SUM(t) <= 0 THEN NULL
             ELSE CAST((COUNT(*) * 1000000000) // SUM(t) AS BIGINT)
           END AS alpha_milli
         FROM s GROUP BY x_ref""",
    // x167: the UNION ALL spelling of the same melt — value joins the
    // sort (the q02 lesson: (orderkey, linenumber) can repeat)
    "x167_unpivot" ->
      """WITH base AS (SELECT l_orderkey, l_linenumber,
             CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS disc_c,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
             CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c
           FROM lineitem),
         u AS (SELECT l_orderkey, l_linenumber, 'disc_c' AS metric,
               disc_c AS value FROM base
           UNION ALL SELECT l_orderkey, l_linenumber, 'price_c', price_c
             FROM base
           UNION ALL SELECT l_orderkey, l_linenumber, 'qty_c', qty_c
             FROM base)
         SELECT l_orderkey, l_linenumber, metric, value FROM u
         ORDER BY l_orderkey, l_linenumber, metric, value LIMIT 300""",
    // x168: the same cumulative-histogram selection per (group, q) —
    // cum·1000 ≥ q·tot over the distinct-value weight table
    "x168_quantile_ladder" ->
      """WITH b AS (SELECT lang AS grp, CAST(n_chars AS BIGINT) AS v
           FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
         vals AS (SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS w
           FROM b GROUP BY 1, 2),
         c AS (SELECT grp, v, w,
             SUM(w) OVER (PARTITION BY grp ORDER BY v ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(w) OVER (PARTITION BY grp) AS tot FROM vals),
         q AS (SELECT CAST(UNNEST([100, 250, 500, 750, 900, 990])
             AS BIGINT) AS q_permille)
         SELECT c.grp, q.q_permille, CAST(MIN(c.v) AS BIGINT) AS value
         FROM c CROSS JOIN q WHERE c.cum * 1000 >= q.q_permille * c.tot
         GROUP BY 1, 2 ORDER BY grp, q_permille""",
    // x169: distinct (user, day) facts, per-user first day, one
    // classification join — exact integer mix ratio
    "x169_new_returning" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         f AS (SELECT u, MIN(day) AS fd FROM ud GROUP BY 1),
         g AS (SELECT ud.day, CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(SUM(CASE WHEN ud.day = f.fd THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new
           FROM ud JOIN f ON ud.u = f.u GROUP BY 1)
         SELECT day, n_active, n_new, n_active - n_new AS n_returning,
           CAST((n_new * 1000) // n_active AS BIGINT) AS new_permille
         FROM g ORDER BY day""",
    // x170: the DIRECT interval theta join over the x48 session CTEs —
    // a hash match proves the two-sided bin decomposition preserves
    // the overlap semantics exactly
    "x170_interval_overlap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tn FROM events),
         g AS (SELECT *, CASE WHEN lag(tn) OVER w IS NULL
               OR tn - lag(tn) OVER w > 43200000000 THEN 1 ELSE 0 END AS nw
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tn, event_id)),
         s AS (SELECT *, SUM(nw) OVER (PARTITION BY user_id ORDER BY tn,
             event_id ROWS UNBOUNDED PRECEDING) AS session_seq FROM g),
         sess AS (SELECT user_id, session_seq, MIN(tn) AS lo, MAX(tn) AS hi
           FROM s GROUP BY 1, 2),
         a AS (SELECT CAST(user_id * 1000000 + session_seq AS BIGINT) AS a_id,
             lo AS a_lo, hi AS a_hi FROM sess),
         b AS (SELECT a_id AS b_id, a_lo AS b_lo, a_hi AS b_hi FROM a
           ORDER BY a_hi - a_lo DESC, a_id LIMIT 5)
         SELECT a.a_id, b.b_id,
           GREATEST(a_lo, b_lo) AS overlap_lo,
           LEAST(a_hi, b_hi) AS overlap_hi,
           LEAST(a_hi, b_hi) - GREATEST(a_lo, b_lo) AS overlap_len
         FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi AND a.a_id <> b.b_id
         ORDER BY a_id, b_id""",
    // x171: per column the same count table, ONE ln per distinct value,
    // the x52 entropy identity, micronat/milli floors — generated from
    // the SAME column list as the Spark call
    "x171_column_entropy" -> columnEntropyOracle,
    // x172: one groupBy + one rollup, all integers
    "x172_dup_audit" ->
      """WITH g AS (SELECT l_orderkey, l_linenumber,
             CAST(COUNT(*) AS BIGINT) AS c
           FROM lineitem GROUP BY 1, 2)
         SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_keys,
           CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
             AS n_surplus_rows,
           CAST(MAX(c) AS BIGINT) AS max_multiplicity
         FROM g""",
    // x173: the x48 session CTEs label events, the x109 champion chain
    // runs keyed by the composite (user, session) string
    "x173_session_funnel" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tn,
             event_type FROM events),
         g AS (SELECT *, CASE WHEN lag(tn) OVER w IS NULL
               OR tn - lag(tn) OVER w > 43200000000 THEN 1 ELSE 0 END AS nw
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tn, event_id)),
         s AS (SELECT *, SUM(nw) OVER (PARTITION BY user_id ORDER BY tn,
             event_id ROWS UNBOUNDED PRECEDING) AS session_seq FROM g),
         lab AS (SELECT CAST(user_id AS VARCHAR) || '#' ||
             CAST(session_seq AS VARCHAR) AS k, tn, event_type FROM s),
         s1 AS (SELECT k, MIN(tn) AS t FROM lab
           WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT l.k, MIN(l.tn) AS t FROM lab l
           JOIN s1 ON l.k = s1.k AND l.tn > s1.t
           WHERE l.event_type = 'click' GROUP BY 1),
         s3 AS (SELECT l.k, MIN(l.tn) AS t FROM lab l
           JOIN s2 ON l.k = s2.k AND l.tn > s2.t
           WHERE l.event_type = 'purchase' GROUP BY 1)
         SELECT 1 AS step_idx, 'view' AS step,
           (SELECT COUNT(*) FROM s1) AS n_sessions
         UNION ALL
         SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
         UNION ALL
         SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
         ORDER BY step_idx""",
    // x174: the x122 contribution explode at window 28 + the guarded
    // integer ratio
    "x174_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day
           FROM events),
         b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
         g AS (SELECT UNNEST(range(d0, d1 + 1)) AS day FROM b),
         c AS (SELECT user_id, day + o AS day
           FROM ud, UNNEST(range(28)) AS t(o)),
         w AS (SELECT c.day, COUNT(DISTINCT c.user_id) AS mau
           FROM c, b WHERE c.day <= b.d1 GROUP BY 1),
         dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau
           FROM ud GROUP BY 1)
         SELECT g.day, COALESCE(dau.dau, 0) AS dau,
           COALESCE(w.mau, 0) AS mau,
           CASE WHEN COALESCE(w.mau, 0) = 0 THEN NULL
             ELSE CAST((COALESCE(dau.dau, 0) * 1000) // w.mau AS BIGINT)
           END AS stickiness_permille
         FROM g LEFT JOIN w ON g.day = w.day
         LEFT JOIN dau ON g.day = dau.day
         ORDER BY g.day""",
    // x175: the x129 keyword rule derives the seed terms IN SQL (the
    // Spark side collects them as broadcast literals — same set by the
    // same total order), then the x47 BM25 tree scores with
    // `tok IN (SELECT …)`, seed doc excluded, re-cut to k
    "x175_more_like_this" ->
      """WITH dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                 FROM documents)
           GROUP BY 1, 2),
         dfq0 AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
           FROM dt GROUP BY 1),
         seed AS (SELECT d.tok FROM dt d JOIN dfq0 f USING (tok)
           WHERE d.doc_id = 0
           ORDER BY (d.tf * 1000000) // f.df DESC, d.tok LIMIT 3),
         dl AS (SELECT doc_id,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
               AS BIGINT) AS dl
           FROM documents),
         stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
         tf AS (SELECT doc_id, tok, COUNT(*) AS tf
           FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                 FROM documents)
           WHERE tok IN (SELECT tok FROM seed) GROUP BY doc_id, tok),
         dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         scored AS (SELECT tf.doc_id AS doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_hit,
             CAST(FLOOR(SUM(
               ln(1 + (stats.n_docs - dfq.df + 0.5::DOUBLE)
                 / (dfq.df + 0.5::DOUBLE))
               * tf.tf * (1.2::DOUBLE + 1)
               / (tf.tf + 1.2::DOUBLE * ((1 - 0.75::DOUBLE)
                 + 0.75::DOUBLE * dl.dl / stats.avgdl))
             ) * 1000 + 0.5) AS BIGINT) AS score_milli
           FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id)
           CROSS JOIN stats GROUP BY tf.doc_id)
         SELECT doc_id, n_hit, score_milli FROM scored WHERE doc_id <> 0
         ORDER BY score_milli DESC, doc_id LIMIT 10""",
    // x176: the UNION ALL spelling with literal grouping ids — the
    // portable form of GROUPING SETS + grouping_id
    "x176_grouping_sets" ->
      """WITH g0 AS (SELECT l_returnflag, l_linestatus,
             CAST(0 AS BIGINT) AS gid, CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1, 2),
         g1 AS (SELECT l_returnflag, CAST(NULL AS VARCHAR) AS l_linestatus,
             CAST(1 AS BIGINT) AS gid, CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1),
         g3 AS (SELECT CAST(NULL AS VARCHAR) AS l_returnflag,
             CAST(NULL AS VARCHAR) AS l_linestatus,
             CAST(3 AS BIGINT) AS gid, CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem)
         SELECT * FROM g0 UNION ALL SELECT * FROM g1
         UNION ALL SELECT * FROM g3
         ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    // x177: integer CDFs over the joint distinct-value spine, the
    // HUGEINT ≡ decimal(38,0) cross-multiplied max, ONE sqrt (x81
    // discipline) for the critical value
    "x177_ks_test" ->
      """WITH b AS (SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents
           WHERE lang IN ('en', 'fr') AND n_chars IS NOT NULL),
         c AS (SELECT v,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS wa,
             CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
               AS wb
           FROM b GROUP BY 1),
         r AS (SELECT v, SUM(wa) OVER w AS ca, SUM(wb) OVER w AS cb,
             SUM(wa) OVER () AS ta, SUM(wb) OVER () AS tb
           FROM c WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
         m AS (SELECT CAST(MAX(ta) AS BIGINT) AS n_a,
             CAST(MAX(tb) AS BIGINT) AS n_b,
             MAX(ABS(CAST(ca AS HUGEINT) * tb - CAST(cb AS HUGEINT) * ta))
               AS d
           FROM r),
         f AS (SELECT n_a, n_b,
             CAST((d * 1000000) // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
               AS d_micro,
             CAST(FLOOR(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE) /
               (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) * 1000000 + 0.5)
               AS BIGINT) AS crit_micro
           FROM m)
         SELECT n_a, n_b, d_micro, crit_micro, d_micro > crit_micro AS reject
         FROM f""",
    // x178: the x48 session CTEs + first/last ROW_NUMBER champions per
    // session, entry×exit matrix rollup
    "x178_session_handoff" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tn,
             event_type FROM events),
         g AS (SELECT *, CASE WHEN lag(tn) OVER w IS NULL
               OR tn - lag(tn) OVER w > 43200000000 THEN 1 ELSE 0 END AS nw
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tn, event_id)),
         s AS (SELECT *, SUM(nw) OVER (PARTITION BY user_id ORDER BY tn,
             event_id ROWS UNBOUNDED PRECEDING) AS session_seq FROM g),
         r AS (SELECT user_id, session_seq, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
               ORDER BY tn, event_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
               ORDER BY tn DESC, event_id DESC) AS rl
           FROM s),
         fe AS (SELECT user_id, session_seq, event_type AS entry_type
           FROM r WHERE rf = 1),
         le AS (SELECT user_id, session_seq, event_type AS exit_type
           FROM r WHERE rl = 1)
         SELECT fe.entry_type, le.exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions
         FROM fe JOIN le USING (user_id, session_seq)
         GROUP BY 1, 2 ORDER BY entry_type, exit_type""",
    // x180: the x163 densified day grid, then pure integer power sums —
    // slope/intercept by trunc div, R² cross-multiplied in HUGEINT
    // (≡ decimal(38,0), the x177 discipline)
    "x180_ols_trend" ->
      """WITH c AS (SELECT event_type AS t,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2),
         b AS (SELECT t, MIN(day) AS d0, MAX(day) AS d1 FROM c GROUP BY 1),
         grid AS (SELECT t, UNNEST(range(d0, d1 + 1)) AS day FROM b),
         dense AS (SELECT g.t, g.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
           FROM grid g LEFT JOIN c ON c.t = g.t AND c.day = g.day),
         agg AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS d,
             CAST(SUM(day) AS BIGINT) AS sx, CAST(SUM(n) AS BIGINT) AS sy,
             CAST(SUM(day * n) AS BIGINT) AS sxy,
             CAST(SUM(day * day) AS BIGINT) AS sxx,
             CAST(SUM(n * n) AS BIGINT) AS syy
           FROM dense GROUP BY 1),
         v AS (SELECT t, d, sx, sy,
             d * sxx - sx * sx AS vx, d * syy - sy * sy AS vy,
             d * sxy - sx * sy AS cov FROM agg)
         SELECT t AS event_type, d AS n_days,
           CASE WHEN vx = 0 THEN NULL
             ELSE CAST((cov * 1000000) // vx AS BIGINT) END AS slope_micro,
           CASE WHEN vx = 0 THEN NULL
             ELSE CAST((sy * 1000000 - ((cov * 1000000) // vx) * sx) // d
               AS BIGINT) END AS intercept_micro,
           CASE WHEN vx = 0 OR vy = 0 THEN NULL
             ELSE CAST((CAST(cov AS HUGEINT) * CAST(cov AS HUGEINT) * 1000)
               // (CAST(vx AS HUGEINT) * CAST(vy AS HUGEINT)) AS BIGINT)
             END AS r2_milli
         FROM v ORDER BY event_type""",
    // x181: per-user first/last day, censor at the horizon, lifetime
    // histogram + 0..max grid, suffix-sum at-risk, integer ppm hazard
    "x181_hazard_curve" ->
      """WITH s AS (SELECT user_id AS u,
             CAST(MIN(CAST(ts AS DATE) - DATE '1970-01-01') AS BIGINT) AS f,
             CAST(MAX(CAST(ts AS DATE) - DATE '1970-01-01') AS BIGINT) AS l
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         h AS (SELECT MAX(l) AS hz FROM s),
         lt AS (SELECT l - f AS t,
             CASE WHEN l = hz THEN 1 ELSE 0 END AS cens
           FROM s CROSS JOIN h),
         agg AS (SELECT t, CAST(SUM(1 - cens) AS BIGINT) AS n_deaths,
             CAST(SUM(cens) AS BIGINT) AS n_censored FROM lt GROUP BY 1),
         grid AS (SELECT UNNEST(range(0, (SELECT MAX(t) FROM agg) + 1))
             AS t),
         g2 AS (SELECT g.t,
             CAST(COALESCE(a.n_deaths, 0) AS BIGINT) AS n_deaths,
             CAST(COALESCE(a.n_censored, 0) AS BIGINT) AS n_censored
           FROM grid g LEFT JOIN agg a ON a.t = g.t),
         r AS (SELECT t, n_deaths, n_censored,
             CAST(SUM(n_deaths + n_censored) OVER (ORDER BY t DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
           FROM g2)
         SELECT CAST(t AS BIGINT) AS t_days, n_at_risk, n_deaths,
           n_censored,
           CAST((n_deaths * 1000000) // n_at_risk AS BIGINT) AS hazard_ppm
         FROM r ORDER BY t_days""",
    // x182: distinct basket facts, min-count prune BOTH sides before
    // the pair join, ONE sqrt of an integer product, half-up milli
    // floor, total (cosine desc, a, b) order under the LIMIT
    "x182_item_cosine" ->
      """WITH facts AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
           FROM lineitem),
         tot AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n FROM facts
           GROUP BY 1 HAVING COUNT(*) >= 2),
         pr AS (SELECT f.i AS a, f2.i AS b2,
             CAST(COUNT(*) AS BIGINT) AS n_ab
           FROM facts f JOIN facts f2 ON f.b = f2.b AND f.i < f2.i
             JOIN tot ta ON ta.i = f.i JOIN tot tb ON tb.i = f2.i
           GROUP BY 1, 2 HAVING COUNT(*) >= 2)
         SELECT pr.a AS item_a, pr.b2 AS item_b, ta.n AS n_a, tb.n AS n_b,
           pr.n_ab,
           CAST(FLOOR(pr.n_ab * 1000 /
             sqrt(CAST(ta.n * tb.n AS DOUBLE)) + 0.5) AS BIGINT)
             AS cosine_milli
         FROM pr JOIN tot ta ON ta.i = pr.a JOIN tot tb ON tb.i = pr.b2
         ORDER BY cosine_milli DESC, item_a, item_b LIMIT 50""",
    // x183: the Sampling.hashMod md5 contract for both schemes;
    // rendezvous argmax replayed as ROW_NUMBER (w DESC, s DESC) over
    // the key × shard grid (bounded: |keys|·5 rows at oracle scale)
    "x183_shard_rebalance" ->
      """WITH k AS (SELECT CAST(doc_id AS VARCHAR) AS key FROM documents
           WHERE doc_id IS NOT NULL),
         hb AS (SELECT key,
             CAST('0x' || substr(md5(key), 1, 15) AS BIGINT) AS h FROM k),
         mods AS (SELECT key, h % 4 AS b, h % 5 AS a FROM hb),
         rv AS (SELECT key, s,
             CAST('0x' || substr(md5(key || '#' || CAST(s AS VARCHAR)),
               1, 15) AS BIGINT) AS w
           FROM k CROSS JOIN (SELECT UNNEST(range(5)) AS s)),
         rb AS (SELECT key, s AS shard, ROW_NUMBER() OVER (
             PARTITION BY key ORDER BY w DESC, s DESC) AS rn
           FROM rv WHERE s < 4),
         ra AS (SELECT key, s AS shard, ROW_NUMBER() OVER (
             PARTITION BY key ORDER BY w DESC, s DESC) AS rn FROM rv),
         rdv AS (SELECT b.key, b.shard AS rb, a.shard AS ra
           FROM (SELECT key, shard FROM rb WHERE rn = 1) b
           JOIN (SELECT key, shard FROM ra WHERE rn = 1) a USING (key)),
         msz AS (SELECT CAST(MAX(n) AS BIGINT) AS mx,
             CAST(MIN(n) AS BIGINT) AS mn
           FROM (SELECT b, COUNT(*) AS n FROM mods GROUP BY 1)),
         mstat AS (SELECT 'mod' AS scheme,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN b <> a THEN 1 ELSE 0 END) AS BIGINT)
               AS n_moved FROM mods),
         rsz AS (SELECT CAST(MAX(n) AS BIGINT) AS mx,
             CAST(MIN(n) AS BIGINT) AS mn
           FROM (SELECT rb, COUNT(*) AS n FROM rdv GROUP BY 1)),
         rstat AS (SELECT 'rendezvous' AS scheme,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN rb <> ra THEN 1 ELSE 0 END) AS BIGINT)
               AS n_moved FROM rdv)
         SELECT scheme, n_rows, n_moved,
           CAST((n_moved * 1000000) // n_rows AS BIGINT) AS moved_ppm,
           mx AS max_shard_rows, mn AS min_shard_rows
         FROM mstat CROSS JOIN msz
         UNION ALL
         SELECT scheme, n_rows, n_moved,
           CAST((n_moved * 1000000) // n_rows AS BIGINT) AS moved_ppm,
           mx AS max_shard_rows, mn AS min_shard_rows
         FROM rstat CROSS JOIN rsz
         ORDER BY scheme""",
    // x184: one zone-keyed aggregation; skippable = min/max evidence
    // misses the [0, 365] ship-day range (parquet min/max pruning rule)
    "x184_zone_map" ->
      """WITH z AS (SELECT CAST(l_orderkey AS BIGINT) // 1000 AS zone,
             CAST(CAST(l_shipdate AS DATE) - DATE '1995-01-01' AS BIGINT)
               AS v
           FROM lineitem)
         SELECT zone, CAST(zone * 1000 AS BIGINT) AS zone_lo,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(MIN(v) AS BIGINT) AS min_val,
           CAST(MAX(v) AS BIGINT) AS max_val,
           CASE WHEN MIN(v) IS NULL OR MAX(v) < 0 OR MIN(v) > 365
             THEN 1 ELSE 0 END AS skippable
         FROM z GROUP BY 1 ORDER BY 1""",
    // x185: the x116 integer z formula with the stats window
    // partitioned by (type, day % 7) over the densified day grid
    "x185_seasonal_anomaly" ->
      """WITH c AS (SELECT event_type AS t,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2),
         b AS (SELECT t, MIN(day) AS d0, MAX(day) AS d1 FROM c GROUP BY 1),
         grid AS (SELECT t, UNNEST(range(d0, d1 + 1)) AS day FROM b),
         dense AS (SELECT g.t, g.day, g.day % 7 AS dow,
             CAST(COALESCE(c.n, 0) AS BIGINT) AS n
           FROM grid g LEFT JOIN c ON c.t = g.t AND c.day = g.day),
         z AS (SELECT t, day, dow, n,
             CAST(COUNT(*) OVER w AS BIGINT) AS c,
             CAST(SUM(n) OVER w AS BIGINT) AS s1,
             CAST(SUM(n * n) OVER w AS BIGINT) AS s2
           FROM dense WINDOW w AS (PARTITION BY t, dow)),
         zz AS (SELECT t, day, dow, n,
             CASE WHEN c * s2 - s1 * s1 = 0 THEN 0
               ELSE CAST(FLOOR(1000 * (n * c - s1) /
                 sqrt(CAST(c * s2 - s1 * s1 AS DOUBLE)) + 0.5) AS BIGINT)
               END AS z_milli
           FROM z)
         SELECT t AS event_type, CAST(day AS BIGINT) AS day,
           CAST(dow AS BIGINT) AS dow, n, z_milli,
           CASE WHEN ABS(z_milli) >= 2000 THEN 1 ELSE 0 END AS is_anomaly
         FROM zz ORDER BY event_type, day""",
    // x186: per-group weight sums, running share over the weight-desc
    // total order, integer permille, head flag by cross-multiplication
    "x186_pareto_sources" ->
      """WITH per AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS weight
           FROM documents WHERE source IS NOT NULL GROUP BY 1),
         t AS (SELECT CAST(SUM(weight) AS BIGINT) AS tot FROM per),
         c AS (SELECT source, weight,
             CAST(SUM(weight) OVER (ORDER BY weight DESC, source
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM per)
         SELECT c.source, c.weight,
           CAST((c.weight * 1000) // t.tot AS BIGINT) AS share_permille,
           CAST((c.cum * 1000) // t.tot AS BIGINT) AS cum_permille,
           CASE WHEN (c.cum - c.weight) * 1000 < t.tot * 800
             THEN 1 ELSE 0 END AS in_head
         FROM c CROSS JOIN t ORDER BY c.weight DESC, c.source""",
    // x187: two per-key count tables joined (bounded by distinct
    // keys), output mass per key, HUGEINT total, top-k by mass
    "x187_join_skew" ->
      """WITH l AS (SELECT CAST(user_id AS BIGINT) AS key,
             CAST(COUNT(*) AS BIGINT) AS n_left
           FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         r AS (SELECT CAST(user_id AS BIGINT) AS key,
             CAST(COUNT(*) AS BIGINT) AS n_right
           FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         m AS (SELECT l.key, n_left, n_right,
             CAST(n_left * n_right AS BIGINT) AS out_rows
           FROM l JOIN r USING (key)),
         t AS (SELECT SUM(CAST(out_rows AS HUGEINT)) AS tot FROM m)
         SELECT m.key, m.n_left, m.n_right, m.out_rows,
           CAST((CAST(out_rows AS HUGEINT) * 1000) // t.tot AS BIGINT)
             AS share_permille
         FROM m CROSS JOIN t ORDER BY out_rows DESC, key LIMIT 20""",
    // x188: per-type count + max(ts) in integer micros, 1-row tip,
    // integer lag seconds and the stale flag
    "x188_freshness" ->
      """WITH per AS (SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(epoch_us(MAX(ts)) AS BIGINT) AS latest_us
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
         t AS (SELECT MAX(latest_us) AS tip FROM per)
         SELECT event_type, n_rows, latest_us,
           CAST((t.tip - latest_us) // 1000000 AS BIGINT) AS lag_secs,
           CASE WHEN (t.tip - latest_us) // 1000000 >= 3600
             THEN 1 ELSE 0 END AS is_stale
         FROM per CROSS JOIN t ORDER BY event_type""",
    // x189: the x07 pair CTEs + the x42 md5 split CASE on BOTH
    // endpoints, cells canonicalized lexicographically
    "x189_split_leakage" -> {
      def split(key: String) =
        s"""CASE WHEN CAST('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 15)
              AS BIGINT) % 1000 < 900 THEN 'train'
            WHEN CAST('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 15)
              AS BIGINT) % 1000 < 950 THEN 'val' ELSE 'test' END"""
      s"""WITH $minHashPairsCtes,
         sp AS (SELECT ${split("da")} AS s_a, ${split("db")} AS s_b
           FROM pairs)
         SELECT LEAST(s_a, s_b) AS split_lo, GREATEST(s_a, s_b) AS split_hi,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CASE WHEN LEAST(s_a, s_b) <> GREATEST(s_a, s_b) THEN 1 ELSE 0 END
             AS is_leak
         FROM sp GROUP BY 1, 2 ORDER BY 1, 2"""
    },
    // x190: the single-level prefix-min spelling of the same dominance
    // reduction (SkylineSpec proves both ≡ brute-force NOT EXISTS)
    "x190_skyline" ->
      """WITH p AS (SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
             AS x,
             CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT)
               AS y
           FROM orders
           WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL),
         r AS (SELECT x, CAST(MIN(y) AS BIGINT) AS y FROM p GROUP BY 1),
         m AS (SELECT x, y, MIN(y) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM r)
         SELECT x AS price_cents, y AS order_day FROM m
         WHERE pm IS NULL OR y < pm ORDER BY price_cents""",
    // x191: the x177 spine with a LEAD gap — every segment exact
    // integers cross-multiplied in HUGEINT, ONE division at the end
    "x191_emd" ->
      """WITH b AS (SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents
           WHERE lang IN ('en', 'fr') AND n_chars IS NOT NULL),
         c AS (SELECT v,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS wa,
             CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT)
               AS wb
           FROM b GROUP BY 1),
         r AS (SELECT v, SUM(wa) OVER w AS ca, SUM(wb) OVER w AS cb,
             SUM(wa) OVER () AS ta, SUM(wb) OVER () AS tb,
             COALESCE(LEAD(v) OVER (ORDER BY v) - v, 0) AS gap
           FROM c WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
         m AS (SELECT CAST(MAX(ta) AS BIGINT) AS n_a,
             CAST(MAX(tb) AS BIGINT) AS n_b,
             SUM(ABS(CAST(ca AS HUGEINT) * tb - CAST(cb AS HUGEINT) * ta)
               * gap) AS w
           FROM r)
         SELECT n_a, n_b,
           CAST((w * 1000000) // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
             AS emd_micro
         FROM m""",
    // x192: the x59 per-column profile UNION replayed over BOTH sides
    // (the x63 next-drop CTE), integer ppm, deltas in the outer select
    "x192_profile_diff" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      def prof(rel: String) = cols.map(c =>
        s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
            CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct FROM $rel""")
        .mkString(" UNION ALL ")
      s"""WITH nn AS (SELECT doc_id,
             CASE WHEN doc_id % 53 = 0 THEN text || ' v2' ELSE text END
               AS text, lang, source, n_chars
           FROM documents WHERE doc_id % 97 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
           FROM documents WHERE doc_id < 4),
         a AS (${prof("documents")}),
         b AS (${prof("nn")}),
         j AS (SELECT a.col_name, a.n_rows AS n_rows_a,
             b.n_rows AS n_rows_b,
             CASE WHEN a.n_rows = 0 THEN NULL
               ELSE CAST((a.n_null * 1000000) // a.n_rows AS BIGINT) END
               AS null_ppm_a,
             CASE WHEN b.n_rows = 0 THEN NULL
               ELSE CAST((b.n_null * 1000000) // b.n_rows AS BIGINT) END
               AS null_ppm_b,
             a.n_distinct AS n_distinct_a, b.n_distinct AS n_distinct_b
           FROM a JOIN b USING (col_name))
         SELECT col_name, n_rows_a, n_rows_b, null_ppm_a, null_ppm_b,
           null_ppm_b - null_ppm_a AS null_ppm_delta,
           n_distinct_a, n_distinct_b,
           n_distinct_b - n_distinct_a AS distinct_delta
         FROM j ORDER BY col_name"""
    },
    // x193: zone bytes via octet_length(encode(text)) (the x164
    // spelling), running cumsum, grp = bytes-before div target
    "x193_compaction_plan" ->
      """WITH z AS (SELECT CAST(doc_id AS BIGINT) // 50 AS zone,
             CAST(octet_length(encode(text)) AS BIGINT) AS b
           FROM documents),
         g AS (SELECT zone, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(b) AS BIGINT) AS bytes FROM z GROUP BY 1),
         c AS (SELECT zone, n_rows, bytes,
             CAST(SUM(bytes) OVER (ORDER BY zone ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cum FROM g)
         SELECT zone, n_rows, bytes,
           CAST((cum - bytes) // 40000 AS BIGINT) AS grp
         FROM c ORDER BY zone""",
    // x194: the x123 weight-table discipline — inclusive running sum
    // per group, integer permille
    "x194_percentile_rank" ->
      """WITH c AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           GROUP BY 1, 2),
         r AS (SELECT lang, v, n,
             CAST(SUM(n) OVER (PARTITION BY lang ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS tot
           FROM c)
         SELECT lang, v, n, CAST((cum * 1000) // tot AS BIGINT)
           AS pct_permille
         FROM r ORDER BY lang, v""",
    // x195: the same 4-shape payload synthesized in SQL, json_keys
    // guarded by json_valid (malformed → the sentinel row)
    "x195_json_profile" ->
      """WITH src AS (SELECT CASE CAST(event_id % 4 AS INTEGER)
             WHEN 0 THEN '{"uid": ' || CAST(user_id AS VARCHAR) || '}'
             WHEN 1 THEN '{"uid": ' || CAST(user_id AS VARCHAR)
               || ', "geo": {"cc": "US"}}'
             WHEN 2 THEN '{"uid": ' || CAST(user_id AS VARCHAR)
               || ', "tag": "' || event_type || '", "v": 1}'
             ELSE 'oops' END AS j
           FROM events),
         ks AS (SELECT CASE WHEN json_valid(j) THEN json_keys(j)
               ELSE ['__malformed__'] END AS kl
           FROM src WHERE j IS NOT NULL),
         t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM ks),
         e AS (SELECT UNNEST(kl) AS key FROM ks)
         SELECT key, CAST(COUNT(*) AS BIGINT) AS n_present,
           CAST((COUNT(*) * 1000000) // t.tot AS BIGINT) AS present_ppm
         FROM e CROSS JOIN t GROUP BY key, t.tot ORDER BY key""",
    // x196: the DIRECT one-window running max over arrival order — a
    // hash match proves the bucketed two-level decomposition is
    // semantics-preserving (x161/x170 pattern) — then the x168 ladder
    "x196_lateness" ->
      """WITH b AS (SELECT event_type AS t, epoch_us(ts) AS e,
             CAST(event_id AS BIGINT) AS a
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
             AND event_id IS NOT NULL),
         l AS (SELECT t AS grp,
             CAST(MAX(e) OVER (PARTITION BY t ORDER BY a
               ROWS UNBOUNDED PRECEDING) - e AS BIGINT) AS v
           FROM b),
         vals AS (SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS w
           FROM l GROUP BY 1, 2),
         c AS (SELECT grp, v, w,
             SUM(w) OVER (PARTITION BY grp ORDER BY v ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(w) OVER (PARTITION BY grp) AS tot FROM vals),
         q AS (SELECT CAST(UNNEST([500, 900, 990, 1000]) AS BIGINT)
             AS q_permille)
         SELECT c.grp, q.q_permille, CAST(MIN(c.v) AS BIGINT) AS value
         FROM c CROSS JOIN q WHERE c.cum * 1000 >= q.q_permille * c.tot
         GROUP BY 1, 2 ORDER BY grp, q_permille""",
    // x197: the x18 backward-within-tolerance rule as an EXISTS per
    // purchase, rolled to one integer-ppm coverage row
    "x197_asof_match_rate" ->
      """WITH l AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS lt
           FROM events WHERE event_type = 'purchase'),
         r AS (SELECT user_id, epoch_us(ts) AS rt FROM events
           WHERE event_type = 'click'),
         m AS (SELECT l.pid,
             MAX(CASE WHEN r.rt IS NOT NULL THEN 1 ELSE 0 END) AS hit
           FROM l LEFT JOIN r ON r.user_id = l.user_id
             AND r.rt <= l.lt AND r.rt >= l.lt - 3600000000
           GROUP BY l.pid)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_left,
           CAST(SUM(hit) AS BIGINT) AS n_matched,
           CAST(COUNT(*) - SUM(hit) AS BIGINT) AS n_unmatched,
           CASE WHEN COUNT(*) = 0 THEN NULL
             ELSE CAST((SUM(hit) * 1000000) // COUNT(*) AS BIGINT) END
             AS match_ppm
         FROM m""",
    // x198: one integer-µs CASE per row — cutoff 2024-01-20T00:00Z,
    // embargo 2 days
    "x198_time_split" ->
      """SELECT event_id,
           CASE WHEN epoch_us(ts) < 1705708800000000 THEN 'train'
             WHEN epoch_us(ts) < 1705881600000000 THEN 'embargo'
             ELSE 'test' END AS split
         FROM events ORDER BY event_id, split""",
    // x199: the x42 md5 split CASE + per-(split, label) counts, group
    // stats joined back, integer permille/milli
    "x199_class_balance" ->
      """WITH a AS (SELECT CASE WHEN h < 900 THEN 'train'
             WHEN h < 950 THEN 'val' ELSE 'test' END AS split, label
           FROM (SELECT CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
               1, 15) AS BIGINT) % 1000 AS h, label FROM embeddings)),
         c AS (SELECT split,
             COALESCE(CAST(label AS VARCHAR), '__null__') AS label,
             CAST(COUNT(*) AS BIGINT) AS n FROM a GROUP BY 1, 2),
         g AS (SELECT split, CAST(SUM(n) AS BIGINT) AS group_n,
             CAST(MAX(n) AS BIGINT) AS mx, CAST(MIN(n) AS BIGINT) AS mn
           FROM c GROUP BY 1)
         SELECT c.split, c.label, c.n,
           CAST((c.n * 1000) // g.group_n AS BIGINT) AS share_permille,
           g.group_n, CAST((g.mx * 1000) // g.mn AS BIGINT)
             AS imbalance_milli
         FROM c JOIN g USING (split) ORDER BY split, label""",
    // x200: the x180 fit CTEs, trend projected per day, dow effect as
    // the detrended mean (trunc div — negatives truncate toward zero
    // in both engines), residual by subtraction
    "x200_seasonal_decomp" ->
      """WITH c AS (SELECT event_type AS t,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2),
         b AS (SELECT t, MIN(day) AS d0, MAX(day) AS d1 FROM c GROUP BY 1),
         grid AS (SELECT t, UNNEST(range(d0, d1 + 1)) AS day FROM b),
         dense AS (SELECT g.t, g.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
           FROM grid g LEFT JOIN c ON c.t = g.t AND c.day = g.day),
         agg AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS d,
             CAST(SUM(day) AS BIGINT) AS sx, CAST(SUM(n) AS BIGINT) AS sy,
             CAST(SUM(day * n) AS BIGINT) AS sxy,
             CAST(SUM(day * day) AS BIGINT) AS sxx
           FROM dense GROUP BY 1),
         s AS (SELECT t, d, sx, sy,
             CASE WHEN d * sxx - sx * sx = 0 THEN NULL
               ELSE ((d * sxy - sx * sy) * 1000000) // (d * sxx - sx * sx)
               END AS slope
           FROM agg),
         i AS (SELECT t, slope,
             CASE WHEN slope IS NULL THEN NULL
               ELSE (sy * 1000000 - slope * sx) // d END AS icept
           FROM s),
         dt AS (SELECT dense.t, dense.day, dense.day % 7 AS dow, dense.n,
             CASE WHEN slope IS NULL THEN NULL
               ELSE icept + slope * dense.day END AS trend,
             CASE WHEN slope IS NULL THEN NULL
               ELSE dense.n * 1000000 - (icept + slope * dense.day)
               END AS dm
           FROM dense JOIN i ON dense.t = i.t),
         dw AS (SELECT t, dow, SUM(dm) AS sdm,
             CAST(COUNT(*) AS BIGINT) AS cd
           FROM dt GROUP BY 1, 2)
         SELECT dt.t AS event_type, CAST(dt.day AS BIGINT) AS day,
           CAST(dt.dow AS BIGINT) AS dow, dt.n,
           CAST(dt.trend AS BIGINT) AS trend_micro,
           CASE WHEN dw.sdm IS NULL THEN NULL
             ELSE CAST(dw.sdm // dw.cd AS BIGINT) END AS dow_micro,
           CASE WHEN dt.dm IS NULL OR dw.sdm IS NULL THEN NULL
             ELSE CAST(dt.dm - dw.sdm // dw.cd AS BIGINT) END
             AS residual_micro
         FROM dt JOIN dw ON dt.t = dw.t AND dt.dow = dw.dow
         ORDER BY event_type, day""",
    // x10/x23 (hyperplane LSH) and x25 (Spark-ML KMeans cells) depend on
    // engine-specific hash seeds or trained models; x20 is a HLL++
    // sketch, x37 a count-min sketch, x78/x179 DataSketches HLL states.
    // Excluded from cross-engine hashing per SURVEY §2.4 rule 6;
    // covered by Spark-side golden specs instead.
  )

  /** x106 oracle: per-position equality over the SAME replayed
    * signature columns the x07 CTEs derive (h0..h15), summed as an
    * integer match count — est and err in exact permille. */
  private def jaccardEstimateOracle: String = {
    val matches = (0 until 16)
      .map(i => s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $minHashPairsCtes,
       est AS (SELECT p.da, p.db, p.jac_permille,
           CAST((($matches) * 1000) // 16 AS BIGINT) AS est_permille
         FROM pairs p JOIN mins a ON p.da = a.doc_id
         JOIN mins b ON p.db = b.doc_id)
       SELECT da, db, CAST(jac_permille AS BIGINT) AS jac_permille,
         est_permille,
         CAST(est_permille - jac_permille AS BIGINT) AS err_permille
       FROM est ORDER BY da, db"""
  }

  /** x96 oracle: the 6 upper-triangle pairs share one exact-moment
    * aggregate CTE; corr is the identical double expression tree the
    * Spark side builds (n·Σab − Σa·Σb over the sqrt product). */
  private def corrMatrixOracle: String = {
    val cols = Seq("qty" -> "l_quantity", "price" -> "l_extendedprice",
      "disc" -> "l_discount", "tax" -> "l_tax")
    val moments = cols.map { case (a, _) => s"SUM(${a}_c) AS s_$a" } ++
      (for { i <- cols.indices; j <- i until cols.size } yield {
        val (a, b) = (cols(i)._1, cols(j)._1)
        s"SUM(CAST(${a}_c AS HUGEINT) * ${b}_c) AS p_${a}_$b"
      })
    def corr(a: String, b: String): String = {
      def d(x: String) = s"CAST($x AS DOUBLE)"
      val num = s"${d("n")} * ${d(s"p_${a}_$b")} - ${d(s"s_$a")} * ${d(s"s_$b")}"
      val den = s"sqrt(${d("n")} * ${d(s"p_${a}_$a")} - ${d(s"s_$a")} * ${d(s"s_$a")}) * " +
        s"sqrt(${d("n")} * ${d(s"p_${b}_$b")} - ${d(s"s_$b")} * ${d(s"s_$b")})"
      s"CAST(FLOOR(($num) / ($den) * 1000 + 0.5) AS BIGINT)"
    }
    val rows = for { i <- cols.indices; j <- (i + 1) until cols.size } yield {
      val (a, b) = (cols(i)._1, cols(j)._1)
      s"SELECT '${a}_c' AS col_a, '${b}_c' AS col_b, ${corr(a, b)} AS corr_milli FROM a"
    }
    s"""WITH c AS (SELECT
         ${cols.map { case (a, src) =>
           s"CAST(FLOOR($src * 100 + 0.5) AS BIGINT) AS ${a}_c" }.mkString(", ")}
         FROM lineitem),
       a AS (SELECT COUNT(*) AS n, ${moments.mkString(", ")} FROM c)
       SELECT * FROM (${rows.mkString(" UNION ALL ")})
       ORDER BY col_a, col_b"""
  }

  /** x65/x74 oracle: shingle containment + Jaccard per pair, at the
    * query's shingleK — the RESULT is plan-independent, so both the
    * naive and the prefix-filtered operator answer to this form. */
  private def containmentOracle(shingleK: Int): String =
    s"""WITH ${shingleCtes(shingleK)},
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common
                 FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
       SELECT da, db,
         (common * 1000) // LEAST(sa.sz, sb.sz) AS cont_permille,
         (common * 1000) // (sa.sz + sb.sz - common) AS jac_permille
       FROM pairs
       JOIN sizes sa ON pairs.da = sa.doc_id
       JOIN sizes sb ON pairs.db = sb.doc_id
       WHERE (common * 1000) // LEAST(sa.sz, sb.sz) >= 700
       ORDER BY da, db, cont_permille, jac_permille"""

  /** x69 oracle: unrolled ±1 projection — the sign literals come from
    * the SAME [[Similarity.signPlus]] the operator bakes into its
    * plan, so the two engines cannot disagree on the matrix. Elements
    * widen to double before scaling in both engines (identical IEEE
    * rounding), then floor-quantize to exact integers. */
  private def randomProjectOracle: String = {
    val terms = (0 until 8).map { j =>
      val sum = (0 until 64).map { i =>
        val sgn = if (Similarity.signPlus(42L, j, i)) "+" else "-"
        s"$sgn CAST(FLOOR(CAST(embedding[${i + 1}] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
      }.mkString(" ")
      s"($sum) AS y$j"
    }.mkString(", ")
    s"SELECT vec_id, $terms FROM embeddings ORDER BY vec_id"
  }

  /** x68 oracle: equal positional grams across docs → per-(pair,
    * diagonal) islands via ia − ROW_NUMBER; maximal run ≥ 15 tokens
    * (gram-run length + k − 1). df-prune (≤ 8 docs) replayed too. */
  private def sharedRunsOracle: String =
    s"""WITH ${gramCtes(5)},
       df AS (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS df
                             FROM gr GROUP BY h) WHERE df <= 8),
       g AS (SELECT gr.doc_id, gr.i, gr.h FROM gr JOIN df USING (h)),
       hits AS (SELECT a.doc_id AS da, b.doc_id AS db, a.i AS ia, b.i AS ib
                FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id),
       r AS (SELECT da, db, ia - ib AS diag, ia,
               ROW_NUMBER() OVER (PARTITION BY da, db, ia - ib ORDER BY ia) AS rn
             FROM hits),
       runs AS (SELECT da, db, diag, ia - rn AS grp, COUNT(*) AS glen,
                  MIN(ia) AS sa
                FROM r GROUP BY 1, 2, 3, 4)
       SELECT da, db, sa - 1 AS start_a, sa - 1 - diag AS start_b,
         CAST(glen + 4 AS BIGINT) AS run_tokens
       FROM runs WHERE glen + 4 >= 15
       ORDER BY da, db, start_a, start_b, run_tokens"""

  /** Shared CTE chain ending in `<p>sh(doc_id, sh)` — the distinct
    * word k-shingle hashes per doc, replaying [[graft.functions
    * .ShingleHashes]]: tokh = first 60 md5 bits mod P31; shingle =
    * fold_j (acc·1000003 + tokh_{i+j}) mod P31, acc₀ = 0. `src` is the
    * source relation (subquery allowed), `p` a CTE-name prefix so two
    * chains can coexist in one statement (the contamination oracle). */
  /** The k-gram polynomial fold over `ts[i..i+k)` shared by
    * [[shingleCtes]] (distinct form) and [[gramCtes]] (positional). */
  private def gramExpr(k: Int): String = {
    val P = graft.operators.Dedup.P31
    (0 until k)
      .foldLeft("CAST(0 AS BIGINT)")((acc, j) =>
        s"(($acc) * 1000003 + (CAST('0x' || substr(md5(ts[i+$j]), 1, 15) AS BIGINT) % $P)) % $P")
  }

  private def shingleCtes(shingleK: Int, src: String = "documents",
                          p: String = ""): String = {
    val shingleExpr = gramExpr(shingleK)
    s"""${p}toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM $src),
       ${p}le AS (SELECT doc_id, ts FROM ${p}toks WHERE len(ts) >= $shingleK),
       ${p}pos AS (SELECT doc_id, ts, UNNEST(range(1, len(ts) - $shingleK + 2)) AS i FROM ${p}le),
       ${p}sh AS (SELECT DISTINCT doc_id, $shingleExpr AS sh FROM ${p}pos)"""
  }

  /** Positional twin of [[shingleCtes]] — chain ends in
    * `<p>gr(doc_id, i, h)` with i 1-BASED (DuckDB range/ts indexing;
    * consumers subtract 1 to match Spark's 0-based posexplode),
    * duplicates kept: replays [[graft.functions.GramHashes]]. */
  private def gramCtes(k: Int, src: String = "documents",
                       p: String = ""): String =
    s"""${p}toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM $src),
       ${p}le AS (SELECT doc_id, ts FROM ${p}toks WHERE len(ts) >= $k),
       ${p}pos AS (SELECT doc_id, ts, UNNEST(range(1, len(ts) - $k + 2)) AS i FROM ${p}le),
       ${p}gr AS (SELECT doc_id, i, ${gramExpr(k)} AS h FROM ${p}pos)"""

  /** x39 oracle: distinct vs total 3-gram counts per doc — `sh` is
    * distinct by construction, `le` still has the raw token array for
    * the total (len − k + 1). */
  private def repetitionOracle: String =
    s"""WITH ${shingleCtes(3)},
       nd AS (SELECT doc_id, COUNT(*) AS ndist FROM sh GROUP BY doc_id),
       tot AS (SELECT doc_id, len(ts) - 2 AS total FROM le)
       SELECT nd.doc_id AS doc_id, 1000 - (nd.ndist * 1000) // tot.total AS rep_permille
       FROM nd JOIN tot ON nd.doc_id = tot.doc_id
       ORDER BY nd.doc_id, rep_permille"""

  /** x40 oracle: the same md5-derived shard, running-sum window and
    * integer div/mod cut — every step is engine-portable arithmetic. */
  private def packSequencesOracle: String =
    """WITH t AS (SELECT doc_id,
           LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 8 AS shard
         FROM documents),
       p AS (SELECT doc_id, n_tokens, shard,
           CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
         FROM t)
       SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, shard,
         CAST(start_tok // 2048 AS BIGINT) AS seq_in_shard,
         CAST(start_tok % 2048 AS BIGINT) AS offset_in_seq
       FROM p ORDER BY doc_id"""

  /** x43 oracle: the full gate replayed — token/word-length formulas,
    * the x39 repetition chain (LEFT JOIN + COALESCE 0 for sub-k docs),
    * and the reason bitmask as integer CASE arithmetic. */
  private def qualityGateOracle: String =
    s"""WITH ${shingleCtes(3)},
       nd AS (SELECT doc_id, COUNT(*) AS ndist FROM sh GROUP BY doc_id),
       tot AS (SELECT doc_id, len(ts) - 2 AS total FROM le),
       rep AS (SELECT nd.doc_id AS doc_id,
           1000 - (nd.ndist * 1000) // tot.total AS rp
         FROM nd JOIN tot ON nd.doc_id = tot.doc_id),
       m AS (SELECT d.doc_id AS doc_id,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS BIGINT) * 1000
             // (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS awl_permille,
           CAST(COALESCE(rep.rp, 0) AS BIGINT) AS rep_permille
         FROM documents d LEFT JOIN rep ON d.doc_id = rep.doc_id),
       g AS (SELECT doc_id, n_tokens, awl_permille, rep_permille,
           CAST((CASE WHEN n_tokens < 32 THEN 1 ELSE 0 END)
             + (CASE WHEN rep_permille > 10 THEN 2 ELSE 0 END)
             + (CASE WHEN awl_permille < 4200 OR awl_permille > 4800 THEN 4 ELSE 0 END)
             AS BIGINT) AS reason_bits
         FROM m)
       SELECT doc_id, n_tokens, awl_permille, rep_permille, reason_bits,
         CAST(CASE WHEN reason_bits = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
       FROM g ORDER BY doc_id"""

  /** x41 oracle: two prefixed shingle chains (corpus ≥ 20, benchmark
    * < 20) joined on the shingle hash — the exact contamination count. */
  /** x80 oracle: [[graft.operators.Dedup.crossNearDup]] replayed end
    * to end — per-side shingles, minhash signatures, band buckets, the
    * cross candidate join and exact-Jaccard verification (the x07
    * discipline over TWO tables). The bench CTE rebuilds the planted
    * slice with a nested subquery (NOT a lateral alias — both engines
    * resolve same-select alias references differently). */
  private def crossNearDupOracle: String = {
    val (numHashes, rowsPerBand, shingleK, minPermille) = (16, 4, 2, 600)
    val corpusSrc = "(SELECT * FROM documents WHERE doc_id >= 10)"
    val benchSrc =
      """(SELECT orig_id + 9000000 AS doc_id, text FROM (
         SELECT doc_id AS orig_id,
           CASE WHEN doc_id % 2 = 0 THEN text || ' heldout' ELSE text END AS text
         FROM documents WHERE doc_id >= 10 AND doc_id < 25))"""
    s"""WITH ${shingleCtes(shingleK, corpusSrc, "c")},
       ${shingleCtes(shingleK, benchSrc, "b")},
       cmins AS (SELECT doc_id, ${minhashSigCols(numHashes)} FROM csh GROUP BY doc_id),
       bmins AS (SELECT doc_id, ${minhashSigCols(numHashes)} FROM bsh GROUP BY doc_id),
       cbanded AS (${minhashBandSelects("cmins", numHashes, rowsPerBand)}),
       bbanded AS (${minhashBandSelects("bmins", numHashes, rowsPerBand)}),
       cand AS (SELECT DISTINCT c.doc_id AS doc_id, b.doc_id AS bench_id
                FROM cbanded c JOIN bbanded b
                  ON c.band = b.band AND c.bucket = b.bucket),
       csz AS (SELECT doc_id, COUNT(*) AS sz FROM csh GROUP BY doc_id),
       bsz AS (SELECT doc_id, COUNT(*) AS sz FROM bsh GROUP BY doc_id),
       cm AS (SELECT c.doc_id, c.bench_id, COUNT(s2.sh) AS common
              FROM cand c
              LEFT JOIN csh s1 ON s1.doc_id = c.doc_id
              LEFT JOIN bsh s2 ON s2.doc_id = c.bench_id AND s2.sh = s1.sh
              GROUP BY c.doc_id, c.bench_id)
       SELECT cm.doc_id AS doc_id, cm.bench_id AS bench_id,
         (cm.common * 1000) // (sa.sz + sb.sz - cm.common) AS jac_permille
       FROM cm JOIN csz sa ON cm.doc_id = sa.doc_id
            JOIN bsz sb ON cm.bench_id = sb.doc_id
       WHERE (cm.common * 1000) // (sa.sz + sb.sz - cm.common) >= $minPermille
       ORDER BY doc_id, bench_id, jac_permille"""
  }

  private def contaminationOracle: String =
    s"""WITH ${shingleCtes(3, "(SELECT * FROM documents WHERE doc_id >= 20)", "c")},
       ${shingleCtes(3, "(SELECT * FROM documents WHERE doc_id < 20)", "b")}
       SELECT c.doc_id AS doc_id, b.doc_id AS bench_id, COUNT(*) AS shared
       FROM csh c JOIN bsh b ON c.sh = b.sh
       GROUP BY 1, 2 HAVING COUNT(*) >= 3
       ORDER BY doc_id, bench_id, shared"""

  /** x38 oracle: [[graft.operators.Dedup.jaccardSweep]] has candidate
    * recall 1.0 (a qualifying pair must share a shingle) and exact
    * scoring, so its result is PLAN-INDEPENDENT — the oracle is
    * brute-force all-pairs shingle Jaccard (the shared-shingle inner
    * join is complete: zero-overlap pairs cannot reach the
    * threshold). */
  private def jaccardSweepOracle: String =
    s"""WITH ${shingleCtes(3)},
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       cm AS (SELECT s1.doc_id AS da, s2.doc_id AS db, COUNT(*) AS common
              FROM sh s1 JOIN sh s2 ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
              GROUP BY 1, 2)
       SELECT cm.da, cm.db,
         (cm.common * 1000) // (sa.sz + sb.sz - cm.common) AS jac_permille
       FROM cm JOIN sizes sa ON cm.da = sa.doc_id JOIN sizes sb ON cm.db = sb.doc_id
       WHERE (cm.common * 1000) // (sa.sz + sb.sz - cm.common) >= 200
       ORDER BY da, db, jac_permille"""

  /** Full cross-engine replication of [[graft.operators.Dedup.minHashLsh]]
    * with the x07 parameters (shingleK=2, 16 hashes, 4 rows/band,
    * minPermille=300). Every hash is md5-derived — shingle keys are the
    * rolling polynomial of per-token 60-bit md5 prefixes mod 2³¹−1,
    * exactly [[graft.functions.ShingleHashes]] — so signatures, band
    * buckets, candidates and verified Jaccard all agree bit for bit. */
  private def minHashLshOracle: String =
    s"WITH $minHashPairsCtes\n       " +
      "SELECT da, db, jac_permille FROM pairs ORDER BY da, db, jac_permille"

  /** CTE chain ending in `pairs(da, db, jac_permille)` — shared by the
    * x07 pair oracle and the x34 cluster oracle (which closes the pair
    * graph with a recursive CTE). */
  /** The seeded-minhash signature column list — ONE spelling of the
    * universal-hash-family arithmetic shared by every oracle that
    * replays [[graft.operators.Dedup.bandedSignatures]] (the x07
    * family of self-join oracles and the x80 cross oracle); a banding
    * change must hit all of them or none. */
  private def minhashSigCols(numHashes: Int): String = {
    val P = graft.operators.Dedup.P31
    (0 until numHashes).map { i =>
      val (a, b) = (graft.operators.Dedup.affineA(i), graft.operators.Dedup.affineB(i))
      s"MIN(($a * (sh % $P) + $b) % $P) AS h$i"
    }.mkString(", ")
  }

  /** Banded rolling-polynomial bucket selects over a `mins` CTE —
    * [[minhashSigCols]]'s second half, same sharing contract. */
  private def minhashBandSelects(mins: String, numHashes: Int,
                                 rowsPerBand: Int): String = {
    val P = graft.operators.Dedup.P31
    (0 until numHashes / rowsPerBand).map { b =>
      val bucket = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .foldLeft("CAST(0 AS BIGINT)")((acc, i) => s"(($acc) * 1000003 + h$i) % $P")
      s"SELECT doc_id, $b AS band, $bucket AS bucket FROM $mins"
    }.mkString(" UNION ALL ")
  }

  private def minHashPairsCtes: String = {
    val (numHashes, rowsPerBand, shingleK, minPermille) = (16, 4, 2, 300)
    s"""${shingleCtes(shingleK)},
       mins AS (SELECT doc_id, ${minhashSigCols(numHashes)} FROM sh GROUP BY doc_id),
       banded AS (${minhashBandSelects("mins", numHashes, rowsPerBand)}),
       cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                FROM banded a JOIN banded b
                  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       cm AS (SELECT c.da, c.db, COUNT(s2.sh) AS common
              FROM cand c
              LEFT JOIN sh s1 ON s1.doc_id = c.da
              LEFT JOIN sh s2 ON s2.doc_id = c.db AND s2.sh = s1.sh
              GROUP BY c.da, c.db),
       pairs AS (SELECT cm.da, cm.db,
           (cm.common * 1000) // (sa.sz + sb.sz - cm.common) AS jac_permille
         FROM cm JOIN sizes sa ON cm.da = sa.doc_id JOIN sizes sb ON cm.db = sb.doc_id
         WHERE (cm.common * 1000) // (sa.sz + sb.sz - cm.common) >= $minPermille)"""
  }

  /** x34 oracle: close the x07 pair graph transitively (recursive CTE
    * — sound because near-dup clusters are tiny) and label every node
    * with its minimum reachable doc id, replaying
    * [[graft.operators.Dedup.connectedComponents]]'s fixpoint. */
  private def dupClustersOracle: String =
    s"""WITH RECURSIVE $minHashPairsCtes,
       sym AS (SELECT da AS s, db AS d FROM pairs
               UNION SELECT db AS s, da AS d FROM pairs),
       verts AS (SELECT DISTINCT s AS v FROM sym),
       reach AS (SELECT v AS a, v AS b FROM verts
                 UNION SELECT r.a, s.d FROM reach r JOIN sym s ON r.b = s.s)
       SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS cluster_id
       FROM reach GROUP BY a ORDER BY doc_id, cluster_id"""

  /** x55 oracle: the same 10 power iterations UNROLLED as chained CTEs
    * over the x07 pair graph (recursive CTEs cannot aggregate in the
    * recursive term, so fixed unrolling is the faithful SQL form).
    * Every constant is forced ::DOUBLE; micros rounding absorbs
    * summation-order ulps (tiny here — per-node fan-in is cluster
    * degree). */
  private def pageRankOracle: String = {
    val rounds = (1 to 10).map { k =>
      s"""m$k AS (SELECT s.dst AS node, SUM(i.r / d.deg) AS m
         FROM sym s JOIN it${k - 1} i ON s.src = i.node JOIN deg d ON s.src = d.src
         GROUP BY s.dst),
       it$k AS (SELECT node, tele.t + 0.85::DOUBLE * m AS r FROM m$k CROSS JOIN tele)"""
    }.mkString(",\n       ")
    s"""WITH $minHashPairsCtes,
       sym AS (SELECT da AS src, db AS dst FROM pairs
               UNION SELECT db AS src, da AS dst FROM pairs),
       deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
       nn AS (SELECT COUNT(*) AS n FROM deg),
       tele AS (SELECT (1 - 0.85::DOUBLE) / n AS t FROM nn),
       it0 AS (SELECT src AS node, 1.0::DOUBLE / nn.n AS r FROM deg CROSS JOIN nn),
       $rounds
       SELECT node AS doc_id, CAST(FLOOR(r * 1000000 + 0.5) AS BIGINT) AS pr_micros
       FROM it10 ORDER BY doc_id"""
  }

  /** x153 oracle: 4 synchronous label-propagation rounds UNROLLED as
    * chained CTEs over the x07 pair graph (the x55 fixed-unroll
    * discipline); the neighbor-label argmax replays Spark's
    * `max(struct(cnt, −label))` as a (count DESC, label) row_number. */
  private def labelPropOracle: String = {
    val rounds = (1 to 4).map { k =>
      s"""c$k AS (SELECT s.src AS node, i.lbl AS lbl, COUNT(*) AS c
         FROM sym s JOIN it${k - 1} i ON s.dst = i.node GROUP BY 1, 2),
       it$k AS (SELECT node, lbl FROM (SELECT node, lbl,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
         FROM c$k) WHERE rn = 1)"""
    }.mkString(",\n       ")
    s"""WITH $minHashPairsCtes,
       sym AS (SELECT da AS src, db AS dst FROM pairs
               UNION SELECT db AS src, da AS dst FROM pairs),
       it0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym),
       $rounds
       SELECT node AS doc_id, CAST(lbl AS BIGINT) AS community
       FROM it4 ORDER BY doc_id"""
  }

  /** x154 oracle: the x56 quantize + integer-L2 spelling with one
    * centroid per LABEL (rounded integer-micro mean over the labeled
    * rows), argmin ties to the lowest label, confusion-matrix rollup. */
  private def centroidEvalOracle: String = {
    val dist = """list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(list_zip(q.qv, c.cqv), p -> (p[1]-p[2])*(p[1]-p[2]))),
         (a, b) -> a + b)"""
    s"""WITH q AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS qv
         FROM embeddings WHERE label IS NOT NULL),
       u AS (SELECT lbl, r.pos,
           CAST(floor(CAST(SUM(qv[r.pos]) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cv
         FROM q CROSS JOIN (SELECT CAST(range + 1 AS INT) AS pos FROM range(64)) r
         GROUP BY lbl, r.pos),
       cents AS (SELECT lbl AS clbl, list(cv ORDER BY pos) AS cqv FROM u GROUP BY lbl),
       a AS (SELECT vec_id, lbl, clbl FROM (
           SELECT q.vec_id, q.lbl, c.clbl,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY $dist ASC, c.clbl ASC) AS rn
           FROM q CROSS JOIN cents c) WHERE rn = 1)
       SELECT lbl AS true_label, clbl AS pred_label,
         CAST(COUNT(*) AS BIGINT) AS n
       FROM a GROUP BY 1, 2 ORDER BY true_label, pred_label"""
  }

  /** x162 oracle: 4 k-core peel rounds unrolled over the x07 pair
    * graph — per round the degree table, the deg ≥ k keep set, and the
    * both-endpoints-survive edge restriction, exactly the operator's
    * trajectory. */
  private def kCoreOracle: String = {
    // every e_r is referenced TWICE (its degree table and the next
    // restriction) — without MATERIALIZED DuckDB may inline each
    // reference and re-evaluate the whole LSH-pair pipeline once per
    // path through the 4-round chain (exponential; at sf0.1 it spilled
    // >80 GB of temp). Materializing pins each round to one evaluation.
    val rounds = (1 to 4).map { r =>
      s"""d$r AS (SELECT src, COUNT(*) AS deg FROM e${r - 1} GROUP BY src),
       k$r AS MATERIALIZED (SELECT src AS node FROM d$r WHERE deg >= 2),
       e$r AS MATERIALIZED (SELECT e.src, e.dst FROM e${r - 1} e
         JOIN k$r a ON e.src = a.node JOIN k$r b ON e.dst = b.node)"""
    }.mkString(",\n       ")
    s"""WITH $minHashPairsCtes,
       e0 AS MATERIALIZED (SELECT da AS src, db AS dst FROM pairs
              UNION SELECT db AS src, da AS dst FROM pairs),
       $rounds
       SELECT src AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_deg
       FROM e4 GROUP BY src ORDER BY doc_id"""
  }

  /** x171 oracle: one UNION ALL branch per audited column, each
    * replaying the count table → entropy identity → floors; the
    * branch list derives from [[entropyCols]] so the two sides cannot
    * drift (the x141 fdRules discipline). */
  private def columnEntropyOracle: String =
    entropyCols.map { c =>
      s"""(WITH vv AS (SELECT CAST($c AS VARCHAR) AS v FROM lineitem),
         cnt AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n FROM vv
           WHERE v IS NOT NULL GROUP BY v),
         st AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS nd,
             SUM(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS s FROM cnt),
         nl AS (SELECT CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_nulls FROM vv)
         SELECT '$c' AS col_name, COALESCE(st.nn, 0) AS n, nl.n_nulls,
           COALESCE(st.nd, 0) AS n_distinct,
           CAST(FLOOR((ln(CAST(st.nn AS DOUBLE)) - st.s / st.nn) * 1000000
             + 0.5) AS BIGINT) AS entropy_micronat,
           CASE WHEN COALESCE(st.nd, 0) <= 1 THEN NULL
             ELSE CAST(FLOOR((ln(CAST(st.nn AS DOUBLE)) - st.s / st.nn)
               / ln(CAST(st.nd AS DOUBLE)) * 1000 + 0.5) AS BIGINT)
           END AS evenness_milli
         FROM st CROSS JOIN nl)"""
    }.mkString("\n       UNION ALL\n       ") +
      "\n       ORDER BY col_name"

  /** Shared oracle for the exact cosine top-k twins (x09 HOF path, x13
    * native-expression path): same fold order as the Spark plan, so the
    * scores are bit-identical, not merely close. */
  /** x56: chained-CTE replay of [[graft.operators.Clustering.kmeans]]
    * (k=4, 2 iterations, dim 64) — quantize, assign (argmin of integer
    * squared L2, ties → lowest centroid), update (rounded integer
    * mean, empty clusters keep the old centroid), assign again. */
  private def kmeansOracle: String =
    s"""WITH ${kmeansChain(4, 2, 64)}
       SELECT vec_id, CAST(c AS INTEGER) AS cluster FROM afin ORDER BY vec_id"""

  /** The k-means trajectory as a reusable CTE body ending in
    * `afin(vec_id, qv, c)` — shared by the x56 oracle and the x73
    * semantic-dedup oracle (which keeps composing after `afin`).
    * `src` is the source relation (a prior CTE name is fine). */
  private def kmeansChain(k: Int, iters: Int, dim: Int,
                          src: String = "embeddings"): String = {
    def dist(qv: String, cv: String) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(list_zip($qv, $cv), p -> (p[1]-p[2])*(p[1]-p[2]))),
         (a, b) -> a + b)"""
    def assign(name: String, cents: String) =
      s"""$name AS (SELECT vec_id, qv, c FROM (
           SELECT q.vec_id, q.qv, $cents.c,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY ${dist("q.qv", s"$cents.qv")} ASC, $cents.c ASC) AS rn
           FROM q CROSS JOIN $cents) WHERE rn = 1)"""
    def update(i: Int) =
      s"""u$i AS (SELECT a$i.c, r.pos,
           CAST(floor(CAST(SUM(a$i.qv[r.pos]) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cv
           FROM a$i CROSS JOIN (SELECT CAST(range + 1 AS INT) AS pos FROM range($dim)) r
           GROUP BY a$i.c, r.pos),
         c$i AS (SELECT c${i - 1}.c, COALESCE(n.qv, c${i - 1}.qv) AS qv
           FROM c${i - 1} LEFT JOIN
             (SELECT c, list(cv ORDER BY pos) AS qv FROM u$i GROUP BY c) n
           ON n.c = c${i - 1}.c)"""
    val chain = (1 to iters).map(i => s"${assign(s"a$i", s"c${i - 1}")},\n${update(i)}")
      .mkString(",\n")
    s"""q AS (SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS qv
         FROM $src),
       c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, qv
         FROM q ORDER BY vec_id LIMIT $k),
       $chain,
       ${assign("afin", s"c$iters")}"""
  }

  /** x73: the x56 trajectory (k=16) composed with the x09-parity
    * cosine spelling for within-cluster pairs and the x34 recursive
    * closure for duplicate groups — three certified replays chained. */
  private def semanticDedupOracle: String =
    s"""WITH RECURSIVE emb2 AS (
         SELECT vec_id, embedding, label FROM embeddings
         UNION ALL
         SELECT vec_id + 1000000, list_transform(embedding, (x, i) ->
             CAST(CAST(x AS DOUBLE) + 0.02 * (CAST('0x' ||
               substr(md5(CAST(vec_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 15)
               AS BIGINT) / 1152921504606846976.0) AS FLOAT)),
           label
         FROM embeddings WHERE vec_id < 64),
       ${kmeansChain(16, 2, 64, src = "emb2")},
       fv AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM emb2),
       nrm AS (SELECT vec_id, v,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(v, x -> x * x)), (a, b) -> a + b)) AS n
         FROM fv),
       pr AS (SELECT a.vec_id AS da, b.vec_id AS db
         FROM afin a JOIN afin b ON a.c = b.c AND a.vec_id < b.vec_id
         JOIN nrm na ON na.vec_id = a.vec_id
         JOIN nrm nb ON nb.vec_id = b.vec_id
         WHERE FLOOR((CASE WHEN na.n * nb.n = 0 THEN 0.0 ELSE
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list_zip(na.v, nb.v), p -> p[1] * p[2])),
               (x, y) -> x + y) / (na.n * nb.n) END) * 1000 + 0.5) >= 900),
       sym AS (SELECT da AS s, db AS d FROM pr UNION SELECT db AS s, da AS d FROM pr),
       verts AS (SELECT DISTINCT s AS v FROM sym),
       reach AS (SELECT v AS a, v AS b FROM verts
                 UNION SELECT r.a, s2.d FROM reach r JOIN sym s2 ON r.b = s2.s),
       comp AS (SELECT a AS vid, MIN(b) AS keep FROM reach GROUP BY a)
       SELECT f.vec_id, CAST(f.c AS INTEGER) AS cluster,
         CAST(COALESCE(comp.keep, f.vec_id) AS BIGINT) AS keep_id
       FROM afin f LEFT JOIN comp ON comp.vid = f.vec_id
       ORDER BY f.vec_id"""

  /** x60: RRF fusion replay — the x47 BM25 formula at pool depth 50,
    * the x09 cosine (same left-fold dot product) for query vec 0, then
    * `Σ 1/(60 + rank)` in micros. */
  private def hybridRrfOracle: String =
    """WITH dl AS (SELECT doc_id,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS dl
         FROM documents),
       stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
       tf AS (SELECT doc_id, tok, COUNT(*) AS tf
         FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
         WHERE tok IN ('vector', 'stream', 'join') GROUP BY doc_id, tok),
       dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
       bm AS (SELECT tf.doc_id AS doc_id,
           CAST(FLOOR(SUM(
             ln(1 + (stats.n_docs - dfq.df + 0.5::DOUBLE) / (dfq.df + 0.5::DOUBLE))
             * tf.tf * (1.2::DOUBLE + 1)
             / (tf.tf + 1.2::DOUBLE * ((1 - 0.75::DOUBLE) + 0.75::DOUBLE * dl.dl / stats.avgdl))
           ) * 1000 + 0.5) AS BIGINT) AS score_milli
         FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
         GROUP BY tf.doc_id
         ORDER BY score_milli DESC, doc_id LIMIT 50),
       lex AS (SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score_milli DESC, doc_id) AS lex_rank FROM bm),
       qv AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         FROM embeddings WHERE vec_id = 0),
       cv AS (SELECT vec_id AS neighbor_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv FROM embeddings),
       sc AS (SELECT neighbor_id,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_zip(qv, cv), p -> p[1] * p[2])), (a, b) -> a + b) AS d,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(qv, x -> x * x)), (a, b) -> a + b)) *
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(cv, x -> x * x)), (a, b) -> a + b)) AS n
         FROM qv CROSS JOIN cv WHERE neighbor_id <> 0),
       dense AS (SELECT neighbor_id AS doc_id, dense_rank FROM (
           SELECT neighbor_id,
             ROW_NUMBER() OVER (ORDER BY (CASE WHEN n = 0 THEN 0.0 ELSE d / n END) DESC,
               neighbor_id) AS dense_rank
           FROM sc) WHERE dense_rank <= 50),
       f AS (SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
           lex.lex_rank AS lex_rank, dense.dense_rank AS dense_rank
         FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id)
       SELECT doc_id, lex_rank, dense_rank,
         CAST(FLOOR((COALESCE(1.0/(60.0 + lex_rank), 0.0)
           + COALESCE(1.0/(60.0 + dense_rank), 0.0)) * 1000000.0 + 0.5) AS BIGINT) AS rrf_micro
       FROM f ORDER BY rrf_micro DESC, doc_id LIMIT 20"""

  /** x58: the same shift/mask interleave as [[graft.core.Layout.zValue]]
    * (bits=8 over the mod-256 reduced keys), spelled in SQL operators. */
  private def zOrderOracle: String = {
    val interleave = (0 until 8).map(i =>
      s"((((o_custkey % 256) >> $i) & 1) << ${2 * i}) | " +
        s"((((o_orderkey % 256) >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")
    s"""SELECT o_orderkey, CAST($interleave AS BIGINT) AS zval
       FROM orders ORDER BY zval, o_orderkey LIMIT 200"""
  }

  private def cosineTopKOracle: String =
    """WITH q AS (SELECT vec_id AS query_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         FROM embeddings WHERE vec_id < 10),
       c AS (SELECT vec_id AS neighbor_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
         FROM embeddings),
       s AS (SELECT query_id, neighbor_id,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_zip(qv, cv), p -> p[1] * p[2])), (a, b) -> a + b) AS d,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(qv, x -> x * x)), (a, b) -> a + b)) *
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(cv, x -> x * x)), (a, b) -> a + b)) AS n
         FROM q, c WHERE query_id <> neighbor_id),
       r AS (SELECT query_id, neighbor_id,
           CASE WHEN n = 0 THEN 0.0 ELSE d / n END AS score,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY (CASE WHEN n = 0 THEN 0.0 ELSE d / n END) DESC, neighbor_id) AS rank
         FROM s)
       SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
         CAST(FLOOR(score * 1000 + 0.5) AS BIGINT) AS cos_permille
       FROM r WHERE rank <= 5
       ORDER BY query_id, rank, neighbor_id, cos_permille"""

  /** Brute-force simhash oracle: identical md5-keyed 60-bit signatures,
    * then ALL pairs at Hamming ≤ 3 — sound because the Spark side's
    * pigeonhole banding guarantees recall 1.0 (same result set). */
  private def simHashOracle: String = {
    val bits = graft.operators.Dedup.SimHashBits
    val bitSums = (0 until bits).map(i => s"SUM((h >> $i) & 1) AS s$i").mkString(", ")
    val sigExpr = (0 until bits)
      .map(i => s"(CASE WHEN 2 * s$i > n THEN (CAST(1 AS BIGINT) << $i) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""WITH tok0 AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents),
       tok AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM tok0),
       agg AS (SELECT doc_id, COUNT(*) AS n, $bitSums FROM tok GROUP BY doc_id),
       sig AS (SELECT doc_id, $sigExpr AS simhash FROM agg)
       SELECT a.doc_id AS da, b.doc_id AS db,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ORDER BY da, db, hamming"""
  }
}
