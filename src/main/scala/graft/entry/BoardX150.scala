package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.queries.Relational
import graft.entry.EntryLib._

/** Board segment: capability rows x150–x200 — query registrations and their
  * DuckDB oracle texts, concatenated into the driver contract by
  * [[graft.SparkEntry]] (which documents the rules; EntrySpec pins
  * the 1:1 id/alias/oracle-key invariants across segments). */
private[graft] object BoardX150 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    // PPJoin operating-point planner: per-candidate-k df profile +
    // naive/prefix join masses + a closed-form recommendation — the
    // measured basis x74's shingleK is pinned to (DedupSpec asserts
    // the recommendation; corpus drift re-opens the choice loudly)
    "x201_prefix_plan" -> ((s, d) =>
      Dedup.prefixFilterPlan(Tables.documents(s, d))),
    // k-NN label-noise audit over a probe slice vs the labeled corpus
    // — the mislabel detector embeddings can see and text audits can't
    "x202_knn_label_audit" -> ((s, d) =>
      graft.operators.Similarity.knnLabelAudit(
        Tables.embeddings(s, d).filter(col("vec_id") < 100),
        Tables.embeddings(s, d), k = 10)),
    // clustering-depth histogram: arrival-batch "files" vs the n_chars
    // key — how many files a point lookup fans out to on THIS layout
    "x203_clustering_depth" -> ((s, d) =>
      graft.core.Layout.clusteringDepthHistogram(Tables.documents(s, d),
        expr("doc_id div 100"), "n_chars")),
    // full time-to-convert quantile ladder per funnel transition —
    // x128's median generalized to the p90/p99 SLA tail
    "x204_funnel_latency" -> ((s, d) =>
      graft.operators.Behavior.funnelStepQuantiles(Tables.events(s, d),
        Seq("view", "click", "purchase"))),
    // duplicate-aware loss weights over the x34 cluster closure — keep
    // every copy, down-weight by 1/cluster_size
    "x205_loss_weights" -> ((s, d) =>
      Dedup.clusterLossWeights(Tables.documents(s, d),
        Dedup.minHashLshPairs(Tables.documents(s, d), shingleK = 2,
          minPermille = 300))),
    // subject-deletion blast-radius audit across the two tables the
    // corpus keys by the same subject space (user_id ≡ custkey)
    "x206_purge_audit" -> { (s, d) =>
      val ids = Tables.events(s, d)
        .filter(pmod(col("user_id"), lit(97L)) === 0L)
        .select("user_id").distinct()
      graft.operators.Governance.purgeAudit(Seq(
        ("events", Tables.events(s, d), "user_id"),
        ("orders", Tables.orders(s, d), "o_custkey")), ids)
    },
    // retention-policy TTL audit: 30-day age buckets vs a 365-day TTL
    // anchored just past the corpus' last order date
    "x207_ttl_audit" -> ((s, d) =>
      graft.operators.Governance.ttlAudit(Tables.orders(s, d),
        "o_orderdate", ttlDays = 365L, asOf = "2001-09-01")),
  )

  def oracleSql: Map[String, String] = Map(
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
             ELSE CAST((CAST(cov AS HUGEINT) * 1000000)
               // CAST(vx AS HUGEINT) AS BIGINT) END AS slope_micro,
           CASE WHEN vx = 0 THEN NULL
             ELSE CAST((CAST(sy AS HUGEINT) * 1000000
               - ((CAST(cov AS HUGEINT) * 1000000) // CAST(vx AS HUGEINT))
                 * CAST(sx AS HUGEINT)) // CAST(d AS HUGEINT)
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
      """WITH z AS (SELECT
             (CAST(l_orderkey AS BIGINT)
               - ((l_orderkey % 1000) + 1000) % 1000) // 1000 AS zone,
             CAST(CAST(l_shipdate AS DATE) - DATE '1995-01-01' AS BIGINT)
               AS v
           FROM lineitem WHERE l_orderkey IS NOT NULL)
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
         dense AS (SELECT g.t, g.day, ((g.day % 7) + 7) % 7 AS dow,
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
      """WITH z AS (SELECT
             (CAST(doc_id AS BIGINT) - ((doc_id % 50) + 50) % 50) // 50
               AS zone,
             CAST(octet_length(encode(text)) AS BIGINT) AS b
           FROM documents WHERE doc_id IS NOT NULL),
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
               ELSE CAST((CAST(d * sxy - sx * sy AS HUGEINT) * 1000000)
                 // CAST(d * sxx - sx * sx AS HUGEINT) AS BIGINT)
               END AS slope
           FROM agg),
         i AS (SELECT t, slope,
             CASE WHEN slope IS NULL THEN NULL
               ELSE CAST((CAST(sy AS HUGEINT) * 1000000
                 - CAST(slope AS HUGEINT) * CAST(sx AS HUGEINT))
                 // CAST(d AS HUGEINT) AS BIGINT) END AS icept
           FROM s),
         dt AS (SELECT dense.t, dense.day,
             ((dense.day % 7) + 7) % 7 AS dow, dense.n,
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
    // x201: the same shingle/df/rank derivation per candidate k,
    // collapsed to one stats row each, with the integer 25%-of-best
    // recommendation rule over the 4-row report
    "x201_prefix_plan" -> prefixPlanOracle(),
    // x202: the x09 exact-cosine rank replayed, neighbor-label counts,
    // (n DESC, label ASC) majority, agreement by left join
    "x202_knn_label_audit" -> knnLabelAuditOracle,
    // x203: per-"file" (doc_id div 100) min/max of n_chars, boundary
    // sweep (+1 at lo, −1 past hi), running depth, span histogram
    "x203_clustering_depth" ->
      """WITH f AS (SELECT doc_id // 100 AS fi,
             CAST(MIN(n_chars) AS BIGINT) AS lo,
             CAST(MAX(n_chars) AS BIGINT) AS hi
           FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
         b AS (SELECT lo AS pt, 1 AS d FROM f
           UNION ALL SELECT hi + 1, -1 FROM f),
         m AS (SELECT pt, CAST(SUM(d) AS BIGINT) AS delta
           FROM b GROUP BY 1),
         s AS (SELECT pt,
             CAST(SUM(delta) OVER (ORDER BY pt ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS depth,
             LEAD(pt) OVER (ORDER BY pt) AS nxt
           FROM m)
         SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(nxt - pt) AS BIGINT) AS key_span
         FROM s WHERE nxt IS NOT NULL GROUP BY 1 ORDER BY 1""",
    // x204: the x128 champion/gap CTEs with the exact lower-quantile
    // ladder selection instead of the single median
    "x204_funnel_latency" ->
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
           FROM v),
         q AS (SELECT UNNEST([500, 900, 990]) AS q_permille)
         SELECT CAST(c.step_idx AS BIGINT) AS step_idx,
           CAST(q.q_permille AS BIGINT) AS q_permille,
           MIN(c.gap) AS gap_ns
         FROM c CROSS JOIN q
         WHERE c.cum * 1000 >= q.q_permille * c.tot
         GROUP BY 1, 2 ORDER BY step_idx, q_permille""",
    // x205: the x34 closure + sizes, corpus left-joined — singletons
    // are their own cluster, weight = 10^6 div size with the min-id
    // survivor absorbing the remainder (each cluster sums to 10^6)
    "x205_loss_weights" -> lossWeightsOracle,
    // x206: distinct-id left joins (ids distinct → no fan-out), one
    // summary row per table, integer ppm
    "x206_purge_audit" ->
      """WITH ids AS (SELECT DISTINCT user_id AS k FROM events
           WHERE user_id % 97 = 0),
         e AS (SELECT 'events' AS table_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN ids.k IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_matched
           FROM events LEFT JOIN ids ON events.user_id = ids.k),
         o AS (SELECT 'orders' AS table_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN ids.k IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_matched
           FROM orders LEFT JOIN ids ON orders.o_custkey = ids.k),
         u AS (SELECT * FROM e UNION ALL SELECT * FROM o)
         SELECT table_name, n_rows, n_matched,
           CASE WHEN n_rows = 0 THEN 0
             ELSE CAST((n_matched * 1000000) // n_rows AS BIGINT) END
             AS matched_ppm
         FROM u ORDER BY table_name""",
    // x207: exact integer day ages back from the asOf literal, 30-day
    // trunc-div buckets, half-open purge rule; sentinels -1 (NULL ts)
    // and -2 (future-dated, age < 0) mirror the operator's policy
    "x207_ttl_audit" ->
      """WITH a AS (SELECT CAST(DATE '2001-09-01' -
             CAST(o_orderdate AS DATE) AS BIGINT) AS age FROM orders),
         b AS (SELECT CASE WHEN age IS NULL THEN -1
             WHEN age < 0 THEN -2 ELSE age // 30 END
             AS age_bucket,
             CASE WHEN age IS NOT NULL AND age >= 365 THEN 1 ELSE 0 END
               AS p
           FROM a)
         SELECT CAST(age_bucket AS BIGINT) AS age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(p) AS BIGINT) AS purged,
           CAST((SUM(p) * 1000000) // COUNT(*) AS BIGINT) AS purge_ppm
         FROM b GROUP BY 1 ORDER BY 1""",
    // x10/x23 (hyperplane LSH) and x25 (Spark-ML KMeans cells) depend on
    // engine-specific hash seeds or trained models; x20 is a HLL++
    // sketch, x37 a count-min sketch, x78/x179 DataSketches HLL states.
    // Excluded from cross-engine hashing per SURVEY §2.4 rule 6;
    // covered by Spark-side golden specs instead.
  )
}
