package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.queries.Relational
import graft.entry.EntryLib._

/** Board segment: capability rows x100–x149 — query registrations and their
  * DuckDB oracle texts, concatenated into the driver contract by
  * [[graft.SparkEntry]] (which documents the rules; EntrySpec pins
  * the 1:1 id/alias/oracle-key invariants across segments). */
private[graft] object BoardX100 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
  )

  def oracleSql: Map[String, String] = Map(
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
    // weighted-containment arithmetic; the FORM is shared with x210's
    // prefix-filtered plan (bit-identical output)
    "x103_weighted_containment" -> weightedContainmentOracle(3, 500),
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
  )
}
