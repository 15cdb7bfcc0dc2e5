package graft

import java.nio.file.{Files, Paths}

/** Regenerates PLANS.md: the formatted physical plans of the flagship
  * queries, with the scale-critical property each plan demonstrates.
  * Usage: runMain graft.Plans [sfDir] [outFile]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = graft.core.GraftSession.local(4)

    val entries: Seq[(String, String, String)] = Seq(
      ("q03_filter_pred", "predicate pushdown — both filters reach the parquet scan (PushedFilters), 2-column ReadSchema",
        "q03_filter_pred"),
      ("q06_multi_join", "dimension broadcast — nation and region broadcast, zero pre-agg shuffles",
        "q06_multi_join"),
      ("q07_left_anti", "outer-join + IS NULL on a declared-non-null PK rewritten to a true LeftAnti by AntiJoinRewrite — matched rows never materialize",
        "q07_left_anti"),
      ("q08_semi_join", "EXISTS as LeftSemi with the quantity filter pushed below the join",
        "q08_semi_join"),
      ("q09_tpch1_agg", "cast-to-date filter rewritten to a pushable timestamp range; partial+final agg",
        "q09_tpch1_agg"),
      ("q12_window_rank", "rank filter triggers native Partial+Final WindowGroupLimit before the shuffle",
        "q12_window_rank"),
      ("q14_topk_sort", "bounded top-k plans as TakeOrderedAndProject — no global sort exchange",
        "q14_topk_sort"),
      ("x18_asof_join", "as-of join: one hash shuffle + sort, no range explosion",
        "x18_asof_join"),
      ("x33_asof_nearest", "nearest as-of: BOTH direction champions from ONE shuffle — ascending running frame for the backward leg, time-REVERSED running frame (an in-partition re-sort, not a second Exchange) for the forward leg; never Spark's O(n²) unbounded-following frame",
        "x33_asof_nearest"),
      ("x23_embed_neardup", "multi-probe hyperplane LSH self-join: native lsh_sig signatures, probe-side explode, signature equi-join — candidate mass ~n·M/2^planes, no all-pairs join",
        "x23_embed_neardup"),
      ("x22_range_join_banded", "interval predicate executed as a binned equi join, no nested loop",
        "x22_range_join_banded"),
      ("x282_semi_rewrite", "InnerUniqueJoinToSemi: the plain inner filter-join plans as LeftSemi — key-only build, first-hit probe, zero row multiplication",
        "x282_semi_rewrite"),
      ("x285_regional_revenue", "TPC-H Q5 star, printed in its 100 TB shape: the broadcast threshold is pinned to -1 FOR THIS SECTION so the artifact shows what the narrative claims — nation/region still broadcast (explicit hints in the query), while the three un-hinted fact joins (lineitem⋈orders, ⋈customer, ⋈supplier) plan as SortMergeJoin on their keys. At toy sf AQE would re-broadcast these at runtime (correct there — the r13 artifact showed exactly that and demonstrated nothing about scale); at 100 TB the facts exceed any broadcast budget and THIS printed shape is the executed one. PlanSpec pins 3×SortMergeJoin + 2×BroadcastHashJoin under the same threshold",
        "x285_regional_revenue"),
      ("x274_cdc_chunks", "content-defined chunking: boundaries, slices and md5 digests all row-local on the codegen'd gram_hashes array — the only Exchange is the per-source digest distinct",
        "x274_cdc_chunks"),
      ("x290_pair_state", "persisted pair-mining state: standing pairs and the delta's arrival mine from the SAME fingerprint table — the arrival's candidate join is bandedDelta ⋈ bandedAll (never the full self-join), and the text-side shingle scan happens once per doc ever",
        "x290_pair_state"),
      ("x292_shipping_priority", "TPC-H Q3: segment/order-date/ship-date predicates each pushed to THEIR OWN scan, top-10 as TakeOrderedAndProject — never a global sort of the qualifying aggregate",
        "x292_shipping_priority"),
      ("x293_golden_record", "golden-record consolidation: deletion variants are a Generate riding each scan, candidates a hash equi-join, the label fixpoint runs over found pairs, and the attribute election is ONE melted Expand pass ranked inside an (entity, attr)-keyed window over the bounded count table",
        "x293_golden_record"),
      ("x294_bucket_checksum", "bucket-checksum sync plan: both snapshots collapse SCAN-SIDE to ≤N (bucket, count, digest-sum) rows with map-side combine — no row ever shuffles; the plan is a ≤N-row full-outer join",
        "x294_bucket_checksum"),
      ("x295_split_repair", "split-leakage repair: the component fixpoint runs over found pairs only, splits are a scan-side md5 CASE (no assignment join), and the majority election is an argmax window over the bounded (cluster, split) count table",
        "x295_split_repair"),
      ("x296_mixture_waterfill", "water-filling mixture solver: ONE token-sum scan collapses the corpus to its source table; the ratio sort, capped-prefix inequality and water level all run over that bounded table in exact decimal arithmetic",
        "x296_mixture_waterfill"),
      ("x13_cosine_native", "native CosineF32 expression inside WholeStageCodegen over a broadcast probe set",
        "x13_cosine_native"),
      ("x38_jaccard_sweep", "exact low-threshold sweep: inverted-index equi-join on shingle hash (no BNL/cartesian), common counts as partial-aggregated group counts — no per-pair array payloads",
        "x38_jaccard_sweep"),
      ("x40_pack_sequences", "sequence packing: running-sum window PARTITIONED by the md5 shard — parallel, never a single global window task",
        "x40_pack_sequences"),
      ("x41_contamination", "contamination check: benchmark shingle rows broadcast, corpus side joins in place with zero Exchange below the aggregation",
        "x41_contamination"),
      ("x35_stratified_sample", "deterministic md5-keyed sample is a scan-side filter — zero Exchange, zero UDF, column-pruned scan",
        "x35_stratified_sample"),
      ("x47_bm25_topk", "BM25 retrieval: postings filtered to query terms at the scan, df + corpus stats broadcast, top-k as TakeOrderedAndProject",
        "x47_bm25_topk"),
      ("x48_sessionize", "gaps-and-islands sessionization: lag + running sum + session agg off ONE user_id shuffle (the agg keys refine the window partitioning)",
        "x48_sessionize"),
      ("x56_kmeans", "fixed-point k-means final assignment: broadcast-literal centroids make the labeling a pure map pass riding the scan — no join, no aggregate, no hash Exchange below the presentation sort",
        "x56_kmeans"),
      ("x59_profile", "per-column profile: 3·|cols| aggregates (incl. exact distincts) through a single Expand-based multi-distinct — ONE scan, never per-column sub-plans",
        "x59_profile"),
      ("x60_hybrid_rrf", "hybrid RRF fusion: corpus-sized work stays inside the pooled operators (inverted-index postings probe; broadcast cosine scoring); the fusion itself full-outer joins two ≤poolK-row pools",
        "x60_hybrid_rrf"),
      ("x63_snapshot_diff", "snapshot diff: md5 fingerprints projected scan-side, so the full-outer join shuffles only (key, fp) pairs — network cost is keys, not rows",
        "x63_snapshot_diff"),
      ("x65_containment", "asymmetric containment: inverted-index equi-join on shingle hashes with map-side partial counts; no size-ratio prune by design (size asymmetry IS the signal), no cross join anywhere",
        "x65_containment"),
      ("x66_incremental_agg", "materialized-view refresh law: two partial states union then key-groupBy — every aggregate partial_sum/partial_count combines map-side, so the merge shuffle carries at most one row per (partition, key)",
        "x66_incremental_agg"),
      ("x67_length_buckets", "length-bucketed padding accounting: one scan, bucket CASE stays in codegen, <=|ladder|-row aggregate after map-side combine",
        "x67_length_buckets"),
      ("x68_shared_runs", "span-level substring dedup: positional gram equi-join (df-pruned) then islands window keyed by (pair, diagonal) — never a cross join, never a global window",
        "x68_shared_runs"),
      ("x69_random_project", "deterministic JL sign projection: the ±1 matrix is plan literals, each output an exact integer sum — pure codegen map over the scan, no Exchange below the presentation sort",
        "x69_random_project"),
      ("x70_majority_vote", "majority vote: (key, vote) groupBy with map-side partial counts, then total + tie-broken row_number over the counts table — the raw vote table shuffles once",
        "x70_majority_vote"),
      ("x71_rank_calibrate", "rank calibration: rank and group count ride ONE window partitioning (single keyed shuffle); integer permille projection after",
        "x71_rank_calibrate"),
      ("x72_decayed_counts", "decayed trending counts: weights are a row-local codegen CASE over datediff, aggregate is a |types|-row groupBy with map-side combine (anchor = one scalar pre-job)",
        "x72_decayed_counts"),
      ("x73_semantic_dedup", "SemDeDup: the k-means assignment map is computed once into the operator cache; the pairwise cosine join is an equi-join on `cluster` (pair mass bounded per cell, native cosine_f32 in the filter); the survivor fixpoint runs over found pairs only",
        "x73_semantic_dedup"),
      ("x74_containment_prefix", "PPJoin-style containment: df table + per-doc rarest-first rank window feed the prefix equi-join; exact common counts re-derived for candidates only — everything keyed, nothing quadratic; output bit-identical to x65 (shared oracle)",
        "x74_containment_prefix"),
      ("x75_redact", "PII redaction: regexp counts + ordered replaces all ride the scan in one codegen stage — no Exchange below the presentation sort",
        "x75_redact"),
      ("x76_new_docs", "incremental-corpus dedup: LEFT ANTI on 16-byte md5 digests — the batch side shuffles fingerprints, never bodies; the store side is the persisted fingerprint artifact",
        "x76_new_docs"),
      ("x77_bigram_surprisal", "bigram surprisal: row-local bigram derivation (no positional self-join); unigram/bigram count tables broadcast back; one doc-keyed aggregate",
        "x77_bigram_surprisal"),
      ("x78_incremental_distinct", "HLL distinct maintenance: per-key hll_sketch_agg states union then hll_union_agg key-groupBy — sketch merge combines map-side, so the refresh shuffle carries fixed-size sketch bytes per (partition, key), never raw values",
        "x78_incremental_distinct"),
      ("x79_psi_drift", "PSI drift gate: the only data-scale work is the two-sided histogram pass (bin CASE in codegen, map-side combine, ≤2·nbins rows per task in the shuffle); spine join, totals, and ln all run on the ≤nbins-row bin table",
        "x79_psi_drift"),
      ("x80_cross_neardup", "cross-corpus near-dup decontamination: corpus band rows probe the BROADCAST benchmark band table (corpus never self-joins, signatures row-local); exact-Jaccard verification joins arrays for band-collision candidates only",
        "x80_cross_neardup"),
      ("x82_dsir_weights", "DSIR importance weights: gram→bucket rows row-local (native gram_hashes), both corpora collapse to ≤4096-row bucket tables (map-side combine), the ln-ratio table broadcasts back onto the gram rows, one doc-keyed aggregation — no data-scale×data-scale join",
        "x82_dsir_weights"),
      ("x94_span_dedup", "span-duplication profile: sequence+substring windows ride the scan in one codegen stage (no UDF); span df groupBy then a doc-keyed aggregate — stride is the linear cost knob",
        "x94_span_dedup"),
      ("x96_corr_matrix", "correlation matrix: n, Σx, and Σxy for every column pair in ONE aggregation pass (exact decimal moments, map-side partials); the 6 pair rows unpivot from the 1-row result — no second scan, no join",
        "x96_corr_matrix"),
      ("x100_triangles", "triangle counting: degree-ordered orientation, wedge equi-join on the middle vertex (each triangle generated once), closing equi-join — join mass Σ d⁻·d⁺, never a cross join; the canonical AND oriented edge lists are cached (InMemoryTableScan on every wedge-join side) so the upstream LSH pair mining executes ONCE — uncached, the 6 plan references re-ran the whole mining pipeline (the r9 15.6 s regression)",
        "x100_triangles"),
      ("x102_weighted_sample", "A-ES weighted sample: md5-uniform key projected scan-side, top-k as TakeOrderedAndProject — no window, no global sort Exchange, output columns untouched",
        "x102_weighted_sample"),
      ("x103_weighted_containment", "IDF-weighted containment: vocabulary-bounded micronat weight table joins onto inverted-index rows; boilerplate carries weight 0 so its pairs die in the score, not in a df-cap heuristic — same equi-join shape and levers as x65",
        "x103_weighted_containment"),
      ("x108_bloom_newdocs", "bloom-pruned incremental dedup: BloomFilterMightContain is a codegen'd scan-side predicate on the batch, so only dups + fpp·batch reach the anti-join shuffle; the sketch is one store aggregation, result bit-identical to x76",
        "x108_bloom_newdocs"),
      ("x109_funnel", "conversion funnel: each step is a filter-pushed event scan + user-keyed join/agg — every shuffle shares the user hash distribution (exchange reuse), step counts are 1-row aggregates",
        "x109_funnel"),
      ("x112_gapfill", "gap-fill + interpolation: per-user day grid from one keyed agg + explode; neighbour lookups are user-PARTITIONed running-frame windows (no single-partition window, no self-join against observations)",
        "x112_gapfill"),
      ("x113_sorted_linkage", "sorted-neighbourhood linkage: row_number windows PARTITIONed by block, candidate ranks exploded per row, pairs via (block, rn) equi-join — join mass exactly n·w, levenshtein evaluated on candidates only",
        "x113_sorted_linkage"),
      ("x114_skipgram", "skip-gram co-occurrence: pair generation is a row-local HOF chain riding the scan (Generate over the flattened pair array — no self-join, no window); the ONE Exchange is the vocabulary-bounded pair groupBy with map-side partial counts",
        "x114_skipgram"),
      ("x117_event_paths", "path mining: len−1 leads off ONE user-partitioned window shuffle, |types|^len-bounded count table with map-side combine, top-k as TakeOrderedAndProject — no global sort",
        "x117_event_paths"),
      ("x119_fk_audit", "FK audit: every edge's parent collapses to DISTINCT keys BEFORE its LEFT ANTI join — the shuffles carry key bytes, never parent rows; the per-edge scalars meet in 1×1 joins",
        "x119_fk_audit"),
      ("x121_attribution", "last-touch attribution: the AsOfJoin.backward composition — conversions and touches union into ONE keyed shuffle + sort, the champion rides a running window, tolerance is a post-window filter; no per-conversion scan, no range-exploded join",
        "x121_attribution"),
      ("x122_rolling_actives", "rolling actives: the contribution explode turns a sliding COUNT DISTINCT into an exact groupBy — no self-join over the window, no per-row re-aggregating distinct-over-range window",
        "x122_rolling_actives"),
      ("x123_weighted_median", "weighted median: one (group, value) aggregation collapses the corpus to its distinct-value table; the running-sum window and half-mass cut run over THAT bounded table — no raw row ever passes through a sort",
        "x123_weighted_median"),
      ("x124_assoc_rules", "association rules: pair support via the within-basket self-join (join mass Σ basket_size², baskets keyed by (user, day)); all measures integer arithmetic on the ≤|types|²-row pair table with broadcast singleton supports",
        "x124_assoc_rules"),
      ("x126_id_gaps", "bucketed id-gap audit: the per-id lag window runs PARTITIONED by id bucket over sparse buckets only (dense runs pruned by the count = span groupBy before the window); the single un-partitioned window reads the |ids|/B bucket summary — never raw ids",
        "x126_id_gaps"),
      ("x129_keywords", "keyword extraction: map-side-combined (doc, tok) tf table, vocab-bounded df equi-join, doc-PARTITIONED rank window — integer-division scores, no global sort, no driver state",
        "x129_keywords"),
      ("x133_two_hop", "2-hop counts: middle-vertex equi-join over the pair graph (Σ deg² mass — pair-graph-sized, never corpus), distinct + LEFT ANTI shortcut removal, zero-reporting left join",
        "x133_two_hop"),
      ("x134_moments", "moment profile: ONE map-side-combined groupBy accumulates exact integer power sums (S3/S4 in DECIMAL(38,0)); all float math runs on the |groups|-row aggregate table",
        "x134_moments"),
      ("x136_streaks", "activity streaks: distinct (user, day) facts, ONE user-PARTITIONed window for the day − row_number island id, island and user aggregates refine the same hash distribution — no self-join, no sequence explode",
        "x136_streaks"),
      ("x139_cusum", "CUSUM change-point: the corpus collapses to per-day counts with map-side combine; the densify grid, running sum, and peak selection all run over the calendar-bounded day aggregate — the global window never sees a raw event",
        "x139_cusum"),
      ("x140_interval_cover", "interval coverage: cummax island rule + island labeling + both aggregates off ONE user-hash shuffle — overlapping durations merge without any row-to-row join",
        "x140_interval_cover"),
      ("x144_key_skew", "key-skew Gini: the rank sum computes from the frequency-of-frequencies closed form, so the only window runs over the multiplicity histogram (bounded by max key frequency) — Gini over 10¹² keys without ranking a single key",
        "x144_key_skew"),
      ("x145_cdc_apply", "CDC apply: last-(ts, seq)-wins is ONE map-side-combinable max(struct) champion aggregate per key — the shuffle carries one candidate per key per map task, never the history; tombstones filter on the |keys|-row result",
        "x145_cdc_apply"),
      ("x147_winnowing", "winnowing fingerprints: gram hashes and the packed (hash, pos) keys ride the scan row-locally; the ONE window is doc-partitioned with a w-row frame; selection dedupe + summary reuse the same doc-hash distribution",
        "x147_winnowing"),
      ("x148_basket_pairs", "bought-together projection: the apriori frequent-item semi-join prunes BEFORE pairing, so the within-basket self-join's mass is Σ|frequent items per basket|² — per-basket-bounded on a large vocabulary, never vocabulary²",
        "x148_basket_pairs"),
      ("x150_retract_agg", "retractable MV refresh: the signed changelog collapses to per-key (±n, ±v) partials map-side, then ONE key-equi merge with the state — identical shuffle shape to the insert-only merge; deletes never re-read the snapshot",
        "x150_retract_agg"),
      ("x151_phrase_topk", "phrase search: per-doc m-grams are a Generate riding the scan, the phrase equality filters BEFORE the aggregate (only matching docs shuffle), and the top-k cut is TakeOrderedAndProject",
        "x151_phrase_topk"),
      ("x154_centroid_eval", "nearest-centroid eval: per-label centroids collapse to plan literals (broadcast-literal pattern), so the scoring pass is a shuffle-free codegen map over the scan — the only exchanges feed the |labels|²-bounded confusion aggregate",
        "x154_centroid_eval"),
      ("x156_deletion_join", "SymSpell deletion join: variants are a Generate riding each scan, candidates meet in an ordinary hash equi-join on the variant string — no cartesian, no nested loop — and the levenshtein verify runs on candidates only",
        "x156_deletion_join"),
      ("x161_pane_windows", "pane-decomposed sliding windows: raw events collapse to (type, pane) partials FIRST (map-side combine), the ×W contribution Generate fans out the bounded pane table, never events — O(events + panes·W)",
        "x161_pane_windows"),
      ("x170_interval_overlap", "interval-overlap join: both interval sets explode to covered bins and meet in a hash equi-join on the bin (no BroadcastNestedLoopJoin), dedupe, then the exact overlap predicate verifies survivors",
        "x170_interval_overlap"),
      ("x183_shard_rebalance", "shard rebalance: the rendezvous argmax is a row-local array transform + array_max riding the scan — no |rows|×|shards| explode, no join anywhere; both schemes' before/after shards project in ONE pass and only the ≤2·shards-row summaries aggregate",
        "x183_shard_rebalance"),
      ("x187_join_skew", "join-skew pre-flight: both sides collapse to per-key count tables BEFORE the join (the shuffle carries keys, never rows); per-key output mass is integer arithmetic on the bounded table and top-k cuts with TakeOrderedAndProject",
        "x187_join_skew"),
      ("x190_skyline", "2-D skyline: the strict prefix-min decomposes into a (bucket)-PARTITIONED window plus a global window over the bucket-summary AGGREGATE — no O(n²) dominance join, no global data-scale sort; output is the frontier itself",
        "x190_skyline"),
      ("x193_compaction_plan", "compaction plan: the corpus collapses to per-zone (rows, bytes) with map-side combine; the running-bytes window and the group assignment run over the bounded zone table only",
        "x193_compaction_plan"),
      ("x196_lateness", "lateness profile: the running event-time max decomposes over arrival buckets — (type, bucket)-keyed prefix max over raw events, global prefix over the bucket-summary aggregate — then the quantile ladder runs on the lateness weight table; no per-type window ever serializes raw events",
        "x196_lateness"))

    val md = new StringBuilder
    md.append("# PLANS — physical plans of the flagship queries\n\n")
    md.append(s"Generated by `runMain graft.Plans` against `$sf`. Each section\n")
    md.append("names the scale property the plan shape demonstrates; PlanSpec\n")
    md.append("asserts these properties in `sbt test` so regressions fail CI.\n")
    entries.foreach { case (name, why, key) =>
      // x285's section exists to show the at-scale join shape: pin the
      // broadcast threshold so un-hinted fact joins print as
      // SortMergeJoin (the hinted nation/region broadcasts survive the
      // pin — hints outrank the threshold)
      val pin = name == "x285_regional_revenue"
      val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      if (pin) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = SparkEntry.queries(key)(spark, sf)
        md.append(s"\n## $name\n\n$why\n\n```\n")
        md.append(df.queryExecution.executedPlan.toString.take(4000))
        md.append("\n```\n")
      } finally if (pin)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    }
    Files.writeString(Paths.get(out), md.toString)
    println(s"[plans] wrote $out (${entries.size} plans)")
    spark.stop()
  }
}
