package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.queries.Relational
import graft.entry.EntryLib._

/** Board segment: capability rows x01–x49 — query registrations and their
  * DuckDB oracle texts, concatenated into the driver contract by
  * [[graft.SparkEntry]] (which documents the rules; EntrySpec pins
  * the 1:1 id/alias/oracle-key invariants across segments). */
private[graft] object BoardX000 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
  )

  def oracleSql: Map[String, String] = Map(
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
  )
}
