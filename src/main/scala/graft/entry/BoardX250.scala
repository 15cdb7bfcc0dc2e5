package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Board segment: capability rows x244+ — query registrations and
  * their DuckDB oracle texts, concatenated into the driver contract
  * by [[graft.SparkEntry]] (EntrySpec pins the 1:1 id/alias/oracle-key
  * invariants across segments). */
private[graft] object BoardX250 {

  /** x247's probe corpus: the raw corpus has ZERO cross-source exact
    * dups at sf0.001/sf0.01 (probed), and an empty matrix certifies
    * nothing — so every 13th document is mirrored into a derived
    * `mirror_<source>` feed at doc_id + 10⁹ (collision-free,
    * deterministic, DuckDB replays the construction verbatim — the
    * x208/x234/x242 derived-fixture discipline). The mirror doc joins
    * its text's WHOLE dup group, so where the raw corpus already has
    * same-text docs the originator is the group's true min-id doc,
    * not necessarily the mirrored one — exercised, not assumed. */
  private def withMirrorFeed(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.unionByName(
      docs.filter(col("doc_id") % 13 === 0 && col("text").isNotNull
          && col("source").isNotNull)
        .select((col("doc_id") + lit(1000000000L)).as("doc_id"),
          col("text"), col("lang"),
          concat(lit("mirror_"), col("source")).as("source"),
          col("n_chars")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-doc cross-entropy under the corpus unigram LM — the no-target
    // "how unlike the corpus is this doc" outlier read (x240's micronat
    // discipline at document granularity)
    "x244_doc_typicality" -> ((s, d) =>
      TextAnalysis.docTypicality(Tables.documents(s, d))),
    // top-gram share + repeated-gram mass per doc — the two dominance
    // signals x39's distinct ratio cannot separate (one stuck phrase
    // vs diffuse re-phrasing)
    "x245_gram_dominance" -> ((s, d) =>
      TextAnalysis.gramDominanceReport(Tables.documents(s, d), k = 2)),
    // arrival-batch centroid drift: each 128-vector ingest batch
    // cosined against the global centroid (absolute drift) and its
    // predecessor (step drift localizing WHEN a change shipped)
    "x246_embedding_drift" -> ((s, d) =>
      Similarity.embeddingDrift(Tables.embeddings(s, d), batchSize = 128)),
    // directed who-copies-whom matrix over exact-dup groups, probed on
    // a derived mirror feed (raw corpus has zero cross-source exact
    // dups at the oracle scales — the derived-fixture discipline)
    "x247_syndication" -> ((s, d) =>
      Dedup.syndicationMatrix(withMirrorFeed(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    // x244: one (doc_id, token) count table, corpus token totals from
    // it, integer micronat ln terms (term = c·(lnµN − lnµc_t) ≥ 0),
    // HUGEINT sum, one truncating div per doc
    "x244_doc_typicality" ->
      """WITH tok0 AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
           FROM documents WHERE text IS NOT NULL),
       dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok0 GROUP BY 1, 2),
       ct AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS ctot FROM dt GROUP BY 1),
       tt AS (SELECT CAST(SUM(ctot) AS BIGINT) AS n FROM ct),
       t AS (SELECT dt.doc_id, dt.c,
           dt.c * (CAST(FLOOR(ln(CAST(tt.n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
             - CAST(FLOOR(ln(CAST(ct.ctot AS DOUBLE)) * 1000000 + 0.5) AS BIGINT))
             AS term
         FROM dt JOIN ct USING (tok), tt),
       g AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           SUM(term) AS s FROM t GROUP BY 1)
       SELECT doc_id, n_tokens, CAST(s // n_tokens AS BIGINT) AS xent_micronat
       FROM g ORDER BY doc_id""",
    // x245: literal 2-gram slices (duplicates kept), per-doc gram
    // counts, top/repeat rollup, trunc division
    "x245_gram_dominance" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
           FROM documents WHERE text IS NOT NULL),
       le AS (SELECT doc_id, ts FROM toks WHERE len(ts) >= 2),
       pos AS (SELECT doc_id, ts, UNNEST(range(1, len(ts))) AS i FROM le),
       g AS (SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS gram FROM pos),
       c AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
           FROM g GROUP BY 1, 2),
       a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
           CAST(MAX(c) AS BIGINT) AS top,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS rep
         FROM c GROUP BY 1)
       SELECT doc_id, n_grams,
         CAST((top * 1000) // n_grams AS BIGINT) AS top_share_permille,
         CAST((rep * 1000) // n_grams AS BIGINT) AS repeat_mass_permille
       FROM a ORDER BY doc_id""",
    // x246: the x233 integer-quantized centroid spelling keyed by
    // vec_id // 128, plus a lag-1 self-join for the step drift; the
    // ordered list_reduce fold replays Spark's aggregate bit-for-bit
    "x246_embedding_drift" ->
      """WITH e AS (SELECT vec_id // 128 AS batch, UNNEST(embedding) AS x,
           UNNEST(range(len(embedding))) AS i
         FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
       q AS (SELECT batch, i,
           CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qq
         FROM e),
       per AS (SELECT batch, i, CAST(SUM(qq) AS BIGINT) AS s
         FROM q GROUP BY 1, 2),
       bv AS (SELECT batch, list(CAST(s AS DOUBLE) ORDER BY i) AS v
         FROM per GROUP BY 1),
       g0 AS (SELECT i, CAST(SUM(s) AS BIGINT) AS s FROM per GROUP BY 1),
       gv AS (SELECT list(CAST(s AS DOUBLE) ORDER BY i) AS g FROM g0),
       nv AS (SELECT vec_id // 128 AS batch, CAST(COUNT(*) AS BIGINT) AS n_vecs
         FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
         GROUP BY 1),
       c AS (SELECT bv.batch,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_zip(v, g), p -> p[1] * p[2])),
             (a, b) -> a + b) AS dg,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nvv,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(g, x -> x * x)), (a, b) -> a + b)) AS ngg
         FROM bv, gv),
       p AS (SELECT a.batch,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])),
             (x, y) -> x + y) AS dp,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(a.v, x -> x * x)), (x, y) -> x + y)) AS na,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(b.v, x -> x * x)), (x, y) -> x + y)) AS nb
         FROM bv a JOIN bv b ON a.batch = b.batch + 1)
       SELECT c.batch, nv.n_vecs,
         CAST(FLOOR((CASE WHEN c.nvv * c.ngg = 0 THEN 0.0
           ELSE c.dg / (c.nvv * c.ngg) END) * 1000 + 0.5) AS BIGINT)
           AS cos_global_permille,
         CASE WHEN p.batch IS NULL THEN NULL
           ELSE CAST(FLOOR((CASE WHEN p.na * p.nb = 0 THEN 0.0
             ELSE p.dp / (p.na * p.nb) END) * 1000 + 0.5) AS BIGINT) END
           AS cos_prev_permille
       FROM c JOIN nv USING (batch) LEFT JOIN p USING (batch)
       ORDER BY c.batch""",
    // x247: the identical mirror-feed construction, md5 dup groups,
    // arg_min originator, directed rollup excluding within-source
    "x247_syndication" ->
      """WITH m AS (SELECT doc_id + 1000000000 AS doc_id, text,
           'mirror_' || source AS source
         FROM documents
         WHERE doc_id % 13 = 0 AND text IS NOT NULL AND source IS NOT NULL),
       a AS (SELECT doc_id, text, source FROM documents
         UNION ALL SELECT doc_id, text, source FROM m),
       d AS (SELECT md5(text) AS fp, doc_id, source AS src FROM a
         WHERE text IS NOT NULL AND source IS NOT NULL),
       o AS (SELECT fp, arg_min(src, doc_id) AS src_from FROM d GROUP BY 1),
       j AS (SELECT o.src_from, d.src AS src_to, d.fp
         FROM d JOIN o USING (fp) WHERE d.src <> o.src_from)
       SELECT src_from, src_to, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_groups
       FROM j GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
