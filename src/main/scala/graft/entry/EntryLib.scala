package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.queries.Relational
import graft.entry.EntryLib._

/** Shared helpers behind the board segments: column lists, synthetic
  * frame builders, and the generated DuckDB oracle texts that the
  * per-segment oracle maps interpolate. ONE definition feeds both the
  * Spark call and the oracle SQL wherever drift is possible. */
private[graft] object EntryLib {

  /** x171's audited column set — ONE list feeds both the Spark call
    * and the generated oracle union (the x141 fdRules discipline). */
  val entropyCols: Seq[String] =
    Seq("l_linestatus", "l_returnflag", "l_suppkey")

  /** x141's audited FD rules — ONE list feeds both the Spark call and
    * the generated oracle union so the two sides cannot drift. */
  val fdRules: Seq[(String, String)] = Seq(
    "l_orderkey" -> "l_suppkey",
    "l_partkey" -> "l_suppkey",
    "l_orderkey" -> "l_returnflag",
    "l_suppkey" -> "l_linestatus")

  /** x141 oracle: per rule, the same null-safe fan-out subquery
    * (COUNT(DISTINCT rhs) + MAX(rhs IS NULL)) rolled to one summary
    * row, UNION ALL across rules, ordered by rule name. */
  def fdAuditOracle: String =
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
  def rfmOracle: String = {
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
  def cdcChangelog(events: DataFrame): DataFrame =
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
  def nextDrop(base: DataFrame): DataFrame =
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
  def embeddingsWithPlantedDups(s: SparkSession, d: String): DataFrame = {
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


  /** x106 oracle: per-position equality over the SAME replayed
    * signature columns the x07 CTEs derive (h0..h15), summed as an
    * integer match count — est and err in exact permille. */
  def jaccardEstimateOracle: String = {
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
  def corrMatrixOracle: String = {
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
  /** x201 oracle: per candidate k the SAME shingle/df/rank CTEs the
    * operator derives (scalar subqueries collapse each k to one stats
    * row), unioned, then the integer 4·mass ≤ 5·min recommendation
    * rule over the |ks|-row report. */
  def prefixPlanOracle(ks: Seq[Int] = Seq(2, 3, 4, 5),
                       minPermille: Long = 700): String = {
    val blocks = ks.map { k =>
      s"""${shingleCtes(k, p = s"k$k")},
       k${k}sz AS (SELECT doc_id, COUNT(*) AS sz FROM k${k}sh GROUP BY 1),
       k${k}df AS (SELECT sh, COUNT(*) AS df FROM k${k}sh GROUP BY 1),
       k${k}rk AS (SELECT s.doc_id, d.df, z.sz,
           ROW_NUMBER() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.sh)
             AS rk
         FROM k${k}sh s JOIN k${k}df d USING (sh)
         JOIN k${k}sz z USING (doc_id)),
       k${k}pre AS (SELECT * FROM k${k}rk
         WHERE rk <= sz - ($minPermille * sz + 999) // 1000 + 1),
       k${k}stat AS (SELECT CAST($k AS BIGINT) AS shingle_k,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM k${k}df) AS vocab,
           (SELECT CAST(SUM(df) AS BIGINT) FROM k${k}df) AS n_rows,
           (SELECT CAST(MAX(df) AS BIGINT) FROM k${k}df) AS max_df,
           (SELECT CAST(SUM(df * df) AS BIGINT) FROM k${k}df)
             AS naive_mass,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM k${k}pre) AS prefix_rows,
           (SELECT CAST(SUM(df) AS BIGINT) FROM k${k}pre) AS prefix_mass)"""
    }
    val union = ks.map(k => s"SELECT * FROM k${k}stat").mkString("\n         UNION ALL ")
    s"""WITH ${blocks.mkString(",\n       ")},
       allk AS ($union),
       r1 AS (SELECT *, MIN(prefix_mass) OVER () AS minm FROM allk),
       r2 AS (SELECT *, MIN(CASE WHEN prefix_mass * 4 <= minm * 5
           THEN shingle_k END) OVER () AS bestk FROM r1)
       SELECT shingle_k, vocab, n_rows, max_df, naive_mass, prefix_rows,
         prefix_mass,
         CAST(CASE WHEN shingle_k = bestk THEN 1 ELSE 0 END AS BIGINT)
           AS recommended
       FROM r2 ORDER BY shingle_k"""
  }

  /** x103/x210 oracle: the x65 shingle CTEs + micronat IDF weights
    * (ONE ln per distinct shingle over exact integer counts), then
    * pure integer weighted-containment arithmetic. Shared by the
    * naive (x103) and prefix-filtered (x210) plans — candidate recall
    * 1.0 + exact verification keep the outputs bit-identical. */
  def weightedContainmentOracle(shingleK: Int, minPermille: Long): String =
    s"""WITH ${shingleCtes(shingleK)},
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
         AND (cw * 1000) // LEAST(ta.tw, tb.tw) >= $minPermille
       ORDER BY da, db"""

  /** x211 oracle: [[prefixPlanOracle]]'s per-k report where the
    * prefix is the WEIGHTED rarest-first prefix — per doc, rows whose
    * exclusive cumulative IDF weight (df-ascending, sh tiebreak — a
    * total order, so the running sum is engine-deterministic) stays
    * ≤ tw − ⌈p·tw/1000⌉; zero-total docs excluded. */
  def weightedPrefixPlanOracle(ks: Seq[Int] = Seq(2, 3, 4, 5),
                               minPermille: Long = 500): String = {
    val blocks = ks.map { k =>
      s"""${shingleCtes(k, p = s"k$k")},
       k${k}nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
       k${k}df AS (SELECT sh, COUNT(*) AS df FROM k${k}sh GROUP BY 1),
       k${k}w AS (SELECT d.sh AS sh, d.df AS df,
           CAST(FLOOR(ln(CAST(n_docs AS DOUBLE) / CAST(d.df AS DOUBLE))
             * 1000000 + 0.5) AS BIGINT) AS wt
         FROM k${k}df d CROSS JOIN k${k}nd),
       k${k}wr AS (SELECT s.doc_id, s.sh, w.df, w.wt
         FROM k${k}sh s JOIN k${k}w w ON s.sh = w.sh),
       k${k}tw AS (SELECT doc_id, SUM(wt) AS tw FROM k${k}wr GROUP BY 1),
       k${k}wt AS (SELECT r.doc_id, r.sh, r.df, r.wt, t.tw
         FROM k${k}wr r JOIN k${k}tw t USING (doc_id) WHERE t.tw > 0),
       k${k}cum AS (SELECT *, COALESCE(SUM(wt) OVER (PARTITION BY doc_id
           ORDER BY df, sh ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS cumx FROM k${k}wt),
       k${k}pre AS (SELECT * FROM k${k}cum
         WHERE cumx <= tw - ($minPermille * tw + 999) // 1000),
       k${k}stat AS (SELECT CAST($k AS BIGINT) AS shingle_k,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM k${k}df) AS vocab,
           (SELECT CAST(SUM(df) AS BIGINT) FROM k${k}df) AS n_rows,
           (SELECT CAST(MAX(df) AS BIGINT) FROM k${k}df) AS max_df,
           (SELECT CAST(SUM(df * df) AS BIGINT) FROM k${k}df)
             AS naive_mass,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM k${k}pre) AS prefix_rows,
           (SELECT CAST(COALESCE(SUM(df), 0) AS BIGINT) FROM k${k}pre)
             AS prefix_mass)"""
    }
    val union = ks.map(k => s"SELECT * FROM k${k}stat").mkString("\n         UNION ALL ")
    s"""WITH ${blocks.mkString(",\n       ")},
       allk AS ($union),
       r1 AS (SELECT *, MIN(prefix_mass) OVER () AS minm FROM allk),
       r2 AS (SELECT *, MIN(CASE WHEN prefix_mass * 4 <= minm * 5
           THEN shingle_k END) OVER () AS bestk FROM r1)
       SELECT shingle_k, vocab, n_rows, max_df, naive_mass, prefix_rows,
         prefix_mass,
         CAST(CASE WHEN shingle_k = bestk THEN 1 ELSE 0 END AS BIGINT)
           AS recommended
       FROM r2 ORDER BY shingle_k"""
  }

  /** x202 oracle: the x09 dot/norm spelling over the labeled probe
    * slice, rank ≤ k, then per-query neighbor-label counts, the
    * (n DESC, label ASC) majority, and the agreement left-join. */
  def knnLabelAuditOracle: String =
    """WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         FROM embeddings WHERE vec_id < 100 AND label IS NOT NULL),
       c AS (SELECT vec_id AS neighbor_id, label AS nlabel,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
         FROM embeddings WHERE label IS NOT NULL),
       s AS (SELECT query_id, neighbor_id, nlabel,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_zip(qv, cv), p -> p[1] * p[2])), (a, b) -> a + b) AS d,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(qv, x -> x * x)), (a, b) -> a + b)) *
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(cv, x -> x * x)), (a, b) -> a + b)) AS n
         FROM q, c WHERE query_id <> neighbor_id),
       r AS (SELECT query_id, nlabel,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY (CASE WHEN n = 0 THEN 0.0 ELSE d / n END) DESC,
               neighbor_id) AS rank
         FROM s),
       cnt AS (SELECT query_id, nlabel, CAST(COUNT(*) AS BIGINT) AS n
         FROM r WHERE rank <= 10 GROUP BY 1, 2),
       mj AS (SELECT query_id, nlabel,
           CAST(SUM(n) OVER (PARTITION BY query_id) AS BIGINT) AS n_neighbors,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY n DESC, nlabel) AS rn
         FROM cnt),
       own AS (SELECT DISTINCT query_id AS vec_id, qlabel AS label FROM q)
       SELECT own.vec_id, own.label, m.nlabel AS majority_label,
         CAST(COALESCE(ag.n, 0) AS BIGINT) AS n_agree, m.n_neighbors,
         CAST(CASE WHEN m.nlabel <> own.label THEN 1 ELSE 0 END AS BIGINT)
           AS suspect
       FROM own
       JOIN (SELECT query_id, nlabel, n_neighbors FROM mj WHERE rn = 1) m
         ON m.query_id = own.vec_id
       LEFT JOIN cnt ag
         ON ag.query_id = own.vec_id AND ag.nlabel = own.label
       ORDER BY own.vec_id"""

  /** x205 oracle: the x34 reachability closure, cluster sizes, and a
    * corpus left join — singletons label themselves; the min-id
    * survivor (doc_id = cluster_id) absorbs the div remainder so every
    * cluster sums to exactly 10⁶ ppm. */
  def lossWeightsOracle: String =
    s"""WITH RECURSIVE $minHashPairsCtes,
       sym AS (SELECT da AS s, db AS d FROM pairs
               UNION SELECT db AS s, da AS d FROM pairs),
       verts AS (SELECT DISTINCT s AS v FROM sym),
       reach AS (SELECT v AS a, v AS b FROM verts
                 UNION SELECT r.a, s.d FROM reach r JOIN sym s ON r.b = s.s),
       lab AS (SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS cluster_id
         FROM reach GROUP BY a),
       sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
         FROM lab GROUP BY 1),
       j AS (SELECT doc.doc_id,
           COALESCE(lab.cluster_id, doc.doc_id) AS cluster_id,
           COALESCE(sz.cluster_size, 1) AS cluster_size
         FROM documents doc
         LEFT JOIN lab ON lab.doc_id = doc.doc_id
         LEFT JOIN sz ON sz.cluster_id = lab.cluster_id)
       SELECT doc_id, cluster_id, cluster_size,
         CAST(CASE WHEN doc_id = cluster_id
           THEN 1000000 - (cluster_size - 1) * (1000000 // cluster_size)
           ELSE 1000000 // cluster_size END AS BIGINT) AS weight_ppm
       FROM j ORDER BY doc_id"""

  def containmentOracle(shingleK: Int): String =
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
  def randomProjectOracle: String = {
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
  def sharedRunsOracle: String =
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
  def gramExpr(k: Int): String = {
    val P = graft.operators.Dedup.P31
    (0 until k)
      .foldLeft("CAST(0 AS BIGINT)")((acc, j) =>
        s"(($acc) * 1000003 + (CAST('0x' || substr(md5(ts[i+$j]), 1, 15) AS BIGINT) % $P)) % $P")
  }

  def shingleCtes(shingleK: Int, src: String = "documents",
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
  def gramCtes(k: Int, src: String = "documents",
                       p: String = ""): String =
    s"""${p}toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM $src),
       ${p}le AS (SELECT doc_id, ts FROM ${p}toks WHERE len(ts) >= $k),
       ${p}pos AS (SELECT doc_id, ts, UNNEST(range(1, len(ts) - $k + 2)) AS i FROM ${p}le),
       ${p}gr AS (SELECT doc_id, i, ${gramExpr(k)} AS h FROM ${p}pos)"""

  /** x39 oracle: distinct vs total 3-gram counts per doc — `sh` is
    * distinct by construction, `le` still has the raw token array for
    * the total (len − k + 1). */
  def repetitionOracle: String =
    s"""WITH ${shingleCtes(3)},
       nd AS (SELECT doc_id, COUNT(*) AS ndist FROM sh GROUP BY doc_id),
       tot AS (SELECT doc_id, len(ts) - 2 AS total FROM le)
       SELECT nd.doc_id AS doc_id, 1000 - (nd.ndist * 1000) // tot.total AS rep_permille
       FROM nd JOIN tot ON nd.doc_id = tot.doc_id
       ORDER BY nd.doc_id, rep_permille"""

  /** x40 oracle: the same md5-derived shard, running-sum window and
    * integer div/mod cut — every step is engine-portable arithmetic. */
  def packSequencesOracle: String =
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
  def qualityGateOracle: String =
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
  def crossNearDupOracle: String = {
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

  def contaminationOracle: String =
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
  def jaccardSweepOracle: String =
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
  def minHashLshOracle: String =
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
  def minhashSigCols(numHashes: Int): String = {
    val P = graft.operators.Dedup.P31
    (0 until numHashes).map { i =>
      val (a, b) = (graft.operators.Dedup.affineA(i), graft.operators.Dedup.affineB(i))
      s"MIN(($a * (sh % $P) + $b) % $P) AS h$i"
    }.mkString(", ")
  }

  /** Banded rolling-polynomial bucket selects over a `mins` CTE —
    * [[minhashSigCols]]'s second half, same sharing contract. */
  def minhashBandSelects(mins: String, numHashes: Int,
                                 rowsPerBand: Int): String = {
    val P = graft.operators.Dedup.P31
    (0 until numHashes / rowsPerBand).map { b =>
      val bucket = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .foldLeft("CAST(0 AS BIGINT)")((acc, i) => s"(($acc) * 1000003 + h$i) % $P")
      s"SELECT doc_id, $b AS band, $bucket AS bucket FROM $mins"
    }.mkString(" UNION ALL ")
  }

  def minHashPairsCtes: String = {
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
  def dupClustersOracle: String =
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
  def pageRankOracle: String = {
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
  def labelPropOracle: String = {
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
  def centroidEvalOracle: String = {
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
  def kCoreOracle: String = {
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
  def columnEntropyOracle: String =
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
  def kmeansOracle: String =
    s"""WITH ${kmeansChain(4, 2, 64)}
       SELECT vec_id, CAST(c AS INTEGER) AS cluster FROM afin ORDER BY vec_id"""

  /** The k-means trajectory as a reusable CTE body ending in
    * `afin(vec_id, qv, c)` — shared by the x56 oracle and the x73
    * semantic-dedup oracle (which keeps composing after `afin`).
    * `src` is the source relation (a prior CTE name is fine). */
  def kmeansChain(k: Int, iters: Int, dim: Int,
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

  /** md5-perturbed copies of the first 64 vectors (ids shifted +1e6,
    * ±2% per-dimension jitter) — the oracle-replayable duplicate
    * planting shared by x73/x329: the corpus has no natural ≥900‰
    * cosine pairs (ceiling ~0.51), so the SemDeDup drop set would be
    * empty without it. Two-step select: the output column is ALSO
    * named vec_id, and Spark's lateral column alias resolution would
    * silently bind the lambda's vec_id to the just-shifted value
    * (DuckDB binds the input) — hashing from the distinctly-named
    * orig_id keeps both engines perturbing from the SAME key. */
  def plantPerturbedCopies(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < 64)
      .select(col("vec_id").as("orig_id"), col("embedding"), col("label"))
      .select(
        (col("orig_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") + lit(0.02d) *
            (conv(substring(md5(concat_ws(":", col("orig_id"), i)), 1, 15), 16, 10)
              .cast("double") / lit(1152921504606846976.0d))).cast("float"))
          .as("embedding"),
        col("label"))

  /** A REAL 24bpp top-down BMP wrapping `px` as its bare pixel array
    * (w divisible by 4 → no row padding): the x331 carrier. Because
    * the corpus text is pure ASCII, the DECODED pixel at file offset
    * 54+j IS text byte j — which is what lets a DuckDB oracle reason
    * about the full bytes→pixels→resample path in plain `substr`
    * arithmetic. */
  def bmpTopDown(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54 + px.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + px.length)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(-h).putShort(1).putShort(24)
      .putInt(0).putInt(px.length)
    bb.putInt(2835).putInt(2835).putInt(0).putInt(0)
    bb.put(px)
    bb.array()
  }

  /** x73: the x56 trajectory (k=16) composed with the x09-parity
    * cosine spelling for within-cluster pairs and the x34 recursive
    * closure for duplicate groups — three certified replays chained. */
  def semanticDedupOracle: String = semanticDedupOracleFor(16, "")

  /** x329: the SAME replay on the fixed 256-vector slice (+64 planted
    * = 320 rows at EVERY scale factor), where the engine's k ≤ 0
    * auto-sizing lands on ⌊√320⌋ = 17 — the oracle pins that k, so a
    * drift in the sizing rule breaks the hash, not just a spec. */
  def semanticDedupAutoOracle: String =
    semanticDedupOracleFor(17, "WHERE vec_id < 256")

  private def semanticDedupOracleFor(k: Int, baseWhere: String): String =
    s"""WITH RECURSIVE emb2 AS (
         SELECT vec_id, embedding, label FROM embeddings $baseWhere
         UNION ALL
         SELECT vec_id + 1000000, list_transform(embedding, (x, i) ->
             CAST(CAST(x AS DOUBLE) + 0.02 * (CAST('0x' ||
               substr(md5(CAST(vec_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 15)
               AS BIGINT) / 1152921504606846976.0) AS FLOAT)),
           label
         FROM embeddings WHERE vec_id < 64),
       ${kmeansChain(k, 2, 64, src = "emb2")},
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
  def hybridRrfOracle: String =
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
  def zOrderOracle: String = {
    val interleave = (0 until 8).map(i =>
      s"((((o_custkey % 256) >> $i) & 1) << ${2 * i}) | " +
        s"((((o_orderkey % 256) >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")
    s"""SELECT o_orderkey, CAST($interleave AS BIGINT) AS zval
       FROM orders ORDER BY zval, o_orderkey LIMIT 200"""
  }

  def cosineTopKOracle: String =
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
  def simHashOracle: String = {
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
