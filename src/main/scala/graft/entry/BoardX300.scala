package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Incremental, Sessions, TextAnalysis}
import graft.queries.Relational

/** Board segment: capability rows x297+ — query registrations and
  * their DuckDB oracle texts, concatenated into the driver contract
  * by [[graft.SparkEntry]] (EntrySpec pins the 1:1 id/alias/oracle-key
  * invariants across segments).
  *
  * The x297–x301 tier is the TPC-H DECORRELATION suite: the five
  * classic subquery shapes (correlated EXISTS with an outer-row
  * inequality, outer-join double aggregation, HAVING-IN, correlated
  * scalar MIN, uncorrelated scalar total) written as their
  * decorrelated DataFrame plans, each oracle-checked against DuckDB
  * running the SUBQUERY form — the hash match certifies the
  * decorrelation itself, not just the arithmetic. */
private[graft] object BoardX300 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q4: correlated EXISTS w/ inequality on the outer row →
    // LEFT SEMI with a residual condition; first-hit early-out
    "x297_late_priority" -> ((s, d) =>
      Relational.latePriorityCensus(s, d)),
    // TPC-H Q13: LEFT OUTER with the predicate in the JOIN CONDITION
    // (a WHERE would delete the n_orders=0 bucket) + double agg
    "x298_order_distribution" -> ((s, d) =>
      Relational.orderCountDistribution(s, d)),
    // TPC-H Q18: HAVING-IN decorrelated to aggregate-then-join; the
    // quantity bar filters BEFORE any join touches orders/customer
    "x299_large_orders" -> ((s, d) =>
      Relational.largeVolumeOrders(s, d)),
    // TPC-H Q2: correlated scalar MIN decorrelated to groupBy-min +
    // match-back join; price ties all survive, like the subquery form
    "x300_min_cost_supplier" -> ((s, d) =>
      Relational.minCostSupplier(s, d)),
    // TPC-H Q11: uncorrelated scalar total as a window SUM over the
    // BOUNDED brand aggregate — one corpus scan, never two
    "x301_revenue_concentration" -> ((s, d) =>
      Relational.revenueConcentration(s, d)),
    // CCNet-style boilerplate scrub: fixed token-window segments,
    // corpus-occurrence bar, kept-text rebuild — md5 fingerprints
    // shuffle, segment text never (except to its own doc's rebuild)
    "x302_boilerplate_scrub" -> ((s, d) =>
      TextAnalysis.boilerplateScrub(Tables.documents(s, d))),
    // mergeable quantile state: estimates read from the MERGE of two
    // half-states (o_orderkey parity split) — the oracle replays the
    // one-shot form, so the hash match certifies the merge law on the
    // real corpus (IncrementalSpec proves it on adversarial splits)
    "x303_quantile_state" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val v = Relational.cents(col("o_totalprice"))
      val half = (p: Int) => Incremental.quantileState(
        o.filter(pmod(col("o_orderkey"), lit(2L)) === p), v, 100000L)
      Incremental.quantileEstimate(
        Incremental.mergeQuantile(Seq(half(0), half(1))),
        100000L, Seq(500, 900, 990))
    },
    // the groupBy-split-then-join anti-pattern, written as a user
    // would: MergeAggSelfJoin folds it to ONE aggregation over ONE
    // scan (PlanSpec pins no-Join + single FileScan)
    "x304_agg_selfjoin_merge" -> { (s, d) =>
      val a = Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      val b = Tables.orders(s, d).groupBy("o_custkey")
        .agg(sum(Relational.cents(col("o_totalprice"))).as("spend_cents"))
      a.join(b, Seq("o_custkey")).orderBy("o_custkey")
    },
    // per-user rolling median spend over the last 9 events — the
    // robust rolling statistic; user-keyed window, 9-row frame
    "x305_rolling_median" -> ((s, d) =>
      Sessions.rollingMedian(Tables.events(s, d))))

  def oracleSql: Map[String, String] = Map(
    // x297: the EXISTS form verbatim — DuckDB keeps the subquery,
    // Spark runs the decorrelated semi join; the hash match IS the
    // decorrelation proof
    "x297_late_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate < TIMESTAMP '1998-01-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority""",
    // x298: count(o_orderkey) counts MATCHED rows only — unmatched
    // customers land in the 0 bucket, the row the query exists for
    "x298_order_distribution" ->
      """SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
       FROM (SELECT c_custkey, count(o_orderkey) AS n_orders
             FROM customer LEFT OUTER JOIN orders
               ON c_custkey = o_custkey
              AND o_orderpriority <> '1-URGENT'
             GROUP BY c_custkey)
       GROUP BY n_orders
       ORDER BY n_customers DESC, n_orders DESC""",
    // x299: the HAVING-IN form verbatim; quantities are integral by
    // data contract (RelationalSpec asserts it) so the BIGINT cast is
    // exact in both engines despite their different double→int rules
    "x299_large_orders" ->
      """SELECT c_name, o_orderkey, o_orderdate,
         CAST(total_qty AS BIGINT) AS total_qty
       FROM customer, orders,
         (SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS BIGINT)) > 200) lq
       WHERE o_orderkey = l_orderkey AND c_custkey = o_custkey
       ORDER BY total_qty DESC, o_orderkey
       LIMIT 20""",
    // x300: the correlated scalar subquery verbatim (per-part MIN is
    // invariant to the p_size restriction — it correlates only on
    // p_partkey, which is why the Spark side may prune first)
    "x300_min_cost_supplier" ->
      """SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS min_price_cents
       FROM part, lineitem, supplier
       WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         AND p_size <= 5
         AND CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) =
             (SELECT MIN(CAST(FLOOR(l2.l_extendedprice * 100 + 0.5) AS BIGINT))
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
       ORDER BY p_partkey, s_suppkey""",
    // x301: uncorrelated scalar total; // and Spark's div agree on
    // positive integers (both floor), HUGEINT// stays exact
    "x301_revenue_concentration" ->
      """WITH br AS (SELECT p_brand,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
             AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand)
       SELECT p_brand, revenue_cents FROM br
       WHERE revenue_cents > (SELECT SUM(revenue_cents) FROM br) // 30
       ORDER BY revenue_cents DESC, p_brand""",
    // x302: the full segment/occurrence/rebuild chain replayed — the
    // 16-word windows via range-unnest (DuckDB lacks WITH ORDINALITY),
    // occurrence counts over the same md5 fingerprints, ordered
    // string_agg rebuild with the same NULL-skip semantics
    "x302_boilerplate_scrub" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws
           FROM documents WHERE text IS NOT NULL),
       w AS (SELECT doc_id, ws[i] AS word, i
             FROM ws, UNNEST(range(1, len(ws) + 1)) AS r(i)),
       seg AS (SELECT doc_id, CAST((i - 1) // 16 AS BIGINT) AS seg_idx,
                 string_agg(word, ' ' ORDER BY i) AS seg_text
               FROM w GROUP BY 1, 2),
       occ AS (SELECT md5(seg_text) AS seg_fp,
                 CAST(count(*) AS BIGINT) AS seg_occ
               FROM seg GROUP BY 1),
       f AS (SELECT s.doc_id, s.seg_idx, s.seg_text, o.seg_occ
             FROM seg s JOIN occ o ON md5(s.seg_text) = o.seg_fp)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seg,
         CAST(SUM(CASE WHEN seg_occ >= 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dropped,
         md5(COALESCE(string_agg(CASE WHEN seg_occ < 3 THEN seg_text END,
           ' ' ORDER BY seg_idx), '')) AS kept_md5
       FROM f GROUP BY doc_id ORDER BY doc_id""",
    // x303: the ONE-SHOT form — the Spark side reads the merged halves,
    // so the hash match certifies merge(state(A), state(B)) ≡ state(A⊎B)
    "x303_quantile_state" ->
      """WITH v AS (SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
           FROM orders WHERE o_totalprice IS NOT NULL),
       b AS (SELECT v // 100000 AS bin, CAST(count(*) AS BIGINT) AS n
             FROM v GROUP BY 1),
       c AS (SELECT bin, SUM(n) OVER (ORDER BY bin) AS cum,
               (SELECT CAST(SUM(n) AS BIGINT) FROM b) AS tot FROM b),
       q AS (SELECT CAST(UNNEST([500, 900, 990]) AS BIGINT) AS permille)
       SELECT permille, CAST(MIN(bin) AS BIGINT) AS bin,
         CAST(MIN(bin) * 100000 AS BIGINT) AS lo_value
       FROM q JOIN c ON c.cum >= GREATEST(1, (permille * tot + 999) // 1000)
       GROUP BY permille ORDER BY permille""",
    // x304: the same two-aggregate join text — DuckDB executes the
    // join, Spark's MergeAggSelfJoin folds it to one aggregation; the
    // hash match proves the fold is semantics-preserving
    "x304_agg_selfjoin_merge" ->
      """SELECT a.o_custkey AS o_custkey, n_orders, spend_cents
       FROM (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
             FROM orders GROUP BY o_custkey) a
       JOIN (SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS spend_cents
             FROM orders GROUP BY o_custkey) b
         ON a.o_custkey = b.o_custkey
       ORDER BY o_custkey""",
    // x305: DuckDB's quantile_disc(0.5) IS the lower-median convention
    // the Spark side spells as element ⌈n/2⌉ of the sorted frame
    "x305_rolling_median" ->
      """SELECT event_id, user_id,
         CAST(count(*) OVER w AS BIGINT) AS n_window,
         CAST(quantile_disc(CAST(FLOOR(value * 100 + 0.5) AS BIGINT), 0.5)
           OVER w AS BIGINT) AS med_cents
       FROM events
       WHERE value IS NOT NULL AND user_id IS NOT NULL
       WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                    ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
       ORDER BY event_id""")
}
