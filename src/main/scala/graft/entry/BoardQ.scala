package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.queries.Relational
import graft.entry.EntryLib._

/** Board segment: the q01–q22 core relational oracle contract (SURVEY §2.4) — query registrations and their
  * DuckDB oracle texts, concatenated into the driver contract by
  * [[graft.SparkEntry]] (which documents the rules; EntrySpec pins
  * the 1:1 id/alias/oracle-key invariants across segments). */
private[graft] object BoardQ {

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
  )

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
  )
}
