package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      Relational.revenueConcentration(s, d)))

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
       ORDER BY revenue_cents DESC, p_brand""")
}
