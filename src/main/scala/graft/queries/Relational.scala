package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** The relational query surface (SURVEY.md §2.4, Q1–Q22), written as
  * DataFrame programs so Catalyst plans them (pushdown, pruning, join
  * selection, AQE all apply).
  *
  * Determinism contract (must hash-match a DuckDB oracle, SURVEY §2.4):
  *  - total ORDER BY on output, NULLS FIRST made explicit;
  *  - money/measure sums go through exact integer cents:
  *    `SUM(CAST(FLOOR(x * 100 + 0.5) AS BIGINT))`;
  *  - timestamps only surface as `CAST(ts AS DATE)` (session TZ = UTC);
  *  - LIMIT only after a total order.
  *
  * Scale notes are attached per-query: what the plan does at 100 TB on a
  * real cluster, not just at the local test scale.
  */
object Relational {

  /** Exact integer cents: FLOOR on IEEE doubles is bit-identical across
    * engines, unlike double→int casts (Spark truncates, DuckDB rounds).
    * The ONE spelling of the determinism-critical formula — every query
    * must use it (three inline copies had crept in); public so the
    * operator package shares it instead of re-spelling it. */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100 + 0.5).cast("long")

  /** Q1 — full scan + count. Parquet footer row-count short-circuit: the
    * scan reads no data pages, only metadata (count(*) pushdown). */
  def q01Count(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(count(lit(1)).as("n"))

  /** Q2 — projection + derived column (reference R12 analog,
    * etl_connector.py:130-164). Column-pruned scan: only 4 of 11
    * lineitem columns are read (check ReadSchema). */
  def q02ProjectCents(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_cents"))
      // §2.4 rule 1 demands a TOTAL order before LIMIT: the regenerated
      // sf0.1 corpus has duplicate (orderkey, linenumber) pairs with
      // different prices, so net_cents must join the sort or the LIMIT
      // boundary is engine-dependent
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_cents"))
      .limit(100)

  /** Q3 — conjunctive predicate filter (reference R16 analog,
    * etl_connector.py:194-203). Both predicates push to the parquet scan
    * (PushedFilters: GreaterThan, EqualTo) → row-group skipping via
    * min/max stats at scale. */
  def q03FilterPred(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45.0 && col("l_returnflag") === "R")
      .agg(count(lit(1)).as("n"))

  /** Q4 — null-check filter (reference R16, required-fields predicate,
    * etl_connector.py:199-202). IsNotNull pushes to the scan. */
  def q04NullFilter(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("value").isNotNull && col("props").isNotNull)
      .agg(count(lit(1)).as("n"))

  /** Q5 — inner equi join + agg. orders ⋈ customer are both fact-scale
    * at 100 TB, so no broadcast hint: AQE picks broadcast at small SF and
    * shuffled hash/sort-merge at scale. Aggregation is partial+final
    * (map-side combine) automatically. */
  def q05JoinAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment").asc_nulls_first)

  /** Q6 — multi-way dimension join. nation (25 rows) and region (5 rows)
    * are bounded by schema, so broadcast them EXPLICITLY — at 100 TB the
    * customer side is huge and the two broadcasts eliminate both
    * shuffles; the whole join chain stays map-side. */
  def q06MultiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name").agg(count(lit(1)).as("customers"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  /** Q7 — left outer join + IS NULL (the classic hand-written anti-join
    * shape). Catalyst does NOT rewrite outer+IsNull to anti on its own;
    * executed literally, the outer join materializes every matched row
    * just for the filter to discard it — 2–3× wasted join work at scale.
    * `coalesce(o_orderkey, -1)` declares the primary-key NOT NULL
    * invariant (parquet reports all columns nullable), which lets
    * [[graft.plans.AntiJoinRewrite]] prove post-join null ⟺ unmatched
    * and plan a true LeftAnti under the graft extensions — same rows,
    * matched rows never materialize. Without the extensions the literal
    * outer-join plan runs and returns the same result. */
  def q07LeftAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d)
          .withColumn("o_orderkey", coalesce(col("o_orderkey"), lit(-1L))),
        col("c_custkey") === col("o_custkey"), "left")
      .filter(col("o_orderkey").isNull)
      .agg(count(lit(1)).as("n"))

  /** Q8 — semi join (EXISTS). left_semi short-circuits per probe row and
    * never materializes lineitem columns past the join. The non-key
    * predicate (quantity ≥ 49) is pushed into the lineitem scan first. */
  def q08SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .join(
        Tables.lineitem(s, d).filter(col("l_quantity") >= 49.0),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .agg(count(lit(1)).as("n"))

  /** Q9 — TPC-H Q1 shape: scan-heavy multi-key hash agg with a date
    * filter. The group-by has tiny cardinality (RF×LS ≤ 9) so the
    * partial agg collapses nearly everything map-side; the shuffle moves
    * a handful of rows regardless of input size. */
  def q09Tpch1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").cast("date") <= lit("1998-09-02").cast("date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        sum(cents(col("l_quantity"))).as("qty_c"),
        sum(cents(col("l_extendedprice"))).as("price_c"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Q10 — distinct aggregate. Planned as two-phase: partial distinct on
    * o_custkey then exact count; for approximate at-scale variants use
    * approx_count_distinct (HLL) — exposed in extensions. */
  def q10CountDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(count_distinct(col("o_custkey")).as("active_customers"))

  /** Q11 — ROLLUP (grouping sets). Spark expands to a union of grouping
    * sets in one shuffle via the Expand operator. */
  def q11Rollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
               col("o_orderstatus").asc_nulls_first, col("n"))

  /** Q12 — window ranking, top-1 per group (reference R18 last-wins
    * shape, etl_connector.py:179-183). One hash-partition shuffle on
    * o_custkey; rank ties broken by o_orderkey for determinism. */
  def q12WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey")
      .orderBy("o_custkey")
      .limit(100)
  }

  /** Q13 — window frame (ROWS 2 PRECEDING). Running aggregate over a
    * bounded frame: single shuffle on user_id, sorted within partition,
    * O(1) state per row. */
  def q13WindowFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(-2, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), sum(cents(col("value"))).over(w).as("roll_c"))
      .orderBy("event_id")
      .limit(200)
  }

  /** Q14 — global sort + top-k. Catalyst plans TakeOrderedAndProject:
    * per-partition top-10 then a driver-side merge of 10×partitions
    * rows — no global sort shuffle at any scale. */
  def q14TopkSort(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_c"))
      .orderBy(col("total_c").desc, col("o_orderkey"))
      .limit(10)

  /** Q15 — INTERSECT (distinct semantics, same as SQL default). */
  def q15Intersect(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("k"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
      .orderBy("k")

  /** Q16 — EXCEPT (distinct semantics). Output keeps the left column
    * name per SQL rules. */
  def q16Except(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d).select(col("n_nationkey"))
      .except(Tables.customer(s, d).select(col("c_nationkey").as("n_nationkey")))
      .orderBy("n_nationkey")

  /** Q17 — string scalar functions + group by expression. All built-in
    * codegen'd expressions; stays inside one WholeStageCodegen span up
    * to the exchange. */
  def q17StringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .groupBy(
        upper(substring(col("p_name"), 1, 4)).as("pre"),
        length(col("p_name")).as("len"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("pre").asc_nulls_first, col("len"), col("n"))

  /** Q18 — key-based last-write-wins dedup: the batch form of the
    * reference's upsert sink (R18, etl_connector.py:167-183,
    * `replace_one(..., upsert=True)` ⇒ latest per key). */
  def q18LastWinsDedup(s: SparkSession, d: String): DataFrame = {
    // order on ts_ns: the oracle compares the raw parquet nanos
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id")
      .orderBy("user_id")
  }

  /** Q19 — event-time tumbling-day window, batch form (streaming twin in
    * graft.streaming uses window(ts, "1 day") + watermark). */
  def q19DateAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("ts").cast("date").as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("d").asc_nulls_first, col("event_type").asc_nulls_first)

  /** Q20 — JSON payload extraction (reference R6/R13 analog,
    * etl_connector.py:100,148-154). get_json_object is a codegen'd
    * built-in; the LIKE prefilter pushes to the scan. */
  def q20JsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("props").like("""{"k": %}"""))
      .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"))

  /** Q21 — text-analysis extension: per-language corpus stats. */
  def q21TextAgg(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(sum("n_chars").as("chars"), count(lit(1)).as("docs"))
      .orderBy(col("lang").asc_nulls_first)

  /** Q22 — embedding table scan + agg (vector math itself is Spark-side
    * golden-tested; arrays are excluded from cross-engine hashing). */
  def q22EmbedGroup(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy(col("label").asc_nulls_first)

  /** CUBE (full grouping-set lattice; rollup's sibling in SURVEY §2.3).
    * One Expand + one shuffle, like rollup. */
  def cube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
               col("o_orderstatus").asc_nulls_first, col("n"))

  /** Explicit GROUPING SETS with `grouping_id()` — the third member
    * of the grouping trio next to [[q11Rollup]] and [[cube]]: an
    * ARBITRARY combination list ((a, b), (a), ()) rather than the
    * rollup prefix chain or the cube power set, via Spark's native
    * `Dataset.groupingSets` (Spark 4 API — one Expand, one aggregate,
    * exactly like rollup/cube; no union-of-scans). `gid` disambiguates
    * "grouped NULL" from "data NULL" — the reason GROUPING SETS
    * reports carry grouping_id at all. */
  def groupingSetsReport(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"), col("n"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** FULL OUTER equi join. Sort-merge at scale (outer sides cannot
    * broadcast-build); AQE still coalesces post-shuffle partitions. */
  def fullJoin(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(Tables.supplier(s, d), col("n_nationkey") === col("s_nationkey"), "full")
      .agg(count(lit(1)).as("n"))

  /** Theta (non-equi range predicate) join — planned as broadcast
    * nested-loop with the small side broadcast; the only join shape
    * where NL is the right answer. */
  def thetaJoin(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).join(
      Tables.supplier(s, d),
      col("p_size") >= col("s_suppkey") && col("p_size") <= col("s_suppkey") + 20)
      .agg(count(lit(1)).as("n"))

  /** Scalar-function breadth: math (abs/floor/mod), date (month trunc),
    * string (concat/replace/upper/trim) — all codegen'd built-ins in
    * one narrow projection over a pruned scan. */
  def scalarFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(cents(col("l_discount"))).as("disc_c"),
        trunc(col("l_shipdate").cast("date"), "month").as("ship_month"),
        concat(col("l_returnflag"), lit("-"), col("l_linestatus")).as("rf_ls"),
        regexp_replace(upper(col("l_returnflag")), "R", "X").as("rf_x"),
        pmod(col("l_orderkey"), lit(7)).as("m7"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Approximate distinct-count sketch (HyperLogLog++): the at-scale
    * substitute for q10's exact distinct — fixed-size sketch per
    * partition, one tiny merge, 2% default error. Engine-specific
    * sketch values → rows-only check + accuracy-bounded spec. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"))

  /** Open-JSON navigation through Spark 4's VariantType: parse once
    * into the binary variant encoding, extract typed fields lazily —
    * the modern replacement for get_json_object string re-parsing when
    * payload shapes are heterogeneous (SURVEY §1.2's escape hatch).
    * Extracted values are plain longs, so the oracle can certify them
    * from DuckDB's JSON operators. */
  def variantExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("props").like("""{"k": %}"""))
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
      .orderBy("event_id")

  /** Exact interpolated median per language — Spark `percentile` and
    * DuckDB `quantile_cont` both linear-interpolate over the sorted
    * values; on integer inputs the arithmetic is double-exact, so the
    * cents guard makes it cross-engine stable. (The at-scale variant is
    * approx_percentile's KLL-ish sketch — engine-specific, so the exact
    * form carries the oracle.) */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(
        cents(expr("percentile(n_chars, 0.5)")).as("p50_c"),
        cents(expr("percentile(n_chars, 0.9)")).as("p90_c"))
      .orderBy(col("lang").asc_nulls_first)

  /** Winsorized mean: clip `value` to each event_type's exact
    * [p05, p95] band, then average — the standard outlier-robust
    * reduction for training-signal columns (reward stats, quality
    * scores) where a handful of corrupt magnitudes would swamp a plain
    * mean. Two passes over events: an exact-percentile aggregate
    * (5 rows) broadcast back onto the scan, then one clipped aggregate
    * — the group-by-key shuffle is the only data movement per pass,
    * and the clip itself is a scan-side `least/greatest`. Exactness
    * contract as [[percentiles]]; the cents guard absorbs
    * summation-order ulps in the final mean. */
  def winsorizedMean(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val bands = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.05)").as("lo"),
        expr("percentile(value, 0.95)").as("hi"))
    ev.join(broadcast(bands), "event_type")
      .withColumn("clipped", least(greatest(col("value"), col("lo")), col("hi")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), cents(avg("clipped")).as("wmean_cents"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** The documents table's full source domain — shared by the pivot
    * query and its generated oracle so neither can silently cover a
    * subset of the fan-out. */
  val PivotSources: Seq[String] = (0 until 20).map(i => s"src$i")

  /** Pivot: per-language counts fanned out to one column per source —
    * ALL sources, not a sample. Fixed pivot value list (deterministic
    * schema — at scale an unpinned pivot triggers a distinct-scan of
    * the pivot column); missing cells filled 0 to match
    * COUNT(CASE ...) semantics. */
  def pivotCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("lang")
      .pivot("source", PivotSources)
      .agg(count(lit(1)))
      .na.fill(0L, PivotSources)
      .orderBy(col("lang").asc_nulls_first)

  /** Backward as-of join: each order picks the latest event of the
    * matching user at or before the order date (ns-exact comparison —
    * the oracle compares raw parquet nanos). Runs through
    * [[graft.operators.AsOfJoin]]: one shuffle + sort, no range
    * explosion. */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val (left, right) = asofInputs(s, d)
    graft.operators.AsOfJoin.backward(
      left, right, key = "k", leftTime = "t", rightTime = "t",
      rightCols = Seq("event_id"), tieBreak = Some("event_id"))
      .select("o_orderkey", "event_id")
      .orderBy(col("o_orderkey"), col("event_id"))
  }

  private def asofInputs(s: SparkSession, d: String): (DataFrame, DataFrame) = (
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey").as("k"),
      // NTZ → LTZ cast is identity under the pinned UTC session TZ
      (unix_micros(col("o_orderdate").cast("timestamp")) * 1000).as("t")),
    Tables.events(s, d).select(
      col("user_id").as("k"), col("ts_ns").as("t"), col("event_id")))

  /** Forward as-of: each order picks the EARLIEST event of the
    * matching user at or after the order date (tie → highest
    * event_id, mirroring [[asofJoin]]). */
  def asofForward(s: SparkSession, d: String): DataFrame = {
    val (left, right) = asofInputs(s, d)
    graft.operators.AsOfJoin.forward(
      left, right, key = "k", leftTime = "t", rightTime = "t",
      rightCols = Seq("event_id"), tieBreak = Some("event_id"))
      .select("o_orderkey", "event_id")
      .orderBy(col("o_orderkey"), col("event_id"))
  }

  /** Nearest as-of: each order picks the event minimizing |ts − order
    * date| (equal distance → the at-or-before event; equal times →
    * highest event_id). Both direction champions come from one
    * shuffle + sort — see [[graft.operators.AsOfJoin.nearest]]. */
  def asofNearest(s: SparkSession, d: String): DataFrame = {
    val (left, right) = asofInputs(s, d)
    graft.operators.AsOfJoin.nearest(
      left, right, key = "k", leftTime = "t", rightTime = "t",
      rightCols = Seq("event_id"), tieBreak = Some("event_id"))
      .select("o_orderkey", "event_id")
      .orderBy(col("o_orderkey"), col("event_id"))
  }
  /** Majority-vote aggregation — the label-consolidation step of every
    * multi-annotator pipeline (RLHF preference grading, quality
    * rating, weak supervision): per key, the winning vote, its count,
    * and the agreement ratio. Ties break deterministically by vote
    * value ascending — engines must not disagree on the winner when
    * counts tie.
    *
    * Scale shape: one (key, vote) groupBy (map-side combined — the
    * shuffle carries at most one row per partition per (key, vote)),
    * then two window functions over the SAME |keys × votes|-bounded
    * counts table and one keyed shuffle. The raw vote table never
    * shuffles twice.
    *
    * @return (key, winner, votes, agreement_permille). */
  def majorityVote(df: DataFrame, keyCol: String, voteCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(voteCol))
      .agg(count(lit(1)).as("n"))
    val wk = Window.partitionBy(keyCol)
    val wr = wk.orderBy(col("n").desc, col(voteCol).asc)
    counts
      .withColumn("total", sum("n").over(wk))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") === 1)
      .select(col(keyCol), col(voteCol).as("winner"), col("n").as("votes"),
        expr("(n * 1000) div total").as("agreement_permille"))
      .orderBy(keyCol)
  }

  /** Rank calibration (integer percent-rank): maps a raw per-group
    * metric onto a uniform [0, 1000] permille scale — the
    * distribution-free normalization for combining heterogeneous
    * quality signals (a perplexity and a length score become
    * comparable once both are ranks). `pr = (rank − 1)·1000 div
    * (n − 1)`; RANK() gives ties identical calibrated scores, and
    * single-row groups pin to 0 rather than dividing by zero. All
    * integer — replays exactly cross-engine.
    *
    * Scale shape: a naive `rank() OVER (PARTITION BY group)` puts an
    * ENTIRE group through one window task — a single dominant group
    * (one language of a web corpus) serializes the job. Instead the
    * rank comes from the cumulative-histogram identity RANK(v) = 1 +
    * Σ_{u<v} count(u): aggregate to the (group, value) COUNTS table
    * (map-side combined), run the running-sum window over that — its
    * input is bounded by distinct metric values per group, not rows —
    * and join the two derived columns back onto the scan by (group,
    * value). Ties share a rank by construction.
    *
    * @return (idCol, groupCol, metricCol, pr_permille). */
  def rankCalibrate(df: DataFrame, groupCol: String, metricCol: String,
                    idCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(metricCol))
      .agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy(groupCol)
    val wv = wg.orderBy(col(metricCol).asc)
    val ranked = counts
      .withColumn("r", sum("c").over(wv) - col("c") + lit(1L))
      .withColumn("cnt", sum("c").over(wg))
      .select(col(groupCol), col(metricCol), col("r"), col("cnt"))
    df.select(col(idCol), col(groupCol), col(metricCol))
      .join(ranked, Seq(groupCol, metricCol))
      .select(col(idCol), col(groupCol), col(metricCol),
        when(col("cnt") === 1, lit(0L))
          .otherwise(expr("((r - 1) * 1000) div (cnt - 1)")).as("pr_permille"))
      .orderBy(idCol, groupCol)
  }

  /** Wide→long unpivot (melt): each input row emits one row per
    * measure as (ids…, metric, value) — the inverse of
    * [[pivotCounts]] and the missing half of the reshape pair (a
    * metrics store, a plotting layer, and UNION-style ML feature
    * tables all consume the long form). Uses Spark's NATIVE
    * `Dataset.unpivot` (Expand under the hood — one pass, no join, no
    * union-of-scans; the measure columns are computed once on the
    * scan and fan out row-locally, so the cost is |rows|·|measures|
    * narrow output, zero extra shuffles at any scale).
    *
    * @param measures (name, expression) pairs; all must share a type
    *                 (cast in the expression — unpivot requires it). */
  def unpivotMeasures(df: DataFrame, ids: Seq[String],
                      measures: Seq[(String, org.apache.spark.sql.Column)],
                      varName: String = "metric",
                      valueName: String = "value"): DataFrame = {
    require(measures.nonEmpty, "unpivotMeasures needs at least one measure")
    df.select(ids.map(col) ++
        measures.map { case (n, c) => c.as(n) }: _*)
      .unpivot(ids.map(col).toArray,
        measures.map(m => col(m._1)).toArray, varName, valueName)
  }

  /** Per-group top-k through the native `topk_pairs` bounded
    * aggregate — the RELATIONAL face of the similarity tier's
    * rank-window replacement (TopKAggregate.scala): a rank window
    * shuffles EVERY scored row to rank it; this folds each partition
    * to a ≤k buffer map-side, so the shuffle carries O(groups·k) rows
    * however large the fact table. The "top N products per region /
    * top parts per supplier" query every BI layer runs, in its 100 TB
    * form. Ties broken by (score DESC, id ASC) — exactly the rank
    * window's order, spec-pinned row-for-row (SimilaritySpec).
    *
    * The score transits the aggregate as double: exact for integer
    * scores below 2⁵³ (cents at any realistic scale); the id must be
    * integral. Output score is cast back to long.
    *
    * @return (groupCol, idCol, rank, scoreCol) ordered by group,
    *         rank. */
  def groupedTopK(df: DataFrame, groupCol: String, idCol: String,
                  scoreCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.groupBy(col(groupCol))
      .agg(call_function("topk_pairs", col(idCol).cast("long"),
        col(scoreCol).cast("double"), lit(k)).as("__tk"))
      .select(col(groupCol), posexplode(col("__tk")))
      .select(col(groupCol), col("col.neighbor_id").as(idCol),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.score").cast("long").as(scoreCol))
      .orderBy(groupCol, "rank")
  }

  /** TPC-H Q5-shape regional revenue — the six-way star the classic
    * benchmark grades join planning on: lineitem ⋈ orders ⋈ customer ⋈
    * supplier (LOCAL-supplier semantics: customer and supplier share a
    * nation) ⋈ nation ⋈ region, region-filtered, revenue per nation in
    * exact integer cents. The plan story IS the query: the two dim
    * tables broadcast (no shuffle for them), the region filter prunes
    * through the broadcast side, and the three fact-side joins shuffle
    * on their keys — the shape AQE re-plans at 100 TB.
    *
    * @return (n_name, revenue_cents, n_lineitems), revenue-desc. */
  /** TPC-H Q3 shape: top-10 not-yet-shipped orders by revenue for one
    * market segment. The three scale properties, PlanSpec-pinned: the
    * segment / order-date / ship-date predicates each push to THEIR
    * OWN scan (the join never sees a disqualified row), the un-hinted
    * fact joins shuffle on their keys under a pinned broadcast
    * threshold (the x285 discipline — at toy sf AQE re-broadcasts at
    * runtime, at 100 TB it cannot), and the final cut is
    * TakeOrderedAndProject — per-partition top-10 pre-reduction, never
    * a global sort of the |qualifying orders| aggregate. Revenue in
    * exact cents (the shared `cents` discipline). */
  def shippingPriority(s: SparkSession, d: String,
                       segment: String = "BUILDING",
                       cutDate: String = "1998-06-01"): DataFrame = {
    val cut = lit(cutDate).cast("timestamp")
    Tables.customer(s, d).filter(col("c_mktsegment") === segment)
      .join(Tables.orders(s, d).filter(col("o_orderdate") < cut),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_shipdate") > cut),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey"))
      .limit(10)
  }

  def regionalRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val su = Tables.supplier(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue_cents").desc, col("n_name"))
  }

  /** TPC-H Q4 shape (x297): order-priority census over orders with at
    * least one LATE lineitem — the canonical correlated EXISTS whose
    * subquery carries an INEQUALITY on the outer row
    * (`l_shipdate > o_orderdate + 60 days`), not just key equality.
    *
    * Plan shape: the EXISTS decorrelates to a LEFT SEMI join keyed on
    * the order key with the inequality as a residual condition — the
    * probe early-outs on the FIRST late line, lineitem's payload
    * columns never leave its scan (ReadSchema: 2 of 11 columns), and
    * an order with 40 late lines still counts once without any
    * distinct. Both sides are fact-scale at 100 TB, so no broadcast
    * hint: the semi join shuffles on the order key and AQE may still
    * broadcast the (date-pruned) orders side at small SF.
    *
    * @return (o_orderpriority, n_orders), priority-ordered. */
  def latePriorityCensus(s: SparkSession, d: String,
                         fromDate: String = "1997-01-01",
                         toDate: String = "1998-01-01",
                         graceDays: Int = 60): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(fromDate).cast("timestamp")
        && col("o_orderdate") < lit(toDate).cast("timestamp"))
    val late = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    o.join(late, col("l_orderkey") === col("o_orderkey")
        && col("l_shipdate") > col("o_orderdate")
          + expr(s"INTERVAL $graceDays DAYS"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q13 shape (x298): the customer order-count DISTRIBUTION —
    * how many customers placed 0, 1, 2, … qualifying orders. The
    * classic double aggregation over a LEFT OUTER join whose predicate
    * (`o_orderpriority <> excluded`) lives in the JOIN CONDITION, not
    * a WHERE clause — pushing it to a filter would turn zero-order
    * customers into dropped rows instead of the n_orders = 0 bucket,
    * the row this query exists to surface.
    *
    * Plan shape: customer ⋈ filtered orders shuffle on the customer
    * key (both fact-scale at 100 TB — no hint, AQE decides at small
    * SF); `count(o_orderkey)` counts only matched rows so unmatched
    * customers land in bucket 0; the second aggregation runs over the
    * |customers|-row count table and collapses to ≤ max-orders rows
    * before the final (bounded) sort.
    *
    * @return (n_orders, n_customers), customers-desc then orders-desc. */
  def orderCountDistribution(s: SparkSession, d: String,
                             excludePriority: String = "1-URGENT"): DataFrame = {
    val o = Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_orderpriority")
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey")
        && col("o_orderpriority") =!= excludePriority, "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("n_orders").desc)
  }

  /** TPC-H Q18 shape (x299): large-volume orders — customers whose
    * order aggregates past a quantity bar. The HAVING-subquery form
    * (`o_orderkey IN (SELECT l_orderkey … HAVING SUM(qty) > bar)`)
    * expressed directly as its decorrelated plan: aggregate-then-join.
    *
    * Plan shape: ONE lineitem aggregation (map-side combined) builds
    * the per-order quantity table; the HAVING bar filters it to a
    * vanishing fraction (bar 200 ≈ p95 of per-order mass) BEFORE any
    * join, so the orders/customer joins see only qualifying keys —
    * at 100 TB the filtered aggregate is broadcast-able and AQE makes
    * that call at runtime. The final cut is TakeOrderedAndProject
    * (per-partition top-k, no global sort). Quantities are integral
    * by data contract (spec-asserted) so the BIGINT cast is exact.
    *
    * @return (c_name, o_orderkey, o_orderdate, total_qty), qty-desc
    *         top-20. */
  def largeVolumeOrders(s: SparkSession, d: String,
                        minQty: Long = 200L): DataFrame = {
    val perOrder = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    perOrder
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q2 shape (x300): minimum-cost supplier per part — the
    * correlated SCALAR subquery (`price = (SELECT MIN(price) FROM …
    * WHERE l2.l_partkey = p_partkey)`) in its decorrelated form:
    * groupBy-min once, join the minima back as a filter. Ties (two
    * suppliers hitting the same minimum cents) all survive, exactly
    * like the subquery form — hence the DISTINCT.
    *
    * Plan shape: the part filter (p_size ≤ bar) semi-prunes lineitem
    * FIRST — the per-part MIN is identical whether computed before or
    * after the part restriction (the subquery correlates only on
    * p_partkey), so the aggregation runs over the pruned fraction, not
    * the corpus. One lineitem scan feeds both the minima and the
    * match-back (self-join on the 3-column projection); supplier joins
    * un-hinted (dim-scale here, fact-scale at SF100k — AQE decides).
    *
    * @return distinct (p_partkey, p_name, s_suppkey, s_name,
    *         min_price_cents), part- then supplier-ordered. */
  def minCostSupplier(s: SparkSession, d: String,
                      maxSize: Int = 5): DataFrame = {
    val parts = Tables.part(s, d).filter(col("p_size") <= maxSize)
      .select("p_partkey", "p_name")
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        cents(col("l_extendedprice")).as("price_cents"))
      .join(parts.select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
    val minima = li.groupBy(col("l_partkey").as("m_partkey"))
      .agg(min(col("price_cents")).as("min_price_cents"))
    li.join(minima, col("l_partkey") === col("m_partkey")
        && col("price_cents") === col("min_price_cents"))
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("min_price_cents"))
      .distinct()
      .orderBy(col("p_partkey"), col("s_suppkey"))
  }

  /** TPC-H Q11 shape (x301): revenue concentration — brands whose
    * revenue exceeds a fixed fraction of the corpus total. The
    * uncorrelated SCALAR subquery (`rev > (SELECT SUM(rev)…) / k`)
    * decorrelated as: aggregate once, total the bounded aggregate,
    * broadcast the 1-row total back as a filter.
    *
    * Plan shape: ONE lineitem⋈part aggregation builds the |brands|-row
    * revenue table and nothing corpus-scale runs twice — the grand
    * total is an unpartitioned window SUM over that BOUNDED aggregate
    * (the repo's bounded-table window discipline; a naive scalar
    * subquery or a second `agg` branch would re-run the corpus join,
    * which is the actual 100 TB defect here). Integer `div` keeps the
    * bar exact.
    *
    * @return (p_brand, revenue_cents) above total/divisor,
    *         revenue-desc. */
  def revenueConcentration(s: SparkSession, d: String,
                           divisor: Long = 30L): DataFrame = {
    val brandRev = Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"))
    brandRev
      .withColumn("grand_cents",
        sum(col("revenue_cents")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("revenue_cents") > expr(s"grand_cents div $divisor"))
      .select(col("p_brand"), col("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("p_brand"))
  }

  /** TPC-H Q10 shape (x309): top customers by RETURNED revenue in a
    * quarter — the "who is sending the most value back" account-review
    * list. Four-way star (customer ⋈ orders ⋈ lineitem ⋈ nation) with
    * each predicate on its own scan and the cut a TakeOrderedAndProject.
    *
    * Plan shape: the order-date window prunes orders at the scan and
    * the R-flag prunes lineitem at the scan BEFORE either joins; the
    * two fact joins shuffle on their keys at 100 TB (no hints — AQE
    * broadcasts at small SF); nation broadcasts by hint. Grouping by
    * (custkey, name, nation) adds no extra shuffle beyond the custkey
    * the join already established.
    *
    * @return (c_custkey, c_name, n_name, revenue_cents) revenue-desc
    *         top-20. */
  def returnedItemReport(s: SparkSession, d: String,
                         fromDate: String = "1997-01-01",
                         toDate: String = "1997-04-01"): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(fromDate).cast("timestamp")
        && col("o_orderdate") < lit(toDate).cast("timestamp"))
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12 shape (x310): late-shipment census split by order
    * priority CLASS — per return flag, how many late-shipped lines
    * belong to critical (1-URGENT/2-HIGH) vs ordinary orders. The
    * conditional-aggregation-over-a-join shape Q12 grades (the
    * reference keys it by ship mode, a column this corpus lacks —
    * return flag is the stand-in axis, the class split is verbatim).
    *
    * Plan shape: the lateness predicate is a join residual (it
    * correlates both sides); orders is pruned to 3 columns, lineitem
    * to 3; one fact-fact key shuffle, then a 3-row aggregate.
    *
    * @return (l_returnflag, high_count, low_count), flag-ordered. */
  def latePriorityClassCensus(s: SparkSession, d: String,
                              graceDays: Int = 30): DataFrame = {
    val isHigh = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_shipdate", "l_returnflag"),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate")
            + expr(s"INTERVAL $graceDays DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_count"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q14 shape (x311): promo revenue share for one ship-month —
    * the two-aggregates-one-scan ratio (`100 * promo / total`) Q14
    * grades, in exact integer micro-units: both sums are cents, the
    * share is a DECIMAL(38,0) cross-multiply + trunc division (never a
    * float ratio — the repo's x296 discipline), NULL if the month is
    * empty rather than a divide-by-zero.
    *
    * Plan shape: ONE lineitem(month-pruned) ⋈ part join; both the
    * promo and total sums ride the SAME aggregation (conditional sum),
    * so the ratio costs one scan, one join, one 1-row aggregate.
    *
    * @return one row (promo_cents, total_cents, promo_share_micro). */
  def promoRevenueShare(s: SparkSession, d: String,
                        monthStart: String = "1997-09-01",
                        monthEnd: String = "1997-10-01"): DataFrame = {
    val rev = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(monthStart).cast("timestamp")
        && col("l_shipdate") < lit(monthEnd).cast("timestamp"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type") === "PROMO", rev).otherwise(0L))
        .as("promo_cents"),
        sum(rev).as("total_cents"))
      .select(col("promo_cents"), col("total_cents"),
        expr("CAST((CAST(promo_cents AS DECIMAL(38,0)) * 1000000) " +
          "div nullif(total_cents, 0) AS BIGINT)").as("promo_share_micro"))
  }

  /** TPC-H Q21 shape (x313): suppliers SOLELY to blame for late
    * multi-supplier orders — the hardest classic decorrelation: an
    * EXISTS (another supplier on the order) chained with a NOT EXISTS
    * (another supplier ALSO late), both correlated on the outer line's
    * order AND supplier. Counts late LINES per blamed supplier,
    * exactly like the reference query.
    *
    * Plan shape — ONE lineitem pass: lines join orders once for the
    * lateness flag; per-(order, supplier) aggregation collapses lines
    * to supplier-level late flags + late-line counts; the EXISTS /
    * NOT-EXISTS pair decorrelates to two window counts over that
    * table partitioned by order (suppliers per order are bounded —
    * single digits in any order-line model — so the window never sees
    * skew); qualification is then a row-local filter (this supplier
    * late, ≥ 2 suppliers, exactly 1 late supplier), and only
    * qualifying (order, supplier) rows reach the supplier join.
    *
    * @return (s_name, numwait) — late lines on solely-blamed orders —
    *         desc top-10. */
  def soleLateSuppliers(s: SparkSession, d: String,
                        graceDays: Int = 60): DataFrame = {
    // NULL supplier keys never satisfy the subquery forms' `<>`
    // comparisons, so the decorrelation must exclude them BEFORE the
    // aggregate — otherwise a null-supplier group would inflate the
    // window counts the EXISTS pair decorrelates to (the corpus has no
    // null keys; the filter keeps the equivalence unconditional)
    val osup = Tables.lineitem(s, d)
      .filter(col("l_suppkey").isNotNull)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("__late",
        when(col("l_shipdate") > col("o_orderdate")
          + expr(s"INTERVAL $graceDays DAYS"), 1L).otherwise(0L))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max("__late").as("sup_late"), sum("__late").as("n_late_lines"))
    val w = Window.partitionBy("l_orderkey")
    osup
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp", sum("sup_late").over(w))
      .filter(col("sup_late") === 1L && col("n_supp") >= 2L
        && col("n_late_supp") === 1L)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum("n_late_lines").as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** TPC-H Q20 shape (x314): DOMINANT suppliers — suppliers carrying
    * more than twice the fair share of some part's quantity (the
    * correlated grouped-HAVING threshold Q20 grades, with the
    * availability bar made scale-stable: share vs the part's
    * per-supplier average rather than an absolute).
    *
    * Plan shape — ONE lineitem scan: the (part, supplier) quantity
    * aggregation, then the part totals and supplier counts come from
    * a WINDOW over that aggregate partitioned by part (suppliers per
    * part are bounded, and a second groupBy branch would rescan
    * lineitem — the window form keeps it one pass); the fair-share
    * compare is an exact integer cross-multiply; only dominant pairs
    * reach the supplier join.
    *
    * @return (s_suppkey, s_name, n_dominated), supplier-ordered. */
  def dominantSuppliers(s: SparkSession, d: String): DataFrame = {
    // NULL-key semantics matched to the correlated form EXACTLY: a
    // NULL part key never matches the correlated subqueries (`=` is
    // UNKNOWN) — filtered up front; NULL-supplier rows DO count in
    // the per-part total (the subquery sums ALL of l3's quantity) but
    // not in the distinct-supplier count (COUNT DISTINCT skips NULL)
    // and can't survive the supplier join — so the null-suppkey group
    // stays in the aggregate for tq, count(col) skips it for ns, and
    // it is dropped before the dominance filter
    val ps = Tables.lineitem(s, d)
      .filter(col("l_partkey").isNotNull)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sq"))
    val w = Window.partitionBy("l_partkey")
    ps.withColumn("tq", sum("sq").over(w))
      .withColumn("ns", count(col("l_suppkey")).over(w))
      .filter(col("l_suppkey").isNotNull)
      .filter(col("sq") * col("ns") > col("tq") * lit(2L))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_dominated"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q22 shape (x315): DORMANT RICH customers — above-average
    * balance and no recent orders — the scalar-average subquery plus
    * NOT EXISTS anti-join Q22 grades.
    *
    * Plan shape: the global average is a 1-row aggregate broadcast
    * back (the compare is the exact cross-multiply cents·N > Σcents —
    * never a float average); the NOT EXISTS decorrelates to a LEFT
    * ANTI against date-pruned orders (the date predicate pushes to
    * the orders scan, shrinking the anti build side); the report is a
    * |segments|-row aggregate.
    *
    * @return (c_mktsegment, n_cust, bal_cents), segment-ordered. */
  def dormantRichCustomers(s: SparkSession, d: String,
                           sinceDate: String = "2000-01-01"): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_acctbal").isNotNull)
      .withColumn("__bal", cents(col("c_acctbal")))
    val totals = c.agg(count(lit(1)).as("__n"), sum("__bal").as("__sum"))
    c.crossJoin(broadcast(totals))
      .filter(col("__bal") * col("__n") > col("__sum"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(sinceDate).cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), sum("__bal").as("bal_cents"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q17 shape (x319): small-quantity revenue for one brand —
    * lines whose quantity falls below a FRACTION of the part's average
    * (`l_quantity < 0.2 * (SELECT AVG(l_quantity) WHERE l2.l_partkey
    * = p_partkey)`), the fractional-average trap: 0.2·avg computed in
    * doubles diverges from the exact bar on tie rows (0.2 is not
    * binary-representable — 0.2·10.0 > 2.0 in IEEE), so BOTH engines
    * run the cross-multiply `5·q·cnt < Σq` instead, which is the same
    * predicate in exact integers.
    *
    * Plan shape: the brand filter prunes part to a 1/|brands| sliver
    * and the join prunes lineitem FIRST (no broadcast hint — the
    * sliver is SF-scaled, AQE makes the call at runtime); the correlated
    * count/sum decorrelate to a window over that pruned scan keyed by
    * part (per-part AVG is invariant to the brand restriction — it
    * correlates only on p_partkey), so the whole query is ONE pruned
    * lineitem pass, never a corpus-scale aggregate join.
    *
    * @return one row (rev_cents, n_small). */
  def smallQuantityRevenue(s: SparkSession, d: String,
                           brand: String = "Brand#12"): DataFrame = {
    val bp = Tables.part(s, d).filter(col("p_brand") === brand)
      .select("p_partkey")
    val w = Window.partitionBy("l_partkey")
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(bp, col("l_partkey") === col("p_partkey"))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("tot", sum(col("l_quantity").cast("long")).over(w))
      .filter(col("l_quantity").cast("long") * lit(5L) * col("cnt") < col("tot"))
      .agg(sum(cents(col("l_extendedprice"))).as("rev_cents"),
        count(lit(1)).as("n_small"))
  }

  /** TPC-H Q15 shape (x320): top supplier by windowed revenue — the
    * view + MAX-of-aggregate form (`total_revenue = (SELECT MAX(…)
    * FROM revenue)`), where a naive plan evaluates the revenue view
    * TWICE (once for rows, once for the max) — the groupBy-split-
    * self-join anti-pattern the x304 optimizer rule exists for.
    *
    * Plan shape: the date window prunes lineitem at the scan; ONE
    * per-supplier aggregation; the max is an unpartitioned window MAX
    * over that BOUNDED (|suppliers|-row) aggregate — the repo's
    * bounded-table window discipline — so the corpus is scanned once
    * and the view is never re-evaluated. Ties all survive, exactly
    * like the subquery form. A NULL supplier key group keeps its
    * revenue in the max race but can't reach the supplier join — both
    * forms agree (the inner join drops it), no up-front filter needed.
    *
    * @return (s_suppkey, s_name, total_revenue_cents), supplier-
    *         ordered. */
  def topRevenueSupplier(s: SparkSession, d: String,
                         fromDate: String = "1996-01-01",
                         toDate: String = "1996-04-01"): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(fromDate).cast("timestamp")
        && col("l_shipdate") < lit(toDate).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("total_revenue_cents"))
    rev
      .withColumn("__max_rev",
        max(col("total_revenue_cents")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("total_revenue_cents") === col("__max_rev"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_cents"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q7 shape (x321): volume shipping between two trading
    * regions — revenue by (supplier region, customer region, ship
    * year) for the two cross directions of a region pair, the
    * two-sided dimension star with the DISJUNCTIVE pair predicate
    * (`(r1=A AND r2=B) OR (r1=B AND r2=A)`) and year split Q7 grades.
    * (The reference keys it by nation; this corpus has 10 suppliers
    * per 25 nations at its smallest scale, so the region axis is the
    * stand-in that stays non-degenerate — the shape is verbatim.)
    *
    * Plan shape: the pair predicate is decomposed and PUSHED — each
    * side's dimension chain (nation ⋈ region, both fixed-size) is
    * broadcast and restricted to the two regions BEFORE touching a
    * fact table, so supplier and customer shrink to the pair's
    * members and the fact joins carry only qualifying rows (the
    * shrunken supplier/customer sides stay UN-hinted — they are
    * SF-scaled, AQE broadcasts them only while they fit); the
    * `supp ≠ cust` residual then keeps exactly the two cross
    * directions. Date window prunes lineitem at the scan. Two
    * fact-fact shuffles (lineitem⋈orders, orders⋈customer) — the
    * irreducible Q7 cost; everything else broadcasts.
    *
    * @return (supp_region, cust_region, l_year, revenue_cents),
    *         triple-ordered. */
  def volumeShipping(s: SparkSession, d: String,
                     regionA: String = "AMERICA", regionB: String = "ASIA",
                     fromDate: String = "1996-01-01",
                     toDate: String = "1998-01-01"): DataFrame = {
    def nationsOf(alias: String) =
      broadcast(Tables.nation(s, d)
        .join(Tables.region(s, d).filter(col("r_name").isin(regionA, regionB)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as(s"${alias}_nationkey"),
          col("r_name").as(alias)))
    val supp = Tables.supplier(s, d)
      .join(nationsOf("supp_region"),
        col("s_nationkey") === col("supp_region_nationkey"))
      .select("s_suppkey", "supp_region")
    val cust = Tables.customer(s, d)
      .join(nationsOf("cust_region"),
        col("c_nationkey") === col("cust_region_nationkey"))
      .select("c_custkey", "cust_region")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(fromDate).cast("timestamp")
        && col("l_shipdate") < lit(toDate).cast("timestamp"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_region") =!= col("cust_region"))
      .groupBy(col("supp_region"), col("cust_region"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"))
      .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
  }

  /** TPC-H Q8 shape (x322): market share — the fraction of one
    * nation's suppliers in a region's market for one part type, per
    * order year: the CASE-inside-SUM ratio over the full seven-table
    * star Q8 grades. Share in exact integer micro-units (DECIMAL
    * cross-multiply + trunc division — never a float ratio), NULL on
    * an empty year rather than divide-by-zero.
    *
    * Plan shape: the part-type filter prunes part to a 1/|types|
    * sliver that prunes lineitem FIRST (the strongest predicate in
    * the star; un-hinted — SF-scaled, AQE decides); the customer
    * side's region restriction rides the broadcast nation⋈region
    * chain; the supplier side is NOT restricted (every supplier
    * competes in the market — only the CASE tests the nation), so
    * its nation name joins onto the fact rows un-hinted. Both sums
    * ride ONE aggregation.
    *
    * @return (o_year, nation_cents, total_cents, share_micro),
    *         year-ordered. */
  def marketShare(s: SparkSession, d: String,
                  nation: String = "NATION_3", region: String = "EUROPE",
                  partType: String = "PROMO",
                  fromDate: String = "1996-01-01",
                  toDate: String = "1998-01-01"): DataFrame = {
    val bp = Tables.part(s, d).filter(col("p_type") === partType)
      .select("p_partkey")
    val custRegion = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)
          .join(Tables.region(s, d).filter(col("r_name") === region),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val suppNation = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val vol = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
    Tables.lineitem(s, d)
      .join(bp, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(fromDate).cast("timestamp")
            && col("o_orderdate") < lit(toDate).cast("timestamp"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custRegion, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(when(col("supp_nation") === nation, vol).otherwise(0L))
          .as("nation_cents"),
        sum(vol).as("total_cents"))
      .select(col("o_year"), col("nation_cents"), col("total_cents"),
        expr("CAST((CAST(nation_cents AS DECIMAL(38,0)) * 1000000) " +
          "div nullif(total_cents, 0) AS BIGINT)").as("share_micro"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q16 shape (x323): supplier variety per part segment —
    * distinct suppliers offering each (brand, type, size), excluding
    * a NOT-IN blacklist (suppliers in deficit). The NOT IN form is
    * the classic NULL trap this query exists to grade: one NULL in
    * the blacklist makes EVERY `NOT IN` UNKNOWN (empty result), and a
    * NULL outer key is UNKNOWN too — so BOTH forms pin the guards
    * explicitly (`s_suppkey IS NOT NULL` inside the subquery,
    * `l_suppkey IS NOT NULL` outside, the defensive spelling every
    * production warehouse uses), and with the guards pinned the
    * decorrelation to a broadcast LEFT ANTI join is exact.
    *
    * Plan shape: supplier-part pairs come from lineitem (this corpus
    * has no partsupp; df = distinct pairs, same variety semantics);
    * the blacklist anti-join is un-hinted (deficit suppliers are a
    * small but SF-scaled fraction — AQE broadcasts while they fit);
    * part's predicates prune at its scan; the
    * count-distinct aggregates (partkey-pruned) pairs, an expand-free
    * single-key distinct per group.
    *
    * @return (p_brand, p_type, p_size, supplier_cnt), count-desc. */
  def supplierPartVariety(s: SparkSession, d: String,
                          excludeBrand: String = "Brand#1",
                          maxSize: Int = 25): DataFrame = {
    val blacklist = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0 && col("s_suppkey").isNotNull)
      .select("s_suppkey")
    Tables.lineitem(s, d)
      .filter(col("l_suppkey").isNotNull)
      .select("l_partkey", "l_suppkey")
      .join(blacklist,
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.part(s, d)
          .filter(col("p_brand") =!= excludeBrand && col("p_size") <= maxSize),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q19 shape (x324): disjunctive multi-predicate revenue —
    * three OR'd (brand, size-range, quantity-range) branches, each
    * referencing BOTH join sides: the disjunctive-pushdown stress Q19
    * grades. A naive plan evaluates the OR only as a post-join
    * residual over the full lineitem×part key join; the right plan
    * factors what it can out of the disjunction and pushes it to the
    * scans.
    *
    * Plan shape: Catalyst's common-factor extraction pushes the
    * union of per-side disjuncts — `p_brand IN (…) AND p_size ≤ max`
    * to the part scan (broadcast sliver), `l_quantity BETWEEN
    * global-min AND global-max` to the lineitem scan — and keeps the
    * exact three-way OR as the join residual; the join itself is a
    * broadcast on the pruned part side, so the disjunction never
    * forces a fact-fact shuffle.
    *
    * @return one row (revenue_cents, n_lines). */
  def disjunctiveRevenue(s: SparkSession, d: String): DataFrame = {
    val b1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
      col("l_quantity").between(1.0, 15.0)
    val b2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
      col("l_quantity").between(10.0, 25.0)
    val b3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 30) &&
      col("l_quantity").between(20.0, 35.0)
    Tables.lineitem(s, d)
      .join(Tables.part(s, d),
        col("l_partkey") === col("p_partkey") && (b1 || b2 || b3))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q9 shape (x325): product-type profit by (supplier nation,
    * order year) — the LIKE-filtered six-table star that closes the
    * classic suite. Profit per line = net revenue − cost basis
    * (p_retailprice stands in for the absent ps_supplycost: this
    * corpus has no partsupp — the star shape, the LIKE pushdown and
    * the two fact-fact joins are what Q9 grades). Cost is the exact
    * integer product `cents(p_retailprice) · qty` (quantities are
    * integral by data contract), so profit is exact and may go
    * negative — Q9's profit CAN, that is not an error.
    *
    * Plan shape: the LIKE filter prunes part at its scan
    * (StringContains pushes to parquet) to a small sliver that prunes
    * lineitem FIRST (un-hinted — SF-scaled, AQE decides); then the
    * two irreducible fact-fact shuffles (lineitem⋈orders for the
    * year, on the order key the scan already bucket-groups at real
    * deployments) and the supplier join; nation broadcasts by hint
    * (fixed 25 rows at every scale). One aggregation to
    * |nations|·|years| rows.
    *
    * @return (nation, o_year, profit_cents), nation then year-desc. */
  def productProfit(s: SparkSession, d: String,
                    namePattern: String = "%red%"): DataFrame = {
    val parts = Tables.part(s, d)
      .filter(col("p_name").like(namePattern))
      .select(col("p_partkey"), cents(col("p_retailprice")).as("__cost1"))
    Tables.lineitem(s, d)
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          - col("__cost1") * col("l_quantity").cast("long"))
        .as("profit_cents"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q6 shape (x326): the forecast-revenue-change scan — ONE
    * lineitem pass with three range predicates (ship year, discount
    * band, quantity cap) and `SUM(extendedprice · discount)`, the
    * purest pushdown microbenchmark in the suite: the right plan is a
    * scan whose PushedFilters carry ALL THREE ranges (parquet
    * row-group min/max stats skip most of the corpus) feeding a 1-row
    * partial-aggregated sum — no join, no shuffle beyond the final
    * 1-row merge. The discount band is spelled in cents-scale
    * integers (`floor(discount·100+0.5) ∈ [5,7]` would lose the
    * pushdown — instead the raw double bounds 0.05−ε / 0.07+ε bracket
    * the generator's two-decimal grid exactly, so the predicate stays
    * scan-pushable AND engine-exact).
    *
    * @return one row (revenue_cents, n_lines). */
  def forecastRevenue(s: SparkSession, d: String,
                      yearStart: String = "1996-01-01",
                      yearEnd: String = "1997-01-01",
                      maxQty: Double = 24.0): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(yearStart).cast("timestamp")
        && col("l_shipdate") < lit(yearEnd).cast("timestamp")
        && col("l_discount") >= 0.045 && col("l_discount") <= 0.075
        && col("l_quantity") < maxQty)
      .agg(sum(cents(col("l_extendedprice") * col("l_discount")))
        .as("revenue_cents"),
        count(lit(1)).as("n_lines"))
}
