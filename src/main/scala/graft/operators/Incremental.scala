package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * shape. A full `groupBy` re-aggregation costs O(snapshot) every
  * batch; keeping the aggregate as a MERGEABLE PARTIAL STATE table
  * (per-key count + sum — a commutative monoid) makes the refresh
  * cost O(|delta| + |touched keys|): aggregate the new batch alone,
  * then merge states by key. The same law covers min/max/count/sum/
  * avg (= sum÷count at read time) and every sketch with a merge
  * (HLL, CMS, KLL) — count+sum is the canonical pair implemented
  * here.
  *
  * Scale shape: `merge` is a union + key-groupBy, so Spark's partial
  * aggregation combines map-side and the shuffle carries at most one
  * row per (input-partition, key). With the state table stored
  * hash-bucketed on the key ([[graft.core.Layout]]), the state side
  * needs no exchange at all, and [[graft.etl.Pipeline.upsertIncremental]]
  * writes back only the buckets whose keys the delta touched — the
  * end-to-end refresh never rewrites or reshuffles the untouched
  * snapshot.
  */
object Incremental {

  /** Partial aggregate state of `valueCol` per `keys`: (n, tot).
    * Deterministic and engine-portable as long as `valueCol` is
    * integer (sum order then cannot matter — use scaled-integer
    * money/metrics, e.g. [[graft.queries.Relational.cents]]). */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(valueCol).as("tot"))

  /** Merge partial states built by [[aggState]] over disjoint (or
    * overlapping-key, disjoint-row) inputs. Associative + commutative:
    * merge(merge(a,b),c) ≡ merge(a,b,c) ≡ one aggState over the
    * concatenated input — the refresh invariant the x66 oracle checks
    * end-to-end. */
  def merge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state table")
    val keys = states.head.columns.filterNot(Set("n", "tot")).toSeq
    require(keys.nonEmpty, "state tables must carry at least one key column")
    states.foreach(s => require(s.columns.sorted.sameElements(
      states.head.columns.sorted),
      s"state schemas differ: ${s.columns.mkString(",")} vs " +
        states.head.columns.mkString(",")))
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"), sum("tot").as("tot"))
  }

  /** DISTINCT-count state per key as an HLL sketch (Apache DataSketches
    * via `hll_sketch_agg`) — the sketch instance of the same refresh
    * law: exact distinct counts don't merge (|A ∪ B| ≠ |A| + |B|), but
    * sketch UNION is lossless for HLL, so `estimate(merge(s₁, s₂)) ≡
    * estimate(sketch(rows₁ ∪ rows₂))` EXACTLY — not approximately —
    * and IncrementalSpec asserts that identity. The estimate itself
    * carries the usual HLL error vs the true distinct count (bounded
    * in the spec); what the maintenance never adds is drift. */
  def distinctState(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(valueCol).as("hll"))

  /** Merge [[distinctState]] tables by key (lossless HLL union). */
  def mergeDistinct(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "mergeDistinct needs at least one state table")
    val keys = states.head.columns.filterNot(_ == "hll").toSeq
    require(keys.nonEmpty, "state tables must carry at least one key column")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"))
  }

  /** Read the estimate off a [[distinctState]] table. */
  def distinctEstimate(state: DataFrame): DataFrame = {
    val keys = state.columns.filterNot(_ == "hll").toSeq
    state.select(keys.map(col) :+
      hll_sketch_estimate(col("hll")).as("n_distinct_est"): _*)
      .orderBy(keys.map(col): _*)
  }

  /** Mergeable QUANTILE state: a fixed-width integer histogram of the
    * measure — (bin, n) with bin = floor(v / binWidth) — the third
    * instance of the x66 refresh law after count+sum ([[aggState]])
    * and HLL ([[distinctState]]). Exact quantiles don't merge (the
    * p99 of two halves says nothing about the whole), but histogram
    * COUNTS are a commutative monoid, so `merge(state(A), state(B)) ≡
    * state(A ⊎ B)` EXACTLY and any quantile read off the merged
    * histogram is identical to the one-shot read — the estimate's only
    * error is the declared binWidth resolution, and maintenance never
    * adds drift (the same contract KLL/t-digest give approximately,
    * made exact by fixing the resolution up front).
    *
    * Scale shape: binning is a row-local integer projection riding the
    * scan; the state is ≤ value-range/binWidth rows after map-side
    * combine; refresh cost is O(|delta| + |touched bins|). The
    * `pmod` spelling keeps the floor exact for negative measures
    * (Spark's `div` truncates toward zero).
    *
    * @param valueCol integer measure (use
    *                 [[graft.queries.Relational.cents]] for money) */
  def quantileState(df: DataFrame, valueCol: Column, binWidth: Long): DataFrame = {
    require(binWidth >= 1L, s"binWidth ($binWidth) must be >= 1")
    df.filter(valueCol.isNotNull)
      .select(valueCol.cast("long").as("__v"))
      .select(expr(s"(__v - pmod(__v, ${binWidth}L)) div ${binWidth}L").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  /** WEIGHTED [[quantileState]]: bin mass is a weight sum instead of a
    * row count — "the median TOKEN lives in a document of length X"
    * instead of "the median DOCUMENT has length X", the distinction
    * that matters when the consumer is a token-budgeted packer or a
    * mixing run (a few giant docs carry most of the mass). Same
    * (bin, n) schema, so [[mergeQuantile]] and [[quantileEstimate]]
    * apply unchanged — the merge law and the rank read are mass-
    * agnostic. NULL or non-positive weights are excluded (no mass to
    * place). */
  def quantileStateWeighted(df: DataFrame, valueCol: Column,
                            weightCol: Column, binWidth: Long): DataFrame = {
    require(binWidth >= 1L, s"binWidth ($binWidth) must be >= 1")
    df.filter(valueCol.isNotNull && weightCol.isNotNull && weightCol > 0)
      .select(valueCol.cast("long").as("__v"), weightCol.cast("long").as("__w"))
      .select(expr(s"(__v - pmod(__v, ${binWidth}L)) div ${binWidth}L").as("bin"),
        col("__w"))
      .groupBy("bin").agg(sum("__w").as("n"))
  }

  /** Merge [[quantileState]] tables (disjoint-row inputs): union +
    * bin-groupBy — at most one shuffled row per (partition, bin). */
  def mergeQuantile(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "mergeQuantile needs at least one state table")
    states.foreach(s => require(s.columns.sorted.sameElements(Array("bin", "n")),
      s"quantile state must be (bin, n), got ${s.columns.mkString(",")}"))
    states.reduce(_ unionByName _).groupBy("bin").agg(sum("n").as("n"))
  }

  /** Read quantile estimates off a [[quantileState]] histogram: for
    * each requested permille q, the bin holding the ceil(q·N/1000)-th
    * value (1-based, lower-bound convention) and that bin's inclusive
    * lower edge — all integer arithmetic, engine-replayable. The
    * cumulative window runs over the BOUNDED bin table (the repo's
    * bounded-table window discipline), never the data.
    *
    * @return (permille, bin, lo_value), permille-ordered. */
  def quantileEstimate(state: DataFrame, binWidth: Long,
                       permilles: Seq[Int]): DataFrame = {
    require(binWidth >= 1L, s"binWidth ($binWidth) must be >= 1")
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000], got ${permilles.mkString(",")}")
    import org.apache.spark.sql.expressions.Window
    val cumW = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val totW = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    state
      .withColumn("cum", sum("n").over(cumW))
      .withColumn("tot", sum("n").over(totW))
      .withColumn("permille",
        explode(array(permilles.distinct.sorted.map(p => lit(p.toLong)): _*)))
      .filter(col("cum") >= greatest(lit(1L),
        expr("(permille * tot + 999) div 1000")))
      .groupBy("permille")
      .agg(min(col("bin")).as("bin"))
      .select(col("permille"), col("bin"),
        (col("bin") * lit(binWidth)).as("lo_value"))
      .orderBy("permille")
  }

  /** RETRACTABLE refresh: apply a signed changelog — rows tagged
    * `opCol` = 'I' (insert) or 'D' (retract a previously-counted row)
    * — to an [[aggState]] table. Inserts contribute (+1, +v), deletes
    * (−1, −v): count+sum is a GROUP (not just a monoid — every element
    * has an inverse), which is exactly why CDC-fed materialized views
    * can subtract without re-reading the snapshot; min/max famously
    * can't (no inverse), which is the documented boundary of this
    * operator. Keys whose state nets to n = 0 are dropped — a fully-
    * retracted key disappears, same as in a recompute.
    *
    * Refresh cost is O(|delta| + |touched keys|): the changelog
    * collapses to signed per-key partials map-side, then one key-equi
    * merge with the state — identical shuffle shape to [[merge]], and
    * with the state bucketed on the key, exchange-free on that side.
    * applyChangelog(state(R), log) ≡ aggState(R ⊎ inserts ∖ deletes)
    * — IncrementalSpec asserts the law end-to-end. */
  def applyChangelog(state: DataFrame, changelog: DataFrame,
                     keys: Seq[String], valueCol: Column,
                     opCol: String = "op"): DataFrame = {
    val sign = when(col(opCol) === "D", lit(-1L))
      .when(col(opCol) === "I", lit(1L))
      .otherwise(raise_error(concat(lit("applyChangelog: bad op "),
        col(opCol))))
    val delta = changelog
      .groupBy(keys.map(col): _*)
      .agg(sum(sign).as("n"), sum(sign * valueCol).as("tot"))
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"), sum("tot").as("tot"))
      .filter(col("n") =!= 0L)
  }

  /** Pane-based sliding-window counts (the Li et al. "panes"
    * decomposition, VLDB'05): raw events collapse ONCE to per-(type,
    * pane) partial counts — pane = `unix_micros(ts) div paneMicros` —
    * and every sliding window of `windowPanes` consecutive panes is
    * the SUM of its partials. A window sliding by one pane re-reads
    * nothing: each event is aggregated exactly once, each pane partial
    * feeds `windowPanes` windows — O(events + panes·W) instead of the
    * O(events·W) a per-window re-scan costs, and the same partial
    * table serves every window length that divides into panes. This is
    * the batch twin of the streaming windowed aggregations in
    * [[graft.streaming.EventStreams]] (micro-batch state IS a pane).
    *
    * Shape: one map-side-combined (type, pane) aggregation over the
    * corpus; the ×W contribution explode, the per-type window axis
    * (densified over the observed pane span — a fully-quiet window
    * reports 0, the ops-dashboard contract), and the final rollup all
    * run over the PANE table, calendar-bounded, never raw events.
    * Windows whose span extends before the first observed pane are
    * reported from the observed data (warm-up windows, same contract
    * as [[graft.operators.Behavior.rollingActives]]).
    *
    * @return (event_type, win_start_pane, win_end_pane, n) ordered —
    *         pane indices, inclusive; times recover as pane·paneMicros. */
  def paneSlidingCounts(events: DataFrame, paneMicros: Long,
                        windowPanes: Int,
                        typeCol: String = "event_type",
                        tsCol: String = "ts"): DataFrame = {
    require(paneMicros > 0, s"paneMicros ($paneMicros) must be > 0")
    require(windowPanes >= 1 && windowPanes <= 100000,
      s"windowPanes ($windowPanes) must be in [1, 1e5]")
    val panes = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .select(col(typeCol).as("t"),
        expr(s"unix_micros($tsCol) div ${paneMicros}L").as("pane"))
      .groupBy("t", "pane").agg(count(lit(1)).as("n"))
    val grid = panes.groupBy("t")
      .agg(min("pane").as("__p0"), max("pane").as("__p1"))
      .select(col("t"),
        explode(sequence(col("__p0"), col("__p1"))).as("wend"))
    val contrib = panes
      .select(col("t"), col("n"),
        explode(sequence(col("pane"),
          col("pane") + lit(windowPanes - 1L))).as("wend"))
      .groupBy("t", "wend").agg(sum("n").as("n"))
    grid.join(contrib, Seq("t", "wend"), "left")
      .select(col("t").as(typeCol),
        (col("wend") - lit(windowPanes - 1L)).as("win_start_pane"),
        col("wend").as("win_end_pane"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(typeCol, "win_end_pane")
  }

  /** Pane-decomposed sliding DISTINCT counts — [[paneSlidingCounts]]
    * with a DataSketches HLL sketch as the pane partial instead of a
    * count: per (type, pane) the keys collapse to ONE sketch, each
    * window unions its `windowPanes` sketches and reads the estimate.
    * This is the query [[graft.operators.Behavior.rollingActives]]'
    * exact explode cannot reach at scale (its cost grows with
    * windowDays × |user-days|; here a 7-day window over trillions of
    * events is `panes·W` kilobyte-sketch unions) and the sliding twin
    * of [[distinctState]]'s incremental-MV law — the lossless HLL
    * union IS what makes pane decomposition legal for distincts
    * (count partials sum; distinct partials must sketch-union).
    *
    * Sketch internals are engine-specific → rows-only against the
    * oracle (SURVEY §2.4 rule 6); the spec carries correctness: the
    * pane-union estimate is IDENTICAL to sketching each window
    * directly (the same update set at the same lgK — union is
    * lossless), and exact at spec-scale cardinalities (HLL sparse
    * mode). Shape: one map-side-combined (type, pane) sketch
    * aggregation over the corpus; the ×W explode and the union rollup
    * run over the PANE table; quiet windows report 0.
    *
    * @return (event_type, win_start_pane, win_end_pane,
    *         n_distinct_est) ordered. */
  def paneSlidingDistinct(events: DataFrame, paneMicros: Long,
                          windowPanes: Int,
                          keyCol: String = "user_id",
                          typeCol: String = "event_type",
                          tsCol: String = "ts"): DataFrame = {
    require(paneMicros > 0, s"paneMicros ($paneMicros) must be > 0")
    require(windowPanes >= 1 && windowPanes <= 100000,
      s"windowPanes ($windowPanes) must be in [1, 1e5]")
    val panes = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull &&
        col(keyCol).isNotNull)
      .select(col(typeCol).as("t"),
        expr(s"unix_micros($tsCol) div ${paneMicros}L").as("pane"),
        col(keyCol).as("k"))
      .groupBy("t", "pane")
      .agg(expr("hll_sketch_agg(k)").as("sk"))
    val grid = panes.groupBy("t")
      .agg(min("pane").as("__p0"), max("pane").as("__p1"))
      .select(col("t"),
        explode(sequence(col("__p0"), col("__p1"))).as("wend"))
    val contrib = panes
      .select(col("t"), col("sk"),
        explode(sequence(col("pane"),
          col("pane") + lit(windowPanes - 1L))).as("wend"))
      .groupBy("t", "wend")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    grid.join(contrib, Seq("t", "wend"), "left")
      .select(col("t").as(typeCol),
        (col("wend") - lit(windowPanes - 1L)).as("win_start_pane"),
        col("wend").as("win_end_pane"),
        coalesce(col("est"), lit(0L)).as("n_distinct_est"))
      .orderBy(typeCol, "win_end_pane")
  }

  /** Pane-decomposed SLIDING QUANTILES — [[paneSlidingCounts]] with a
    * [[quantileState]] histogram as the pane partial: per-pane (bin,
    * count) partials merge losslessly into each sliding window they
    * feed, so "p95 latency over the trailing week, daily" never
    * re-scans a week of events per day — the pane histogram is built
    * once and ADDED seven times (the monoid the count pane uses, now
    * carrying a distribution instead of a scalar). The third pane
    * instance after count (x36-family) and HLL (x179), completing the
    * refresh-law triangle at window granularity.
    *
    * Scale shape: the only corpus-scale work is the (type, pane, bin)
    * aggregation with map-side combine; pane→window fan-out explodes
    * the BOUNDED pane-histogram table ×windowPanes; the cumulative /
    * total / rank-pick windows run per (type, window) over ≤|bins|
    * rows each (bounded-table window discipline). Windows with no
    * events emit nothing — an empty histogram has no quantile (the
    * count twin reports its 0 instead).
    *
    * @return (event_type, win_start_pane, win_end_pane, permille, n,
    *         bin, lo_value) ordered (type, window, permille). */
  def paneSlidingQuantile(events: DataFrame, paneMicros: Long,
                          windowPanes: Int, valueCol: Column,
                          binWidth: Long, permilles: Seq[Int],
                          typeCol: String = "event_type",
                          tsCol: String = "ts"): DataFrame = {
    require(paneMicros > 0, s"paneMicros ($paneMicros) must be > 0")
    require(windowPanes >= 1 && windowPanes <= 100000,
      s"windowPanes ($windowPanes) must be in [1, 1e5]")
    require(binWidth >= 1L, s"binWidth ($binWidth) must be >= 1")
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000], got ${permilles.mkString(",")}")
    import org.apache.spark.sql.expressions.Window
    val panes = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull
        && valueCol.isNotNull)
      .select(col(typeCol).as("t"),
        expr(s"unix_micros($tsCol) div ${paneMicros}L").as("pane"),
        valueCol.cast("long").as("__v"))
      .select(col("t"), col("pane"),
        expr(s"(__v - pmod(__v, ${binWidth}L)) div ${binWidth}L").as("bin"))
      .groupBy("t", "pane", "bin").agg(count(lit(1)).as("n"))
    val perWindow = panes
      .select(col("t"), col("bin"), col("n"),
        explode(sequence(col("pane"),
          col("pane") + lit(windowPanes - 1L))).as("wend"))
      .groupBy("t", "wend", "bin").agg(sum("n").as("n"))
    val cumW = Window.partitionBy("t", "wend").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val totW = Window.partitionBy("t", "wend")
    perWindow
      .withColumn("cum", sum("n").over(cumW))
      .withColumn("tot", sum("n").over(totW))
      .withColumn("permille",
        explode(array(permilles.distinct.sorted.map(p => lit(p.toLong)): _*)))
      .filter(col("cum") >= greatest(lit(1L),
        expr("(permille * tot + 999) div 1000")))
      .groupBy("t", "wend", "permille")
      .agg(min("bin").as("bin"), max("tot").as("n"))
      .select(col("t").as(typeCol),
        (col("wend") - lit(windowPanes - 1L)).as("win_start_pane"),
        col("wend").as("win_end_pane"), col("permille"), col("n"),
        col("bin"), (col("bin") * lit(binWidth)).as("lo_value"))
      .orderBy(typeCol, "win_end_pane", "permille")
  }
}
