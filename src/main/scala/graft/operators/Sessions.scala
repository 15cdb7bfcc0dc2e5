package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch temporal reshaping of event streams: gap sessionization and
  * SCD2 (slowly-changing-dimension) interval compaction.
  *
  * These are the BATCH twins of the streaming session windows in
  * `graft.streaming.EventStreams` — backfills and historical reloads
  * run over the full event history, where the classic
  * gaps-and-islands window shape is the scalable form: ONE hash
  * shuffle on the entity key, one in-partition sort, and every
  * subsequent window function rides the same sorted run (Spark plans
  * consecutive same-(partition, order) windows in a single Window
  * operator without re-sorting). Per-key history must fit a
  * partition's sort spill budget — the standard contract for keyed
  * windows, and AQE splits skewed keys' shuffle blocks.
  *
  * All emitted measures are exact integers (counts, epoch longs,
  * cents) so results are engine-portable and retry-stable.
  */
object Sessions {

  /** Gap sessionization: events of one `user_id` belong to the same
    * session while consecutive gaps are ≤ `gap`, in `tsCol`'s units
    * (epoch long — nanos or micros, caller's choice). Emits one row
    * per session with bounds and value totals — session_seq numbers a
    * user's sessions in time order from 1.
    *
    * Events are ordered by (tsCol, event_id): the id tiebreak makes
    * simultaneous events — and therefore session numbering — fully
    * deterministic. A session-start flag via `lag`, a running sum to
    * assign session ids, then an aggregate per (user, session): the
    * aggregate's keys refine the window's partitioning, so the map-side
    * partial aggregation is near-total and the second shuffle moves
    * only one row per session. */
  def sessionize(events: DataFrame, gap: Long,
                 tsCol: String = "ts_ns"): DataFrame =
    sessionLabels(events, gap, tsCol)
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min(tsCol).as("start_ts"),
        max(tsCol).as("end_ts"),
        graft.queries.Relational.cents(sum("value")).as("value_cents"))

  /** The per-EVENT half of [[sessionize]]: input rows plus their
    * `session_seq` label (1-based per user in time order), before any
    * aggregation — the shape session-scoped analyses compose on (a
    * funnel that resets at session boundaries keys its champion chain
    * by (user, session), not by user). One keyed shuffle + sort; the
    * start-flag lag and the running-sum label ride the same sorted
    * run. The single spelling of the gap rule, shared with
    * [[sessionize]] so the two cannot drift. */
  def sessionLabels(events: DataFrame, gap: Long,
                    tsCol: String = "ts_ns"): DataFrame = {
    require(gap >= 0, s"gap ($gap) must be >= 0")
    val w = Window.partitionBy("user_id").orderBy(tsCol, "event_id")
    events
      .withColumn("__gap", col(tsCol) - lag(tsCol, 1).over(w))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > gap, 1L).otherwise(0L))
      .withColumn("session_seq", sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__gap", "__new")
  }

  /** Session handoff matrix: how sessions ENTER × how they EXIT —
    * (first event type, last event type, count) over the gap sessions.
    * The product read on [[sessionize]]'s structure: a heavy
    * (view, view) diagonal means browse-and-bounce, entry=purchase
    * rows mean deep links skip the funnel entirely, and the exit
    * column ranks where sessions die — [[sessionLengthHistogram]] says
    * how LONG sessions are, this says what they DO at the edges.
    *
    * Shape: [[sessionLabels]]' one keyed window pass, then entry/exit
    * via `min/max(struct(ts, event_id, type))` — map-side-combinable
    * champion aggregates (deterministic: (ts, id) is a total order),
    * no second window; the matrix is ≤|types|² rows.
    *
    * @return (entry_type, exit_type, n_sessions) ordered. */
  def sessionHandoffMatrix(events: DataFrame, gap: Long,
                           tsCol: String = "ts_ns",
                           typeCol: String = "event_type"): DataFrame =
    sessionLabels(events, gap, tsCol)
      .groupBy("user_id", "session_seq")
      .agg(
        min(struct(col(tsCol), col("event_id"), col(typeCol)))
          .getField(typeCol).as("entry_type"),
        max(struct(col(tsCol), col("event_id"), col(typeCol)))
          .getField(typeCol).as("exit_type"))
      .groupBy("entry_type", "exit_type")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("entry_type", "exit_type")

  /** Session-size distribution: (n_events, n_sessions) over the
    * [[sessionize]] output — the one-glance shape report ("are
    * sessions mostly 1-event bounces or long engaged runs?") that
    * decides whether a funnel analysis is even meaningful at the
    * chosen gap, and the sensitivity check run at several gaps before
    * pinning one.
    *
    * Cost beyond sessionize itself: one map-side-combined groupBy
    * over the (already session-keyed) session table — the output is
    * bounded by the longest session, typically tens of rows. */
  def sessionLengthHistogram(events: DataFrame, gap: Long,
                             tsCol: String = "ts_ns"): DataFrame =
    sessionize(events, gap, tsCol)
      .groupBy("n_events").agg(count(lit(1)).as("n_sessions"))
      .orderBy("n_events")

  /** Interval-coverage summary (merge-overlapping / gaps-and-islands
    * over real intervals): given per-key `[start, end)` intervals —
    * here each event opened into a fixed-width activity window —
    * coalesce everything that overlaps or touches into islands and
    * report, per key, how many raw intervals and merged islands there
    * are, the total COVERED time (overlaps counted once — the quantity
    * a naive Σ(end−start) double-counts), the overall span, and
    * covered/span utilization (permille). The machine-uptime /
    * billing-coverage / SLA primitive that [[sessionize]]'s point-gap
    * rule can't express once rows carry genuine durations.
    *
    * Algorithm: an island starts where `start` exceeds the running
    * `max(end)` over all earlier intervals of the key (the classic
    * cummax formulation — handles nested and out-of-order-ending
    * intervals that a lag(end) comparison would break on); a running
    * sum of start flags labels islands; two keyed aggregates collapse
    * islands → key summary. Both windows and both aggregates share
    * ONE user-hash shuffle; nothing is ever joined row-to-row.
    *
    * @param widthUs each event becomes the interval
    *        [ts_us, ts_us + widthUs)
    * @return (user_id, n_intervals, n_islands, covered_us, span_us,
    *         utilization_permille) ordered by user_id. */
  def intervalCoverage(events: DataFrame, widthUs: Long,
                       userCol: String = "user_id",
                       tsCol: String = "ts",
                       idCol: String = "event_id"): DataFrame = {
    require(widthUs > 0, s"widthUs ($widthUs) must be > 0")
    val iv = events.select(col(userCol).as("user_id"),
      unix_micros(col(tsCol)).as("__s"), col(idCol))
      .withColumn("__e", col("__s") + widthUs)
    val w = Window.partitionBy("user_id").orderBy(col("__s"), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevRun = w.rowsBetween(Window.unboundedPreceding, -1)
    val islands = iv
      .withColumn("__cme", max("__e").over(prevRun)) // cummax BEFORE me
      .withColumn("__new",
        when(col("__cme").isNull || col("__s") > col("__cme"), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum("__new").over(run))
      .groupBy("user_id", "__isl")
      .agg(count(lit(1)).as("__n"), min("__s").as("__is"),
        max("__e").as("__ie"))
    islands.groupBy("user_id")
      .agg(sum("__n").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("covered_us"),
        (max("__ie") - min("__is")).as("span_us"))
      .select(col("user_id"), col("n_intervals"), col("n_islands"),
        col("covered_us"), col("span_us"),
        expr("(covered_us * 1000) div span_us").as("utilization_permille"))
      .orderBy("user_id")
  }

  /** SCD2 interval build: compact a per-user event history into
    * validity intervals of `event_type` — one row per RUN of equal
    * consecutive values, `[valid_from_ts, valid_to_ts)` half-open,
    * open-ended (NULL valid_to_ts) for the current state, `version`
    * numbering a user's states from 1. The change-data-capture →
    * dimension-table transform of every warehouse load.
    *
    * Shape: change points are rows whose previous value IS DISTINCT
    * FROM theirs (null-safe, so NULL states form runs too); `lead`
    * over the surviving rows closes each interval. Both windows share
    * one (user_id) shuffle + sort. */
  /** Regular-grid resampling with linear interpolation — the
    * time-series alignment step before joining event-derived features
    * onto a fixed cadence (training snapshots, daily aggregates,
    * forecasting inputs). For each user and each grid instant in
    * `[startTs, endTs]` stepped by `stepTs` (all in `tsCol` units):
    * the exact event value if one lands on the instant, the linear
    * interpolation between the bracketing events otherwise, hold-last
    * after the final event, back-fill before the first — each case
    * labeled in `kind` ('exact' | 'lerp' | 'hold' | 'backfill').
    *
    * COMPOSED from [[AsOfJoin.backward]] + [[AsOfJoin.forward]] — two
    * single-shuffle sorted passes, no range explosion, no per-grid
    * scans. Simultaneous events collapse latest-event_id-wins first
    * (one more keyed window on the same shuffle key), so the bracketing
    * values are uniquely determined and the oracle can replay them.
    * The grid explodes from a `sequence` literal per user — rows scale
    * as |users|·|grid|, never |users|·|events|. */
  def resampleLinear(events: DataFrame, startTs: Long, endTs: Long,
                     stepTs: Long, tsCol: String = "ts_ns"): DataFrame = {
    require(stepTs > 0, s"stepTs ($stepTs) must be > 0")
    require(endTs >= startTs, s"endTs ($endTs) must be >= startTs ($startTs)")
    // collapse simultaneous events: latest event_id wins (the upsert
    // tie rule), so each (user, ts) has ONE value
    val wTie = Window.partitionBy("user_id", tsCol)
      .orderBy(col("event_id").desc)
    val ev = events
      .withColumn("__rn", row_number().over(wTie))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col(tsCol).as("__et"), col("value").as("__ev"))
    val grid = ev.select("user_id").distinct()
      .withColumn("g_ts",
        explode(sequence(lit(startTs), lit(endTs), lit(stepTs))))
    val bw = AsOfJoin.backward(grid, ev.withColumnRenamed("__et", "__bt")
        .withColumnRenamed("__ev", "__bv"),
      key = "user_id", leftTime = "g_ts", rightTime = "__bt",
      rightCols = Seq("__bt", "__bv"))
    val both = AsOfJoin.forward(bw, ev.withColumnRenamed("__et", "__ft")
        .withColumnRenamed("__ev", "__fv"),
      key = "user_id", leftTime = "g_ts", rightTime = "__ft",
      rightCols = Seq("__ft", "__fv"))
    val lerp = col("__bv") + (col("__fv") - col("__bv")) *
      (col("g_ts") - col("__bt")) / (col("__ft") - col("__bt"))
    both.select(col("user_id"), col("g_ts"),
        when(col("__bt") === col("__ft"), lit("exact"))
          .when(col("__bt").isNotNull && col("__ft").isNotNull, lit("lerp"))
          .when(col("__bt").isNotNull, lit("hold"))
          .otherwise(lit("backfill")).as("kind"),
        graft.queries.Relational.cents(
          when(col("__bt") === col("__ft"), col("__bv"))
            .when(col("__bt").isNotNull && col("__ft").isNotNull, lerp)
            .when(col("__bt").isNotNull, col("__bv"))
            .otherwise(col("__fv"))).as("val_cents"))
  }

  def scd2(events: DataFrame, tsCol: String = "ts_ns"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(tsCol, "event_id")
    events
      .withColumn("__prev", lag("event_type", 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col("__prev") <=> col("event_type")))
      .withColumn("valid_from_ts", col(tsCol))
      .withColumn("valid_to_ts", lead("valid_from_ts", 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select("user_id", "event_type", "valid_from_ts", "valid_to_ts", "version")
  }
  /** Recency-weighted ("trending") counts with integer half-life
    * decay: each event contributes weight 1e6 div 2^(age div
    * halfLifeDays) micros, where age is whole days before the anchor
    * date. Powers of two keep every weight an exact integer (no float
    * pow), so decayed totals replay bit-for-bit cross-engine; beyond
    * 20 half-lives the weight is exactly 0 (1e6 < 2^20),
    * which also bounds the arithmetic. Events AFTER the anchor (only
    * possible with an explicit anchor) get full weight rather than a
    * negative shift.
    *
    * Scale shape: the weighting is a row-local codegen map riding the
    * scan; the aggregate is a |types|-bounded groupBy with map-side
    * combine. The default anchor (max event date) costs one scalar
    * aggregation job — pass `anchor` to skip it (the production shape:
    * the pipeline clock, not the data max, defines "now").
    *
    * @return (event_type, n_raw, decayed_micro) ordered by type. */
  def decayedCounts(events: DataFrame, typeCol: String = "event_type",
                    tsCol: String = "ts", halfLifeDays: Int = 2,
                    anchor: Option[java.sql.Date] = None): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays ($halfLifeDays) must be >= 1")
    val anchorDate = anchor.getOrElse(
      events.agg(max(to_date(col(tsCol)))).head().getDate(0))
    require(anchorDate != null, "decayedCounts needs at least one non-null ts")
    events
      .withColumn("__age", datediff(lit(anchorDate), to_date(col(tsCol))))
      .withColumn("__shift",
        floor(col("__age").cast("double") / lit(halfLifeDays.toDouble)).cast("int"))
      .withColumn("__w",
        when(col("__shift") < 0, lit(1000000L))
          .when(col("__shift") <= 19,
            expr("CAST(1000000 AS BIGINT) div CAST(shiftleft(1, __shift) AS BIGINT)"))
          .otherwise(lit(0L)))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_raw"), sum("__w").as("decayed_micro"))
      .orderBy(typeCol)
  }

  /** Event-time DISORDER profile — the measured basis for every
    * `withWatermark` delay in [[graft.streaming.EventStreams]]: per
    * type, the quantile ladder of each event's LATENESS, defined as
    * (running max of event time over arrival order) − (its own event
    * time). An in-order stream profiles all-zero; the p990/p1000 rows
    * ARE the watermark decision (set the delay at the lateness
    * quantile whose drop rate you accept — a number today guessed
    * from folklore). Arrival order comes from the monotone ingest id
    * (`event_id` — the reference connector assigns ids in fetch
    * order; any ingest sequence column works).
    *
    * Scale shape: the running max NEVER runs as one global window —
    * it decomposes two-level over arrival buckets exactly like
    * [[graft.operators.Profiling.idGapsBucketed]]: a (type, bucket)-
    * PARTITIONED prefix max within each bucket, plus a prefix max over
    * the bounded per-bucket summary (the only unpartitioned-per-type
    * window reads ≤|buckets| rows), and the two combine row-locally.
    * The quantile ladder is [[graft.operators.Profiling.exactQuantiles]]
    * over the lateness values (distinct-value weight table — at
    * petabyte disorder cardinality swap the approx sibling, the x98
    * anchor rule). The ORACLE runs the DIRECT one-window spelling —
    * a hash match proves the bucket decomposition is
    * semantics-preserving (the x161/x170 proof pattern).
    *
    * @return (grp, q_permille, value) — lateness micros per type and
    *         quantile, ordered ([[graft.operators.Profiling.exactQuantiles]]'s
    *         shape). */
  def latenessProfile(events: DataFrame, bucketWidth: Long = 10000L,
                      qsPermille: Seq[Long] = Seq(500L, 900L, 990L, 1000L),
                      typeCol: String = "event_type", tsCol: String = "ts",
                      arrivalCol: String = "event_id",
                      approx: Boolean = false): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth ($bucketWidth) must be > 0")
    val base = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull &&
        col(arrivalCol).isNotNull)
      .select(col(typeCol).as("t"), expr(s"unix_micros($tsCol)").as("e"),
        col(arrivalCol).cast("long").as("a"))
      .withColumn("b", expr(s"a div ${bucketWidth}L"))
    val inBucket = Window.partitionBy("t", "b").orderBy("a")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val acrossBuckets = Window.partitionBy("t").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val summary = base.groupBy("t", "b").agg(max("e").as("__bm"))
      .withColumn("__pm", max("__bm").over(acrossBuckets))
      .select("t", "b", "__pm")
    val late = base
      .withColumn("__in", max("e").over(inBucket))
      .join(summary, Seq("t", "b"))
      // __in includes the current row, so the running max ≥ e and
      // lateness is never negative
      .select(col("t"),
        (greatest(col("__in"), coalesce(col("__pm"), col("__in"))) - col("e"))
          .as("lateness_us"))
    // approx = the documented 100 TB swap: the lateness_us distinct-
    // value table can approach |events| (micro-resolution values), so
    // the ladder comes from the percentile_approx sibling instead —
    // engine-specific estimates, rows-only checkable; the exact form
    // stays the oracle anchor (x196)
    if (approx) Profiling.exactQuantilesApprox(late, "t", "lateness_us", qsPermille)
    else Profiling.exactQuantiles(late, "t", "lateness_us", qsPermille)
  }

  /** DUPLICATE-ARRIVAL gap profile — the measurement that SIZES a
    * streaming dedup state window: when the same logical event (same
    * identity tuple) arrives more than once, how far apart do the
    * re-arrivals land? Each consecutive re-arrival gap is bucketed on
    * a fixed operational ladder (≤1 s, ≤10 s, ≤1 min, ≤10 min, ≤1 h,
    * ≤1 d, >1 d) and reported with its cumulative share — "a 10-minute
    * dedup window catches cum_ppm of re-deliveries" read directly off
    * the row, which is the watermark/TTL decision
    * [[graft.streaming.EventStreams]]' history dedup and
    * [[latenessProfile]]'s watermark sizing bracket from either side.
    *
    * Exact: gaps in integer microseconds, a CASE ladder (half-open,
    * upper-inclusive bounds), integer ppm of the gap total; the
    * identity tuple is the caller's `keyCols` — equality semantics,
    * NULLs excluded (an unkeyable event has no re-arrival identity).
    *
    * Scale shape: one lag window PARTITIONED by the identity tuple
    * (key-parallel, never global), then a map-side-combined
    * 7-row-bounded aggregation; the cumulative window runs over the
    * bounded bucket table (x126 discipline).
    *
    * @return (bucket, gap_le_us, n_gaps, share_ppm, cum_ppm) ordered
    *         by bucket; gap_le_us is the bucket's inclusive upper
    *         bound in µs (NULL for the open top bucket). */
  def dupArrivalProfile(events: DataFrame,
                        keyCols: Seq[String] = Seq("user_id", "event_type", "value"),
                        tsCol: String = "ts"): DataFrame = {
    require(keyCols.nonEmpty, "dupArrivalProfile needs at least one key column")
    import org.apache.spark.sql.expressions.Window
    val keyed = events
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) && col(tsCol).isNotNull)
      .select(keyCols.map(col) :+
        unix_micros(col(tsCol).cast("timestamp")).as("__us"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy("__us")
    val gaps = keyed
      .withColumn("__prev", lag("__us", 1).over(w))
      .filter(col("__prev").isNotNull)
      .select((col("__us") - col("__prev")).as("gap_us"))
    val bounds = Seq(1000000L, 10000000L, 60000000L, 600000000L,
      3600000000L, 86400000000L)
    val bucket = bounds.zipWithIndex.foldRight(lit(bounds.size.toLong)) {
      case ((b, i), acc) => when(col("gap_us") <= b, i.toLong).otherwise(acc)
    }
    val wc = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gaps.select(bucket.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_gaps"))
      .withColumn("__tot", sum("n_gaps").over(Window.partitionBy(lit(1))))
      .withColumn("__cum", sum("n_gaps").over(wc))
      .select(col("bucket"),
        bounds.zipWithIndex.foldRight(lit(null).cast("long")) {
          case ((b, i), acc) =>
            when(col("bucket") === i.toLong, b).otherwise(acc)
        }.as("gap_le_us"),
        col("n_gaps"),
        expr("(n_gaps * 1000000) div __tot").as("share_ppm"),
        expr("(__cum * 1000000) div __tot").as("cum_ppm"))
      .orderBy("bucket")
  }
  /** ARRIVAL-ORDER integrity audit — does the feed deliver events in
    * time order? Per user: events whose timestamp steps BACKWARD
    * relative to the previous event in arrival order (event_id — the
    * producer sequence), the worst backstep, and the backstep rate.
    * The measurement that decides whether downstream operators may
    * assume in-order delivery (the streaming twins' watermark and
    * state-TTL settings both price reordering; [[latenessProfile]]
    * reads lateness against a WINDOW, this reads disorder against the
    * producer's own sequence). A backstep rate of 0 certifies the
    * feed; a heavy tail says "buffer and re-sort before sessionizing".
    *
    * Shape: ONE lag window PARTITIONED by user (never global) over
    * (user, event_id, ts_us) projections; one user-keyed map-side
    * aggregation follows. Exact integers; users with a single event
    * report zero steps, never NULLs.
    *
    * @return (user_id, n_events, n_backsteps, max_backstep_us,
    *         backstep_ppm) ordered by user_id. */
  def arrivalIntegrity(events: DataFrame): DataFrame = {
    val keyed = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("__us"))
    val w = Window.partitionBy("user_id").orderBy("event_id")
    keyed
      .withColumn("__prev", lag("__us", 1).over(w))
      .select(col("user_id"),
        when(col("__prev").isNotNull && col("__us") < col("__prev"),
          col("__prev") - col("__us")).as("__back"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(col("__back")).as("n_backsteps"),
        coalesce(max("__back"), lit(0L)).as("max_backstep_us"))
      .select(col("user_id"), col("n_events"), col("n_backsteps"),
        col("max_backstep_us"),
        expr("(n_backsteps * 1000000) div n_events").as("backstep_ppm"))
      .orderBy("user_id")
  }

  /** Watermark-delay drop curve — the MEASURED basis for the one
    * number every Structured Streaming deployment must pick:
    * [[latenessProfile]] shows the lateness distribution,
    * [[arrivalIntegrity]] flags who delivers out of order; this prices
    * the CHOICE — per candidate delay, how many events a watermark
    * that tight would drop. Lateness of an event is the high-water
    * mark of its key's earlier ARRIVALS (producer order = event_id,
    * the x242 convention) minus its own event time — the per-key
    * deterministic analog of the engine's global watermark; an event
    * is dropped at delay d iff lateness > d.
    *
    * ONE (user_id, event_id) window computes every event's lateness,
    * every candidate delay reads the same column, and the whole curve
    * folds to ONE aggregate row unpivoted to |delays| rows — adding a
    * candidate delay costs one more sum, never another pass.
    *
    * @return (delay_us, n_events, n_dropped, drop_ppm), ordered by
    *         delay_us. */
  def watermarkCurve(events: DataFrame,
                     delaysUs: Seq[Long] = Seq(0L, 60000000L, 300000000L,
                       3600000000L)): DataFrame = {
    require(delaysUs.nonEmpty && delaysUs == delaysUs.sorted
      && delaysUs.distinct == delaysUs && delaysUs.head >= 0,
      s"delaysUs ($delaysUs) must be non-empty, sorted, distinct, >= 0")
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val lat = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("__us"))
      .withColumn("__wm", max("__us").over(w))
      .select(greatest(coalesce(col("__wm") - col("__us"), lit(0L)), lit(0L))
        .as("__late"))
    val oneRow = lat.agg(count(lit(1)).as("n"),
      delaysUs.zipWithIndex.map { case (d, i) =>
        sum(when(col("__late") > lit(d), 1L).otherwise(0L)).as(s"dr$i") }: _*)
    val stacked = delaysUs.zipWithIndex.map { case (d, i) =>
      s"${d}L, n, dr$i, case when n = 0 then null " +
        s"else (dr$i * 1000000) div n end" }.mkString(", ")
    oneRow.select(expr(s"stack(${delaysUs.size}, $stacked) " +
        "AS (delay_us, n_events, n_dropped, drop_ppm)"))
      .orderBy("delay_us")
  }

  /** Per-entity ROLLING MEDIAN over the last `window` events — the
    * robust rolling statistic ops dashboards want where a rolling MEAN
    * is one outlier away from useless (latency p50 per user, spend per
    * account). Median convention: the LOWER middle value of the sorted
    * frame (element ⌈n/2⌉, 1-based) — DuckDB's `quantile_disc(0.5)`
    * convention, so the oracle replays it natively.
    *
    * Scale shape: the window partitions by user (high-cardinality —
    * never a global or low-cardinality window) with a ROWS frame
    * bounded at `window`, so each row's collect+sort is O(window log
    * window) row-LOCAL work and state per open frame is `window`
    * longs; values ride the scan as exact integer cents. At 100 TB
    * this is one user-keyed shuffle — the same shape as [[sessionize]].
    *
    * @return (event_id, user_id, n_window, med_cents), event-ordered. */
  def rollingMedian(events: DataFrame, window: Int = 9): DataFrame = {
    require(window >= 1, s"window ($window) must be >= 1")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(-(window - 1), 0)
    events
      .filter(col("value").isNotNull && col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts_ns"),
        graft.queries.Relational.cents(col("value")).as("__v"))
      .withColumn("__vals", collect_list("__v").over(w))
      .select(col("event_id"), col("user_id"),
        size(col("__vals")).cast("long").as("n_window"),
        expr("element_at(array_sort(__vals), " +
          "CAST((size(__vals) + 1) div 2 AS INT))").as("med_cents"))
      .orderBy("event_id")
  }
}
