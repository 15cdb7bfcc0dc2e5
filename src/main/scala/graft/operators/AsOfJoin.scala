package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** As-of joins: for each left row, attach one right row (same key)
  * chosen by temporal proximity —
  *  - [[backward]]: the most recent right row with time ≤ left time,
  *  - [[forward]]:  the earliest right row with time ≥ left time,
  *  - [[nearest]]:  whichever of the two is closer (ties → backward).
  *
  * Implementation is the union-sort-window trick, the scalable shape
  * for temporal alignment:
  *   1. tag both sides, union on (key, time, tag, payload-struct),
  *   2. ONE hash shuffle on the key, sort within partition by
  *      (time, tag, tiebreak) — sides ordered so that equal times fall
  *      inside the matching frame,
  *   3. a frame-bounded window aggregate (`last`/`first`/`max_by`/
  *      `min_by` with ignored-null left rows) carries the chosen right
  *      row's payload struct to each left row (one struct, so all
  *      payload columns come from the SAME right row),
  *   4. keep the left rows, expand the struct.
  *
  * Cost: one shuffle + one sort, O(n log n) per key group — no
  * range-join explosion, no per-row binary search; skew is handled by
  * AQE like any other keyed shuffle. [[nearest]] computes BOTH
  * direction champions in the same single sorted pass (two frames over
  * one window ordering) and picks per row — still one shuffle. A naive
  * `l JOIN r ON key AND r.t <= l.t` + max() is quadratic in dense keys
  * and collapses at 100 TB; this shape does not.
  */
object AsOfJoin {

  private val Reserved =
    Seq("__t", "__tn", "__side", "__tb", "__payload", "__m", "__bw", "__fw")

  private def validate(left: DataFrame, right: DataFrame,
                       tieBreak: Option[String]): Unit = {
    require(!(left.columns ++ right.columns).exists(Reserved.contains),
      s"input columns may not use the reserved names ${Reserved.mkString(", ")}")
    tieBreak.foreach { tb =>
      val dt = right.schema(tb).dataType
      val exactLong = dt match {
        case ByteType | ShortType | IntegerType | LongType => true
        // scale-0 decimals are exact sequence numbers; precision ≤ 18
        // guarantees every value fits a long, so the cast is lossless
        case d: DecimalType if d.scale == 0 && d.precision <= 18 => true
        case _ => false
      }
      require(exactLong,
        s"tieBreak column '$tb' must be an integral type (byte/short/int/long) " +
          s"or DECIMAL(≤18, 0), got $dt — casting fractional values to long " +
          "collapses distinct tiebreaks (2.9 and 2.1 both become 2), making " +
          "highest-wins nondeterministic among the collapsed ties")
    }
  }

  /** Time as an exactly-ordered numeric for distance math: temporal
    * types to epoch micros, integral types kept as long (a double would
    * round ns-scale epochs above 2^53), fractional types to double. */
  private def timeAsNum(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => unix_micros(c.cast("timestamp"))
    case DateType => unix_micros(c.cast("timestamp"))
    case ByteType | ShortType | IntegerType | LongType => c.cast("long")
    case _: NumericType => c.cast("double")
    case other => throw new IllegalArgumentException(
      s"as-of time column must be temporal or numeric, got $other")
  }

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param key        equi key column name present on both sides
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right — MUST have the
    *                   same type as leftTime (no implicit coercion)
    * @param rightCols  right payload columns to attach (all null when
    *                   no right row qualifies)
    * @param tieBreak   right-side tiebreak column for identical times —
    *                   highest wins (mirrors "latest write wins")
    * @param tolerance  max |right time − left time| for a match, in the
    *                   time column's exact numeric units (epoch MICROS
    *                   for timestamp/date times, the raw value for
    *                   numeric times — see [[timeAsNum]]); matches
    *                   farther away come back as null payload. None =
    *                   unbounded (the classic as-of).
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String], tieBreak: Option[String] = None,
               tolerance: Option[Long] = None): DataFrame =
    directional(left, right, key, leftTime, rightTime, rightCols, tieBreak,
      tolerance, isBackward = true)

  /** Forward as-of: earliest right row with time ≥ the left time —
    * the exact time-mirror of [[backward]], including the tie rule
    * (identical right times resolved by highest tieBreak). */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              rightCols: Seq[String], tieBreak: Option[String] = None,
              tolerance: Option[Long] = None): DataFrame =
    directional(left, right, key, leftTime, rightTime, rightCols, tieBreak,
      tolerance, isBackward = false)

  /** Tagged union scaffold shared by every direction: split out left
    * rows that can never match — NULL key (equi semantics) or NULL
    * time (t ⋚ NULL is unknowable, and the window's NULLS-FIRST sort
    * would otherwise treat them as "earliest" and hand them a real
    * match) — and drop right rows with NULL key/time for the same
    * reason; tag sides and union on the shared
    * (key, __t, __side, __tb, __payload, left…) shape. Left rows get
    * __tb 0: sides never tie on it because __side separates them at
    * equal __t. */
  private case class Tagged(unioned: DataFrame, leftDegenerate: DataFrame,
                            leftCols: Seq[String])

  private def tagAndUnion(left: DataFrame, right: DataFrame, key: String,
                          leftTime: String, rightTime: String, payload: Column,
                          leftSide: Int, tieBreak: Option[String]): Tagged = {
    val leftCols = left.columns.toSeq
    val leftLive = left.filter(col(key).isNotNull && col(leftTime).isNotNull)
    val leftDegenerate = left.filter(col(key).isNull || col(leftTime).isNull)
    val rightLive = right.filter(col(key).isNotNull && col(rightTime).isNotNull)
    val payloadType = right.select(payload.as("p")).schema("p").dataType
    val l = leftLive
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(leftSide))
      .withColumn("__tb", lit(0L))
      .withColumn("__payload", lit(null).cast(payloadType))
      .select(Seq(col(key), col("__t"), col("__side"), col("__tb"), col("__payload")) ++
        leftCols.filterNot(_ == key).map(col): _*)
    val r = rightLive
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(1 - leftSide))
      .withColumn("__tb", tieBreak.map(c => col(c).cast("long")).getOrElse(lit(0L)))
      .withColumn("__payload", payload)
      .select(Seq(col(key), col("__t"), col("__side"), col("__tb"), col("__payload")) ++
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    Tagged(l.unionByName(r), leftDegenerate, leftCols)
  }

  /** Degenerate left rows re-enter the result with all-null payload. */
  private def nullPayloadFor(df: DataFrame, leftCols: Seq[String],
                             right: DataFrame, rightCols: Seq[String]): DataFrame =
    df.select(leftCols.map(col) ++
      rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)

  private def directional(left: DataFrame, right: DataFrame, key: String,
                          leftTime: String, rightTime: String,
                          rightCols: Seq[String], tieBreak: Option[String],
                          tolerance: Option[Long],
                          isBackward: Boolean): DataFrame = {
    validate(left, right, tieBreak)
    val timeType = right.schema(rightTime).dataType
    tolerance.foreach { t =>
      require(t >= 0, s"tolerance ($t) must be >= 0")
      require(left.schema(leftTime).dataType == timeType,
        s"tolerance needs matching leftTime/rightTime types, got " +
          s"${left.schema(leftTime).dataType} vs $timeType")
    }
    // the payload carries the right time's exact numeric only when a
    // tolerance bound must be checked after the window pass
    val payload = struct(rightCols.map(col) ++
      tolerance.map(_ => timeAsNum(col(rightTime), timeType).as("__tn")): _*)

    // side tags order equal times INTO the frame: backward's frame ends
    // at the left row, so right sorts first (≤ includes equality);
    // forward's frame starts at the left row, so left sorts first
    val leftSide = if (isBackward) 1 else 0
    val tg = tagAndUnion(left, right, key, leftTime, rightTime, payload,
      leftSide, tieBreak)

    // backward: latest right at-or-before → last() over the preceding
    // frame, __tb ascending so the highest tiebreak is last at equal t.
    // forward: the same shape over the TIME-REVERSED sort — NOT a
    // (currentRow, unboundedFollowing) frame: Spark's unbounded-
    // FOLLOWING frame re-aggregates from each row to the partition end
    // (O(n²) per key group), while the unbounded-PRECEDING frame is the
    // O(n) incremental path. Reversing the sort (__t desc, __side desc
    // so equal-time right rows still precede the left row, __tb asc so
    // the highest tiebreak is last) makes "earliest at-or-after" ≡
    // "last over the preceding frame".
    val (w, matchExpr) =
      if (isBackward) (
        Window.partitionBy(col(key))
          .orderBy(col("__t"), col("__side"), col("__tb"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow),
        (c: Column) => last(c, ignoreNulls = true))
      else (
        Window.partitionBy(col(key))
          .orderBy(col("__t").desc, col("__side").desc, col("__tb"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow),
        (c: Column) => last(c, ignoreNulls = true))

    val pick: String => Column = tolerance match {
      case Some(t) =>
        val inRange = col("__m").isNotNull &&
          abs(timeAsNum(col("__t"), timeType) - col("__m.__tn")) <= lit(t)
        c => when(inRange, col(s"__m.$c"))
          .otherwise(lit(null).cast(right.schema(c).dataType)).as(c)
      case None => c => col(s"__m.$c").as(c)
    }
    val matched = tg.unioned
      .withColumn("__m", matchExpr(col("__payload")).over(w))
      .filter(col("__side") === leftSide)
      .select(tg.leftCols.map(col) ++ rightCols.map(pick): _*)
    matched.unionByName(nullPayloadFor(tg.leftDegenerate, tg.leftCols, right, rightCols))
  }

  /** Nearest as-of: the right row minimizing |right time − left time|;
    * equal distances prefer the backward (at-or-before) match, and
    * identical right times within a side resolve by highest tieBreak —
    * consistent with [[backward]]/[[forward]].
    *
    * ONE shuffle for both directions: the backward champion is
    * `max_by(payload, (t, tb))` over the ascending sort's preceding
    * frame (latest ≤, highest tb), and the forward champion is
    * `last(payload)` over the TIME-REVERSED sort's preceding frame
    * (earliest >, highest tb) — two in-partition sorts, but never an
    * unbounded-FOLLOWING frame, which Spark evaluates by re-scanning
    * to the partition end for every row (O(n²) per key group) where
    * the preceding frame is the O(n) incremental path. Left rows carry
    * a NULL ordering struct / payload, which the aggregates skip. Both
    * frames exclude equal-time right rows from the forward side (they
    * sort on the backward side of the left row in each ordering), but
    * those are distance 0 on the backward side, which wins ties
    * anyway — semantics are unaffected.
    *
    * Distance math runs on exact numerics (epoch micros for temporal
    * types, long for integral) — see [[timeAsNum]]; `tolerance` bounds
    * the accepted distance in those units (same contract as
    * [[backward]]/[[forward]]). */
  def nearest(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              rightCols: Seq[String], tieBreak: Option[String] = None,
              tolerance: Option[Long] = None): DataFrame = {
    validate(left, right, tieBreak)
    tolerance.foreach(t => require(t >= 0, s"tolerance ($t) must be >= 0"))
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      s"leftTime/rightTime types must match, got " +
        s"${left.schema(leftTime).dataType} vs ${right.schema(rightTime).dataType}")
    val timeType = right.schema(rightTime).dataType
    // payload always carries the right time's numeric: the champion
    // choice itself is a distance comparison
    val payload = struct(
      rightCols.map(col) :+ timeAsNum(col(rightTime), timeType).as("__tn"): _*)
    val tg = tagAndUnion(left, right, key, leftTime, rightTime, payload,
      leftSide = 1, tieBreak)

    val wPrev = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward champions ride the time-reversed sort's preceding frame:
    // __side desc keeps equal-time right rows (side 0) AFTER the left
    // row (side 1) — out of the frame, as in the ascending spelling —
    // and __tb asc puts the highest tiebreak last, where last() finds it
    val wRev = Window.partitionBy(col(key))
      .orderBy(col("__t").desc, col("__side").desc, col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ordering struct is NULL on left rows — max_by skips them
    val bwOrd = when(col("__side") === 0,
      struct(col("__payload.__tn"), col("__tb"))).otherwise(lit(null))

    val lnum = timeAsNum(col("__t"), timeType)
    val choose =
      when(col("__fw").isNull, col("__bw"))
        .when(col("__bw").isNull, col("__fw"))
        .when(lnum - col("__bw.__tn") <= col("__fw.__tn") - lnum, col("__bw"))
        .otherwise(col("__fw"))
    val bounded = tolerance match {
      case Some(t) => when(abs(lnum - col("__m.__tn")) <= lit(t), col("__m"))
      case None => col("__m")
    }
    val chosen = tg.unioned
      .withColumn("__bw", max_by(col("__payload"), bwOrd).over(wPrev))
      .withColumn("__fw", last(col("__payload"), ignoreNulls = true).over(wRev))
      .filter(col("__side") === 1)
      .withColumn("__m", choose)
      .withColumn("__m", bounded)
      .select(tg.leftCols.map(col) ++
        rightCols.map(c => col(s"__m.$c").as(c)): _*)
    chosen.unionByName(nullPayloadFor(tg.leftDegenerate, tg.leftCols, right, rightCols))
  }

  /** As-of MATCH-RATE audit — the coverage check run before an as-of
    * enrichment ships: of all left rows, how many found a backward
    * match within `tolerance`? An attribution join quietly matching
    * 12% of purchases is a bug report (wrong key, wrong clock unit,
    * too-tight tolerance), not a feature table — and the ppm number is
    * what distinguishes "sparse by nature" from "broken", BEFORE the
    * nulls propagate into training data. `probe` names a never-null
    * right column (an id); its null-ness after the join IS the
    * unmatched marker.
    *
    * Cost: the [[backward]] one-shuffle union-window shape plus a
    * 1-row aggregate; integer ppm.
    *
    * @return one row (n_left, n_matched, n_unmatched, match_ppm);
    *         match_ppm NULL on an empty left side. */
  def matchRateReport(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String, probe: String,
                      tolerance: Option[Long] = None): DataFrame =
    backward(left, right, key, leftTime, rightTime, Seq(probe),
      tieBreak = None, tolerance = tolerance)
      .agg(count(lit(1)).as("n_left"),
        sum(when(col(probe).isNotNull, 1L).otherwise(0L)).as("n_matched"))
      .select(col("n_left"), col("n_matched"),
        (col("n_left") - col("n_matched")).as("n_unmatched"),
        when(col("n_left") === 0L, lit(null).cast("long"))
          .otherwise(expr("(n_matched * 1000000) div n_left"))
          .as("match_ppm"))

  /** Staleness ladder on the [[backward]] join — [[matchRateReport]]
    * says HOW OFTEN a left row finds a match; this says HOW OLD the
    * matches are: per age bucket (age = left time − matched right
    * time, bucketed by a day ladder), the row count and share. The
    * freshness read behind a tolerance decision — "92% of matches are
    * under a day old, the 90-day tail is 3‰" prices what a `tolerance`
    * cut would actually drop. Bucket −1 collects unmatched left rows,
    * so the ladder partitions ALL of the left side.
    *
    * Rides the as-of join unchanged and folds to a ≤|bounds|+2-row
    * histogram (map-side-combined) crossed with its own 1-row total —
    * nothing beyond the join shuffles at data scale.
    *
    * @param unitsPerDay time-unit scale of both time columns
    *                    (default: nanoseconds).
    * @return (bucket, n_rows, share_permille) where bucket i means
    *         age_days < boundsDays(i), |bounds| means ≥ the last
    *         bound, −1 unmatched; ordered by bucket; only observed
    *         buckets appear. */
  def stalenessLadder(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      tieBreak: Option[String] = None,
                      unitsPerDay: Long = 86400L * 1000000000L,
                      boundsDays: Seq[Long] = Seq(1L, 7L, 30L, 90L)): DataFrame = {
    require(unitsPerDay >= 1, s"unitsPerDay ($unitsPerDay) must be >= 1")
    require(boundsDays.nonEmpty && boundsDays == boundsDays.sorted
      && boundsDays.distinct == boundsDays,
      s"boundsDays ($boundsDays) must be non-empty, sorted, distinct")
    val r = right.withColumn("__rt", col(rightTime))
    val ageDays = expr(s"($leftTime - __rt) div $unitsPerDay")
    val bucket = when(col("__rt").isNull, lit(-1L)).otherwise(
      boundsDays.zipWithIndex.foldRight(lit(boundsDays.size.toLong): Column) {
        case ((b, i), acc) => when(ageDays < lit(b), lit(i.toLong)).otherwise(acc)
      })
    val hist = backward(left, r, key, leftTime, rightTime, Seq("__rt"), tieBreak)
      .select(bucket.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
    hist.crossJoin(broadcast(hist.agg(sum("n_rows").as("__tot"))))
      .select(col("bucket"), col("n_rows"),
        expr("(n_rows * 1000) div __tot").as("share_permille"))
      .orderBy("bucket")
  }
}
