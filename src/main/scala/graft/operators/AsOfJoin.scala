package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join: for each left row, attach the most recent right
  * row (same key) whose time is ≤ the left row's time.
  *
  * Implementation is the union-sort-window trick, the scalable shape
  * for temporal alignment:
  *   1. tag both sides, union on (key, time, tag, payload-struct),
  *   2. ONE hash shuffle on the key, sort within partition by
  *      (time, tag, tiebreak) — right rows sort before left rows at
  *      equal time so equality means "≤",
  *   3. `last(payload_struct, ignoreNulls)` over an unbounded-preceding
  *      window carries the latest right row forward (one struct, so all
  *      payload columns come from the SAME right row),
  *   4. keep the left rows, expand the struct.
  *
  * Cost: one shuffle + one sort, O(n log n) per key group — no
  * range-join explosion, no per-row binary search; skew is handled by
  * AQE like any other keyed shuffle. A naive
  * `l JOIN r ON key AND r.t <= l.t` + max() is quadratic in dense keys
  * and collapses at 100 TB; this shape does not.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param key        equi key column name present on both sides
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right — MUST have the
    *                   same type as leftTime (no implicit coercion)
    * @param rightCols  right payload columns to attach (all null when
    *                   no right row is at or before the left time)
    * @param tieBreak   right-side tiebreak column for identical times —
    *                   highest wins (mirrors "latest write wins")
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String], tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("__t", "__side", "__tb", "__payload", "__m")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"input columns may not use the reserved names ${reserved.mkString(", ")}")
    tieBreak.foreach { tb =>
      import org.apache.spark.sql.types._
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
    val payload = struct(rightCols.map(col): _*)

    // equi-join semantics: NULL keys never match (partitionBy would
    // otherwise group all nulls together and pair them up). Null-key
    // left rows bypass the window and come back with null payload.
    val (leftKeyed, leftNullKey) =
      (left.filter(col(key).isNotNull), left.filter(col(key).isNull))
    val rightKeyed = right.filter(col(key).isNotNull)

    val l = leftKeyed
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts after right at equal t
      .withColumn("__tb", lit(Long.MaxValue))
      .withColumn("__payload",
        lit(null).cast(right.select(payload.as("p")).schema("p").dataType))

    val r = rightKeyed
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tb", tieBreak.map(c => col(c).cast("long")).getOrElse(lit(0L)))
      .withColumn("__payload", payload)
      .select(Seq(col(key), col("__t"), col("__side"), col("__tb"), col("__payload")) ++
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val unioned = l.select(
      Seq(col(key), col("__t"), col("__side"), col("__tb"), col("__payload")) ++
        leftCols.filterNot(_ == key).map(col): _*)
      .unionByName(r)

    val matched = unioned
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__m.$c").as(c)): _*)
    matched.unionByName(
      leftNullKey.select(leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*))
  }
}
