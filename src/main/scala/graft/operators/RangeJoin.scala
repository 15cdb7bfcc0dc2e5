package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (binned) range join: `left.v BETWEEN right.lo AND right.hi`
  * without a nested-loop plan.
  *
  * Spark plans interval predicates as BroadcastNestedLoopJoin (small
  * side) or CartesianProduct (both large) — O(|L|·|R|) either way. The
  * banded form discretizes the value domain into fixed-width bins:
  *  - left row → its single bin  floor(v / w),
  *  - right row → every bin its interval [lo, hi] overlaps,
  * then an ordinary shuffled EQUI join on the bin plus the residual
  * `v BETWEEN lo AND hi` filter. Each matching pair meets in exactly
  * one bin (the bin containing v), so no dedup pass is needed.
  *
  * Cost: |L| + Σ interval_width/w join input rows, hash-shuffled —
  * the 100 TB-safe shape as long as `binWidth` is chosen near the
  * median interval width (too small → right-side replication blows up;
  * too large → residual filter does all the work).
  */
object RangeJoin {

  /** Inner banded range join.
    * @param leftVal  left value column name
    * @param lo,hi    right interval bound column names (inclusive)
    * @param binWidth bin width in value units (> 0)
    */
  def banded(left: DataFrame, right: DataFrame,
             leftVal: String, lo: String, hi: String,
             binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin",
      floor(col(leftVal).cast("double") / binWidth).cast("long"))
    val r = right
      // inverted intervals are empty, not a descending bin explosion
      // (sequence(start, stop) steps -1 when start > stop)
      .filter(col(lo) <= col(hi))
      .withColumn("__bin",
        explode(sequence(
          floor(col(lo).cast("double") / binWidth).cast("long"),
          floor(col(hi).cast("double") / binWidth).cast("long"))))
    l.join(r, Seq("__bin"))
      .filter(col(leftVal) >= col(lo) && col(leftVal) <= col(hi))
      .drop("__bin")
  }
}
