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

  /** Interval-OVERLAP join: every (a, b) pair whose closed intervals
    * intersect (`a_lo ≤ b_hi AND b_lo ≤ a_hi`), with the intersection
    * bounds and length — [[banded]]'s two-sided generalization from
    * point-in-interval to interval×interval ("which sessions ran
    * during the incident window", machine-uptime × deploy windows,
    * concurrent-session detection). Spark would plan the raw predicate
    * as a nested loop; here BOTH sides explode to the fixed-width bins
    * their interval covers, meet in an ordinary equi-join on the bin,
    * collapse duplicates (an overlapping pair can share several bins
    * — unlike [[banded]]'s point side there is no unique meeting bin),
    * and verify the exact predicate (sharing a bin does NOT imply
    * overlap — each bin is wider than its residents).
    *
    * Cost: Σ span/w replicated rows per side, equi-hash-shuffled on
    * the bin; `binWidth` near the median interval span keeps the
    * replication factor O(1). Output is the true overlap set — if
    * everything overlaps everything the output is inherently
    * quadratic; keep one side selective (the incident windows, not a
    * second corpus). Bounds must be non-negative (`div` truncation ≡
    * floor only there — epoch micros qualify).
    *
    * @param a (a_id, a_lo, a_hi); b (b_id, b_lo, b_hi) — inclusive.
    * @return (a_id, b_id, overlap_lo, overlap_hi, overlap_len) ordered. */
  def intervalOverlap(a: DataFrame, b: DataFrame, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bins(df: DataFrame, lo: String, hi: String): DataFrame =
      df.filter(col(lo) <= col(hi))
        .withColumn("__bin", explode(sequence(
          expr(s"$lo div ${binWidth}L"), expr(s"$hi div ${binWidth}L"))))
    bins(a, "a_lo", "a_hi")
      .join(bins(b, "b_lo", "b_hi"), Seq("__bin"))
      .drop("__bin").distinct()
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select(col("a_id"), col("b_id"),
        greatest(col("a_lo"), col("b_lo")).as("overlap_lo"),
        least(col("a_hi"), col("b_hi")).as("overlap_hi"))
      .withColumn("overlap_len", col("overlap_hi") - col("overlap_lo"))
      .orderBy("a_id", "b_id")
  }
}
