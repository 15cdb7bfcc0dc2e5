package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, minimize both axes) — "no other row
  * is at least as good on both dimensions and better on one": the
  * price-vs-latency / cost-vs-quality tradeoff curve every
  * multi-objective report reads (Börzsönyi et al., ICDE 2001). The
  * naive spelling is a NOT EXISTS self-theta-join — O(n²) and
  * unshippable at scale; this is the sort-free two-level decomposition
  * (the x126 bucketed-window pattern applied to dominance).
  */
object Skyline {

  /** Frontier of MINIMIZING (x, y) over distinct points.
    *
    * Dominance reduction, exact: (1) among equal x only the minimal y
    * can survive (anything else is y-dominated by it) → one groupBy;
    * (2) a representative (x, yx) survives iff every x' < x has
    * yx' > yx — i.e. yx is strictly below the running prefix-min of y
    * over the x-ascending order (ties in y die: the equal-y smaller-x
    * point dominates strictly in x).
    *
    * The prefix-min decomposes two-level so NO global data-scale sort
    * or window exists: within each x-bucket (`x div bucketWidth`) a
    * PARTITIONED window takes the strict prefix min; across buckets a
    * global window over the ≤|buckets|-row bucket-summary table takes
    * the earlier-buckets min (strict by construction — every x in an
    * earlier bucket is < every x in a later one). survive = y below
    * BOTH. The only global window reads the bounded bucket summary —
    * the [[graft.operators.Profiling.idGapsBucketed]] discipline.
    *
    * Output size is the frontier itself (≤ |distinct x|, typically
    * tiny); everything upstream is one groupBy + keyed windows.
    *
    * @return (x, y) frontier points, ordered by x (y strictly
    *         decreasing along it — the staircase). */
  def frontier2d(df: DataFrame, xCol: String, yCol: String,
                 bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth ($bucketWidth) must be > 0")
    val reps = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy("x").agg(min("y").as("y"))
      .withColumn("b", expr(s"x div ${bucketWidth}L"))
    val inBucket = Window.partitionBy("b").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val summary = reps.groupBy("b").agg(min("y").as("__bm"))
    val acrossBuckets = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withPrev = reps
      .withColumn("__pin", min("y").over(inBucket))
      .join(summary.withColumn("__pout", min("__bm").over(acrossBuckets))
        .select("b", "__pout"), Seq("b"))
    withPrev
      .filter(col("y") < least(
        coalesce(col("__pin"), lit(Long.MaxValue)),
        coalesce(col("__pout"), lit(Long.MaxValue))))
      .select(col("x").as(xCol), col("y").as(yCol))
      .orderBy(xCol)
  }
}
