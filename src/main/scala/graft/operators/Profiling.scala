package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the first thing run against any new corpus
  * drop: per-column row/null/distinct counts as one queryable frame.
  * Mirrors the reference's validation stage (etl_connector.py checks
  * envelope shape and field presence before loading) generalized to
  * whole-corpus statistics.
  */
object Profiling {

  /** Per-column profile: (col_name, n_rows, n_null, n_distinct),
    * one row per requested column.
    *
    * ONE aggregation pass over the data: all 3·|cols| aggregates run
    * in a single `agg` (Spark plans the multi-distinct via one Expand
    * + one shuffle — |cols|+1 duplicated streams, not |cols| scans),
    * then the 1-row result is unpivoted driver-free with
    * explode(array(struct…)). Exact distinct counts keep the result
    * oracle-comparable; at 100 TB flip `approx = true` and the Expand
    * collapses to plain partial HLL sketches — same output shape,
    * rows-only checkable (sketch estimates are engine-specific).
    *
    * COUNT(DISTINCT c) excludes nulls in every engine — n_null and
    * n_distinct are independent facts, not complements. */
  def profile(df: DataFrame, cols: Seq[String],
              approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        (if (approx) approx_count_distinct(col(c)) else countDistinct(col(c)))
          .as(s"__d_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"__n_$c").as("n_rows"),
      (col(s"__n_$c") - col(s"__nn_$c")).as("n_null"),
      col(s"__d_$c").as("n_distinct")))
    one.select(explode(array(stacked: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** Fixed-range integer histogram of a numeric column: `nbins` equal
    * bins over [lo, hi), out-of-range values CLAMPED into the edge
    * bins (width_bucket's under/overflow buckets folded inward — the
    * profiling convention where extreme values should be visible, not
    * dropped). Bin assignment is pure integer arithmetic
    * (`(v−lo)·nbins div (hi−lo)`, clamped) — exact in any engine.
    * Empty bins are absent from the output (a corpus histogram at
    * 100 TB has no empty bins worth materializing).
    *
    * One aggregation pass; the shuffle carries ≤ nbins rows per task
    * after map-side combine. Nulls are excluded (count them via
    * [[profile]]). `(v−lo)·nbins` must fit a long — range-reduce
    * first for astronomically-scaled values.
    *
    * @return (bin, n) ordered by bin. */
  def histogram(df: DataFrame, valueCol: String, lo: Long, hi: Long,
                nbins: Int): DataFrame = {
    require(hi > lo, s"hi ($hi) must be > lo ($lo)")
    require(nbins >= 1 && nbins <= (1 << 20), s"nbins ($nbins) out of range")
    val v = col(valueCol).cast("long")
    df.filter(v.isNotNull)
      .groupBy(binCol(valueCol, lo, hi, nbins).as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }

  /** `div` (integral division) only exists as a SQL operator; negative
    * numerators divide differently across engines (trunc vs floor) but
    * the clamp folds both into bin 0, so the assignment is engine-exact. */
  private def binCol(valueCol: String, lo: Long, hi: Long, nbins: Int) =
    least(greatest(
      expr(s"(CAST($valueCol AS BIGINT) - ${lo}L) * ${nbins}L div ${hi - lo}L"),
      lit(0L)), lit(nbins - 1L))

  /** Population-stability-index drift between two corpus snapshots —
    * THE standard "did this drop shift the distribution?" gate run
    * before a new crawl enters training. Both frames are binned with
    * [[histogram]]'s clamped integer rule, add-one smoothed over the
    * FULL `nbins` support (so empty bins are well-defined and the
    * index is finite without an arbitrary ε), and each bin reports its
    * signed PSI contribution: (p_b − p_n)·ln(p_b/p_n) with
    * p = (count+1)/(total+nbins). Σ psi over bins is the headline
    * index (rule of thumb: <0.10 stable, 0.10–0.25 drifting, >0.25
    * shifted); per-bin rows show WHERE the mass moved, which the
    * scalar hides.
    *
    * Scale shape: one narrow map + aggregation pass per side (map-side
    * combine; the shuffle carries ≤ nbins rows per task), then all
    * arithmetic runs on the ≤ nbins-row bin table — the spine join,
    * totals cross-join, and ln live entirely on driver-sized frames.
    * Nothing data-scale ever joins or re-shuffles.
    *
    * Oracle parity: bin assignment is exact integer arithmetic; ln is
    * taken over a single ratio of exact integer products (counts and
    * totals — exact in doubles below 2⁵³, so range-reduce first at
    * extreme scale), p-differences are single IEEE divisions and one
    * subtraction, and the result is floor-rounded to micronats — the
    * x51/x77 cross-engine ln discipline, with only ONE ln per output
    * value (no summation-order ulps at all).
    *
    * @return (bin, n_base, n_next, psi_micronats), all nbins bins
    *         present, ordered by bin. */
  def psiDrift(base: DataFrame, next: DataFrame, valueCol: String,
               lo: Long, hi: Long, nbins: Int): DataFrame = {
    require(hi > lo, s"hi ($hi) must be > lo ($lo)")
    require(nbins >= 1 && nbins <= (1 << 20), s"nbins ($nbins) out of range")
    val v = col(valueCol).cast("long")
    def binned(df: DataFrame, side: Int) =
      df.filter(v.isNotNull)
        .select(binCol(valueCol, lo, hi, nbins).as("bin"), lit(side).as("side"))
    val counts = binned(base, 0).unionByName(binned(next, 1))
      .groupBy("bin")
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_base"),
           sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_next"))
    val spine = base.sparkSession.range(nbins).toDF("bin")
    val full = spine.join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("n_base", "n_next"))
    val tot = full.agg(sum("n_base").as("tot_base"), sum("n_next").as("tot_next"))
    val k = lit(nbins.toLong)
    val pBase = (col("n_base") + lit(1L)) / (col("tot_base") + k)
    val pNext = (col("n_next") + lit(1L)) / (col("tot_next") + k)
    val lnRatio = log(
      ((col("n_base") + lit(1L)) * (col("tot_next") + k)).cast("double") /
      ((col("n_next") + lit(1L)) * (col("tot_base") + k)).cast("double"))
    full.crossJoin(tot)
      .select(col("bin"), col("n_base"), col("n_next"),
        floor((pBase - pNext) * lnRatio * lit(1e6) + lit(0.5))
          .cast("long").as("psi_micronats"))
      .orderBy("bin")
  }
}
