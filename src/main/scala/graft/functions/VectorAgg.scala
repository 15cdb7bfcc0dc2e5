package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY §2.3 "UDF / UDAF / UDTF"): element-wise
  * vector average as an `Aggregator[IN, BUF, OUT]`.
  *
  * Used for label centroids over the embeddings table and for feature
  * averaging in the multimodal pipeline. Catalyst plans it like any
  * aggregate: partial buffers merge map-side, the shuffle carries one
  * (sums, count) buffer per group per partition — at 100 TB the
  * network moves O(groups × dim) doubles, never the vectors.
  */
object VectorAgg {

  /** Per-ELEMENT counts, not one vector count: for ragged
    * (mixed-length) inputs — which reduce/merge deliberately accept —
    * an element absent from shorter vectors must average over only the
    * vectors that HAVE it, not be deflated as if the missing entries
    * were zeros. Fixed-dimension groups (the common case) behave
    * identically to a single count. */
  case class AvgBuf(sums: Array[Double], counts: Array[Long])

  class VectorAvg extends Aggregator[Array[Float], AvgBuf, Array[Double]] {
    override def zero: AvgBuf = AvgBuf(Array.emptyDoubleArray, Array.emptyLongArray)

    override def reduce(b: AvgBuf, v: Array[Float]): AvgBuf = {
      if (v == null) return b
      val n = math.max(b.sums.length, v.length)
      val sums = if (b.sums.length >= n) b.sums else java.util.Arrays.copyOf(b.sums, n)
      val counts = if (b.counts.length >= n) b.counts else java.util.Arrays.copyOf(b.counts, n)
      var i = 0
      while (i < v.length) { sums(i) += v(i); counts(i) += 1; i += 1 }
      AvgBuf(sums, counts)
    }

    override def merge(a: AvgBuf, b: AvgBuf): AvgBuf = {
      if (a.sums.isEmpty) return b
      if (b.sums.isEmpty) return a
      val (big, small) = if (a.sums.length >= b.sums.length) (a, b) else (b, a)
      val sums = big.sums.clone()
      val counts = big.counts.clone()
      var i = 0
      while (i < small.sums.length) {
        sums(i) += small.sums(i); counts(i) += small.counts(i); i += 1
      }
      AvgBuf(sums, counts)
    }

    override def finish(b: AvgBuf): Array[Double] =
      Array.tabulate(b.sums.length)(i =>
        if (b.counts(i) == 0) 0.0 else b.sums(i) / b.counts(i))

    override def bufferEncoder: Encoder[AvgBuf] = Encoders.product[AvgBuf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Moment buffer for [[VectorOuterSum]]: row count, per-dimension
    * sums, and the packed upper triangle of Σ x·xᵀ (row-major:
    * (i,j≥i) at offset i·(2d−i+1)/2 + (j−i)). */
  case class OuterBuf(n: Long, sums: Array[Double], outer: Array[Double])

  /** Σ x·xᵀ (upper triangle) + Σ x + n in ONE partial-aggregating
    * buffer — the 100 TB path for covariance/Gram matrices
    * ([[graft.operators.Similarity.covarianceMatrixAgg]]): instead of
    * materializing the n·d² chained-explode expansion, each partition
    * folds its rows into a single d(d+1)/2 + d + 1 doubles buffer and
    * the shuffle carries ONE buffer per partition. Same moments,
    * same milli-rounded covariance, no expansion.
    *
    * Inputs must share one dimension — a ragged vector fails fast
    * (covariance over mixed-dimension embeddings is meaningless, and
    * silently zero-padding would corrupt the moments). */
  class VectorOuterSum extends Aggregator[Array[Float], OuterBuf, Array[Double]] {
    override def zero: OuterBuf =
      OuterBuf(0L, Array.emptyDoubleArray, Array.emptyDoubleArray)

    private def dimCheck(have: Int, got: Int): Unit =
      if (have != got) throw new IllegalArgumentException(
        s"vec_outer_sum: mixed vector dimensions ($have vs $got)")

    override def reduce(b: OuterBuf, v: Array[Float]): OuterBuf = {
      if (v == null) return b
      val d = v.length
      val nb =
        if (b.n == 0L) OuterBuf(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
        else { dimCheck(b.sums.length, d); b }
      var i = 0
      var off = 0
      while (i < d) {
        val vi = v(i).toDouble
        nb.sums(i) += vi
        var j = i
        while (j < d) { nb.outer(off) += vi * v(j); j += 1; off += 1 }
        i += 1
      }
      OuterBuf(nb.n + 1, nb.sums, nb.outer)
    }

    override def merge(a: OuterBuf, b: OuterBuf): OuterBuf = {
      if (a.n == 0L) return b
      if (b.n == 0L) return a
      dimCheck(a.sums.length, b.sums.length)
      val sums = a.sums.clone(); val outer = a.outer.clone()
      var i = 0
      while (i < sums.length) { sums(i) += b.sums(i); i += 1 }
      i = 0
      while (i < outer.length) { outer(i) += b.outer(i); i += 1 }
      OuterBuf(a.n + b.n, sums, outer)
    }

    /** [n, s₀…s_{d−1}, p₀₀, p₀₁ … p_{d−1,d−1}] — flat so the result
      * is a plain array column any downstream projection can index. */
    override def finish(b: OuterBuf): Array[Double] =
      Array(b.n.toDouble) ++ b.sums ++ b.outer

    override def bufferEncoder: Encoder[OuterBuf] = Encoders.product[OuterBuf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Register `vec_avg` + `vec_outer_sum` on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("vec_avg", udaf(new VectorAvg))
    spark.udf.register("vec_outer_sum", udaf(new VectorOuterSum))
  }
}
