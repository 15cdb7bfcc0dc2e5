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

  /** Register `vec_avg` on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.udf.register("vec_avg", udaf(new VectorAvg))
}
