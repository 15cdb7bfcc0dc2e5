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

  case class AvgBuf(sums: Array[Double], n: Long)

  class VectorAvg extends Aggregator[Array[Float], AvgBuf, Array[Double]] {
    override def zero: AvgBuf = AvgBuf(Array.emptyDoubleArray, 0L)

    override def reduce(b: AvgBuf, v: Array[Float]): AvgBuf = {
      if (v == null) return b
      val sums = if (b.sums.length >= v.length) b.sums
                 else java.util.Arrays.copyOf(b.sums, v.length)
      var i = 0
      while (i < v.length) { sums(i) += v(i); i += 1 }
      AvgBuf(sums, b.n + 1)
    }

    override def merge(a: AvgBuf, b: AvgBuf): AvgBuf = {
      if (a.n == 0) return b
      if (b.n == 0) return a
      val (big, small) = if (a.sums.length >= b.sums.length) (a, b) else (b, a)
      val sums = big.sums.clone()
      var i = 0
      while (i < small.sums.length) { sums(i) += small.sums(i); i += 1 }
      AvgBuf(sums, a.n + b.n)
    }

    override def finish(b: AvgBuf): Array[Double] =
      if (b.n == 0) Array.emptyDoubleArray else b.sums.map(_ / b.n)

    override def bufferEncoder: Encoder[AvgBuf] = Encoders.product[AvgBuf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Register `vec_avg` on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.udf.register("vec_avg", udaf(new VectorAvg))
}
