package graft

import graft.operators.Learn
import org.apache.spark.sql.functions._

class LearnSpec extends SparkSpec {

  test("linearClassifierFit: the distributed loop ≡ an exact driver-side replay; the model learns") {
    val out = Learn.linearClassifierFit(
      graft.core.Tables.documents(spark, sf)).head()
    val (wThe, wTok, wBias) = (out.getLong(0), out.getLong(1), out.getLong(2))
    val (nCorrect, nTotal) = (out.getLong(3), out.getLong(4))

    // independent replay: collect the centered integer features and run
    // the same 3 iterations in plain Scala Long arithmetic
    val feats = graft.core.Tables.documents(spark, sf)
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select(
        (((length(col("text")) -
          length(replace(col("text"), lit(" the "), lit("")))) / 5) - 2)
          .cast("long"),
        (length(col("text")) -
          length(replace(col("text"), lit(" "), lit(""))) + 1 - 55)
          .cast("long"),
        when(col("n_chars") >= 300L, 1000000L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = feats.length.toLong
    var w = Array(0L, 0L, 0L)
    for (_ <- 1 to 3) {
      val g = Array(0L, 0L, 0L)
      feats.foreach { case (f1, f2, y) =>
        val z = f1 * w(0) + f2 * w(1) + w(2)
        val p = math.max(0L, math.min(1000000L, 500000L + z / 4L))
        g(0) += (p - y) * f1; g(1) += (p - y) * f2; g(2) += (p - y)
      }
      w = Array.tabulate(3)(j => w(j) - g(j) / n / 8L)
    }
    assert((wThe, wTok, wBias) === ((w(0), w(1), w(2))),
      "the distributed gradient loop must land on the replay's exact weights")
    val correct = feats.count { case (f1, f2, y) =>
      (f1 * w(0) + f2 * w(1) + w(2) > 0L) == (y == 1000000L)
    }.toLong
    assert(nCorrect === correct)
    assert(nTotal === n)
    // the fit must actually LEARN: beat the majority class by a margin
    val majority = math.max(feats.count(_._3 == 1000000L),
      feats.count(_._3 == 0L)).toLong
    assert(nCorrect * 10L > majority * 12L,
      s"accuracy $nCorrect/$n must beat the majority class $majority/$n by ≥20%")
  }
}
