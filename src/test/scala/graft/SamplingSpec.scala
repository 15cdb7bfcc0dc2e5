package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 2000L).map(i =>
    (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else null))
    .toDF("id", "lang")

  test("hash sample is deterministic and partition-invariant") {
    val a = Sampling.hashSample(corpus, "id", 250).select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(corpus.repartition(13), "id", 250)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // rate lands near 25% (binomial over 2000 keys)
    assert(a.length > 400 && a.length < 600, s"got ${a.length} of 2000 at 250 permille")
  }

  test("rate 0 keeps nothing, rate 1000 keeps everything") {
    assert(Sampling.hashSample(corpus, "id", 0).count() === 0L)
    assert(Sampling.hashSample(corpus, "id", 1000).count() === 2000L)
  }

  test("stratified rates apply per stratum; null stratum uses the default") {
    val out = Sampling.stratifiedHashSample(corpus, "lang", "id",
      rates = Map("en" -> 1000L, "fr" -> 0L), defaultPermille = 500L)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(out(Some("en")) === 666L)     // every 'en' row kept (multiples of 3 in 1..2000)
    assert(!out.contains(Some("fr")))    // every 'fr' row dropped
    val nullKept = out(None)
    assert(nullKept > 230 && nullKept < 430, s"null stratum kept $nullKept of 666 at 500")
  }

  test("sample plan is a scan-side filter — no shuffle, no UDF") {
    val plan = Sampling.hashSample(corpus, "id", 100).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(!plan.contains("BatchEvalPython"))
  }
}
