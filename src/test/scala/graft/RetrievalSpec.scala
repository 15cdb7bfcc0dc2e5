package graft

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "cat dog cat"),          // cat×2, dl 3
    (2L, "cat fish"),             // cat×1, dl 2
    (3L, "dog dog dog dog"),      // no query terms
    (4L, "bird"))                 // no query terms
    .toDF("doc_id", "text")

  test("bm25 scores and ranks by tf, df and length normalization") {
    val out = Retrieval.bm25TopK(docs, Seq("cat", "fish"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // N=4, avgdl=2.5; cat df=2, fish df=1
    // doc 2 hits both terms (and fish's idf is higher) → ranks first
    assert(out.map(_._1).toSeq === Seq(2L, 1L))
    assert(out.map(_._2).toSeq === Seq(2L, 1L))   // n_hit
    // replay the formula in Scala for doc 1: cat tf=2, dl=3
    val idfCat = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    val s1 = idfCat * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.5))
    assert(out(1)._3 === math.floor(s1 * 1000 + 0.5).toLong)
  }

  test("docs without any query term never appear; k truncates") {
    assert(Retrieval.bm25TopK(docs, Seq("cat"), k = 10).count() === 2L)
    assert(Retrieval.bm25TopK(docs, Seq("cat"), k = 1)
      .collect().map(_.getLong(0)).toSeq === Seq(1L))  // higher tf wins
  }

  test("duplicate query terms collapse; unknown terms contribute nothing") {
    val a = Retrieval.bm25TopK(docs, Seq("cat", "cat", "zzz"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val b = Retrieval.bm25TopK(docs, Seq("cat"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(a.toSeq === b.toSeq)
  }

  test("plan: top-k is TakeOrderedAndProject, df and stats broadcast") {
    val plan = Retrieval.bm25TopK(docs, Seq("cat"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }
}
