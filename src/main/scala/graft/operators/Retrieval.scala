package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus: BM25 scoring in the
  * inverted-index shape.
  *
  * The reference engine stores raw documents and leaves search to the
  * sink database; a training-data pipeline needs corpus-side retrieval
  * for curation (topic pulls, eval-set mining, hard-negative mining)
  * without an external index. BM25 (Robertson/Sparck Jones; the
  * Okapi formulation used by Lucene and every search engine since) is
  * the standard lexical ranking function.
  *
  * Scale shape — the part that matters at 100 TB:
  *  - The corpus is filtered to QUERY-TERM postings BEFORE any
  *    shuffle: `explode(tokens) WHERE tok IN terms` is a narrow
  *    scan-side operation, so the only rows that ever move are the
  *    postings of the |terms| query terms (an inverted-index probe,
  *    not a corpus scan-and-shuffle).
  *  - Document frequencies are derived from the per-doc tf aggregate
  *    (|terms| rows) and broadcast back; corpus-wide stats (N, avgdl)
  *    are a 1-row aggregate cross-joined in — nothing large ever sits
  *    on the build side.
  *  - Top-k is `ORDER BY … LIMIT k` → TakeOrderedAndProject (per-
  *    partition heaps + driver merge of k-row heads), never a global
  *    sort.
  *
  * Determinism: the score is rounded to integer millis
  * (`FLOOR(score·1000 + 0.5)`) and ranked on (score_milli DESC,
  * doc_id), so the result is a pure function of the data — the oracle
  * replays the same double arithmetic and the rounding absorbs
  * summation-order ulps.
  */
object Retrieval {

  /** BM25 top-k: the `k` highest-scoring documents for bag-of-words
    * `terms`, scored as
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` with
    * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))` (the Lucene-style
    * non-negative idf). Documents containing none of the terms never
    * enter the plan.
    *
    * @param docs  corpus with `doc_id` and single-space-tokenized `text`
    * @param terms query bag of words (deduplicated; case-sensitive to
    *              match the corpus convention)
    * @param k     result size
    * @param k1    term-frequency saturation (BM25 default 1.2)
    * @param b     length-normalization strength (BM25 default 0.75)
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k > 0, s"k ($k) must be positive")
    val termSet = terms.distinct

    // per-doc length, computed without materializing the token array
    val dl = docs.select(col("doc_id"),
      TextAnalysis.tokenCountCol(col("text")).as("dl"))
    // 1-row corpus stats; broadcast by the literal-cross-join shape
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))

    // inverted-index probe: only query-term postings survive the scan
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isin(termSet: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // df per term: |terms| rows, broadcast back onto the postings
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))

    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))

    tf.join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"), sum(idf * norm).as("score"))
      .select(col("doc_id"), col("n_hit"),
        floor(col("score") * 1000 + 0.5).cast("long").as("score_milli"))
      .orderBy(col("score_milli").desc, col("doc_id"))
      .limit(k)
  }
}
