package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic clustering over embedding columns — the curation stage
  * between near-dup mining and sampling: cluster the corpus in
  * embedding space, then rebalance/sample per cluster (topic-balanced
  * epochs) or pre-bin semantic dedup so the expensive pairwise pass
  * runs within clusters only.
  *
  * Mirrors the reference's derive-then-group shape (etl_connector.py's
  * transform stage computes derived keys and groups on them) lifted to
  * embedding space.
  */
object Clustering {

  /** Lloyd's k-means in FIXED-POINT integer arithmetic, run for a
    * fixed number of iterations.
    *
    * Every coordinate is quantized once to integer micros
    * (`floor(x·10⁶ + 0.5)` — float32 → double widening is exact, so
    * the quantization is bit-reproducible across engines), and all
    * distance math is 64-bit integer: squared L2 over micro-coords
    * (≤ dim·(2·maxAbs·10⁶)² — dim 64 at |x| ≤ 30 stays < 2⁶³).
    * Assignment argmin breaks ties on the LOWEST centroid index, and
    * centroid updates round component means back to integer micros
    * (`floor(Σq/n + 0.5)` with the sum widened to double — exact while
    * Σq < 2⁵³, i.e. cluster sizes below ~10⁹ rows at unit-norm
    * embeddings; beyond that switch the mean to two-stage decimal).
    * Integer state + fixed iterations means the full trajectory —
    * not just the final labels — is deterministic and exactly
    * replayable by any engine, which is what makes the result
    * ORACLE-COMPARABLE rather than "approximately similar".
    *
    * Scale shape: centroids (k·dim longs) live on the driver and enter
    * the plan as literals — the assignment pass is a pure broadcast
    * map riding the corpus scan, NO shuffle. The update pass shuffles
    * only (cluster, dim) partial sums — k·dim rows per task after
    * map-side combine, invariant in corpus size. Per iteration: one
    * corpus scan + one k·dim-sized aggregate; the corpus itself is
    * never collected, sorted, or joined. Init reads the k lowest-id
    * vectors (TakeOrderedAndProject — no full sort). Empty clusters
    * keep their previous centroid, as the replay must too.
    *
    * @param df        input with an id column and a float-array
    *                  embedding column
    * @param idCol     unique id — init centroids are the k lowest ids
    * @param vecCol    embedding column (array of float/double)
    * @param k         cluster count (small: centroids broadcast)
    * @param iterations fixed Lloyd rounds (assignment after the last
    *                  update is the returned labeling)
    * @return (idCol, cluster) — cluster in [0, k), ordered by id. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
             k: Int, iterations: Int): DataFrame = {
    require(k >= 1 && k <= 4096, s"k ($k) must be in [1, 4096] — centroids broadcast")
    require(iterations >= 1 && iterations <= 50,
      s"iterations ($iterations) must be in [1, 50]")
    val quant = df.select(
      col(idCol),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))
        .as("qv"))

    // k lowest-id vectors seed the centroids; the collect is k·dim
    // longs — the standard broadcast-centroid pattern, not a data pull
    var centroids: Array[Array[Long]] = quant
      .orderBy(col(idCol)).limit(k)
      .select("qv").collect()
      .map(_.getSeq[Long](0).toArray)
    require(centroids.length == k,
      s"input has only ${centroids.length} rows, need at least k = $k")

    def assign(cs: Array[Array[Long]]): DataFrame = {
      val cLit = array(cs.map(cv => array(cv.map(lit(_)): _*)): _*)
      val dists = transform(cLit, c =>
        aggregate(zip_with(col("qv"), c, (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
      // array_position finds the FIRST minimum → lowest index on ties
      quant.withColumn("cluster",
        (array_position(dists, array_min(dists)) - 1).cast("int"))
    }

    for (_ <- 1 to iterations) {
      val updated = assign(centroids)
        .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(floor(sum("v").cast("double") / count(lit(1)) + lit(0.5))
          .cast("long").as("cv"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getLong(2))
        }
      centroids = centroids.indices
        .map(c => updated.getOrElse(c, centroids(c)))
        .toArray
    }
    assign(centroids).select(col(idCol), col("cluster")).orderBy(idCol)
  }
}
