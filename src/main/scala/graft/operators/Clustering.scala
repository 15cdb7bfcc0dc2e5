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
      // ONE native argmin over the constant-folded centroid MATRIX —
      // identical integers, identical lowest-index tie-break as the
      // per-centroid `array_position(array(l2sq_i64…), array_min…)`
      // spelling (the DuckDB-replayed contract), but the generated
      // code is CONSTANT-SIZE in k: the k-expression array paid k
      // generated calls + a k-array allocation per row, and at the
      // auto-sized k ≈ √n the assignment stage alone was 24 s of a
      // 35 s ×10 SemDeDup pass (round-16 probe) before the swap.
      // ArgminL2SqI64's scaladoc carries the plan-shape argument
      graft.functions.GraftFunctions.register(df.sparkSession)
      val centMatrix = array(cs.map(cv => array(cv.map(lit(_)): _*)): _*)
      quant.withColumn("cluster",
        call_function("argmin_l2sq_i64", col("qv"), centMatrix))
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
  /** Nearest-centroid label evaluation over an embedding column — the
    * "is this embedding space any good" readout: build one centroid
    * per label (rounded integer-micro mean, the [[kmeans]] update
    * spelling), assign every vector to its nearest centroid by exact
    * integer squared L2 (ties → lowest label), and report the
    * label × prediction CONFUSION MATRIX. A diagonal-heavy matrix
    * means labels are linearly separable in the space (the embeddings
    * carry the signal curation wants to sample/filter on); heavy
    * off-diagonal cells name exactly WHICH label pairs the space
    * confuses. Doubles as a one-pass nearest-centroid classifier
    * (Rocchio) for routing unlabeled data at ingest.
    *
    * Determinism: coordinates quantize once to integer micros
    * (float32 → double widening is exact), centroid means round back
    * to integer micros (`floor(Σq/n + 0.5)`, sum widened to double —
    * exact while Σq < 2⁵³), distances are 64-bit integer sums, and the
    * argmin tie-break is the lowest label — the whole computation is
    * bit-replayable by the DuckDB oracle, the x56 contract.
    *
    * Scale shape: centroids are ONE |labels|·dim aggregation (posexplode
    * partial sums combine map-side; |labels|·dim longs to the driver —
    * the broadcast-literal pattern), the scoring pass is a shuffle-free
    * codegen map over the scan (native `l2sq_i64` per centroid), and
    * the output aggregation is |labels|²-bounded. NULL labels are
    * excluded (no label to learn or score against).
    *
    * @return (true_label, pred_label, n) ordered. */
  def nearestCentroidEval(df: DataFrame, idCol: String, vecCol: String,
                          labelCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val quant = df.filter(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol).cast("long").as("__lbl"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))
          .as("qv"))
    val cents: Array[(Long, Array[Long])] = quant
      .select(col("__lbl"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy("__lbl", "pos")
      .agg(floor(sum("v").cast("double") / count(lit(1)) + lit(0.5))
        .cast("long").as("cv"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (l, rows) => l -> rows.sortBy(_.getInt(1)).map(_.getLong(2)) }
      .toArray.sortBy(_._1)
    require(cents.nonEmpty, "nearestCentroidEval needs at least one labeled row")
    val dists = array(cents.map { case (_, cv) =>
      call_function("l2sq_i64", col("qv"), array(cv.map(lit(_)): _*))
    }: _*)
    val labelsArr = array(cents.map(c => lit(c._1)): _*)
    quant
      // array_position finds the FIRST minimum → lowest label on ties
      // (cents is sorted by label)
      .withColumn("pred_label",
        element_at(labelsArr, array_position(dists, array_min(dists)).cast("int")))
      .select(col("__lbl").as("true_label"), col("pred_label"))
      .groupBy("true_label", "pred_label")
      .agg(count(lit(1)).as("n"))
      .orderBy("true_label", "pred_label")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): embedding-space
    * dedup that catches PARAPHRASE-level duplicates lexical
    * (shingle/minhash) dedup cannot see. The paper's trick is the
    * clustering PRE-BIN: k-means first, then the quadratic pairwise
    * cosine pass runs only WITHIN clusters — pair mass drops from
    * n²/2 to Σ_c n_c²/2 ≈ n²/(2k), and k scales with corpus size so
    * per-cluster work stays bounded. Near-identical vectors land in
    * the same cluster except at cell boundaries — the documented
    * recall trade the paper accepts.
    *
    * Pipeline, every stage deterministic and engine-replayable:
    * [[kmeans]] (integer trajectory) → within-cluster pairs with
    * native `cosine_f32` ≥ minPermille (same fold order as the x09/
    * x13 oracle parity) → [[Dedup.connectedComponents]] min-label
    * closure → every vector maps to its duplicate-group survivor
    * (the minimum id; itself when unpaired).
    *
    * Scale shape: the only corpus-wide shuffles are kmeans' bounded
    * k·dim updates and the equi-join on `cluster`; the pairwise stage
    * is per-cluster and the component fixpoint runs over found PAIRS
    * only (a vanishing fraction of the corpus).
    *
    * SIZE k WITH THE CORPUS — k ≤ 0 auto-sizes k ≈ √n (floor 16), the
    * [[Similarity.mutualTopKAnn]] nlist discipline: at a FIXED k the
    * per-cluster populations grow linearly with the corpus, so the
    * within-cluster pair mass n²/k grows QUADRATICALLY — the paper's
    * bound only holds because k scales with n. Under √n sizing both
    * the pair mass and the kmeans assignment cost are ~n^1.5 (the same
    * declared contract as mutualTopKAnn), and cluster keys grow with
    * the corpus instead of capping the pairwise join's parallelism at
    * k. The one extra count() is a columnless scan. Pass an explicit
    * k > 0 only for replay-pinned demos (the x73 board row) or when an
    * external sizing rule applies.
    *
    * @return (idCol, cluster, keep_id) ordered by id — keep_id == id
    *         marks survivors; rows with keep_id < id are the drop set. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, iterations: Int,
                    minPermille: Long = 900L): DataFrame = {
    require(minPermille >= 1 && minPermille <= 1000,
      s"minPermille ($minPermille) must be in [1, 1000]")
    val kk =
      if (k > 0) k
      else {
        val n = df.count()
        require(n > 0, "semanticDedup auto-k needs a non-empty corpus")
        // floor 16 (per the paper small corpora don't need more bins),
        // clamped to n — kmeans rejects more centroids than rows
        math.min(n, math.max(16L, math.sqrt(n.toDouble).toLong)).toInt
      }
    graft.functions.GraftFunctions.register(df.sparkSession)
    // cached AT THE JOIN OUTPUT: (id, cluster, vec) feeds BOTH pair
    // sides and the final projection, so the assignment⋈vector join
    // materializes exactly once (caching only the assignment left the
    // join itself to run twice whenever AQE declined to reuse the
    // exchange — the r8 bench's slowest query). The cache boundary
    // also keeps the self-join's constraint inference away from the
    // kmeans lambda expressions (Spark's InferFiltersFromConstraints
    // can fail on a self-joined higher-order-function projection)
    val withVec = Dedup.registerCache(
      kmeans(df, idCol, vecCol, kk, iterations)
        .join(df.select(col(idCol), col(vecCol)), Seq(idCol)))
    val a = withVec.select(col("cluster"), col(idCol).as("da"), col(vecCol).as("va"))
    val b = withVec.select(col("cluster"), col(idCol).as("db"), col(vecCol).as("vb"))
    val pairs = a.join(b, Seq("cluster"))
      .filter(col("da") < col("db"))
      .filter(floor(call_function("cosine_f32", col("va"), col("vb")) * 1000 + 0.5)
        >= minPermille)
      .select("da", "db")
    // the sort-free labels: the id-keyed join below re-shuffles anyway
    val comp = Dedup.connectedComponentsUnsorted(pairs)
      .withColumnRenamed("doc_id", idCol).withColumnRenamed("cluster_id", "keep_id")
    withVec.select(col(idCol), col("cluster")).join(comp, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("keep_id"), col(idCol)).as("keep_id"))
      .orderBy(idCol)
  }
}
