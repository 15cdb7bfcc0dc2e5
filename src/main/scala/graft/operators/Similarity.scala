package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[cosineTopK]]: exact brute force — broadcast the (small) query
  *    set against the corpus; at 100 TB the corpus side streams through
  *    a narrow map + per-partition top-k, so no corpus shuffle.
  *  - [[lshTopK]]: approximate — random-hyperplane LSH buckets both
  *    sides; only same-bucket pairs are scored. Candidate volume drops
  *    from |Q|·|C| to the bucket collision mass; recall is tunable via
  *    number of hyperplanes / tables.
  *
  * Vector math is done with the built-in higher-order functions
  * (`zip_with` + `aggregate`) — codegen'd, no UDF, no Python boundary.
  */
object Similarity {

  /** dot(a, b) over array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) — 0.0 for zero vectors rather than NaN. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b); val n = norm(a) * norm(b)
    when(n === 0.0d, 0.0d).otherwise(d / n)
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k nearest neighbors (cosine) of each query vector.
    *
    * `queries` and `corpus` both carry (id, embedding). The query side
    * is broadcast (it is small by assumption — a probe set); the corpus
    * never shuffles for scoring. Per-query top-k uses a rank window over
    * the scored pairs — the shuffle moves only |Q|·|C| scored ids, and
    * at scale the right fix is per-partition top-k pre-reduction, which
    * Spark's TakeOrderedAndProject applies per query group via the
    * window + filter shape under AQE.
    *
    * Deterministic: ties broken by neighbor id.
    * Score surfaces as integer permille for cross-engine goldens.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        floor(col("score") * 1000 + 0.5).cast("long").as("cos_permille"))
      .orderBy("query_id", "rank", "neighbor_id", "cos_permille")
  }

  /** Exact top-k via the native codegen'd [[graft.functions.CosineF32]]
    * expression — same semantics as [[cosineTopK]], but the score is a
    * single fused primitive loop (no intermediate arrays, no lambda
    * interpretation) and the float vectors are scored in place without
    * an array<double> cast. Requires
    * `GraftFunctions.register(spark)` (or the GraftExtensions session
    * extension) — the hot path for 10^9-pair scoring at scale. */
  def cosineTopKNative(queries: DataFrame, corpus: DataFrame, k: Int,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        call_function("cosine_f32", col("qv"), col("cv")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        floor(col("score") * 1000 + 0.5).cast("long").as("cos_permille"))
      .orderBy("query_id", "rank", "neighbor_id", "cos_permille")
  }

  /** Deterministic pseudo-random hyperplanes: coefficient for (plane p,
    * dim i) derived from a splitmix64-style integer mix — reproducible
    * across runs and engines, no RNG state. Returns values in [-1, 1). */
  private def planeCoef(p: Int, i: Column): Column = {
    val mixed = call_function("xxhash64", lit(p.toLong), i)
    (mixed.cast("double") / lit(Long.MaxValue.toDouble))
  }

  /** Random-hyperplane signature: bit p = sign(dot(plane_p, v)). */
  def lshSignature(vec: Column, numPlanes: Int): Column =
    (0 until numPlanes).map { p =>
      val s = aggregate(
        zip_with(vec, sequence(lit(0L), lit(63L)), (x, i) => x * planeCoef(p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(s > 0.0d, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: bucket by LSH signature, score only same-bucket
    * pairs. At 100 TB the bucket join is an equi-shuffle on the
    * signature (or a broadcast of the query signatures), never a cross
    * join. Recall < 1 by design; raise numPlanes↓bucket size,
    * or run multiple tables (seed offset) and union, to trade cost for
    * recall. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, numPlanes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("sig", lshSignature(col("qv"), numPlanes))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("sig", lshSignature(col("cv"), numPlanes))
    val scored = c.join(broadcast(q), Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        floor(col("score") * 1000 + 0.5).cast("long").as("cos_permille"))
      .orderBy("query_id", "rank", "neighbor_id", "cos_permille")
  }
}
