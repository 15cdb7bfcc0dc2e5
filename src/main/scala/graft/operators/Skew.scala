package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at scale.
  *
  * Spark's AQE already splits skewed SORT-MERGE JOIN partitions at
  * runtime (`spark.sql.adaptive.skewJoin.enabled`), so plain joins
  * should rely on that first. What AQE does NOT fix:
  *  - hash AGGREGATIONS with a hot key (one reducer owns the key), and
  *  - broadcast-side skew in map-side joins.
  * These helpers cover those: explicit salting that trades one extra
  * (cheap, pre-reduced) shuffle for even reducer load.
  */
object Skew {

  /** Two-phase salted sum/count: rows of a hot key scatter over
    * `buckets` sub-keys, partial-aggregate, then a final tiny aggregate
    * over at most `buckets` rows per key. The first shuffle is even by
    * construction; the second moves `keys × buckets` rows only.
    *
    * Salt derives from a pure row-content hash — fully deterministic
    * under task retries (a positional component like
    * monotonically_increasing_id can change on partial stage recompute
    * and double-count/lose rows). Byte-identical duplicate rows share
    * a salt, but that is fine for AGGREGATION: the map-side partial
    * aggregate collapses identical rows per partition before the
    * shuffle, so each map task emits at most one partial per
    * (key, salt) regardless of duplicate volume. */
  def saltedAgg(df: DataFrame, keys: Seq[String], aggs: Map[String, String],
                buckets: Int = 16): DataFrame = {
    require(buckets > 0, s"buckets ($buckets) must be positive — pmod(x, 0) " +
      "surfaces as an opaque mid-job DIVIDE_BY_ZERO under ANSI")
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(buckets)).as("__salt")
    val partialAggs = aggs.toSeq.map {
      case (c, "sum")   => sum(col(c)).as(s"__p_$c")
      case (c, "count") => count(col(c)).as(s"__p_$c")
      case (c, "min")   => min(col(c)).as(s"__p_$c")
      case (c, "max")   => max(col(c)).as(s"__p_$c")
      case (c, f)       => throw new IllegalArgumentException(s"unsupported agg $f($c)")
    }
    val finalAggs = aggs.toSeq.map {
      case (c, "count") => sum(col(s"__p_$c")).as(s"${c}_count")
      case (c, "sum")   => sum(col(s"__p_$c")).as(s"${c}_sum")
      case (c, "min")   => min(col(s"__p_$c")).as(s"${c}_min")
      case (c, "max")   => max(col(s"__p_$c")).as(s"${c}_max")
      case _            => throw new IllegalStateException
    }
    df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted inner equi join for a skewed big side against a small-but-
    * not-broadcastable side: the big side salts each row into one of
    * `buckets` sub-keys; the small side replicates each row across all
    * buckets. The shuffle key becomes (key, salt), splitting a hot
    * key's rows across `buckets` reducers. Small-side cost: ×buckets
    * replication — use only when the small side is modest and one key
    * dominates the big side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    require(buckets > 0, s"buckets ($buckets) must be positive")
    // content hash, not position: deterministic under retries. Fully
    // byte-identical big-side rows share a salt; if THAT is the skew,
    // pre-aggregate duplicates (groupBy all columns + count) first.
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Measured salting plan — the missing middle of the skew family:
    * x144 MEASURES per-key skew, [[saltedAgg]]/[[saltedJoin]] EXECUTE
    * a uniform salt; this PLANS a per-key one — for every key whose
    * row count exceeds `targetPerSalt` (the partition-sized budget a
    * single task should carry), the ceiling-division salt fan-out that
    * brings each salted slice back under budget. Keys under budget
    * don't appear: the plan is exactly the broadcast side a targeted
    * salted join would consume, bounded by the heavy-key count, never
    * data-scale.
    *
    * @return (key, n_rows, n_salts), heavy keys only, ordered by key. */
  def saltPlan(df: DataFrame, keyCol: String,
               targetPerSalt: Long): DataFrame = {
    require(targetPerSalt >= 1, s"targetPerSalt ($targetPerSalt) must be >= 1")
    df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > targetPerSalt)
      .select(col("key"), col("n_rows"),
        expr(s"(n_rows + $targetPerSalt - 1) div $targetPerSalt")
          .as("n_salts"))
      .orderBy("key")
  }
}
