package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds a 10×-scale probe corpus from an existing sf directory —
  * the measurement rig behind `BENCH_NOTES.md`'s sf1 section: the
  * 100 TB design claims of the dedup/graph/ANN family are argued from
  * plan shape at sf0.1; this main adds one more measured DECADE
  * (sf0.1 → ~sf1) so sub-quadratic growth is observed, not argued.
  *
  * Scaling must not change the WORKLOAD SHAPE, only its size:
  *
  *  - `documents`: each of the 10 replicas applies a replica-specific
  *    Caesar rotation to the letters of `text` (replica 0 is the
  *    identity). Within a replica the near-dup structure of the
  *    original corpus is preserved EXACTLY (rotation is a bijection on
  *    tokens, so shingle sets map 1:1 and every Jaccard value is
  *    unchanged); across replicas the token spaces are disjoint, so no
  *    cross-replica pairs exist. Total docs ×10, total near-dup pairs
  *    ×10, shingle-df distribution shape preserved per replica — the
  *    honest linear scale-up. (Plain replication would instead make
  *    every doc a 10-way exact duplicate: pair count ×100, a
  *    quadratically DIFFERENT workload.)
  *  - `embeddings`: replicas offset `vec_id` and nudge one coordinate
  *    by a replica-scaled epsilon (keeps vectors distinct; ANN probe
  *    cost depends on corpus size and cell balance, not exact values).
  *
  * Usage: `runMain graft.ScaleUp <srcDir> <dstDir> [replicas]`, then
  * bench the heavy slice with `SPARK_GRAFT_SF_DIR=<dstDir>`.
  * Writes `documents`, `embeddings`, `events` and `lineitem` parquet —
  * every table the heavy (≥1 s at sf0.1) query tier reads.
  */
object ScaleUp {
  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  /** One replica of the documents table: ids offset by `i * span`,
    * text letters rotated by `i` (both cases), other columns kept. */
  private def docReplica(docs: DataFrame, i: Int, span: Long): DataFrame = {
    val rot = alpha.drop(i % 26) + alpha.take(i % 26)
    docs.select(
      (col("doc_id") + lit(i * span)).as("doc_id"),
      translate(col("text"), alpha + alpha.toUpperCase,
        rot + rot.toUpperCase).as("text"),
      col("lang"), col("source"), col("n_chars"))
  }

  def scaleDocuments(docs: DataFrame, replicas: Int): DataFrame = {
    val span = docs.agg(max("doc_id")).head().getLong(0) + 1L
    (0 until replicas).map(docReplica(docs, _, span)).reduce(_ unionByName _)
  }

  /** Events replicas: event_id and user_id offset per replica (users
    * are the behavioral keys — disjoint user spaces duplicate every
    * per-user session/transition/funnel structure EXACTLY within a
    * replica and create no cross-replica structure, the same linear
    * contract as the documents rotation). Timestamps are kept: the
    * corpus SPAN is a property of the feed, not its volume — dense
    * day-grid operators keep a constant grid while per-day counts ×N,
    * which is exactly what a busier feed looks like. */
  def scaleEvents(events: DataFrame, replicas: Int): DataFrame = {
    val r = events.agg(max("event_id"), max("user_id")).head()
    val (eSpan, uSpan) = (r.getLong(0) + 1L, r.getLong(1) + 1L)
    (0 until replicas).map { i =>
      events.select(
        (col("event_id") + lit(i * eSpan)).as("event_id"), col("ts"),
        (col("user_id") + lit(i * uSpan)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
  }

  /** Lineitem replicas: order AND part keys offset per replica —
    * baskets and item vocabulary both ×N with per-item df preserved,
    * so basket-pair / item-cosine join mass scales LINEARLY (offsetting
    * only orders would instead ×N every item's df and square the
    * inverted-index mass — the quadratically different workload the
    * documents rotation exists to avoid). */
  def scaleLineitem(li: DataFrame, replicas: Int): DataFrame = {
    val r = li.agg(max("l_orderkey"), max("l_partkey")).head()
    val (oSpan, pSpan) = (r.getLong(0) + 1L, r.getLong(1) + 1L)
    (0 until replicas).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * oSpan))
        .withColumn("l_partkey", col("l_partkey") + lit(i * pSpan))
    }.reduce(_ unionByName _)
  }

  def scaleEmbeddings(emb: DataFrame, replicas: Int): DataFrame = {
    val span = emb.agg(max("vec_id")).head().getLong(0) + 1L
    (0 until replicas).map { i =>
      emb.select(
        (col("vec_id") + lit(i * span)).as("vec_id"),
        transform(col("embedding"),
          (x, j) => when(j === 0, x + lit(i * 1e-3f)).otherwise(x))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <dstDir> [replicas]")
    val (src, dst) = (args(0), args(1))
    val replicas = if (args.length > 2) args(2).toInt else 10
    require(replicas >= 1 && replicas <= 26,
      s"replicas ($replicas) must be in [1, 26] — one Caesar rotation each")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    scaleDocuments(spark.read.parquet(s"$src/documents.parquet"), replicas)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    scaleEmbeddings(spark.read.parquet(s"$src/embeddings.parquet"), replicas)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    scaleEvents(spark.read.parquet(s"$src/events.parquet"), replicas)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    scaleLineitem(spark.read.parquet(s"$src/lineitem.parquet"), replicas)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    println(s"[scaleup] wrote ${replicas}x documents+embeddings+events+lineitem to $dst")
    spark.stop()
  }
}
