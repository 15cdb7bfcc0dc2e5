package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shard-assignment planning for a growing corpus — which hashing
  * scheme to key storage/serving shards on, measured on the corpus
  * itself: plain `hash mod N` reassigns ~N/(N+1) of ALL keys when a
  * shard is added (every resize is a full re-shuffle of a 100 TB
  * store), while rendezvous/HRW hashing (Thaler & Ravishankar 1996 —
  * each key goes to the shard with the highest keyed hash weight)
  * moves only the ~1/(N+1) of keys the new shard must own, the
  * theoretical minimum. [[rebalanceReport]] quantifies BOTH on real
  * keys — movement under N→N+1 plus the balance spread at N — so the
  * resize cost argument is measured, not folklore.
  *
  * Hashing rides the engine's single portable-hash contract
  * ([[Sampling.hashMod]]'s md5 spelling), so assignments are
  * deterministic, engine-replayable, and independent of Spark's
  * internal hash — a shard map computed here can be replayed by any
  * system that has md5.
  */
object Sharding {

  /** First 60 bits of md5(s) as a non-negative long — the
    * [[Sampling.hashMod]] contract without the modulus. */
  private def h60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Rendezvous (highest-random-weight) shard in [0, n) for a key:
    * argmax over shards of md5(key # shard), ties to the larger shard
    * id (md5 ties are ~2⁻⁶⁰ — the break exists for determinism, not
    * practice). Computed ROW-LOCALLY: the per-shard weights are a
    * generated array scanned by array_max — no fan-out row explosion,
    * no shuffle, O(n) arithmetic per row on the scan. */
  def rendezvousShard(key: Column, n: Int): Column = {
    require(n >= 1 && n <= 4096, s"n ($n) must be in [1, 4096]")
    array_max(transform(sequence(lit(0), lit(n - 1)),
      s => struct(h60(concat(key.cast("string"), lit("#"), s.cast("string")))
        .as("w"), s.cast("long").as("s"))))
      .getField("s")
  }

  /** Modulo shard in [0, n): the [[Sampling.hashMod]] uniform. */
  def modShard(key: Column, n: Int): Column =
    Sampling.hashMod(key, n.toLong)

  /** The resize report: for BOTH schemes, how many keys move when the
    * shard count grows `nBefore` → `nAfter`, and how balanced the
    * BEFORE assignment is (max/min shard populations — rendezvous and
    * mod are both uniform in expectation; the spread column shows the
    * realized skew on THIS key set). Two rows, one per scheme.
    *
    * Shape: both schemes' before/after shards are row-local scan
    * arithmetic (no join, no explode — see [[rendezvousShard]]); the
    * per-(scheme, shard) populations aggregate map-side into ≤
    * 2·nBefore rows, and the movement counts are one more bounded
    * aggregation. ONE pass over the keys.
    *
    * @return (scheme, n_rows, n_moved, moved_ppm, max_shard_rows,
    *         min_shard_rows) ordered by scheme. */
  def rebalanceReport(df: DataFrame, keyCol: String,
                      nBefore: Int, nAfter: Int): DataFrame = {
    require(nBefore >= 1 && nAfter >= 1,
      s"shard counts must be >= 1 (got $nBefore -> $nAfter)")
    val key = col(keyCol)
    val tagged = df.filter(key.isNotNull).select(
      modShard(key, nBefore).as("mod_b"),
      modShard(key, nAfter).as("mod_a"),
      rendezvousShard(key, nBefore).as("rdv_b"),
      rendezvousShard(key, nAfter).as("rdv_a"))
    def side(scheme: String, before: String, after: String): DataFrame = {
      val perShard = tagged
        .groupBy(col(before).as("shard"))
        .agg(count(lit(1)).as("n"),
          sum(when(col(before) =!= col(after), 1L).otherwise(0L))
            .as("moved"))
      perShard.agg(
        lit(scheme).as("scheme"),
        sum("n").as("n_rows"),
        sum("moved").as("n_moved"),
        expr("(sum(moved) * 1000000) div sum(n)").as("moved_ppm"),
        max("n").as("max_shard_rows"),
        min("n").as("min_shard_rows"))
    }
    side("mod", "mod_b", "mod_a")
      .unionByName(side("rendezvous", "rdv_b", "rdv_a"))
      .orderBy("scheme")
  }

  /** EXPORT MANIFEST — the handoff artifact a training run verifies
    * ingest against: per md5 shard, the document count, token mass
    * and an ORDER-INDEPENDENT content checksum (sum of 60-bit md5
    * text digests in DECIMAL(38,0), published mod 10¹⁸ — the
    * [[graft.operators.Snapshot.bucketChecksumPlan]] discipline, so a
    * re-export in any row order, any partitioning, any engine lands
    * on the same manifest, and a single flipped byte in any document
    * flips its shard's checksum). The consumer recomputes the same
    * three numbers after transfer; [[graft.operators.Snapshot
    * .bucketChecksumPlan]] then NAMES the differing shard if one
    * mismatches.
    *
    * Scale shape: shard id, token count and digest all ride the scan
    * row-locally; ONE map-side-combined aggregation to ≤ numShards
    * rows. Docs with NULL id or text are excluded (nothing to ship).
    *
    * @return (shard, n_docs, n_tokens, checksum), shard-ordered. */
  def exportManifest(docs: DataFrame, numShards: Int): DataFrame = {
    require(numShards >= 1 && numShards <= 100000,
      s"numShards ($numShards) must be in [1, 1e5]")
    docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(
        Sampling.hashMod(col("doc_id"), numShards.toLong).as("shard"),
        TextAnalysis.tokenCountCol(col("text")).as("__t"),
        conv(substring(md5(col("text")), 1, 15), 16, 10)
          .cast("decimal(38,0)").as("__d"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("n_tokens"),
        expr("CAST(sum(__d) % 1000000000000000000 AS BIGINT)").as("checksum"))
      .orderBy("shard")
  }
}
