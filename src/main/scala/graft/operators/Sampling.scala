package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines.
  *
  * The core primitive is DETERMINISTIC hash sampling: a row is kept
  * iff a uniform value derived from its key falls under the stratum's
  * rate. Three properties matter at 100 TB and distinguish this from
  * `df.sample`/`sampleBy` (partition-order-seeded RNG):
  *  - scan-only: a narrow filter, no shuffle, pushes past column
  *    pruning;
  *  - retry/replan-stable: the keep decision is a pure function of the
  *    KEY, so task retries, AQE re-plans and re-runs keep the same
  *    rows — reproducible datasets;
  *  - portable: md5-keyed, so any engine (and the DuckDB oracle)
  *    reproduces the exact sample.
  */
object Sampling {

  /** Uniform value in [0, n) from the key's md5 (first 60 bits mod n;
    * modulo bias ≤ ~2⁻⁵⁰, far below sampling noise at any real rate) —
    * the SINGLE spelling of the engine's portable hash-uniform
    * contract, shared by the samplers, the split assigner and sequence
    * packing, and replayed by every oracle as
    * `CAST('0x' || substr(md5(key), 1, 15) AS BIGINT) % n`. */
  def hashMod(key: Column, n: Long): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(n))

  /** Uniform permille in [0, 1000) derived from the key's md5. */
  def hashPermille(key: Column): Column = hashMod(key, 1000L)

  /** Keep each row with probability ratePermille/1000, deterministically
    * keyed by `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, ratePermille: Long): DataFrame = {
    require(ratePermille >= 0 && ratePermille <= 1000,
      s"ratePermille ($ratePermille) must be in [0, 1000]")
    df.filter(hashPermille(col(keyCol)) < lit(ratePermille))
  }

  /** Stratified variant: per-stratum keep rates (permille), e.g.
    * down-sampling over-represented languages or sources when
    * rebalancing a training corpus. Strata absent from `rates` fall
    * back to `defaultPermille`; a NULL stratum always falls back. */
  def stratifiedHashSample(df: DataFrame, strataCol: String, keyCol: String,
                           rates: Map[String, Long],
                           defaultPermille: Long = 0): DataFrame = {
    require((rates.values ++ Seq(defaultPermille)).forall(r => r >= 0 && r <= 1000),
      "all rates must be permille values in [0, 1000]")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille): Column) {
      case (acc, (stratum, r)) => when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(hashPermille(col(keyCol)) < rate)
  }

  /** Rebalance a corpus to TARGET per-stratum proportions (epoch
    * composition: "train on 50% en, 30% fr, 20% zh") by down-sampling
    * over-represented strata. The achievable total is set by the
    * bottleneck stratum — T = min_s floor(n_s·1000 ∕ target_s), the
    * largest total every stratum can still supply its share of — and
    * each stratum keeps rate_s = floor(target_s·T ∕ n_s) permille, so
    * realized counts track target_s·T∕1000 to integer rounding.
    * Strata not in `targetPermille` drop entirely; a TARGETED stratum
    * absent from the data fails loudly (its share is unsatisfiable).
    *
    * Two passes, like every stats-driven operator: a per-stratum count
    * aggregation (O(#strata) driver scalars — the same cardinality a
    * table format's stats pass collects) to derive the rates, then the
    * scan-only deterministic stratified filter. All integer
    * arithmetic ⇒ the whole derivation replays in the oracle. */
  def rebalance(df: DataFrame, strataCol: String, keyCol: String,
                targetPermille: Map[String, Long]): DataFrame = {
    require(targetPermille.nonEmpty && targetPermille.values.forall(_ > 0),
      "target shares must be positive")
    require(targetPermille.values.sum == 1000L,
      s"target shares must sum to 1000 permille, got ${targetPermille.values.sum}")
    val counts = df.groupBy(col(strataCol)).count()
      .collect().map(r => Option(r.get(0)).map(_.toString).orNull -> r.getLong(1)).toMap
    val missing = targetPermille.keySet.filterNot(counts.contains)
    require(missing.isEmpty,
      s"targeted strata absent from the data: ${missing.toSeq.sorted.mkString(", ")}")
    val tMax = targetPermille.map { case (s, t) => counts(s) * 1000L / t }.min
    val rates = targetPermille.map { case (s, t) => s -> t * tMax / counts(s) }
    stratifiedHashSample(df, strataCol, keyCol, rates, defaultPermille = 0L)
  }

  /** Temperature-weighted stratum mixing — the multilingual α-sampling
    * rule (mT5/XLM-R): stratum l gets budget share ∝ n_l^α, so α = 1
    * is proportional (head languages dominate), α → 0 approaches
    * uniform (tail languages up-weighted), and the published default
    * α ≈ 0.5 sits between. Quotas convert to per-stratum PERMILLION
    * (10⁻⁶) rates — granularity matters: at permille, any stratum
    * with quota < n/1000 (a 500-doc budget over a 10⁶-doc language)
    * floors to rate 0 and silently contributes nothing — and
    * selection is the same scan-only deterministic md5 hash filter as
    * [[stratifiedHashSample]], just on the finer modulus:
    * retry/replan-stable, no rank window (a per-stratum rank would
    * put an entire language through one task at 100 TB). Realized
    * sizes are binomial around the quota, the standard trade for a
    * shuffle-free sample; quotas cap at n_l (sampling is without
    * replacement), and strata with quota < n/10⁶ still floor to
    * zero — at that point the budget is below one row per million
    * and the caller should raise it.
    *
    * Cross-engine exactness: weights are floor(n^α·10⁶) — ONE
    * correctly-rounded IEEE operation when α = 0.5 (sqrt; the reason
    * the default is spelled via `sqrt`, not `pow`, whose libm is only
    * 1-ulp-bounded) — then all quota/rate arithmetic is exact integer
    * division (BigInt here, HUGEINT in the oracle). Strata with a
    * NULL key are excluded (no identity, no quota). The per-stratum
    * count collect is |strata|-bounded — same contract as
    * [[rebalance]]. */
  def temperatureMix(df: DataFrame, strataCol: String, keyCol: String,
                     alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    require(budget > 0, s"budget ($budget) must be positive")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol)).count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    require(counts.nonEmpty, "no non-null strata to mix")
    def wMicro(n: Long): Long =
      if (alpha == 0.5) math.floor(math.sqrt(n.toDouble) * 1e6).toLong
      else math.floor(math.pow(n.toDouble, alpha) * 1e6).toLong
    val w = counts.map { case (s, n) => s -> wMicro(n) }
    val totW = w.values.map(BigInt(_)).sum
    val rates = counts.map { case (s, n) =>
      val quota = (BigInt(budget) * w(s) / totW).min(BigInt(n))
      s -> (quota * 1000000 / n).toLong
    }
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(0L): Column) {
      case (acc, (stratum, r)) => when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(hashMod(col(keyCol), 1000000L) < rate)
  }

  /** Mixture-composition report — the table a training-mix design
    * review reads: per group (language, source), document and TOKEN
    * counts, the group's share of corpus tokens, its α-weighted token
    * quota out of `budgetTokens` ([[temperatureMix]]'s weight rule on
    * TOKENS, not docs — fertility differences make doc-count budgeting
    * wrong, see `TextAnalysis.fertilityStats`), and the EFFECTIVE
    * EPOCHS (millis) that quota implies: quota ∕ n_tokens > 1.0 means
    * the group's data repeats to fill its slot — the overfitting
    * signal mix reviews exist to catch.
    *
    * One token-counting aggregation pass (map-side combine, x03's
    * LENGTH-difference identity — no token arrays); every derived
    * column is exact integer arithmetic on the |groups|-row table
    * (the budget·weight product runs in DECIMAL(38,0) — a Long
    * crosses 2⁶³ at trillion-token budgets; the quotient ≤ budget
    * always fits). α = 0.5 is spelled via the correctly-rounded
    * sqrt, the [[temperatureMix]] portability rule.
    *
    * @return (grp, n_docs, n_tokens, share_permille, quota_tokens,
    *         epochs_milli) ordered by grp. */
  def mixtureReport(docs: DataFrame, groupCol: String, alpha: Double,
                    budgetTokens: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    require(budgetTokens > 0, s"budgetTokens ($budgetTokens) must be positive")
    val counts = docs.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.operators.TextAnalysis.tokenCountCol(col("text"))).as("n_tokens"))
    val wExpr =
      if (alpha == 0.5) floor(sqrt(col("n_tokens").cast("double")) * 1e6)
      else floor(pow(col("n_tokens").cast("double"), lit(alpha)) * 1e6)
    val weighted = counts.withColumn("w", wExpr.cast("long"))
    val tots = weighted.agg(sum("n_tokens").as("tot_tokens"), sum("w").as("tot_w"))
    weighted.crossJoin(tots)
      .withColumn("quota_tokens", expr(
        s"CAST(CAST($budgetTokens AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0))" +
          " div CAST(tot_w AS DECIMAL(38,0)) AS BIGINT)"))
      .select(col("grp"), col("n_docs"), col("n_tokens"),
        expr("CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000" +
          " div CAST(tot_tokens AS DECIMAL(38,0)) AS BIGINT)").as("share_permille"),
        col("quota_tokens"),
        // quota·1000 also runs in decimal — a quadrillion-token quota
        // would cross 2⁶³ in Long (same ANSI-overflow trap as above)
        expr("CAST(CAST(quota_tokens AS DECIMAL(38,0)) * 1000" +
          " div CAST(n_tokens AS DECIMAL(38,0)) AS BIGINT)").as("epochs_milli"))
      .orderBy("grp")
  }

  /** Keep only the TOP `keepPermille` of each group by a quality
    * metric — per-group dynamic thresholding ("top quartile per
    * language"), the group-aware form of a global quality bar. An
    * ABSOLUTE cutoff starves low-resource groups (a minority
    * language's whole score distribution can sit below the majority's
    * bar, so the global threshold silently deletes the language); a
    * per-group quantile keeps the best fraction of EVERY group.
    *
    * The percent-rank comes from [[graft.queries.Relational
    * .rankCalibrate]]'s value-counts histogram — the rank window runs
    * over the (group, distinct metric value) counts table, never a
    * whole group through one task — and ties share a rank, so a tie
    * class is kept or dropped atomically (deterministic,
    * engine-portable: no row_number coin flips inside equal scores).
    * A singleton group has percent-rank 0: it survives only
    * keepPermille = 1000 (document the group floor upstream if
    * singleton groups must always survive).
    *
    * @return (id, group, metric, pr_permille) for kept rows, ordered
    *         by id. */
  def topQuantileByGroup(df: DataFrame, groupCol: String, metricCol: String,
                        idCol: String, keepPermille: Long): DataFrame = {
    require(keepPermille >= 1 && keepPermille <= 1000,
      s"keepPermille ($keepPermille) must be in [1, 1000]")
    graft.queries.Relational.rankCalibrate(df, groupCol, metricCol, idCol)
      .filter(col("pr_permille") >= lit(1000L - keepPermille))
      .orderBy(idCol)
  }

  /** Deterministic train/val/test split assignment: every row gets
    * exactly one split label from cumulative permille thresholds over
    * the SAME md5-keyed uniform as the samplers — disjoint, exhaustive
    * (thresholds must sum to 1000), leak-free under retries and
    * re-runs, and stable when the dataset GROWS (a key's label never
    * changes as other rows arrive — the property random shuffles
    * lack, and the reason eval contamination can't creep in on
    * re-ingestion). Scan-only: a derived column, no shuffle.
    *
    * @param splits ordered (label, permille) slices, e.g.
    *   Seq("train" -> 900L, "val" -> 50L, "test" -> 50L).
    * @return input columns + `split`. */
  def splitAssign(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Long)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) &&
      splits.map(_._2).sum == 1000L,
      s"split permilles must be non-negative and sum to 1000, got $splits")
    df.withColumn("split", splitCase(hashPermille(col(keyCol)), splits))
  }

  /** CASE h < c1 THEN l1 WHEN h < c2 THEN l2 … (last branch always
    * matches: h < 1000 by construction) — the one spelling of the
    * split rule, shared by [[splitAssign]] and [[clusterSplitAssign]]. */
  private def splitCase(h: Column, splits: Seq[(String, Long)]): Column = {
    val cum = splits.scanLeft(0L)(_ + _._2).tail
    splits.zip(cum).foldRight(lit(splits.last._1): Column) {
      case (((label, _), bound), other) => when(h < bound, lit(label)).otherwise(other)
    }
  }

  /** LEAKAGE-SAFE split assignment — [[splitAssign]] keyed by the
    * near-dup CLUSTER instead of the document: close the pair graph
    * ([[Dedup.connectedComponentsUnsorted]]), key every document by
    * its cluster label (its own id when unpaired), and hash-split on
    * THAT. Splitting per document puts near-copies of one page on
    * both sides of a train/test boundary — memorization leaks into
    * eval and the held-out loss lies; splitting per cluster keeps
    * every near-dup family atomically on one side. This is the split
    * rule a deduplicated corpus actually needs, and it composes with
    * the same md5 determinism contract as every sampler here.
    *
    * Cost: the component fixpoint runs over found PAIRS only; the
    * corpus-side work is one left join against the (tiny) label table
    * plus the scan-side hash CASE.
    *
    * @return (keyCol, cluster_id, split), ordered by keyCol. */
  def clusterSplitAssign(docs: DataFrame, pairs: DataFrame, keyCol: String,
                         splits: Seq[(String, Long)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) &&
      splits.map(_._2).sum == 1000L,
      s"split permilles must be non-negative and sum to 1000, got $splits")
    val labels = Dedup.connectedComponentsUnsorted(pairs)
      .withColumnRenamed("doc_id", keyCol)
    docs.select(col(keyCol))
      .join(labels, Seq(keyCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(keyCol)))
      .withColumn("split", splitCase(hashPermille(col("cluster_id")), splits))
      .orderBy(keyCol)
  }

  /** Deterministic fixed-size per-group sample: the `n` rows of each
    * group whose md5-uniform (key-derived — see [[hashMod]]) is
    * smallest, key ascending on hash ties. The md5 order is a
    * reproducible random permutation, so this is an exact-size
    * uniform-without-replacement sample per group — the distributed,
    * retry-stable replacement for per-group reservoir sampling
    * (a sequential algorithm that cannot shard).
    *
    * Scale shape: ONE shuffle keyed by the group + a per-group sort
    * for the rank window. Group sizes bound the sort, not the corpus;
    * for pathological mega-groups pre-filter with a permille hash
    * band ([[hashSample]] at ~10·n/|group| rate) before ranking so
    * the window sees a thin candidate slice instead of the full
    * group. */
  def groupSample(df: DataFrame, groupCol: String, keyCol: String,
                  n: Int): DataFrame = {
    require(n >= 1, s"n ($n) must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashMod(col(keyCol), 1000000007L), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic WEIGHTED sample of k rows without replacement —
    * Efraimidis–Spirakis A-ES: each row draws a key-derived uniform
    * u ∈ (0, 1] and ranks by u^(1/w); the k largest are a weighted
    * sample without replacement (a row's inclusion odds scale with its
    * weight — quality-weighted corpus subsets, importance-weighted
    * eval slices). Ranking uses the monotone-equivalent ln(u)/w
    * DESCENDING (one correctly-rounded-ish ln per row instead of a
    * pow), with the id as total-order tiebreak.
    *
    * Determinism contract: u comes from [[hashMod]]'s md5-uniform
    * (+1 so u > 0 — ln(0) never evaluates), so the sample is
    * retry-stable, partition-invariant, and engine-replayable; the
    * float is confined to RANKING — output columns are the input's —
    * and adjacent keys differ by ≫ ulps generically, so the k-boundary
    * replays cross-engine.
    *
    * Scale shape: a narrow scan projection + global top-k
    * (TakeOrderedAndProject — no global sort, no window); weights must
    * be strictly positive (fail fast, not NaN ranks).
    *
    * @return the k sampled rows (input columns), ordered by `idCol`. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") + lit(1.0d)) / lit(1152921504606846976.0d) // 2^60
    val key = log(u) / col(weightCol).cast("double")
    val cols = df.columns.map(col)
    df.withColumn("__es",
        when(col(weightCol) > 0, key)
          .otherwise(raise_error(concat(
            lit(s"weightedSample: non-positive or null $weightCol for ${idCol}="),
            col(idCol).cast("string")))))
      .orderBy(col("__es").desc, col(idCol))
      .limit(k)
      .select(cols: _*)
      .orderBy(idCol)
  }

  /** k-fold cross-validation assignment: fold = md5-uniform(key) mod k
    * — [[splitAssign]]'s rotating-holdout sibling under the SAME
    * portable-hash contract ([[hashMod]]), so folds are deterministic,
    * retry-stable, disjoint, exhaustive, and stable under corpus
    * growth (a row's fold never changes when other rows arrive — the
    * property a cached per-fold metric store depends on). Scan-only:
    * one codegen expression per row, no shuffle, no window, no state.
    *
    * Leakage note: keyed per ROW this has the same near-dup leakage
    * failure [[clusterSplitAssign]] fixes for train/test — key by the
    * dup-cluster label when folds feed model selection over a
    * non-deduplicated corpus.
    *
    * @return input + `fold` column in [0, k). */
  def kfoldAssign(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 1000, s"k ($k) must be in [2, 1000]")
    df.withColumn("fold", hashMod(col(keyCol), k.toLong))
  }

  /** Time-based train/test split with an EMBARGO gap — the
    * time-series counterpart of [[splitAssign]]: rows strictly before
    * `cutoffUs` train, rows in [cutoff, cutoff + embargo) are
    * EMBARGOED (assigned to neither side), and rows at or beyond the
    * embargo test. Random row-hash splits are WRONG for forecasting
    * and event models — the model sees the future of the very series
    * it is tested on; and even a clean time cutoff leaks through
    * windowed features (a 7-day rolling count computed at test start
    * reads 7 train days), which is exactly what the embargo absorbs
    * (size it at the longest feature lookback — the purged/embargoed
    * split of López de Prado 2018).
    *
    * Scan-only: one codegen CASE per row, no shuffle, no state;
    * deterministic and growth-stable like every assigner here.
    *
    * @return input + `split` ∈ {train, embargo, test}. */
  def timeSplitAssign(df: DataFrame, tsCol: String, cutoffUs: Long,
                      embargoUs: Long): DataFrame = {
    require(embargoUs >= 0, s"embargoUs ($embargoUs) must be >= 0")
    val t = expr(s"unix_micros($tsCol)")
    df.withColumn("split",
      when(t < cutoffUs, lit("train"))
        .when(t < cutoffUs + embargoUs, lit("embargo"))
        .otherwise(lit("test")))
  }

  /** Split-leakage audit — the MEASUREMENT that motivates
    * [[clusterSplitAssign]]: given the near-dup pair table (da, db)
    * and a per-document split rule, the matrix of pair counts by
    * (split, split). Every off-diagonal cell is train/test
    * CONTAMINATION — a near-copy of an eval document sitting in
    * training, the leak that makes held-out loss lie. Run it after
    * any per-document split of a non-deduplicated corpus: a non-zero
    * leak row is the finding; the fix is [[clusterSplitAssign]]
    * (cluster-keyed assignment puts every near-dup family atomically
    * on one side, so ITS matrix is diagonal by construction).
    *
    * Shape: both endpoints' splits are the SAME scan-side md5
    * expression ([[splitAssign]]'s `splitCase`/[[hashPermille]] — no
    * assignment join, nothing but the pair table ever shuffles), the
    * cell labels canonicalize (lo ≤ hi, so leak cells don't split by
    * direction), and the matrix is ≤ |splits|² rows.
    *
    * @return (split_lo, split_hi, n_pairs, is_leak) ordered. */
  def splitLeakageAudit(pairs: DataFrame,
                        splits: Seq[(String, Long)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) &&
      splits.map(_._2).sum == 1000L,
      s"split permilles must be non-negative and sum to 1000, got $splits")
    val sa = splitCase(hashPermille(col("da")), splits)
    val sb = splitCase(hashPermille(col("db")), splits)
    pairs
      .select(least(sa, sb).as("split_lo"), greatest(sa, sb).as("split_hi"))
      .groupBy("split_lo", "split_hi")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_leak",
        when(col("split_lo") =!= col("split_hi"), 1).otherwise(0))
      .orderBy("split_lo", "split_hi")
  }

  /** Water-filling mixture allocation — the SOLVER behind the mixture
    * planners: [[mixtureEpochPlan]] reports what a weight vector
    * demands and where it falls short; this finds the allocation a
    * data-mixing run actually uses — give each source tokens
    * proportional to its weight, cap at availability, and REDISTRIBUTE
    * every capped source's surplus across the uncapped ones (the
    * water-filling fixed point: Σ min(avail_s, λ·w_s) = budget).
    *
    * Solved in CLOSED FORM over the bounded source table — no
    * iteration: sources sort by the exact ratio avail/weight (the
    * integer key (avail·10¹⁵) div weight — resolution 10⁻¹⁵, finer
    * than the 1/(w_i·w_j) ≥ 10⁻¹² minimum gap between distinct
    * rationals, so the order is the true rational order), the capped
    * prefix falls out of one cross-multiplied inequality per row
    * (avail_s·(totW − cumW_s) ≤ w_s·(budget − cumA_s) — all exact
    * DECIMAL(38,0), no floats), and uncapped allocations are one
    * truncating division against the water level num/den read off a
    * 1-row aggregate. Truncation keeps Σ allocated ≤ budget; the
    * ≤|uncapped|-token remainder is deliberately NOT smeared (a
    * deterministic sub-token residue, not a planning quantity).
    *
    * @param weights (source, weight_ppm) — relative weights, > 0;
    *        sources absent from the corpus allocate 0 (capped).
    * @return (source, weight_ppm, available_tokens, allocated_tokens,
    *         capped) ordered by source. */
  def mixtureWaterFill(docs: DataFrame, weights: Seq[(String, Long)],
                       budgetTokens: Long,
                       sourceCol: String = "source"): DataFrame = {
    require(weights.nonEmpty && weights.map(_._1).distinct.size == weights.size,
      s"weights must be non-empty and distinct per source, got $weights")
    require(weights.forall(_._2 > 0), s"weights must be positive, got $weights")
    // the ppm contract also bounds every division's denominator at 10⁶,
    // which is what keeps the scale-6 decimal divisions EXACT after
    // FLOOR (fraction gaps ≥ 10⁻⁶ > the 5·10⁻⁷ rounding error — the
    // cross-engine guarantee)
    require(weights.map(_._2).sum <= 1000000L,
      s"weights sum to ${weights.map(_._2).sum} ppm > 1e6")
    require(budgetTokens >= 0, s"budgetTokens ($budgetTokens) must be >= 0")
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val avail = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(sum(TextAnalysis.tokenCountCol(col("text"))).as("__a"))
    val base = weights.toDF("source", "weight_ppm")
      .join(avail, Seq("source"), "left")
      .select(col("source"), col("weight_ppm"),
        coalesce(col("__a"), lit(0L)).as("available_tokens"))
    val keyed = base.withColumn("__rk",
      expr("""CAST(FLOOR((CAST(available_tokens AS DECIMAL(38,0))
           * 1000000000000000) / weight_ppm) AS DECIMAL(38,0))"""))
    val w = Window.orderBy(col("__rk"), col("source"))
    val flagged = keyed
      .withColumn("__cumA", sum("available_tokens").over(w))
      .withColumn("__cumW", sum("weight_ppm").over(w))
      .crossJoin(broadcast(keyed.agg(sum("weight_ppm").as("__totW"))))
      .withColumn("capped", when(
        expr(s"""CAST(available_tokens AS DECIMAL(38,0)) * (__totW - __cumW)
              <= CAST(weight_ppm AS DECIMAL(38,0))
                 * (CAST(${budgetTokens}L AS DECIMAL(38,0)) - __cumA)"""),
        1L).otherwise(0L))
    val level = flagged.agg(
      greatest(lit(budgetTokens) -
        sum(when(col("capped") === 1L, col("available_tokens"))
          .otherwise(0L)), lit(0L)).cast("decimal(38,0)").as("__num"),
      sum(when(col("capped") === 0L, col("weight_ppm")).otherwise(0L))
        .cast("decimal(38,0)").as("__den"))
    flagged.crossJoin(broadcast(level))
      .withColumn("allocated_tokens",
        when(col("capped") === 1L, col("available_tokens"))
          .otherwise(expr("""CAST(FLOOR(CAST(weight_ppm AS DECIMAL(38,0))
               * __num / __den) AS BIGINT)""")))
      .select("source", "weight_ppm", "available_tokens",
        "allocated_tokens", "capped")
      .orderBy("source")
  }

  /** Split-leakage REPAIR plan — [[splitLeakageAudit]] MEASURES the
    * leaks (near-dup pairs straddling a train/eval boundary); this
    * PLANS the minimal-move fix (the x277/x280 measure→plan closure):
    * close the pair graph into clusters, compute every member's
    * CURRENT hash split ([[splitAssign]]'s scan-side md5 rule — no
    * assignment join), elect each cluster's TARGET split as its
    * members' majority (ties to the earliest-DECLARED split —
    * deterministic, and train-first under the conventional
    * declaration order, which is where a leaked eval doc should go:
    * removing it from eval fixes the leak, adding it to train is
    * free), and list exactly the documents that must move. Clusters
    * already on one side emit nothing — the plan is the move list,
    * never a copy of the corpus. Moving every listed doc makes
    * [[splitLeakageAudit]] read zero leak cells over the same pairs,
    * by construction.
    *
    * Scale shape: the component fixpoint runs over found PAIRS only;
    * splits are a scan-side CASE over md5; the election is a
    * (cluster, split) count plus an argmax window over that bounded
    * table; movers fall out of one keyed join against the
    * ≤|clusters|-row target table.
    *
    * @return (doc_id, cluster_id, from_split, to_split) — movers
    *         only, ordered by doc_id. */
  def splitRepairPlan(pairs: DataFrame,
                      splits: Seq[(String, Long)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) &&
      splits.map(_._2).sum == 1000L,
      s"split permilles must be non-negative and sum to 1000, got $splits")
    import org.apache.spark.sql.expressions.Window
    val labels = Dedup.connectedComponentsUnsorted(pairs)
    val withSplit = labels.withColumn("from_split",
      splitCase(hashPermille(col("doc_id")), splits))
    // declared-order priority breaks count ties deterministically
    val prio = splits.map(_._1).zipWithIndex
      .foldRight(lit(splits.size): Column) { case ((l, i), other) =>
        when(col("from_split") === l, lit(i)).otherwise(other)
      }
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("__c").desc, col("__prio"))
    val target = withSplit.groupBy("cluster_id", "from_split")
      .agg(count(lit(1)).as("__c"))
      .withColumn("__prio", prio)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("cluster_id"), col("from_split").as("to_split"))
    withSplit.join(target, Seq("cluster_id"))
      .filter(col("from_split") =!= col("to_split"))
      .select("doc_id", "cluster_id", "from_split", "to_split")
      .orderBy("doc_id")
  }

  /** TOKEN-BUDGET corpus cut: keep the highest-priority documents
    * whose cumulative token count fits `budgetTokens` — the corpus-
    * assembly step after quality scoring ("we can afford B tokens;
    * take the best") that a naive global ORDER BY + running-sum
    * window would serialize through one task at 100 TB.
    *
    * Scale shape — threshold find, not a corpus sort: one map-side-
    * combined aggregation collapses the corpus to its (priority value
    * → token mass) weight table; the running sum and the budget
    * boundary are found on THAT bounded table (the x71/x92
    * distinct-value-window discipline); priority classes strictly
    * inside the budget are kept via one broadcast-able semi-join (a
    * scan-side filter); only the SINGLE boundary class — the one
    * value whose mass straddles the budget — pays a per-doc running
    * sum, ordered by doc_id so the partial fill is deterministic.
    * Worst case (a corpus with one distinct priority value) degrades
    * to the naive plan for exactly that class; every real priority
    * column (quality permille, n_chars) has enough values to keep the
    * boundary class a vanishing fraction.
    *
    * Docs with NULL priority or NULL text are excluded — no rank, no
    * token count to budget.
    *
    * @return kept docs (doc_id, priority, n_tokens), ordered priority
    *         DESC then doc_id — the fill order itself. */
  def budgetCut(docs: DataFrame, budgetTokens: Long,
                priorityCol: String = "n_chars"): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens ($budgetTokens) must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val t = docs
      .filter(col(priorityCol).isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col(priorityCol).as("priority"),
        graft.operators.TextAnalysis.tokenCountCol(col("text")).as("n_tokens"))
    val w = t.groupBy("priority").agg(sum("n_tokens").as("__vtok"))
    // both windows run over the bounded distinct-priority table
    val cum = w
      .withColumn("__cum", sum("__vtok").over(Window.orderBy(col("priority").desc)))
      .withColumn("__cumb", col("__cum") - col("__vtok"))
    val full = cum.filter(col("__cum") <= budgetTokens).select("priority")
    val bnd = cum
      .filter(col("__cumb") < budgetTokens && col("__cum") > budgetTokens)
      .select(col("priority"), (lit(budgetTokens) - col("__cumb")).as("__r"))
    val inside = t.join(full, Seq("priority"), "left_semi")
    val wIn = Window.partitionBy("priority").orderBy("doc_id")
    val partial = t.join(broadcast(bnd), Seq("priority"))
      .withColumn("__c", sum("n_tokens").over(wIn))
      .filter(col("__c") <= col("__r"))
      .select("priority", "doc_id", "n_tokens")
    inside.unionByName(partial)
      .select(col("doc_id"), col("priority"), col("n_tokens"))
      .orderBy(col("priority").desc, col("doc_id"))
  }

  /** MIXTURE EPOCH PLANNER — the static allocation table a training
    * run is configured from: given target mixture weights (ppm per
    * source) and a total token budget, how many epochs (repeats,
    * milli) of each source's available tokens meet its share, where
    * the cap bites (data-constrained sources that would over-repeat —
    * the Muennighoff et al. 2023 repeat-degradation bound is why
    * `maxEpochsMilli` exists), and the shortfall the cap leaves. One
    * row per WEIGHT entry — a weighted source missing from the corpus
    * reports available 0 / NULL epochs / full-target shortfall (the
    * mixture spec names what the data lacks; it is not silently
    * renormalized — rerunning with redistributed weights is a policy
    * decision, so it stays with the caller).
    *
    * Exact integer throughout: targets and epochs cross-multiply in
    * DECIMAL(38,0) before the truncating div (the olsTrend overflow
    * discipline — budget·ppm overflows BIGINT at ~9·10¹² tokens,
    * well under a real budget). planned = available·capped div 1000
    * ≤ target by construction, so shortfall is never negative.
    *
    * Scale shape: ONE map-side-combined token-sum per source over the
    * corpus scan; everything after runs on the |weights|-row table
    * (broadcast join against the per-source sums).
    *
    * @param weights (source, weight_ppm), ppm ≥ 0, Σ ≤ 10⁶
    * @return (source, weight_ppm, available_tokens, target_tokens,
    *         epochs_milli, epochs_capped_milli, planned_tokens,
    *         shortfall_tokens) ordered by source. */
  def mixtureEpochPlan(docs: DataFrame, weights: Seq[(String, Long)],
                       budgetTokens: Long, maxEpochsMilli: Long = 4000L,
                       sourceCol: String = "source"): DataFrame = {
    require(weights.nonEmpty, "mixtureEpochPlan needs at least one weight")
    require(weights.forall(_._2 >= 0L),
      s"weights must be >= 0 ppm, got $weights")
    require(weights.map(_._2).sum <= 1000000L,
      s"weights sum to ${weights.map(_._2).sum} ppm > 1e6")
    require(weights.map(_._1).distinct.size == weights.size,
      "duplicate source in weights")
    require(budgetTokens > 0, s"budgetTokens ($budgetTokens) must be > 0")
    require(maxEpochsMilli >= 1, s"maxEpochsMilli ($maxEpochsMilli) must be >= 1")
    import docs.sparkSession.implicits._
    val avail = docs
      .select(col(sourceCol).as("source"),
        TextAnalysis.tokenCountCol(col("text")).as("__t"))
      .groupBy("source").agg(sum("__t").as("__avail"))
    weights.toDF("source", "weight_ppm")
      .join(avail, Seq("source"), "left")
      .select(col("source"), col("weight_ppm"),
        coalesce(col("__avail"), lit(0L)).as("available_tokens"),
        expr(s"cast((cast(${budgetTokens}L as decimal(38,0)) * weight_ppm)" +
          " div 1000000 as bigint)").as("target_tokens"))
      .withColumn("epochs_milli",
        when(col("available_tokens") === 0L, lit(null).cast("long"))
          .otherwise(expr("cast((cast(target_tokens as decimal(38,0)) * 1000)" +
            " div available_tokens as bigint)")))
      .withColumn("epochs_capped_milli",
        when(col("epochs_milli").isNull, lit(null).cast("long"))
          .otherwise(least(col("epochs_milli"), lit(maxEpochsMilli))))
      .withColumn("planned_tokens",
        when(col("epochs_capped_milli").isNull, lit(0L))
          .otherwise(expr("cast((cast(available_tokens as decimal(38,0))" +
            " * epochs_capped_milli) div 1000 as bigint)")))
      .withColumn("shortfall_tokens", col("target_tokens") - col("planned_tokens"))
      .orderBy("source")
  }

  /** Deterministic WEIGHTED sample without replacement — the
    * Efraimidis–Spirakis A-Res scheme with the randomness derived
    * from the key's md5, so the same corpus always draws the same
    * sample (retry-stable, cross-engine replayable — the [[hashSample]]
    * discipline with weights). Each row gets priority ln(u)·10⁶ div w
    * with u = (hashMod(key, 10⁶)+1)/10⁶; the n LARGEST priorities win
    * — selection probability ∝ weight, the standard proof. Integer
    * micronat ln (one rounded ln per row), truncating division
    * (negative toward zero — both engines, verified round 9), ties by
    * key.
    *
    * The top-n is a `TakeOrderedAndProject` — per-partition pre-
    * reduction, no global sort exchange; at 100 TB the sample costs
    * one scan.
    *
    * Usable weight range: u has only 10⁶ distinct values, so
    * |ln(u)·10⁶| ≤ ln(10⁶)·10⁶ ≈ 1.38·10⁷, and the integer priority
    * `(ln(u)·10⁶·10⁶) div w` truncates to 0 for every row once
    * w ≳ 1.4·10¹³ — degenerate all-zero priorities would silently
    * collapse selection to key order. Weights are REQUIRED < 10¹²
    * (≥ 14 distinct priority levels remain at the cap); rescale
    * heavier weights before sampling (selection is invariant to a
    * common positive scale factor up to the 10⁶ quantization).
    *
    * @return the n selected rows as (key, weight, priority_micro),
    *         ordered by priority DESC then key. */
  def weightedHashSample(df: DataFrame, keyCol: String, weightCol: String,
                         n: Int): DataFrame = {
    require(n >= 1, s"n ($n) must be >= 1")
    df.filter(col(keyCol).isNotNull && col(weightCol).isNotNull
        && col(weightCol) > 0)
      .select(col(keyCol).as("key"), col(weightCol).cast("long").as("weight"))
      // fail loud inside the scan, not silently in key order: the
      // priority quantization cannot discriminate weights >= 1e12
      .withColumn("weight", when(col("weight") < 1000000000000L, col("weight"))
        .otherwise(raise_error(concat(lit("weightedHashSample: weight "),
          col("weight").cast("string"),
          lit(" >= 1e12 exceeds the priority quantization range — rescale weights")))))
      .withColumn("__h", hashMod(col("key"), 1000000L) + 1L)
      .withColumn("priority_micro",
        // ln(u) = lnµ(h) − lnµ(10⁶): BOTH ln arguments are integers,
        // the proven cross-engine discipline (a float ratio under ln
        // risks a rounding-boundary flip between libms)
        expr("""((cast(floor(ln(cast(__h as double)) * 1000000 + 0.5d)
               as bigint)
             - cast(floor(ln(1000000.0d) * 1000000 + 0.5d) as bigint))
             * 1000000) div weight"""))
      .select(col("key"), col("weight"), col("priority_micro"))
      .orderBy(col("priority_micro").desc, col("key"))
      .limit(n)
  }

  /** QUALITY-RANKED PER-SOURCE CAP — the domain-cap stage (C4 capped
    * pages per domain; Dolma caps URLs) with the accounting a mix
    * review needs: keep the best `cap` documents per source by
    * (score DESC, doc_id) and report what each source keeps vs loses
    * in documents AND character mass. [[groupSample]] is the UNIFORM
    * per-group cut; this is the quality-ranked one — "which feed's
    * tail are we cutting" is the question the report answers.
    *
    * Scale shape: the kept set comes from the native `topk_pairs`
    * bounded aggregate ([[graft.queries.Relational.groupedTopK]]) —
    * each task folds to a ≤cap buffer map-side, so the shuffle carries
    * O(sources·cap) rows and a giant source never drags through one
    * rank-window task; totals are one map-side-combined aggregation;
    * the report join is |sources|-bounded.
    *
    * Docs with NULL source, score or id are excluded — no rank, no
    * mass to account.
    *
    * @param scoreCol integral quality score (n_chars here; any permille
    *                 quality column at 100 TB)
    * @return (source, n_docs, n_kept, n_dropped, total_score,
    *         kept_score, dropped_score), source-ordered. */
  def domainCap(docs: DataFrame, cap: Int,
                scoreCol: String = "n_chars"): DataFrame = {
    require(cap >= 1, s"cap ($cap) must be >= 1")
    val base = docs.filter(col("source").isNotNull
      && col(scoreCol).isNotNull && col("doc_id").isNotNull)
    val totals = base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(scoreCol).as("total_score"))
    val kept = graft.queries.Relational
      .groupedTopK(base, "source", "doc_id", scoreCol, cap)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(scoreCol).as("kept_score"))
    totals.join(kept, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        (col("n_docs") - col("n_kept")).as("n_dropped"),
        col("total_score"), col("kept_score"),
        (col("total_score") - col("kept_score")).as("dropped_score"))
      .orderBy("source")
  }
}
