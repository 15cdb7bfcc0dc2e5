package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall certification for the approximate operators (LSH / IVF /
  * near-dup): compares an approximate result's key set against the
  * exact baseline and emits ONE deterministic scalar row — the form
  * the driver's rows-check and a CI floor assertion can both consume.
  *
  * This is what makes the `no_oracle` ANN entries assertion-bearing:
  * the hashes are engine-specific (SURVEY §2.4 rule 6 exempts them
  * from cross-engine hashing), but recall against a seeded exact
  * baseline is a plain number any engine can check.
  */
object Recall {

  /** One-row (n_exact, n_found, n_hit, recall_permille): how much of
    * the exact result set the approximate result recovered, keyed by
    * `keys`. Empty exact set ⇒ recall 1000 (vacuously complete).
    *
    * All three inputs reduce to single-row counts before the
    * cross-joins, so the combine is three broadcast-trivial 1×1 joins
    * regardless of corpus size; cost is dominated by computing the
    * exact baseline itself (bound it — e.g. a probe subset — at scale). */
  def pairRecall(exact: DataFrame, found: DataFrame, keys: Seq[String]): DataFrame = {
    val e = exact.select(keys.map(col): _*).distinct()
    val f = found.select(keys.map(col): _*).distinct()
    val hit = e.join(f, keys, "left_semi")
    e.agg(count(lit(1)).as("n_exact"))
      .crossJoin(f.agg(count(lit(1)).as("n_found")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_exact"), col("n_found"), col("n_hit"),
        when(col("n_exact") === 0, lit(1000L))
          .otherwise(expr("n_hit * 1000 div n_exact")).cast("long")
          .as("recall_permille"))
  }
}
