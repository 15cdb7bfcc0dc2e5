package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — dataset versioning's core primitive: which
  * keys were added, removed, or changed between two corpus drops.
  * The reference's upsert sink (etl_connector.py load stage, key-based
  * last-write-wins) answers "what is current"; diff answers "what
  * moved", which is what incremental reprocessing and audit trails
  * consume.
  */
object Snapshot {

  /** Keyed diff of two snapshots: (key, status) for every key whose
    * status is `added` (new only), `removed` (old only) or `changed`
    * (both, fingerprint differs). Unchanged keys are dropped — at
    * 100 TB the overwhelmingly common case, and the reason the output
    * is a delta, not a copy.
    *
    * Rows are compared by md5 over the U+0001-joined value columns,
    * computed SCAN-SIDE: only (key, 32-char fp) pairs ever reach the
    * full-outer join's shuffle, so the network cost is keys, not rows.
    * With both snapshots bucketed on the key ([[graft.core.Layout
    * .writeBucketed]]) the join is zero-Exchange. Caveat of the
    * separator-join fingerprint: NULL and '' are indistinguishable
    * (concat_ws skips nulls) — acceptable for change DETECTION;
    * pair with [[graft.etl.Pipeline]] quarantine flows if null-vs-
    * empty must round-trip. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
           valCols: Seq[String]): DataFrame = {
    require(valCols.nonEmpty, "diff needs at least one value column")
    def fp(df: DataFrame, out: String) = df.select(
      col(keyCol).as("__k"),
      md5(concat_ws("\u0001", valCols.map(col): _*)).as(out))
    fp(oldDf, "__ofp").join(fp(newDf, "__nfp"), Seq("__k"), "full_outer")
      .withColumn("status",
        when(col("__ofp").isNull, lit("added"))
          .when(col("__nfp").isNull, lit("removed"))
          .when(col("__ofp") =!= col("__nfp"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("__k").as(keyCol), col("status"))
      .orderBy(keyCol, "status")
  }
}
