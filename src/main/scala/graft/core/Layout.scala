package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical data layout for scale: bucketing (shuffle-free co-located
  * joins/aggregations) and partitioned writes (scan-time partition
  * pruning).
  *
  * At 100 TB these two layout decisions dominate query cost:
  *  - a fact table bucketed on its join key turns every fact-fact
  *    equi join and keyed aggregation into a zero-Exchange plan —
  *    the shuffle is paid ONCE at write time, amortized over every
  *    subsequent query;
  *  - partitioning on a low-cardinality predicate column (date,
  *    region) lets the scan skip whole directories
  *    (`PartitionFilters` in the plan), before row-group stats even
  *    apply.
  */
object Layout {

  /** Drop a managed table AND its leftover warehouse directory — the
    * in-memory catalog forgets tables across JVMs but the directory
    * survives, making a later saveAsTable refuse with
    * LOCATION_ALREADY_EXISTS. */
  def dropManagedTable(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
      .stripPrefix("file:")
    // the catalog lowercases unquoted identifiers, and a db-qualified
    // managed table lives under <db>.db/<table> — mirror both, or the
    // delete misses the real directory and the next saveAsTable still
    // fails with LOCATION_ALREADY_EXISTS
    val rel = name.toLowerCase.split('.') match {
      case Array(db, tbl) => s"$db.db/$tbl"
      case _ => name.toLowerCase
    }
    Fs.deleteRecursively(new java.io.File(warehouse, rel))
  }

  /** Write `df` as a bucketed+sorted managed table. Spark's bucket
    * layout requires the table catalog (`saveAsTable`); readers then
    * get `HashPartitioning(bucketCols, n)` from the scan for free. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Directory-partitioned parquet write: one directory per distinct
    * value combination of `partitionCols`. Keep partition columns
    * low-cardinality (dates, enums) — millions of tiny directories
    * are their own scale bug. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
}
