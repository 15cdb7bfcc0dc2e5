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

  /** Morton (Z-order) value of two non-negative dimension columns:
    * the low `bits` bits of each are interleaved (a even positions, b
    * odd), so sorting by the result places rows close in BOTH
    * dimensions into the same neighborhood — and therefore the same
    * files, giving parquet min/max row-group skipping on EITHER
    * dimension from one sort order. Plain sort-by-(a,b) clusters only
    * the leading column; Z-order is the standard multi-dimensional
    * layout fix (Delta/Iceberg expose the same thing at table level).
    *
    * Pure integer shift/mask arithmetic (no UDF — stays in codegen and
    * is exactly replayable by any engine with `>> & |`). Inputs must
    * already be range-reduced to [0, 2^bits) — pass quantized/bucketed
    * dimensions, not raw values; out-of-range bits are masked off. */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
             bits: Int): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, s"bits ($bits) must be in [1, 31]")
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order a frame for writing: range-partition by the interleaved
    * key (contiguous Z-ranges per output file → tight per-file min/max
    * on both dimensions), then sort within partitions. One full sort
    * shuffle at write time, amortized over every later pruned scan —
    * the same pay-once economics as [[writeBucketed]]. */
  def zOrderBy(df: DataFrame, a: String, b: String, bits: Int,
               partitions: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zValue(col(a), col(b), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Small-file compaction plan — the maintenance pass every
    * streaming/incremental sink eventually needs: micro-batch and
    * per-bucket writes leave thousands of KB-scale files, and at
    * 100 TB the scan's task-scheduling and footer-reading overhead is
    * dominated by FILE COUNT, not bytes. This plans the merge: group
    * key-adjacent zones (the stand-ins for files of a key-ordered
    * layout — adjacency preserves the layout's min/max tightness, see
    * [[graft.operators.Profiling.zoneMapReport]]) greedily into
    * `targetBytes` output groups: group = bytes-before div target, so
    * every group except possibly the last reaches the target and no
    * group exceeds it by more than one input zone. Deterministic, one
    * pass, and the plan is itself a frame — auditable before any
    * rewrite executes (the same plan-then-verify contract as the
    * incremental upsert's bucket manifest).
    *
    * Shape: one map-side-combined per-zone aggregation collapses the
    * data scan to ≤|zones| rows; the running-bytes window orders THAT
    * bounded table (the x126 global-window-over-aggregate contract).
    *
    * @return (zone, n_rows, bytes, grp) ordered by zone; grp is the
    *         merge-group id, contiguous in zone order. */
  def compactionPlan(df: DataFrame, keyCol: String,
                     bytes: org.apache.spark.sql.Column, zoneWidth: Long,
                     targetBytes: Long): DataFrame = {
    require(zoneWidth > 0, s"zoneWidth ($zoneWidth) must be > 0")
    require(targetBytes > 0, s"targetBytes ($targetBytes) must be > 0")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("zone")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL keys zone nowhere and are dropped; floor-division zone id
    // (exact bigint form) keeps negative keys in correctly-labelled
    // zones — the zoneMapReport discipline.
    df.filter(col(keyCol).isNotNull)
      .select(expr(s"""(cast($keyCol as bigint)
            - pmod(cast($keyCol as bigint), ${zoneWidth}L))
            div ${zoneWidth}L""").as("zone"),
        bytes.cast("long").as("__b"))
      .groupBy("zone")
      .agg(count(lit(1)).as("n_rows"), sum("__b").as("bytes"))
      .withColumn("__cum", sum("bytes").over(w))
      .select(col("zone"), col("n_rows"), col("bytes"),
        expr(s"(__cum - bytes) div ${targetBytes}L").as("grp"))
      .orderBy("zone")
  }

  /** CLUSTERING-DEPTH histogram — the Iceberg/Delta layout-health
    * metric [[graft.operators.Profiling.zoneMapReport]] cannot see:
    * zone maps score zones derived FROM the key, which never overlap
    * by construction; real files are cut by ARRIVAL (ingest batches),
    * and on an unsorted table their key [min, max] ranges overlap each
    * other — a point lookup then reads every overlapping file no
    * matter how tight each file's own stats are. This measures that
    * directly: treating `fileExpr` as the file id (ingest batch at
    * test scale, the real file path in production), sweep the files'
    * key ranges and report, for each DEPTH d, how much of the key
    * space is covered by exactly d files. depth 1 everywhere = the
    * sorted ideal (compaction has nothing to do); mass at depth ≥ 4 =
    * every point query fans out 4× — the number that justifies a
    * [[sortedBy]]/Z-order rewrite, measured not guessed.
    *
    * Shape: ONE map-side-combined (file → min/max) aggregation
    * collapses the scan to |files| rows; the boundary sweep (+1 at lo,
    * −1 past hi, running sum) is a window over the ≤2|files|-row
    * boundary table — the x126 bounded-global-window contract. All
    * arithmetic exact integer; interior depth-0 segments (key-range
    * gaps between files) are reported too — they are the evidence of
    * perfect partitioning, not noise.
    *
    * @return (depth, n_segments, key_span) ordered by depth. */
  def clusteringDepthHistogram(df: DataFrame,
                               fileExpr: org.apache.spark.sql.Column,
                               keyCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val files = df.filter(col(keyCol).isNotNull)
      .groupBy(fileExpr.as("__f"))
      .agg(min(col(keyCol).cast("long")).as("lo"),
        max(col(keyCol).cast("long")).as("hi"))
    val bounds = files.select(col("lo").as("pt"), lit(1L).as("d"))
      .unionByName(files.select((col("hi") + 1L).as("pt"), lit(-1L).as("d")))
      .groupBy("pt").agg(sum("d").as("delta"))
    val sweep = Window.orderBy("pt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds
      .withColumn("depth", sum("delta").over(sweep))
      .withColumn("__next", lead("pt", 1).over(Window.orderBy("pt")))
      .filter(col("__next").isNotNull)
      .groupBy("depth")
      .agg(count(lit(1)).as("n_segments"),
        sum(col("__next") - col("pt")).as("key_span"))
      .orderBy("depth")
  }
}
