package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test corpus (TESTDATA.md).
  *
  * One parquet file per table under `dir`. Schemas are carried by the
  * parquet footers; we deliberately do NOT pass explicit schemas so the
  * scan keeps native column pruning + predicate pushdown (verified via
  * `.explain("formatted")`: `PushedFilters` / `ReadSchema`).
  *
  * Scale notes: at 100 TB each of these would be a partitioned parquet
  * dataset (directory, not single file); `spark.read.parquet(path)` is
  * unchanged, partition pruning then applies on directory keys.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot hold in
    * TimestampType (µs). We read nanos as a long (full precision kept in
    * `ts_ns` — the DuckDB oracle compares at ns precision, so last-wins
    * ordering must too) and derive `ts` as a µs TimestampType via
    * truncation, which matches DuckDB's ns→DATE/µs truncation.
    *
    * SIDE EFFECT: enables `spark.sql.legacy.parquet.nanosAsLong` on the
    * SESSION (there is no per-read switch) — other parquet reads with
    * NANOS columns in the same session will surface them as longs too.
    * GraftSession.local sets it up front so behavior never depends on
    * whether this loader ran first. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      // FLOOR division, not `div` (which truncates toward zero): a
      // pre-epoch ts_ns off a µs boundary must round down like
      // DuckDB's ns→µs conversion, or boundary rows disagree
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
