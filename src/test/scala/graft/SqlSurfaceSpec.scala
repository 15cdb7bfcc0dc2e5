package graft

import graft.core.Tables

/** The SQL-text surface certified BOARD-WIDE for the core contract:
  * every q01–q22 oracle string — written in the common ANSI dialect
  * both engines parse — runs through `spark.sql` over views of the
  * same tables, and the result must equal the DataFrame-API board
  * entry row for row AND column name for column name. x316 proved one
  * such query; this spec proves the property for the whole §2.4
  * contract, which is what "a reference user can bring raw SQL"
  * actually means: Catalyst plans both forms into the same engine.
  *
  * Dialect exclusions (documented, not silently skipped): the xNNN
  * oracle strings are NOT run here — many lean on DuckDB-only
  * spelling (`//` integer division, `string_split`, chained
  * `AS MATERIALIZED` CTEs, HUGEINT sums) by design, because their
  * job is to be maximally idiomatic for the ORACLE engine. The
  * q-board strings are the declared common-dialect surface.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("q01–q22: spark.sql over the oracle text ≡ the DataFrame board entry") {
    // the same loaders Verify uses — events normalizes its ts layout,
    // so the SQL text sees the contract schema, not the raw parquet
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sf).createOrReplaceTempView("orders")
    Tables.customer(spark, sf).createOrReplaceTempView("customer")
    Tables.supplier(spark, sf).createOrReplaceTempView("supplier")
    Tables.part(spark, sf).createOrReplaceTempView("part")
    Tables.nation(spark, sf).createOrReplaceTempView("nation")
    Tables.region(spark, sf).createOrReplaceTempView("region")
    Tables.events(spark, sf).createOrReplaceTempView("events")
    Tables.documents(spark, sf).createOrReplaceTempView("documents")
    Tables.embeddings(spark, sf).createOrReplaceTempView("embeddings")

    val queries = graft.entry.BoardQ.queries
    val oracles = graft.entry.BoardQ.oracleSql
    assert(oracles.keySet === queries.keySet,
      "every core query must carry its common-dialect SQL text")
    oracles.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      val viaApi = queries(name)(spark, sf)
      val viaSql = spark.sql(sql)
      assert(viaApi.columns.toSeq === viaSql.columns.toSeq,
        s"$name: column names diverge between the API and SQL forms")
      val apiRows = viaApi.collect().map(_.toString).toSeq
      val sqlRows = viaSql.collect().map(_.toString).toSeq
      assert(apiRows === sqlRows,
        s"$name: ${apiRows.size} API rows vs ${sqlRows.size} SQL rows — " +
        "the two forms must be row-for-row identical")
    }
  }
}
