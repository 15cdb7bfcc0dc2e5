package graft

import org.apache.spark.sql.functions._
import graft.core.{Layout, Tables}

/** Layout-level scale guards: bucketed joins must plan with zero
  * Exchange; partitioned reads must prune directories at the scan. */
class LayoutSpec extends SparkSpec {

  test("bucketed self-layout join plans without any Exchange") {
    Layout.dropManagedTable(spark, "orders_b")
    Layout.dropManagedTable(spark, "lineitem_b")
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    Layout.writeBucketed(orders.select("o_orderkey", "o_totalprice"),
      "orders_b", buckets = 4, bucketCols = Seq("o_orderkey"))
    Layout.writeBucketed(lineitem.select("l_orderkey", "l_quantity"),
      "lineitem_b", buckets = 4, bucketCols = Seq("l_orderkey"))
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
    // force the plan with AQE disabled view: check the initial physical plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle; plan:\n$plan")
    assert(joined.count() > 0)
  }

  test("partitioned write enables partition pruning at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    val events = Tables.events(spark, sf)
      .withColumn("d", col("ts").cast("date").cast("string"))
    Layout.writePartitioned(events.select("event_id", "event_type", "d"),
      dir, Seq("d"))
    val read = spark.read.parquet(dir).filter(col("d") === "2024-01-01")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(d"),
      s"filter on the partition column must prune directories; plan:\n$plan")
    // pruning selects a strict subset of the data
    val pruned = read.count()
    val all = spark.read.parquet(dir).count()
    assert(pruned > 0 && pruned < all)
  }

  test("GraftSession factory registers native functions and UDAFs") {
    // the shared test session was not built by GraftSession; register
    // directly and confirm the SQL surface the factory promises
    graft.functions.GraftFunctions.register(spark)
    graft.functions.VectorAgg.register(spark)
    import spark.implicits._
    Seq((1, Array(1.0f, 0.0f))).toDF("label", "embedding")
      .createOrReplaceTempView("gs_vecs")
    val out = spark.sql(
      "SELECT label, vec_avg(embedding) AS c, cosine_f32(embedding, embedding) AS s FROM gs_vecs GROUP BY label, embedding")
    assert(out.count() === 1L)
  }
}
