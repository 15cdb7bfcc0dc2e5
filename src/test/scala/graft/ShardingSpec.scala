package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Sharding}

/** Rendezvous-vs-mod shard assignment: determinism, the minimal-
  * movement law (the whole point of HRW), and agreement with the
  * engine's single portable md5-hash contract. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int) = (1 to n).map(_.toLong).toDF("k")

  test("rendezvousShard: deterministic, in range, partition-invariant") {
    val df = keys(200)
    val a = df.select(col("k"), Sharding.rendezvousShard(col("k"), 4).as("s"))
      .as[(Long, Long)].collect().toMap
    val b = df.repartition(7)
      .select(col("k"), Sharding.rendezvousShard(col("k"), 4).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a.values.forall(s => s >= 0 && s < 4))
    // roughly balanced: each of 4 shards holds a real share of 200 keys
    val sizes = a.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size === 4 && sizes.values.forall(_ >= 20))
  }

  test("rendezvous movement law: a key either stays put or moves TO the new shard") {
    // THE structural property mod hashing lacks: growing n -> n+1 only
    // ever reassigns keys to the NEW shard — nothing reshuffles between
    // existing shards (each key's per-shard weights are independent;
    // adding shard n can only introduce a new argmax, never reorder the
    // old ones)
    val moved = keys(500).select(
      Sharding.rendezvousShard(col("k"), 4).as("before"),
      Sharding.rendezvousShard(col("k"), 5).as("after"))
      .filter(col("before") =!= col("after"))
      .as[(Long, Long)].collect()
    assert(moved.nonEmpty, "some keys must move to the new shard")
    assert(moved.forall(_._2 === 4L),
      s"every move must land on the NEW shard, got ${moved.toSeq.distinct}")
  }

  test("modShard matches Sampling.hashMod (one portable hash contract)") {
    val df = keys(50)
    val viaShard = df.select(Sharding.modShard(col("k"), 7))
      .as[Long].collect().toSeq
    val viaSampling = df.select(Sampling.hashMod(col("k"), 7L))
      .as[Long].collect().toSeq
    assert(viaShard === viaSampling)
  }

  test("rebalanceReport: rendezvous moves ~1/(n+1), mod moves ~n/(n+1)") {
    val out = Sharding.rebalanceReport(keys(1000), "k", 4, 5)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val mod = out("mod"); val rdv = out("rendezvous")
    assert(mod._2 === 1000L && rdv._2 === 1000L)
    // expected movement: mod 4/5 = 800000 ppm, rendezvous 1/5 = 200000
    assert(mod._4 > 700000L, s"mod should move ~80%, got ${mod._4} ppm")
    assert(rdv._4 < 300000L, s"HRW should move ~20%, got ${rdv._4} ppm")
    assert(rdv._4 * 2 < mod._4, "HRW must move far fewer keys than mod")
    // moved_ppm is exactly n_moved/n_rows in ppm
    assert(mod._4 === mod._3 * 1000000L / 1000L)
    // balance columns describe the BEFORE assignment
    assert(mod._5 >= mod._6 && mod._6 > 0L)
    assert(rdv._5 >= rdv._6 && rdv._6 > 0L)
  }

  test("rebalanceReport plan: row-local shard arithmetic, no per-shard explode join") {
    // the rendezvous argmax must ride the scan (array transform +
    // array_max), not fan out |rows|x|shards| through a join/explode
    val plan = Sharding.rebalanceReport(keys(10), "k", 4, 5)
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    val gens = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
    assert(joins.isEmpty, s"no join expected, found ${joins.size}")
    assert(gens.isEmpty, s"no explode expected, found ${gens.size}")
  }

  test("exportManifest: order/partition-invariant; one flipped byte flips ONE shard") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 60L).map(i => (i, s"doc $i words w$i")).toDF("doc_id", "text")
    val base = Sharding.exportManifest(docs, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val shuffled = Sharding.exportManifest(
      docs.orderBy(col("doc_id").desc).repartition(7), 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(base === shuffled,
      "the manifest must not depend on row order or partitioning")
    assert(base.map(_._2).sum === 60L)
    val flipped = Sharding.exportManifest(
      docs.withColumn("text",
        when(col("doc_id") === 17L, concat(col("text"), lit("!")))
          .otherwise(col("text"))), 8).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    val diffs = base.filter { case (s, _, _, c) => flipped(s) != c }
    assert(diffs.size === 1,
      s"exactly doc 17's shard must flip its checksum, got ${diffs.map(_._1)}")
  }
}
