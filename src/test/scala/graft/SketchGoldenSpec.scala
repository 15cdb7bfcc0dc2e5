package graft

import org.apache.spark.sql.functions._

/** Golden pins for the engine-specific sketch states behind the
  * rule-6 queries (x20 HLL++, x37 count-min, x78/x179 DataSketches
  * HLL): serialized-sketch digests and estimates over a FIXED input,
  * so a Spark or DataSketches upgrade that changes sketch layout or
  * estimates fails HERE — named — instead of silently shifting the
  * rows-only query outputs the oracle can't hash. (The accompanying
  * law specs — x179's pane-union ≡ direct in IncrementalSpec, x37's
  * CMS overestimate bound in TextAnalysisSpec — prove the operators
  * CORRECT; these pin the exact artifacts a version bump would move.)
  *
  * Pinned on Spark 4.1.2: if an upgrade changes a digest but the
  * matching estimate still satisfies its law spec, re-pin the digest
  * and record the version in the commit; if an ESTIMATE moves, the
  * rows-only CORRECTNESS rows for x20/x37/x78/x179 have moved too —
  * re-baseline deliberately, never silently. */
class SketchGoldenSpec extends SparkSpec {
  import spark.implicits._

  private def sha256(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString

  // fixed corpus: token t{i%37}, i < 1000 — multiplicities exactly
  // 28 (t0..t1) / 27 (the rest); far below eps·n, so CMS is exact here
  private lazy val toks = (0 until 1000).map(i => s"t${i % 37}").toDF("tok")
  // fixed id stream: 500 distinct longs, each seen twice
  private lazy val ids = ((0 until 500) ++ (0 until 500)).map(_.toLong).toDF("k")

  test("count-min sketch (x37's artifact): serialized state and estimates are pinned") {
    val cms = toks.stat.countMinSketch("tok", 0.001, 0.99, 42)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    assert(sha256(bos.toByteArray)
      === "de23205bc7fcb1eb9bab60a9141eab06d8c0fcbb57ab335ef5bcd2fdd167fe7c",
      "CMS serialized layout changed — a Spark upgrade moved x37's sketch state")
    assert(cms.estimateCount("t0") === 28L)
    assert(cms.estimateCount("t36") === 27L)
    assert(cms.estimateCount("zzz") === 0L,
      "an absent key must estimate 0 on this under-loaded sketch")
  }

  test("DataSketches HLL (x78/x179's artifact): state digest and estimate are pinned") {
    val sk = ids.agg(expr("hll_sketch_agg(k)").as("sk"),
      expr("hll_sketch_estimate(hll_sketch_agg(k))").as("est"))
      .select(col("sk"), col("est")).head()
    assert(sha256(sk.getAs[Array[Byte]](0))
      === "fccab48b936b2bb8deb72b72b0e17dc456875fb5f3cce23164591e78fe7eaaa7",
      "HLL serialized layout changed — a DataSketches upgrade moved x78/x179 state")
    assert(sk.getLong(1) === 495L,
      "HLL estimate for 500 distinct moved — the rows-only x78/x179 outputs moved too")
  }

  test("HLL union (the x179 pane law's artifact): lossless disjoint union is pinned") {
    // two parity panes of the same 500 ids: the union's ESTIMATE must
    // equal sketching the whole set directly (DataSketches unions are
    // lossless at matched lgK) — the exact law x179 relies on, pinned
    // at the serialized level
    val u = ids.withColumn("pane", (col("k") % 2).cast("int"))
      .groupBy("pane").agg(expr("hll_sketch_agg(k)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
        expr("hll_union_agg(sk)").as("sk"))
      .select(col("est"), col("sk")).head()
    assert(u.getLong(0) === 495L, "pane-union estimate diverged from direct")
    assert(sha256(u.getAs[Array[Byte]](1))
      === "4c6d46989fc89dc450de6297815eae2d224340f56f71afa147e890b9b87e3088",
      "HLL union serialized state changed across versions")
  }
}
