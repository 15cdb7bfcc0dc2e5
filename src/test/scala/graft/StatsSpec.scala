package graft

import org.apache.spark.sql.functions.col
import graft.operators.Profiling

/** Specs for the statistics operators (corr matrix, PMI cells,
  * equi-depth histogram) — hand-computed small cases, exactness
  * guards, and the determinism contracts the oracles rely on. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("corrMatrix: perfect correlation, anti-correlation, and ordering") {
    val df = Seq((1L, 2L, 4L), (2L, 4L, 3L), (3L, 6L, 2L), (4L, 8L, 1L))
      .toDF("a", "b", "c")
    val out = Profiling.corrMatrix(df, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("a", "b") -> 1000L,  // b = 2a
      ("a", "c") -> -1000L, // c = 5 - a
      ("b", "c") -> -1000L))
  }

  test("corrMatrix: zero-variance column yields NULL, not a crash") {
    val df = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("a", "k")
    val row = Profiling.corrMatrix(df, Seq("a", "k")).collect()
    assert(row.length === 1)
    assert(row(0).isNullAt(2))
  }

  test("corrMatrix rejects unknown or too-few columns") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] { Profiling.corrMatrix(df, Seq("a")) }
    intercept[IllegalArgumentException] { Profiling.corrMatrix(df, Seq("a", "zz")) }
  }

  test("pmiCells: independent table has zero PMI everywhere") {
    val df = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q"))
      .toDF("x", "y")
    val out = Profiling.pmiCells(df, "x", "y").collect()
    assert(out.length === 4)
    assert(out.forall(_.getLong(3) === 0L))
  }

  test("pmiCells: a diagonal table scores ln(2) per cell; nulls drop") {
    // cells (a,p)=2 and (b,q)=2, n=4: PMI = ln(4·2/(2·2)) = ln 2
    val df = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "q"),
      (null, "p"), ("a", null)).toDF("x", "y")
    val out = Profiling.pmiCells(df, "x", "y").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val ln2Micro = math.floor(math.log(2.0) * 1e6 + 0.5).toLong // 693147
    assert(out === Map(
      ("a", "p") -> ((2L, ln2Micro)),
      ("b", "q") -> ((2L, ln2Micro))))
  }

  test("equidepthHistogram: equal counts when nbins divides n, bounds exact") {
    val df = (1L to 10L).map(v => (v * 10, v)).toDF("v", "id")
    val out = Profiling.equidepthHistogram(df, "v", 2, Seq("id")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1, 5L, 10L, 50L), (2, 5L, 60L, 100L)))
  }

  test("equidepthHistogram: remainder rows land in the leading buckets (NTILE rule)") {
    val df = (1L to 11L).map(v => (v, v)).toDF("v", "id")
    val counts = Profiling.equidepthHistogram(df, "v", 2, Seq("id")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts === Map(1 -> 6L, 2 -> 5L))
  }

  test("equidepthHistogramApprox: near-equal counts, contiguous bounds, ties stay together") {
    val df = (1L to 10000L).map(v => (v % 97, v)).toDF("v", "id")
    val out = Profiling.equidepthHistogramApprox(df, "v", 10, relativeError = 0.001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._2).sum === 10000L)
    // near-equal: every bucket within 25% of the ideal 1000 (97 heavy
    // tie classes of ~103 rows each bound the achievable balance)
    assert(out.forall(b => b._2 > 750 && b._2 < 1250),
      s"bucket counts ${out.map(_._2).toSeq}")
    // buckets are value-contiguous and non-overlapping
    val sorted = out.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array(x, y) => assert(x._4 < y._3, s"overlap: $x vs $y")
      case _ => ()
    }
    // ties never split: each distinct v maps to exactly one bucket
    val perValue = Profiling.equidepthHistogramApprox(df, "v", 10)
      .collect() // recompute fine — just re-check shape
    assert(perValue.length === out.length)
  }

  test("equidepthHistogramApprox tracks the exact form at test scale") {
    val df = (1L to 5000L).map(v => (v, v)).toDF("v", "id")
    val approx = Profiling.equidepthHistogramApprox(df, "v", 5, relativeError = 0.0001)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = Profiling.equidepthHistogram(df, "v", 5, Seq("id"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // all-distinct values at tight error: counts within 1%
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (b, n) =>
      assert(math.abs(n - exact(b)) <= 50, s"bucket $b: approx $n vs exact ${exact(b)}")
    }
  }

  test("equidepthHistogram demands tie-break columns") {
    val df = Seq((1L, 1L)).toDF("v", "id")
    intercept[IllegalArgumentException] {
      Profiling.equidepthHistogram(df, "v", 2, Seq.empty)
    }
  }

  test("weightedMedian: half the MASS, not half the rows") {
    // group a: values 1..4 with weight 97 on v=4 → the weighted median
    // is 4 (the unweighted median would be 2/3); duplicates collapse
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L), ("a", 4L, 97L),
      ("b", 5L, 2L), ("b", 5L, 3L), ("b", 9L, 5L))
      .toDF("grp", "v", "w")
    val out = Profiling.weightedMedian(df, "grp", "v", "w")
      .as[(String, Long, Long)].collect().toSeq
    // group b: v=5 carries 5 of 10 → 2·5 ≥ 10 → lower median 5
    assert(out === Seq(("a", 4L, 100L), ("b", 5L, 10L)))
  }

  test("exactQuantilesApprox: rank-adjacent to the exact ladder at test scale") {
    val docs = graft.core.Tables.documents(spark, sf)
    val qs = Seq(100L, 250L, 500L, 750L, 900L, 990L)
    val exact = Profiling.exactQuantiles(docs, "lang", "n_chars", qs)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val approx = Profiling.exactQuantilesApprox(docs, "lang", "n_chars", qs,
      accuracy = 100000)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(approx.keySet === exact.keySet)
    // at this accuracy the sketch keeps every rank at spec scale; the
    // definitional boundary (lower-quantile vs sketch rank rounding)
    // may still pick an adjacent distinct value — assert adjacency in
    // the per-group sorted distinct-value list, never more
    val sorted = docs.filter(col("lang").isNotNull && col("n_chars").isNotNull)
      .select(col("lang"), col("n_chars").cast("long"))
      .distinct().collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).sorted.toIndexedSeq }
    exact.foreach { case ((g, q), ve) =>
      val va = approx((g, q))
      val vs = sorted(g)
      val i = vs.indexOf(ve)
      val window = vs.slice(math.max(0, i - 1), math.min(vs.size, i + 2))
      assert(window.contains(va),
        s"($g, $q): approx $va not rank-adjacent to exact $ve")
    }
  }

  test("weightedMedianApprox: exact at bucketWidth=1; within one bucket else") {
    val docs = graft.core.Tables.documents(spark, sf)
    val exact = Profiling.weightedMedian(docs, "lang", "n_chars", "n_chars")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fine = Profiling.weightedMedianApprox(docs, "lang", "n_chars", "n_chars",
      bucketWidth = 1L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fine === exact, "bucketWidth=1 must reproduce the exact form")
    val coarse = Profiling.weightedMedianApprox(docs, "lang", "n_chars", "n_chars",
      bucketWidth = 64L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(coarse.keySet === exact.keySet)
    coarse.foreach { case (g, (va, tot)) =>
      val (ve, te) = exact(g)
      assert(tot === te, s"$g: total weight must be exact")
      assert(math.abs(va - ve) <= 64L,
        s"$g: approx median $va more than one bucket from exact $ve")
    }
  }

  test("weightedMedian: null group/value/weight rows are excluded") {
    val df = Seq(
      (Option("a"), Option(1L), Option(1L)),
      (Option("a"), Option(2L), Option(1L)),
      (Option.empty[String], Option(9L), Option(9L)),
      (Option("a"), Option.empty[Long], Option(9L)),
      (Option("a"), Option(9L), Option.empty[Long]))
      .toDF("grp", "v", "w")
    val out = Profiling.weightedMedian(df, "grp", "v", "w")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 1L, 2L)))
  }

  test("idGaps: maximal missing ranges; duplicates and nulls ignored") {
    val df = Seq(Option(1L), Option(2L), Option(3L), Option(3L), // dup
      Option(7L), Option(8L), Option(10L), Option.empty[Long])
      .toDF("id")
    val out = Profiling.idGaps(df, "id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((4L, 6L, 3L), (9L, 9L, 1L)))
    // a dense id range reports nothing
    assert(Profiling.idGaps(Seq(5L, 6L, 7L).toDF("id"), "id").count() === 0L)
  }

  test("idGapsBucketed ≡ idGaps on a holed corpus — interior, boundary-spanning, whole-bucket gaps") {
    // ids 0..999 at bucketSize 100, minus: a singleton hole {57}, an
    // in-bucket run {230..260}, and a run {395..610} that spans a
    // bucket boundary AND swallows buckets 4 and 5 whole (the case
    // where a naive "keep only sparse-bucket ids" prune would invent
    // a false gap between a dense bucket's endpoints or miss the
    // cross-bucket stitch); plus duplicates and nulls
    val removed = (Set(57L) ++ (230L to 260L) ++ (395L to 610L))
    val ids = (0L until 1000L).filterNot(removed)
    val df = (ids ++ ids.take(17)).map(Option(_)) // dups
      .appended(Option.empty[Long]).toDF("id")
    val direct = Profiling.idGaps(df, "id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(direct === Seq((57L, 57L, 1L), (230L, 260L, 31L), (395L, 610L, 216L)))
    val bucketed = Profiling.idGapsBucketed(df, "id", bucketSize = 100L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(bucketed === direct, "bucketed decomposition must reproduce the direct scan")
    // degenerate widths: one giant bucket (pure interior path) and the
    // minimum legal width (every gap is a boundary gap)
    assert(Profiling.idGapsBucketed(df, "id")
      .as[(Long, Long, Long)].collect().toSeq === direct)
    assert(Profiling.idGapsBucketed(df, "id", bucketSize = 2L)
      .as[(Long, Long, Long)].collect().toSeq === direct)
    intercept[IllegalArgumentException] {
      Profiling.idGapsBucketed(df, "id", bucketSize = 1L)
    }
    // a dense id range reports nothing through the bucketed path too
    assert(Profiling.idGapsBucketed((100L to 300L).toDF("id"), "id",
      bucketSize = 64L).count() === 0L)
  }

  test("momentsBy: hand-computed moments; constant group reports NULL shape") {
    val df = Seq(
      (Option("a"), Option(1L)), (Option("a"), Option(2L)),
      (Option("a"), Option(3L)), (Option("a"), Option(4L)),
      (Option("b"), Option(5L)), (Option("b"), Option(5L)),
      (Option.empty[String], Option(9L)), (Option("a"), Option.empty[Long]))
      .toDF("g", "v")
    val out = Profiling.momentsBy(df, "g", "v").collect()
    // group a = {1,2,3,4}: mean 2.5, m2 1.25, m3 0 (symmetric),
    // m4 2.5625 → kurtosis 2.5625/1.5625 − 3 = −1.36
    val a = out(0)
    assert((a.getString(0), a.getLong(1), a.getLong(2), a.getLong(3),
      a.getLong(4), a.getLong(5)) === (("a", 4L, 2500L, 1250L, 0L, -1360L)))
    // group b is constant: variance 0, skew/kurtosis NULL (not ±Inf)
    val b = out(1)
    assert((b.getString(0), b.getLong(1), b.getLong(2), b.getLong(3))
      === (("b", 2L, 5000L, 0L)))
    assert(b.isNullAt(4) && b.isNullAt(5))
    assert(out.length === 2, "null group/value rows are excluded")
  }

  test("fkAudit: orphans, null keys, and permille — hand-computed") {
    val child = Seq(
      (1L, Option(10L)), (2L, Option(10L)), (3L, Option(99L)), // 99 orphan
      (4L, Option(98L)),                                       // 98 orphan
      (5L, None))                                              // null key
      .toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val out = Profiling.fkAudit(Seq(("child->parent", child, "fk", parent, "pk")))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // 5 rows, 1 null key, 2 orphans of 4 non-null → 500 permille
    assert(out === Seq(("child->parent", 5L, 1L, 2L, 500L)))
  }

  test("fkAudit: intact edge reads zero; all-null edge guards the division") {
    val child = Seq((1L, Option.empty[Long])).toDF("id", "fk")
    val parent = Seq(1L).toDF("pk")
    val intact = Seq((1L, Option(1L))).toDF("id", "fk")
    val out = Profiling.fkAudit(Seq(
      ("allnull", child, "fk", parent, "pk"),
      ("intact", intact, "fk", parent, "pk")))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("allnull", 1L, 1L, 0L, 0L), ("intact", 1L, 0L, 0L, 0L)))
    intercept[IllegalArgumentException] { Profiling.fkAudit(Seq.empty) }
    intercept[IllegalArgumentException] {
      Profiling.fkAudit(Seq(("dup", child, "fk", parent, "pk"),
        ("dup", child, "fk", parent, "pk")))
    }
  }

  test("functionalDependencies: fan-out per rule, NULL rhs is a value") {
    val df = Seq(
      (1L, Option("a")), (1L, Option("a")),     // k1 → {a}: holds
      (2L, Option("a")), (2L, Option("b")),     // k2 → {a,b}: violates
      (3L, Option("b")), (3L, Option.empty[String])) // k3 → {b,NULL}: violates
      .toDF("k", "v")
    val out = Profiling.functionalDependencies(df, Seq("k" -> "v"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("k->v", 3L, 2L, 2L, 666L)))
    intercept[IllegalArgumentException] {
      Profiling.functionalDependencies(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Profiling.functionalDependencies(df, Seq("k" -> "v", "k" -> "v"))
    }
  }

  test("functionalDependencies: NULL lhs rows are excluded") {
    val df = Seq((Option(1L), "a"), (Option.empty[Long], "b"),
      (Option.empty[Long], "c")).toDF("k", "v")
    val out = Profiling.functionalDependencies(df, Seq("k" -> "v"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("k->v", 1L, 0L, 1L, 0L)))
  }

  test("benfordDigits: string-derived digits, literal expectations, zero rows report") {
    import org.apache.spark.sql.functions.col
    val df = Seq(1L, 10L, 15L, 2L, 250L, 0L, -3L)
      .toDF("v")
    val out = Profiling.benfordDigits(df, col("v"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // 5 positive values: digit 1 ×3 (1,10,15), digit 2 ×2 (2,250);
    // 0 and −3 excluded; digits 3–9 report zero rows
    assert(out.size === 9)
    assert(out.head === (1L, 3L, 600L, 301L, 299L, 2L))
    assert(out(1) === (2L, 2L, 400L, 176L, 224L, 2L))
    assert(out.drop(2).forall { case (d, n, obs, _, dev, excl) =>
      d >= 3 && n == 0L && obs == 0L && excl == 2L &&
        dev == -out.find(_._1 == d).get._4
    })
    // the nine expected permille are the public Benford constants
    assert(out.map(_._4) === Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L,
      51L, 46L))
  }

  test("kAnonymity: class sizes and the at-risk flag at k") {
    val df = Seq(("us", "a"), ("us", "a"), ("us", "a"), ("de", "b"))
      .toDF("country", "seg")
    val out = Profiling.kAnonymity(df, Seq("country", "seg"), k = 2L)
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(out === Seq(("de", "b", 1L, true), ("us", "a", 3L, false)))
    intercept[IllegalArgumentException] {
      Profiling.kAnonymity(df, Seq.empty, k = 2L)
    }
    intercept[IllegalArgumentException] {
      Profiling.kAnonymity(df, Seq("country"), k = 0L)
    }
  }

  test("keySkewGini: uniform keys score 0") {
    val df = Seq("a", "b", "c", "d").toDF("k")
    val out = Profiling.keySkewGini(df, "k")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((4L, 4L, 1L, 250L, 0L)))
  }

  test("keySkewGini: hand-computed skew from the f-of-f closed form") {
    // freqs sorted: [1, 3] → ranked sum S = 1·1 + 2·3 = 7;
    // gini = (2·7 − 3·4)·1000 div (2·4) = 250
    val df = Seq("a", "a", "a", "b").toDF("k")
    val out = Profiling.keySkewGini(df, "k")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 4L, 3L, 750L, 250L)))
    // null keys are excluded, not a key of their own
    val out2 = Profiling.keySkewGini(
      Seq(Option("a"), Option("a"), Option("a"), Option("b"),
        Option.empty[String]).toDF("k"), "k")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out2 === out)
  }

  test("iqrOutliers: lower quartiles, 2×-scaled fences, per-group counts") {
    // group g: values 1..8 plus outliers −100 and 100 (n = 10).
    // distinct-value cum/tot: q1 = min v with 4·cum ≥ 10 → v = 2
    // (cum 3); q3 = min v with 4·cum ≥ 30 → v = 7 (cum 8); iqr = 5.
    // fences: below 2·v < 4−15 = −11 → v < −5.5 (only −100);
    // above 2·v > 14+15 = 29 → v > 14.5 (only 100)
    val df = ((1L to 8L) ++ Seq(-100L, 100L)).map(("g", _)) :+
      (("h", 5L))
    val out = Profiling.iqrOutliers(df.toDF("grp", "v"), "grp", "v")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("g", 10L, 2L, 7L, 5L, 1L, 1L),
      // single-value group: q1 = q3 = v, iqr 0, no outliers
      ("h", 1L, 5L, 5L, 0L, 0L, 0L)))
  }

  test("chiSquare: independent columns score exactly zero") {
    // uniform 2×2: every o = 2, e = 4·4/8 = 2 → every term 0
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("a", 2),
      ("b", 1), ("b", 1), ("b", 2), ("b", 2)).toDF("x", "y")
    val out = Profiling.chiSquare(df, col("x"), col("y"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out === ((8L, 2L, 2L, 1L, 0L)))
  }

  test("chiSquare: perfect 2×2 association scores N·10⁶ — including the " +
    "zero-observed cells") {
    // x=a ⇔ y=1 (3 rows), x=b ⇔ y=2 (3 rows): χ² = N = 6 exactly.
    // Each of the 4 grid cells contributes (o·N − nx·ny)²·10⁶ ÷ (N·nx·ny)
    // = 81·10⁶ ÷ 54 = 1.5·10⁶ — the two UNOBSERVED cells carry half the
    // statistic, proving the grid densify (observed-only would halve it).
    val df = Seq(("a", 1), ("a", 1), ("a", 1),
      ("b", 2), ("b", 2), ("b", 2)).toDF("x", "y")
    val out = Profiling.chiSquare(df, col("x"), col("y"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out === ((6L, 2L, 2L, 1L, 6000000L)))
  }

  test("chiSquare: NULLs in either column are excluded, dof spans the grid") {
    val df = Seq(Some("a") -> Some(1), Some("a") -> Some(2),
      Some("b") -> Some(1), Some("c") -> Some(2),
      None -> Some(1), Some("a") -> None)
      .toDF("x", "y")
    val out = Profiling.chiSquare(df, col("x"), col("y"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out._1 === 4L)   // the two NULL rows don't count
    assert(out._2 === 3L && out._3 === 2L && out._4 === 2L)
  }

  test("ksTest: identical samples score 0; disjoint samples score 10⁶ " +
    "and reject at scale") {
    val same = (Seq.fill(50)(("en", 1L)) ++ Seq.fill(50)(("en", 2L)) ++
      Seq.fill(50)(("fr", 1L)) ++ Seq.fill(50)(("fr", 2L)))
      .toDF("lang", "v")
    val s = Profiling.ksTest(same, "lang", "v", "en", "fr")
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(s._3 === 0L && !s._5)
    // fully disjoint supports: D = 1 exactly; at n = 200 each the
    // critical value is 1.358·√(400/40000) = 0.1358 → reject
    val disj = (Seq.fill(200)(("en", 1L)) ++ Seq.fill(200)(("fr", 9L)))
      .toDF("lang", "v")
    val d = Profiling.ksTest(disj, "lang", "v", "en", "fr")
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(d === ((200L, 200L, 1000000L, 135800L, true)))
    // other groups are ignored entirely
    val noisy = disj.union(Seq.fill(10)(("zh", 5L)).toDF("lang", "v"))
    val n = Profiling.ksTest(noisy, "lang", "v", "en", "fr")
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(n === d)
  }

  test("duplicateRows: surplus and multiplicity over a planted dup set") {
    // keys: (1,a)×1, (2,b)×3, (3,c)×2 → 6 rows, 3 keys, 2 dup keys,
    // surplus 2+1 = 3, worst 3
    val df = Seq((1L, "a"), (2L, "b"), (2L, "b"), (2L, "b"),
      (3L, "c"), (3L, "c")).toDF("k1", "k2")
    val out = Profiling.duplicateRows(df, Seq("k1", "k2"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out === ((6L, 3L, 2L, 3L, 3L)))
    // a clean key set reports zero surplus
    val clean = Profiling.duplicateRows(df.select("k1").distinct(), Seq("k1"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(clean === ((3L, 3L, 0L, 0L, 1L)))
  }

  test("columnEntropy: constant, balanced, and skewed columns in one pass; " +
    "NULL accounting; all-NULL column keeps its spine row") {
    val df = Seq(
      ("k", "a", Some("x"), None: Option[String]),
      ("k", "b", Some("x"), None),
      ("k", "a", Some("y"), None),
      ("k", "b", None, None)
    ).toDF("const", "balanced", "holey", "void")
    val out = Profiling
      .columnEntropy(df, Seq("balanced", "const", "holey", "void"))
      .as[(String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    def h(ns: Seq[Long]): Long = {
      val n = ns.sum.toDouble
      val s = ns.map(c => c.toDouble * math.log(c.toDouble)).sum
      math.floor((math.log(n) - s / n) * 1000000 + 0.5).toLong
    }
    val hb = h(Seq(2L, 2L))    // balanced a/b → ln 2 ≈ 693147
    val hh = h(Seq(2L, 1L))    // holey x×2, y×1
    assert(out === Seq(
      ("balanced", 4L, 0L, 2L, Some(hb),
        Some(math.floor(
          (math.log(4d) - (2d * math.log(2d) + 2d * math.log(2d)) / 4d)
            / math.log(2d) * 1000 + 0.5).toLong)),
      ("const", 4L, 0L, 1L, Some(0L), None),
      ("holey", 3L, 1L, 2L, Some(hh),
        Some(math.floor(
          (math.log(3d) - (2d * math.log(2d) + 1d * math.log(1d)) / 3d)
            / math.log(2d) * 1000 + 0.5).toLong)),
      ("void", 0L, 4L, 0L, None, None)))
  }

  test("hillTailIndex: power-of-two tail replays the ln sum and α exactly") {
    // top 4 of {80, 40, 20, 10, 5, 1} at kTop = 3: x_ref = 10, ratios
    // 8, 4, 2 → micronat terms 2079442 + 1386294 + 693147 = 4158883,
    // α_milli = 3·10⁹ div 4158883 = 721
    val df = Seq(80L, 40L, 20L, 10L, 5L, 1L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("doc_id", "v")
    val out = Profiling.hillTailIndex(df, "v", "doc_id", kTop = 3)
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    def t(r: Double): Long = math.floor(math.log(r) * 1000000 + 0.5).toLong
    val sum = t(8.0) + t(4.0) + t(2.0)
    assert(out === Seq((3L, 10L, sum, Some(3000000000L / sum))))
  }

  test("exactQuantiles: lower-quantile ladder replays the cumulative " +
    "selection; ties stay atomic") {
    // group g: values 1..10 once each → q100 → 1, q250 → 3 (cum 3·1000
    // ≥ 250·10 ⇔ cum ≥ 2.5 → v=3), q500 → 5, q750 → 8, q990 → 10
    val df = (1L to 10L).map(("g", _)).toDF("grp", "v")
    val out = Profiling.exactQuantiles(df, "grp", "v",
      Seq(100L, 250L, 500L, 750L, 990L))
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("g", 100L, 1L), ("g", 250L, 3L), ("g", 500L, 5L),
      ("g", 750L, 8L), ("g", 990L, 10L)))
    // tie atomicity: {1, 5, 5, 5} — q500 lands inside the tie class → 5
    val ties = Seq(("t", 1L), ("t", 5L), ("t", 5L), ("t", 5L))
      .toDF("grp", "v")
    val tq = Profiling.exactQuantiles(ties, "grp", "v", Seq(500L))
      .as[(String, Long, Long)].collect().toSeq
    assert(tq === Seq(("t", 500L, 5L)))
  }

  test("zoneMapReport: min/max evidence drives the skip flag; all-null zones skip") {
    // zone 0 (keys 0-4): values 10..14 overlap [0,100] -> not skippable
    // zone 1 (keys 5-9): values 400..404, one null -> min 400 > 100 -> skip
    // zone 2 (keys 10-12): all null -> no evidence -> skippable, nulls counted
    val df = ((0 to 4).map(k => (k.toLong, Option(10L + k))) ++
      (5 to 8).map(k => (k.toLong, Option(395L + k))) ++
      Seq((9L, Option.empty[Long])) ++
      (10 to 12).map(k => (k.toLong, Option.empty[Long])))
      .toDF("key", "v")
    val out = Profiling.zoneMapReport(df, "key", "v",
      zoneWidth = 5L, predLo = 0L, predHi = 100L)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long], Int)]
      .collect().toSeq
    assert(out === Seq(
      (0L, 0L, 5L, 0L, Some(10L), Some(14L), 0),
      (1L, 5L, 5L, 1L, Some(400L), Some(403L), 1),
      (2L, 10L, 3L, 3L, None, None, 1)))
  }

  test("zoneMapReport: sorted layout skips what a shuffled one reads (the layout payoff)") {
    // the SAME rows under two key layouts: values assigned randomly to
    // keys (shuffled) vs values sorted by key (clustered). Range
    // predicate [0, 24] covers a quarter of the value space.
    val vals = (0 until 100).map(_.toLong)
    val shuffled = vals.map(v => ((v * 37) % 100, v)).toDF("key", "v")
    val sorted = vals.map(v => (v, v)).toDF("key", "v")
    def skipped(df: org.apache.spark.sql.DataFrame): Long =
      Profiling.zoneMapReport(df, "key", "v", 10L, 0L, 24L)
        .filter(col("skippable") === 1).count()
    assert(skipped(shuffled) === 0L, "a shuffled layout skips nothing")
    assert(skipped(sorted) === 7L, "the sorted layout skips 7 of 10 zones")
  }

  test("joinSkewPreflight: exact per-key output mass and permille shares") {
    val left = Seq(1L, 1L, 1L, 2L).toDF("k")
    val right = Seq(1L, 1L, 2L, 2L, 2L, 2L, 2L, 3L).toDF("k")
    val out = Profiling.joinSkewPreflight(left, right, "k", "k", k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // key 1: 3*2=6 of 11 -> 545 permille; key 2: 1*5=5 -> 454; key 3
    // has no left rows -> produces nothing, not a zero row
    assert(out === Seq((1L, 3L, 2L, 6L, 545L), (2L, 1L, 5L, 5L, 454L)))
  }

  test("joinSkewPreflight: top-k keeps the heaviest keys under the total order") {
    val left = (1L to 30L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("k")
    val right = left
    val out = Profiling.joinSkewPreflight(left, right, "k", "k", k = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) === Seq(30L, 29L, 28L))
    assert(out.head._4 === 900L) // 30*30
  }

  test("freshnessReport: lag measured against the freshest source, stale flag at the bar") {
    val df = Seq(
      ("a", "2024-01-01 10:00:00"), ("a", "2024-01-01 08:00:00"),
      ("b", "2024-01-01 09:00:00"), ("c", "2024-01-01 09:45:00"))
      .toDF("src", "__s")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(col("__s")))
    val out = Profiling.freshnessReport(df, "src", "ts", staleSecs = 1800L)
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    // lags are relative to the freshest source (a) — no wall clock
    assert(out.map(r => (r._1, r._2, r._4, r._5)) === Seq(
      ("a", 2L, 0L, 0), ("b", 1L, 3600L, 1), ("c", 1L, 900L, 0)))
    val us = out.map(r => r._1 -> r._3).toMap
    assert(us("a") - us("b") === 3600L * 1000000L)
    assert(us("a") - us("c") === 900L * 1000000L)
  }

  test("paretoReport: cumulative shares and the exact 80/20 head set") {
    val df = Seq(("s1", 50L), ("s2", 30L), ("s3", 15L), ("s4", 5L))
      .flatMap { case (g, w) => Seq.fill(w.toInt)((g, 1L)) }
      .toDF("grp", "w")
    val out = Profiling.paretoReport(df, "grp", col("w"))
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    assert(out === Seq(
      ("s1", 50L, 500L, 500L, 1),
      ("s2", 30L, 300L, 800L, 1),  // reaches exactly 800 -> last head member
      ("s3", 15L, 150L, 950L, 0),
      ("s4", 5L, 50L, 1000L, 0)))
  }

  test("paretoReport: weight ties order by group name (total order under the window)") {
    val df = Seq(("b", 10L), ("a", 10L), ("c", 10L)).toDF("grp", "w")
    val out = Profiling.paretoReport(df, "grp", col("w"), headPermille = 500L)
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    assert(out.map(_._1) === Seq("a", "b", "c"))
    assert(out.map(_._5) === Seq(1, 1, 0)) // a+b reach 2/3 >= 1/2
  }

  test("emd1d: hand-computed mass transport; identity is zero; a pure shift reads as the shift") {
    def emd(a: Seq[Long], b: Seq[Long]): (Long, Long, Long) = {
      val df = (a.map(("en", _)) ++ b.map(("fr", _))).toDF("lang", "v")
      Profiling.emd1d(df, "lang", "v", "en", "fr")
        .as[(Long, Long, Long)].head()
    }
    // A={0,10} B={10,10}: CDFs differ by 1/2 over [0,10) -> EMD 5
    assert(emd(Seq(0L, 10L), Seq(10L, 10L)) === ((2L, 2L, 5000000L)))
    // identical distributions -> 0
    assert(emd(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) === ((3L, 3L, 0L)))
    // A={0,1} shifted by exactly 100 -> EMD = 100 (the metric is in
    // value units — KS on the same data saturates at its 1.0 max)
    assert(emd(Seq(0L, 1L), Seq(100L, 101L)) === ((2L, 2L, 100000000L)))
    // asymmetric sizes: A={0} B={2,2}: |1*2 - 0*1|*2 = 4 -> 4e6/2 = 2e6
    assert(emd(Seq(0L), Seq(2L, 2L)) === ((1L, 2L, 2000000L)))
  }

  test("profileDiff: null-rate and distinct drift per column, integer ppm") {
    val base = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option("b"))).toDF("id", "v")
    val next = Seq((1L, Option("a")), (2L, Option("c")),
      (3L, Option.empty[String]), (4L, Option.empty[String])).toDF("id", "v")
    val out = Profiling.profileDiff(base, next, Seq("id", "v"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out === Seq(
      ("id", 3L, 4L, 0L, 0L, 0L, 3L, 4L, 1L),
      // null ppm 1/3 -> 333333, 2/4 -> 500000; distinct {a,b} -> {a,c}
      ("v", 3L, 4L, 333333L, 500000L, 166667L, 2L, 2L, 0L)))
  }

  test("percentileRank: inclusive permille CDF per group, ties share a row") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 5L), ("b", 7L))
      .toDF("g", "v")
    val out = Profiling.percentileRank(df, "g", "v")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("a", 1L, 2L, 500L), ("a", 2L, 1L, 750L), ("a", 5L, 1L, 1000L),
      ("b", 7L, 1L, 1000L)))
  }

  test("jsonKeyProfile: key presence ppm; malformed rows are a row, not a crash") {
    val df = Seq(Some("""{"a": 1, "b": 2}"""), Some("""{"a": 3}"""),
      Some("not json"), None).toDF("j")
    val out = Profiling.jsonKeyProfile(df, "j")
      .as[(String, Long, Long)].collect().toSeq
    // 3 non-null rows in the denominator; the null row is absent entirely
    assert(out === Seq(
      ("__malformed__", 1L, 333333L), ("a", 2L, 666666L), ("b", 1L, 333333L)))
    // valid-but-not-an-object payloads also land in the sentinel
    val arr = Profiling.jsonKeyProfile(Seq("[1, 2]").toDF("j"), "j")
      .as[(String, Long, Long)].collect().toSeq
    assert(arr === Seq(("__malformed__", 1L, 1000000L)))
  }

  test("classBalance: per-group label shares, imbalance ratio, nulls are a class") {
    val df = Seq(("A", Option("x")), ("A", Option("x")), ("A", Option("x")),
      ("A", Option("y")), ("B", Option("z")), ("B", Option("z")),
      ("B", Option.empty[String])).toDF("g", "l")
    val out = Profiling.classBalance(df, "g", "l")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("A", "x", 3L, 750L, 4L, 3000L),
      ("A", "y", 1L, 250L, 4L, 3000L),
      ("B", "__null__", 1L, 333L, 3L, 2000L),
      ("B", "z", 2L, 666L, 3L, 2000L)))
  }

  test("hillTailIndex: an all-equal tail reports NULL α; too-few rows → empty") {
    val flat = Seq.fill(5)(7L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("doc_id", "v")
    val out = Profiling.hillTailIndex(flat, "v", "doc_id", kTop = 3)
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(out === Seq((3L, 7L, 0L, None)))
    val few = Seq((1L, 9L), (2L, 8L)).toDF("doc_id", "v")
    assert(Profiling.hillTailIndex(few, "v", "doc_id", kTop = 3)
      .collect().isEmpty)
  }

  test("cohenKappa: hand case, perfect agreement, degenerate pe, empty input") {
    // classic 2x2: a=(y,y,y,n), b=(y,n,y,n) -> n=4, agree=3 (po=.75),
    // marginals a: y3 n1, b: y2 n2 -> pe = (3*2 + 1*2)/16 = .5,
    // kappa = (.75-.5)/(1-.5) = .5
    val df = Seq(("y", "y"), ("y", "n"), ("y", "y"), ("n", "n"))
      .toDF("a", "b")
    val r = Profiling.cohenKappa(df, "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 750000L, 500000L, 500000L)))
    // perfect agreement over two classes: kappa = 1e6 exactly
    val perfect = Seq(("x", "x"), ("z", "z")).toDF("a", "b")
    assert(Profiling.cohenKappa(perfect, "a", "b")
      .collect().head.getLong(3) === 1000000L)
    // both sides constant on the SAME class: pe = 1 -> kappa NULL (0/0)
    val const = Seq(("k", "k"), ("k", "k")).toDF("a", "b")
    assert(Profiling.cohenKappa(const, "a", "b").collect().head.isNullAt(3))
    // disagreement below chance goes NEGATIVE: a=(y,n), b=(n,y) ->
    // po=0, pe=.5, kappa=-1e6
    val anti = Seq(("y", "n"), ("n", "y")).toDF("a", "b")
    assert(Profiling.cohenKappa(anti, "a", "b")
      .collect().head.getLong(3) === -1000000L)
    // NULLs excluded; all-NULL input -> one row of NULLs, no div error
    val nulls = Seq((Option.empty[String], Option("y"))).toDF("a", "b")
    val nr = Profiling.cohenKappa(nulls, "a", "b").collect().head
    assert(nr.getLong(0) === 0L && nr.isNullAt(1) && nr.isNullAt(3))
  }

  test("embeddingHygiene: planted anomalies each count once, envelopes over clean rows") {
    import graft.operators.Similarity
    val rows = Seq(
      (1L, Array(3.0f, 4.0f)),            // norm 5.0
      (2L, Array(0.6f, 0.8f)),            // norm 1.0
      (3L, Array(0.0f, 0.0f)),            // zero norm
      (4L, null.asInstanceOf[Array[Float]]),
      (5L, Array.empty[Float]),
      (6L, Array(Float.NaN, 1.0f)),       // non-finite
      (7L, Array(1.0f, 0.0f, 0.0f))       // ragged: dim 3
    ).toDF("vec_id", "embedding")
    val r = Similarity.embeddingHygiene(rows).collect().head
    assert(r.getLong(0) === 7L, "n_rows")
    assert(r.getLong(1) === 1L, "n_null_vec")
    assert(r.getLong(2) === 1L, "n_empty_vec")
    assert(r.getLong(3) === 1L, "n_nonfinite")
    assert(r.getLong(4) === 1L, "n_zero_norm")
    assert((r.getLong(5), r.getLong(6)) === ((2L, 3L)), "dim envelope")
    assert((r.getLong(7), r.getLong(8)) === ((0L, 5000000L)), "norm envelope")
  }

  test("quantileCalibrate: per-source permilles map onto global values; identity on one source") {
    // source A values 1,2,3,4 (uniform); source B values 101,102
    // global sorted: 1,2,3,4,101,102 (n=6)
    val df = Seq(
      ("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L),
      ("B", 101L), ("B", 102L)
    ).toDF("source", "v")
    val out = Profiling.quantileCalibrate(df, "source", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // A: v=1 p=250 -> global cum permilles: 1:166, 2:333 -> min gv with gp>=250 is 2
    //    v=2 p=500 -> 3 (cum 500); v=3 p=750 -> 101 (4:666, 101:833); v=4 p=1000 -> 102
    // B: v=101 p=500 -> 3; v=102 p=1000 -> 102
    assert(out === Seq(
      ("A", 1L, 250L, 2L), ("A", 2L, 500L, 3L),
      ("A", 3L, 750L, 101L), ("A", 4L, 1000L, 102L),
      ("B", 101L, 500L, 3L), ("B", 102L, 1000L, 102L)))
    // a single source IS the global distribution: calibration is the
    // identity on its values
    val one = Seq(("S", 5L), ("S", 5L), ("S", 9L)).toDF("source", "v")
    val ident = Profiling.quantileCalibrate(one, "source", "v").collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(ident === Seq((5L, 5L), (9L, 9L)))
  }

  test("rankAuc: exact Mann-Whitney — separation, ties, reversal, degenerate") {
    def auc(rows: Seq[(Long, Long)]): (Long, Long, Long, Option[Long]) = {
      val r = Profiling.rankAuc(rows.toDF("s", "y"), "s", "y").head()
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }
    // perfect separation: every positive above every negative
    assert(auc(Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))) ===
      ((2L, 2L, 8L, Some(1000000L))))
    // perfect reversal
    assert(auc(Seq((3L, 0L), (4L, 0L), (1L, 1L), (2L, 1L))) ===
      ((2L, 2L, 0L, Some(0L))))
    // all scores tied: AUC = 1/2 exactly (ties count half)
    assert(auc(Seq((5L, 1L), (5L, 0L), (5L, 1L), (5L, 0L)))._4 ===
      Some(500000L))
    // hand case: pos {2, 3}, neg {1, 3} — pairs: (2>1)=1, (2=3 no,
    // 2<3)=0, (3>1)=1, (3=3)=½ → AUC = 2.5/4 = 625000
    assert(auc(Seq((1L, 0L), (3L, 0L), (2L, 1L), (3L, 1L))) ===
      ((2L, 2L, 5L, Some(625000L))))
    // single-class input: AUC undefined → NULL, never 0
    assert(auc(Seq((1L, 1L), (2L, 1L)))._4 === None)
    // NULL scores and labels drop before ranking
    val withNulls = Seq((Option(1L), Option(0L)), (Option(2L), Option(1L)),
      (Option.empty[Long], Option(1L)), (Option(9L), Option.empty[Long]))
      .toDF("s", "y")
    val r = Profiling.rankAuc(withNulls, "s", "y").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(3)) === ((1L, 1L, 1000000L)))
    // a label outside {0,1} is a loud error, not a coercion
    intercept[Exception] {
      Profiling.rankAuc(Seq((1L, 2L)).toDF("s", "y"), "s", "y").collect()
    }
  }

  test("sourceSensitivity: leave-one-out mean shift, single-source NULL") {
    // A: rows 10, 20 (sum 30); B: one row of 60. Mean 30; dropping A
    // → 60 (+1000000 ppm); dropping B → 15 (−500000 ppm).
    val df = Seq(("A", 10L), ("A", 20L), ("B", 60L)).toDF("src", "v")
    val out = Profiling.sourceSensitivity(df, "src", "v")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("A", 2L, 1000000L), ("B", 1L, -500000L)))
    // a source that IS the corpus has no leave-out population
    val solo = Profiling.sourceSensitivity(
      Seq(("A", 5L)).toDF("src", "v"), "src", "v").head()
    assert(solo.isNullAt(2))
  }

  test("fdDiscovery: exact and partial dependencies, hand-derived") {
    // a→b: a=1 best 2 of 3, a=2 best 1 of 1 → 750000 ppm;
    // b→a: every b value determines a → exactly 10^6 ppm
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "z"))
      .toDF("a", "b")
    val out = Profiling.fdDiscovery(df, Seq("a", "b"))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("a", "b", 2L, 750000L),
      ("b", "a", 3L, 1000000L)))
    intercept[IllegalArgumentException] {
      Profiling.fdDiscovery(df, Seq("a"))
    }
  }

  test("kAnonPlan: leave-one-out risk table, hand-derived") {
    // classes under (a,b): 3/1/1 → 2 rows at risk at k=2; dropping
    // either column merges to 4/1 → 1 row at risk
    val df = Seq((1L, "x"), (1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"))
      .toDF("a", "b")
    val out = Profiling.kAnonPlan(df, Seq("a", "b"), k = 2L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("(none)", 3L, 1L, 2L),
      ("a", 2L, 1L, 1L),
      ("b", 2L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      Profiling.kAnonPlan(df, Seq("a"), k = 2L)
    }
  }
}
