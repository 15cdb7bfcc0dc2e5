package graft

import org.apache.spark.sql.SparkSession

/** Bench harness (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. One untimed warm-up pass
  * amortizes JVM/codegen warmup so the timed pass measures the plans,
  * not JIT. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // the library's own session factory: extensions (native functions +
    // AntiJoinRewrite) active, so the bench measures the shipped config
    val spark = graft.core.GraftSession.local(cpus)

    // tier flag: the 201-query full board takes ~37 min wall-clock at
    // sf0.1 — too slow for per-commit iteration. SPARK_GRAFT_TIER=core
    // runs the declared q-board (the driver's 22-query oracle contract,
    // the per-commit smoke tier); default/"full" runs everything. The
    // shipped artifact is always a FULL run (a tiered run overwrites
    // BENCH_FULL.json with its subset — the skill notes say re-run full
    // before committing the artifact).
    val tier = sys.env.getOrElse("SPARK_GRAFT_TIER", "full")
    require(tier == "full" || tier == "core",
      s"SPARK_GRAFT_TIER must be core|full, got $tier")
    // optional subset filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=x07_minhash_lsh,x10_ann_lsh
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd (or leaked) ONLY var silently shrinking the run would
    // print a legitimate-looking total — make subsets loud, and fail on
    // names that match nothing rather than benching the wrong set
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
      System.err.println(
        s"[bench] SPARK_GRAFT_ONLY active: ${o.size} of ${SparkEntry.queries.size} queries")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => tier == "full" || n.startsWith("q"))
      .filter(n => only.forall(_.contains(n)))
    if (tier == "core") System.err.println(
      s"[bench] TIER=core: ${names.size} of ${SparkEntry.queries.size} queries")
    // warm-up: JIT + codegen cache + parquet footer cache
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // drop caches the warm-up pass accumulated (dedup shingle/token
    // tables persist per CALL, so stale entries are dead weight that
    // would spill to disk across 4×|queries| invocations)
    graft.operators.Dedup.releaseCaches()
    spark.catalog.clearCache()
    // best of three timed passes per query — the host shows up to ±2.5×
    // run-to-run jitter on sub-second queries (noisy-neighbor CPU), and
    // min-of-3 tracks achievable latency much more stably than one shot.
    // Failures report -1, not a (fast-looking) elapsed time.
    def timeOne(n: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(n)(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
      // blocking: cleanup must FINISH outside the clock, not drift into
      // the next query's timed window as async block-removal work
      finally {
        graft.operators.Dedup.releaseCaches(blocking = true)
        // belt-and-braces: drop ANY block a query left persisted
        // (localCheckpoints, ML-internal caches) so no query's storage
        // leaks into the next one's memory budget
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }
    val timed = names.map { n =>
      val ts = Seq.fill(3)(timeOne(n))
      var best = ts.min
      var extra = Seq.empty[Double]
      // noisy-neighbor guard: a sub-second plan inflated by a bad host
      // window stays inflated for 3 back-to-back passes; two spaced
      // retries (after the cleanup above settles) rescue the honest
      // number, and for genuinely slow queries cost ≤ 2 extra runs
      // a retry that itself fails transiently must not poison the min:
      // three honest primary measurements stand on their own
      if (best > 0.75) {
        extra = Seq.fill(2)(timeOne(n)).filter(_ >= 0)
        best = (best +: extra).min
      }
      (n, if (best < 0 || ts.exists(_ < 0)) -1.0 else best, ts ++ extra)
    }
    val results = timed.map(t => (t._1, t._2))
    // the COMPLETE per-query map always lands in BENCH_FULL.json next to
    // the repo sources — the printed line is the driver contract, the
    // file is the audit trail (the driver's capture window is finite).
    // Every raw repetition rides along so a plan audit can tell host
    // jitter (wide rep spread) from a real regression (tight spread at
    // a new level) without re-running the board.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"),
      renderFull(results, sfDir, timed.map(t => (t._1, t._3))))
    println(renderLine(results, sfDir))
    spark.stop()
  }

  private def entryJson(kv: (String, Double)): String =
    "\"" + kv._1 + f"""\":${kv._2}%.3f"""

  /** Complete results as pretty-enough JSON (one query per line).
    * `reps` (when given) adds the raw per-repetition timings behind
    * each best-of value — the noise-vs-regression audit trail — plus a
    * per-query [min, median, max] "stats" block and a "high_variance"
    * list of queries whose max/min exceeds 3×: min-of-reps alone hid
    * 16× spreads in round 9 (x74 3.5→57 s) and with them exactly the
    * cross-query cache/GC interference a regression bisect needs. */
  def renderFull(results: Seq[(String, Double)], sfDir: String,
                 reps: Seq[(String, Seq[Double])] = Nil): String = {
    val total = results.map(_._2).filter(_ >= 0).sum
    val queries = results.map(e => "    " + entryJson(e)).mkString(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir",%n  "queries":{%n""",
      ",\n", "\n  }")
    if (reps.isEmpty) queries + "\n}\n"
    else {
      def median(ts: Seq[Double]): Double = {
        val s = ts.sorted
        if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      }
      val stats = reps.map { case (n, all) =>
        val ok = all.filter(_ >= 0)
        (n, if (ok.isEmpty) Seq(-1.0, -1.0, -1.0)
            else Seq(ok.min, median(ok), ok.max))
      }
      val highVar = stats.collect {
        case (n, Seq(mn, _, mx)) if mn > 0 && mx / mn > 3.0 => (n, mx / mn)
      }
      val repsBlock = reps.map { case (n, ts) =>
        "    \"" + n + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
      }.mkString(",\n  \"reps\":{\n", ",\n", "\n  }")
      val statsBlock = stats.map { case (n, s) =>
        "    \"" + n + "\":[" + s.map(t => f"$t%.3f").mkString(",") + "]"
      }.mkString(",\n  \"stats\":{\n", ",\n", "\n  }")
      val varBlock =
        if (highVar.isEmpty) ""
        else highVar.sortBy(-_._2).map { case (n, r) =>
          "    {\"query\":\"" + n + f"""\",\"max_over_min\":$r%.1f}"""
        }.mkString(",\n  \"high_variance\":[\n", ",\n", "\n  ]")
      queries + repsBlock + statsBlock + varBlock + "\n}\n"
    }
  }

  /** The ONE printed JSON line, bounded to `budget` chars.
    *
    * The driver parses this line out of a bounded tail capture of the
    * sbt output (observed window: 2000 chars, with sbt's own
    * "[success] Total time" trailer inside it). Round 7's 113-query
    * line overran that window and the round lost its parsed bench —
    * so the line is now a hard-budgeted artifact: failures (-1) and
    * the slowest queries keep their full names, the fastest remainder
    * collapses into {"fast_n": count, "fast_sum": seconds}, and the
    * complete map lives in BENCH_FULL.json (pointed to by "full").
    * Totals are identical between the two renderings. */
  def renderLine(results: Seq[(String, Double)], sfDir: String,
                 budget: Int = 1700): String = {
    val total = results.map(_._2).filter(_ >= 0).sum
    def render(kept: Seq[(String, Double)], dropped: Seq[(String, Double)]): String = {
      val qs = kept.sortBy(_._1).map(entryJson).mkString("{", ",", "}")
      val rest =
        if (dropped.isEmpty) ""
        else f""","fast_n":${dropped.size},"fast_sum":${dropped.map(_._2).filter(_ >= 0).sum}%.3f,"full":"BENCH_FULL.json""""
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$rest,"sf":"$sfDir"}"""
    }
    // retention priority: failures are findings and must never be
    // summarized away; then slowest-first (the queries a plan audit
    // actually reads); sub-budget runs keep every name
    val prio = results.sortBy { case (_, v) =>
      -(if (v < 0) Double.MaxValue else v)
    }
    // the shrink floor: k never drops below the failure count, so a
    // pathological all-failing board overruns the budget rather than
    // summarizing failures away (they sort first, so take(k) with
    // k >= nFail always retains every one of them — and none can leak
    // into the dropped tail to inflate fast_n / skew fast_sum)
    val nFail = results.count(_._2 < 0)
    var k = prio.size
    var line = render(prio.take(k), prio.drop(k))
    while (line.length > budget && k > nFail) {
      k -= 1
      line = render(prio.take(k), prio.drop(k))
    }
    line
  }
}
