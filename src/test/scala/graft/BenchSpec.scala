package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The bench line is a driver-parsed artifact with a hard size ceiling
  * (the driver reads it out of a bounded tail capture — round 7's
  * full-board line overran the window and the round lost its parsed
  * bench). These tests pin the contract: always valid JSON, always
  * under budget, failures never summarized away, totals identical
  * between the printed line and the BENCH_FULL.json rendering. */
class BenchSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def fakeResults(n: Int): Seq[(String, Double)] =
    (0 until n).map { i =>
      f"x$i%03d_some_longer_operator_name" -> (0.05 + (i % 37) * 0.1)
    }

  test("line stays under budget at 200 queries and parses as JSON") {
    val line = Bench.renderLine(fakeResults(200), "/root/testdata/sf0.1")
    assert(line.length <= 1700, s"line length ${line.length}")
    assert(line.startsWith("{\"metric\":\"total\""))
    assert(!line.contains('\n'))
    val node = mapper.readTree(line)
    assert(node.get("unit").asText() == "sec")
    assert(node.get("queries").size() > 0)
    // summarized remainder must be declared, with the full-map pointer
    assert(node.get("fast_n").asInt() > 0)
    assert(node.get("full").asText() == "BENCH_FULL.json")
  }

  test("small boards keep every query name with no summary keys") {
    val rs = fakeResults(10)
    val line = Bench.renderLine(rs, "/tmp/sf")
    val node = mapper.readTree(line)
    assert(node.get("queries").size() == 10)
    assert(node.get("fast_n") == null)
  }

  test("printed total equals full-file total and skips failures") {
    val rs = fakeResults(150) :+ ("x999_failed" -> -1.0)
    val line = Bench.renderLine(rs, "/tmp/sf")
    val full = mapper.readTree(Bench.renderFull(rs, "/tmp/sf"))
    val node = mapper.readTree(line)
    assert(math.abs(node.get("value").asDouble() - full.get("value").asDouble()) < 1e-9)
    val expected = rs.map(_._2).filter(_ >= 0).sum
    assert(math.abs(node.get("value").asDouble() - expected) < 1e-3)
    // the -1 failure sentinel survives summarization (it is a finding)
    assert(node.get("queries").get("x999_failed") != null)
    assert(node.get("queries").get("x999_failed").asDouble() == -1.0)
    // fast_sum + kept values reconstruct the total
    val keptSum = {
      val it = node.get("queries").properties().iterator()
      var s = 0.0
      while (it.hasNext) { val e = it.next(); if (e.getValue.asDouble() >= 0) s += e.getValue.asDouble() }
      s
    }
    val fastSum = Option(node.get("fast_sum")).map(_.asDouble()).getOrElse(0.0)
    assert(math.abs(keptSum + fastSum - expected) < 0.01)
  }

  test("full rendering lists every query") {
    val rs = fakeResults(137)
    val full = mapper.readTree(Bench.renderFull(rs, "/tmp/sf"))
    assert(full.get("queries").size() == 137)
  }

  test("full rendering carries raw repetitions when given") {
    val rs = fakeResults(3)
    val reps = rs.map { case (n, v) => n -> Seq(v, v + 0.01, v * 2) }
    val full = mapper.readTree(Bench.renderFull(rs, "/tmp/sf", reps))
    assert(full.get("reps").size() == 3)
    val arr = full.get("reps").get(rs.head._1)
    assert(arr.isArray && arr.size() == 3)
    assert(math.abs(arr.get(0).asDouble() - rs.head._2) < 1e-9)
    // and the reps block must not break the totals contract
    assert(math.abs(full.get("value").asDouble() - rs.map(_._2).sum) < 1e-6)
  }

  test("full rendering emits the pinned drift-control block with " +
    "per-control ratios and their geomean") {
    // controls present → a normalization basis rides in the artifact;
    // ratios are measured/anchor against the PINNED r15 constants
    val rs = Seq("x55_pagerank" -> 4.762, // 2x its 2.381 anchor
      "x236_pair_jac_hist" -> 1.324,      // exactly its anchor
      "x99_other" -> 1.0)
    val full = mapper.readTree(Bench.renderFull(rs, "/tmp/sf"))
    val ctl = full.get("controls")
    assert(ctl != null, "controls block must be present when controls ran")
    assert(ctl.get("rows").size() == 2)
    val byQ = (0 until 2).map(i => ctl.get("rows").get(i))
      .map(r => r.get("query").asText() -> r).toMap
    assert(math.abs(byQ("x55_pagerank").get("ratio").asDouble() - 2.0) < 0.01)
    assert(math.abs(byQ("x236_pair_jac_hist").get("ratio").asDouble() - 1.0) < 0.01)
    // geomean of {2.0, 1.0} = sqrt(2)
    assert(math.abs(ctl.get("geomean_ratio").asDouble() - math.sqrt(2.0)) < 0.01)
    // no controls in the run → no block (a subset without them can't
    // fabricate a basis)
    val none = mapper.readTree(Bench.renderFull(Seq("x99_other" -> 1.0), "/tmp/sf"))
    assert(none.get("controls") == null)
  }

  test("full rendering reports min/median/max and flags >3x rep spreads") {
    // r9 finding: min-of-reps hid 16x spreads (x74 3.5->57 s) and with
    // them the cache/GC interference the bisect needed — the full file
    // now carries [min, median, max] per query and names the unstable ones
    val rs = Seq("x01_stable" -> 1.0, "x02_jittery" -> 2.0, "x03_failed" -> -1.0)
    val reps = Seq(
      "x01_stable" -> Seq(1.0, 1.1, 1.2),
      "x02_jittery" -> Seq(2.0, 9.0, 30.0, -1.0), // failed rep must not poison stats
      "x03_failed" -> Seq(-1.0, -1.0, -1.0))
    val full = mapper.readTree(Bench.renderFull(rs, "/tmp/sf", reps))
    val st = full.get("stats")
    assert(st.size() == 3)
    val stable = st.get("x01_stable")
    assert(stable.get(0).asDouble() == 1.0 && stable.get(1).asDouble() == 1.1
      && stable.get(2).asDouble() == 1.2)
    val jit = st.get("x02_jittery")
    assert(jit.get(0).asDouble() == 2.0 && jit.get(1).asDouble() == 9.0
      && jit.get(2).asDouble() == 30.0)
    // all-failed query reports the sentinel triple, not a crash
    assert(st.get("x03_failed").get(0).asDouble() == -1.0)
    val hv = full.get("high_variance")
    assert(hv != null && hv.size() == 1, "only the 15x spread is flagged")
    assert(hv.get(0).get("query").asText() == "x02_jittery")
    assert(hv.get(0).get("max_over_min").asDouble() === 15.0)
  }

  test("line and full file carry a rep-median total insensitive to one outlier rep") {
    // r11 finding: the committed best-of total moved 25% on single-rep
    // cache accidents — the headline now carries total_median alongside
    val rs = Seq("x01_a" -> 1.0, "x02_b" -> 2.0, "x03_failed" -> -1.0)
    val reps = Seq(
      "x01_a" -> Seq(1.0, 1.5, 40.0),          // one 40 s GC-pause rep
      "x02_b" -> Seq(2.0, 2.5, 3.0, -1.0),     // failed rep excluded
      "x03_failed" -> Seq(-1.0, -1.0))         // all-failed: no contribution
    val expected = 1.5 + 2.5
    val line = mapper.readTree(Bench.renderLine(rs, "/tmp/sf", reps = reps))
    assert(math.abs(line.get("total_median").asDouble() - expected) < 1e-9)
    // best-of total is unchanged by the reps parameter
    assert(math.abs(line.get("value").asDouble() - 3.0) < 1e-9)
    val full = mapper.readTree(Bench.renderFull(rs, "/tmp/sf", reps))
    assert(math.abs(full.get("total_median").asDouble() - expected) < 1e-9)
    // without reps the key is absent, not zero — a subset render must
    // not fabricate a robust total it didn't measure
    val bare = mapper.readTree(Bench.renderLine(rs, "/tmp/sf"))
    assert(bare.get("total_median") == null)
  }

  test("a pathological all-failure board overruns the budget rather than dropping failures") {
    // 60 failures alone exceed the 1700-char budget; the shrink floor
    // must retain every -1 sentinel (failures are findings), accepting
    // the overrun — and fast_n/fast_sum must not count hidden failures
    val rs = fakeResults(60).map { case (n, _) => n -> -1.0 } ++ fakeResults(5)
    val line = Bench.renderLine(rs.toSeq, "/tmp/sf")
    val node = mapper.readTree(line)
    val qs = node.get("queries")
    val failKept = {
      val it = qs.properties().iterator()
      var c = 0
      while (it.hasNext) { if (it.next().getValue.asDouble() == -1.0) c += 1 }
      c
    }
    assert(failKept == 60, s"every failure must survive summarization, kept $failKept")
    Option(node.get("fast_n")).foreach { fn =>
      assert(fn.asInt() <= 5, "only honest timings may be summarized away")
    }
  }
}
