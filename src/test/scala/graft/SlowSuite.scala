package graft

/** Marks every test of a suite as slow-tier. The full board's suite
  * wall-clock grows ~40 s per round; mixing this into the handful of
  * multi-minute suites gives a sub-3-minute per-commit tier without
  * splitting files:
  *
  *   sbt quickTest   — everything EXCEPT the slow tier (per-commit)
  *   sbt test        — the whole suite (per-milestone / CI cadence)
  *
  * The alias lives in build.sbt (`-l graft.Slow`); tag membership is
  * suite-level on purpose — the slow suites are slow because of what
  * they exercise (streaming clocks, whole-board plan builds, LSH
  * mining), not because of one stray test. */
trait SlowSuite extends org.scalatest.TestSuite {
  abstract override def tags: Map[String, Set[String]] = {
    val base = super.tags
    testNames.iterator
      .map(n => n -> (base.getOrElse(n, Set.empty[String]) + "graft.Slow"))
      .toMap
  }
}
