package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named scale probes — the measurement harness behind BENCH_NOTES'
  * ×10/×100 ladders for operators whose BOARD form is deliberately
  * scale-pinned. Example: x329 certifies `semanticDedup`'s auto-k on a
  * FIXED 320-row slice (so the sizing rule is oracle-replayable at
  * every sf); the scale question — "does auto-k keep the full-corpus
  * form in the gentle tier at ×100?" — needs the UNpinned form over
  * the whole embeddings table, which no oracle can carry (k = ⌊√n⌋
  * changes per corpus). Bench runs board queries only; this main runs
  * a registry of named full-corpus actions with the same protocol
  * (one warm-up, best-of-N wall clock, fresh JVM per invocation) and
  * prints one JSON line per probe.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.Probe <name>[,<name>…]`
  * (reps via SPARK_GRAFT_REPS, default 3).
  */
object Probe {

  /** Each probe returns a DataFrame; the timed action is a count()
    * (materialize everything, retain nothing — the Bench discipline). */
  private def probes(spark: SparkSession, d: String): Map[String, () => DataFrame] = Map(
    // the x329 question at corpus scale: auto-k (k = ⌊√n⌋) SemDeDup
    // over the FULL embeddings table — at a fixed k this is the one
    // operator the r15 verdict marked weak
    "semdedup_autok" -> (() =>
      graft.operators.Clustering.semanticDedup(
        graft.core.Tables.embeddings(spark, d),
        idCol = "vec_id", vecCol = "embedding", k = 0, iterations = 2,
        minPermille = 900L)),
    // the fixed-k comparison anchor (the x73 board operating point)
    "semdedup_k16" -> (() =>
      graft.operators.Clustering.semanticDedup(
        graft.core.Tables.embeddings(spark, d),
        idCol = "vec_id", vecCol = "embedding", k = 16, iterations = 2,
        minPermille = 900L)),
    // x330's scale contract. Two honest operating points: a FIXED RATE
    // (everyN constant) is ~linear in the corpus where the full mutual
    // operator (x230) is n^1.5; the AUDIT point (everyN scaled so the
    // sample COUNT stays fixed — SPARK_GRAFT_EVERYN) is ~O(|S|·k·√n),
    // sub-linear, and is how the operator is meant to be driven at
    // 100 TB (estimate density from a bounded sample)
    "mutual_sampled" -> (() =>
      graft.operators.Similarity.mutualTopKAnnSampled(
        graft.core.Tables.embeddings(spark, d), k = 8,
        everyN = sys.env.getOrElse("SPARK_GRAFT_EVERYN", "4").toInt)),
    // stage isolation for the autok reading: the k-means bin alone,
    // at the same auto-sized k the full operator would pick
    "kmeans_autok" -> { () =>
      val emb = graft.core.Tables.embeddings(spark, d)
      val n = emb.count()
      val k = math.min(n, math.max(16L, math.sqrt(n.toDouble).toLong)).toInt
      graft.operators.Clustering.kmeans(emb, "vec_id", "embedding", k, 2)
    })

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Probe <name>[,<name>…]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus)
    val reg = probes(spark, sfDir)
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(reg.contains)
    require(unknown.isEmpty,
      s"unknown probes: ${unknown.mkString(", ")} (have: ${reg.keys.toSeq.sorted.mkString(", ")})")
    for (n <- names) {
      val mk = reg(n)
      mk().count() // warm-up: codegen, parquet footers, kmeans cache paths
      graft.operators.Dedup.releaseCaches()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = mk().count()
        val s = (System.nanoTime() - t0) / 1e9
        graft.operators.Dedup.releaseCaches()
        (s, rows)
      }
      val best = ts.map(_._1).min
      println(f"""{"probe":"$n","sf":"$sfDir","rows":${ts.head._2},"best":$best%.3f,"reps":[${ts.map(t => f"${t._1}%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
