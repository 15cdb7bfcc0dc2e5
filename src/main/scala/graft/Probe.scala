package graft

/** Throwaway profiling main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
    // warm
    graft.operators.Dedup.minHashLshPairs(docs, shingleK = 2, minPermille = 300).count()
    graft.operators.Dedup.releaseCaches(true)
    var t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.minHashLshPairs(docs, shingleK = 2, minPermille = 300)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = pairs.count()
    println(f"PAIRS n=$n time=${(System.nanoTime() - t0) / 1e9}%.2f")
    t0 = System.nanoTime()
    val cc = graft.operators.Dedup.connectedComponents(pairs)
    val m = cc.count()
    println(f"CC m=$m time=${(System.nanoTime() - t0) / 1e9}%.2f rounds=${graft.operators.Dedup.lastFixpointCheckpointIds.length - 1}")
    pairs.unpersist()
    graft.operators.Dedup.releaseCaches(true)
    // second run with cached-pairs excluded: full composite
    t0 = System.nanoTime()
    val cc2 = graft.operators.Dedup.connectedComponents(
      graft.operators.Dedup.minHashLshPairs(docs, shingleK = 2, minPermille = 300))
    println(f"FULL m=${cc2.count()} time=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
