package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration and the
  * graft extensions (native vector expressions) pre-registered.
  *
  * Local defaults mirror the driver contract (UTC, shuffle partitions
  * = cores); on a real cluster the same builder is used minus
  * `master`, and shuffle partitions come from AQE
  * (`spark.sql.adaptive.coalescePartitions` is on by default in
  * Spark 4, so the configured number is only the pre-AQE ceiling).
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // consistent ns-parquet handling from the start (Tables.events
      // needs it; setting it here means no read-order dependence)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.VectorAgg.register(s) // UDAFs cannot ride extensions
    s
  }
}
