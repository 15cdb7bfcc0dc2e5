package graft

import org.apache.spark.sql.SparkSession
import graft.etl.{EtlConfig, Pipeline}

/** End-to-end ETL pipeline demo (the reference's `python
  * etl_connector.py` run, Spark-first): extract fixture pages through
  * the DSv2 paged source → transform → validate → last-wins upsert into
  * a parquet snapshot.
  *
  * Usage: runMain graft.EtlDemo <fixtureDir> <snapshotDir>
  */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val fixtureDir = args.lift(0).getOrElse(
      getClass.getResource("/pages") match {
        case null => sys.error("no fixture dir given and no bundled /pages resource")
        case url  => url.getPath
      })
    val snapshotDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-etl-demo").toString + "/snapshot")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = EtlConfig.fromEnv(sys.env.toMap.updated("OTX_API_KEY",
      sys.env.getOrElse("OTX_API_KEY", "demo-key")))
    val (valid, quarantined) = Pipeline.run(spark, fixtureDir, snapshotDir, cfg)
    println(s"[etl-demo] processed=$valid quarantined=$quarantined snapshot=$snapshotDir")
    val snap = spark.read.parquet(snapshotDir)
    snap.select("pulse_id", "pulse_name", "indicator_count", "source_city").show(20, false)
    println(s"[etl-demo] snapshot rows=${snap.count()}")
    spark.stop()
  }
}
