package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.3 streaming rows): the
  * reference's incremental generator pipeline (etl_connector.py:88-127
  * feeding the micro-batched loop at :219-237) re-expressed as
  * readStream → transforms → writeStream.
  *
  * Everything here takes an unbounded Dataset (from readStream or
  * MemoryStream in tests) and returns the transformed streaming
  * DataFrame; callers pick the sink/trigger. At scale these run with
  * state in RocksDB-backed stores partitioned by key — no driver
  * state.
  */
object EventStreams {

  /** Tumbling event-time window with watermark: counts per
    * (window, event_type); late rows beyond the watermark are dropped
    * (SURVEY §2.3 "Streaming windows"). */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Sliding window variant. */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Session window: gap-based sessionization per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))

  /** Stateful streaming dedup on event_id within the watermark — the
    * streaming twin of the reference's key-upsert (R18): the first
    * arrival wins within the state horizon, duplicates are dropped
    * (SURVEY §2.3 "Stateful dedup / late data"). */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user running aggregate via arbitrary state
    * (mapGroupsWithState): running count + cents-sum per user across
    * micro-batches (SURVEY §2.3 "Arbitrary state"). Event-time ordering
    * within state is not assumed — the fold is order-insensitive. */
  case class UserEvent(user_id: Long, event_id: Long, value: Double)
  case class UserTotals(user_id: Long, events: Long, value_cents: Long)

  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0L))
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserTotals(user, acc.events + 1,
              acc.value_cents + math.floor(e.value * 100 + 0.5).toLong)
          }
          state.update(next)
          next
      }
  }

  /** Streaming ETL ingest: the full reference pipeline shape on a
    * stream — transform + validate per micro-batch, then foreachBatch
    * does the upsert (≙ R17 micro-batching + R18 upsert). */
  def etlStream(raw: DataFrame, cfg: graft.etl.EtlConfig, snapshotDir: String) = {
    val transformed = graft.etl.Pipeline.transform(raw, cfg)
    transformed.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val valid = batch.filter(graft.etl.Pipeline.isValid)
        graft.etl.Pipeline.upsert(batch.sparkSession, valid, snapshotDir)
      }
  }
}
