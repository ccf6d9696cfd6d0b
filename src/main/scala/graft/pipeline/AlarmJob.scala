package graft.pipeline

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.MetricEvent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's 24/7 alarm engine as a runnable pipeline: OPC-UA
  * subscription (replay source) → stateful trend detection
  * (DeviationTracker ring buffer, opcua_server/main.py:31-39, as
  * flatMapGroupsWithState) → idempotent append sink.
  *
  * This is the stateful sibling of MvRefreshJob: where the MV job's state
  * is windowed aggregation buffers, this job's state is per-(entity,
  * metric) explicit GroupState — the part of a restart that actually
  * hurts: on recovery the state store must restore every ring buffer
  * exactly, or alarms double-fire (state replayed too old) or go silent
  * (state lost). PipelineSpec kills the query mid-stream and asserts the
  * resumed run fires exactly the alarms the uninterrupted run fires.
  *
  * At 100 TB-scale key cardinality the state store is RocksDB
  * (MvRefreshJob.configureStateStore); state per key is O(TrendWindow)
  * doubles, shuffled once by key — the same partitioning story as the
  * batch operator.
  */
object AlarmJob {

  case class Config(
      eventsPath: String,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      rowsPerBatch: Int = 1000,
      maxRows: Option[Int] = None)

  def start(spark: SparkSession, cfg: Config): StreamingQuery = {
    import spark.implicits._
    val src = ReplayStreams.source(spark, cfg.eventsPath, cfg.rowsPerBatch, cfg.maxRows)

    // null-valued events are the string-payload shape: they carry no
    // numeric deviation, so they must not enter the ring buffer (the batch
    // twin computes pct = null for them; coalescing to 0.0 would fabricate
    // a -100% deviation and fire spurious alarms)
    val events = src
      .filter(col("value").isNotNull)
      .selectExpr("event_id", "ts", "user_id", "metric", "value")
      .as[MetricEvent]

    StreamingOps.trendAlarms(events)
      .toDF()
      .writeStream
      .foreachBatch(IdempotentSink.parquetAppend(cfg.outDir))
      .option("checkpointLocation", cfg.checkpointDir)
      .outputMode("append")
      .trigger(cfg.trigger)
      .start()
  }
}
