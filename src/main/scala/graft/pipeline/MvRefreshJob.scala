package graft.pipeline

import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's continuous-aggregate refresh policy as a runnable
  * Structured Streaming job: database/init.sql:51-54 schedules
  * `refresh_continuous_aggregate` every 30 s with a 1-minute end offset;
  * here the same semantics are one checkpointed streaming query —
  * opcua-replay source → minute-grain windowed aggregate (watermark = the
  * 1-minute end offset: in-progress buckets never materialize) → append to
  * day-partitioned Parquet.
  *
  * Restart story: offsets + watermark + aggregation state live in the
  * checkpoint, and the Parquet sink's file manifest makes the append
  * exactly-once — kill the JVM mid-stream and the restarted query resumes
  * from the last committed batch with no duplicate and no missing bucket
  * (the reference needs hand-rolled reconnect loops for the same property,
  * kafka_db_agent/main.py:26-37).
  *
  * State store: RocksDB (spark.sql.streaming.stateStore.providerClass) —
  * at 100 TB the open-bucket state exceeds executor heaps; RocksDB keeps it
  * off-heap with incremental checkpoint upload. Set on the session by
  * `configureStateStore` before the query starts.
  */
object MvRefreshJob {

  /** `grain` + `endOffset` select the refresh policy: the minute defaults
    * are init.sql:51-54 (30 s refresh, 1-minute end offset); `hourly` below
    * is init.sql:31-34 (30 min refresh, 1-hour end offset — the 3-day
    * start_offset needs no streaming analog: append mode never revisits
    * closed buckets, which is exactly what a bounded refresh window is for).
    */
  case class Config(
      eventsPath: String,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      rowsPerBatch: Int = 1000,
      maxRows: Option[Int] = None,
      grain: String = "1 minute",
      endOffset: String = "1 minute")

  object Config {
    /** The hourly continuous-aggregate policy (init.sql:31-34). */
    def hourly(
        eventsPath: String,
        outDir: String,
        checkpointDir: String,
        trigger: Trigger = Trigger.ProcessingTime("30 minutes"),
        rowsPerBatch: Int = 1000,
        maxRows: Option[Int] = None): Config =
      Config(eventsPath, outDir, checkpointDir, trigger, rowsPerBatch, maxRows,
        grain = "1 hour", endOffset = "1 hour")
  }

  def configureStateStore(spark: SparkSession): Unit =
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  def start(spark: SparkSession, cfg: Config): StreamingQuery = {
    val src = ReplayStreams.source(spark, cfg.eventsPath, cfg.rowsPerBatch, cfg.maxRows)

    // the streaming twin of q_mv_minute / q_mv_hourly (RelationalOps)
    val mv = StreamingOps.mvStream(src, cfg.grain, cfg.endOffset)

    mv
      // day partitioning at rest = the hypertable chunk layout
      // (init.sql:11); the partition column derives from the bucket so
      // readers prune by day before touching a row group
      .withColumn("day", date_format(col("bucket"), "yyyy-MM-dd"))
      .writeStream
      .format("parquet")
      .partitionBy("day")
      .option("path", cfg.outDir)
      .option("checkpointLocation", cfg.checkpointDir)
      .outputMode("append")
      .trigger(cfg.trigger)
      .start()
  }
}
