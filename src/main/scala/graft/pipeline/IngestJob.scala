package graft.pipeline

import graft.Tables
import graft.streaming.KafkaBridge
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's complete ingest path (SURVEY §3.1) as ONE checkpointed
  * streaming job: OPC-UA subscription (replay source) → JSON envelope onto
  * the wire (hydration_agent/main.py:77-86) → wire decode + type-safe
  * envelope (kafka_db_agent/main.py:58-63) → broadcast operator enrichment
  * (hydration_agent/main.py:68-86) → idempotent append
  * (kafka_db_agent/main.py:92-103, minus its duplicate-on-crash window).
  *
  * The broker hop is exercised byte-exactly — events serialize through
  * KafkaBridge.encode to binary key/value wire frames and come back
  * through KafkaBridge.decode — with the broker itself replaced by an
  * in-plan transform (a deployment splits this job at the encode/sink and
  * source/decode seams onto a real topic; the envelope bytes are
  * identical). Synthetic broker metadata mirrors the surrogate batch op
  * (src_kafka): topic `machine_events`, partition = key hash mod 4.
  *
  * Everything stays one pipelined stage until the sink: the only shuffle
  * is none — decode is a projection and the dim join is broadcast, so
  * at 100 TB ingest parallelism equals source partition count.
  */
object IngestJob {

  /** `retentionDays`: when set, the sink writes day-partitioned (the
    * hypertable chunk layout) and the job loop applies the reference's
    * retention policy (drop_chunks ≙ PartitionedWriter.retainLastDays)
    * after every committed batch — the fact table at rest never holds more
    * than the newest N days.
    */
  case class Config(
      eventsPath: String,
      sfDir: String,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      rowsPerBatch: Int = 1000,
      maxRows: Option[Int] = None,
      retentionDays: Option[Int] = None)

  def start(spark: SparkSession, cfg: Config): StreamingQuery = {
    val src = ReplayStreams.source(spark, cfg.eventsPath, cfg.rowsPerBatch, cfg.maxRows)

    // the broker hop: envelope → binary wire frame → decoded envelope.
    // Values travel as strings on the wire (the reference's envelope is
    // all-string; type dispatch happens at the DB edge).
    val wire = KafkaBridge.encode(src.withColumn("value", col("value").cast("string")))
      .select(
        col("key"), col("value"),
        lit("machine_events").as("topic"),
        pmod(xxhash64(col("key")), lit(4)).cast("int").as("partition"),
        lit(0L).as("offset"),
        current_timestamp().as("timestamp"),
        lit(0).as("timestampType"))
    val decoded = KafkaBridge.decode(wire)

    // stream-static hydration: tiny slowly-changing dim, broadcast
    val context = Tables.customer(spark, cfg.sfDir)
      .select(
        col("c_custkey").as("user_id"),
        col("c_name").as("operator"),
        col("c_mktsegment").as("segment"))
    val enriched = decoded
      .join(broadcast(context), Seq("user_id"), "left")
      .select(
        col("event_id"), col("ts"), col("metric"),
        expr("try_cast(value AS DOUBLE)").as("value_num"),
        col("user_id"), col("operator"), col("segment"))

    val sink =
      if (cfg.retentionDays.isDefined)
        IdempotentSink.parquetAppendByDay(cfg.outDir, "ts", cfg.retentionDays)
      else IdempotentSink.parquetAppend(cfg.outDir)
    enriched.writeStream
      .foreachBatch(sink)
      .option("checkpointLocation", cfg.checkpointDir)
      .outputMode("append")
      .trigger(cfg.trigger)
      .start()
  }
}
