package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Kafka DataSource V2 wiring for the reference's broker hops
  * (hydration_agent/main.py:54-57 producer → kafka_db_agent/main.py:50-57
  * consumer, topic `machine_events`).
  *
  * The batch surrogates (DataflowOps.srcKafka/snkKafka) verify the envelope
  * round-trip against the oracle. Two real streaming paths share this
  * bridge's decode/encode:
  *  - [[source]]/[[sink]]: `format("kafka")` resolves the STOCK connector
  *    at runtime (a deployment adds the spark-sql-kafka jar and a
  *    bootstrap address);
  *  - [[sourceLive]]/[[sinkLive]]: `format("kafka-graft")` — the engine's
  *    own wire-protocol stack ([[graft.net.KafkaBroker]]/
  *    [[graft.net.KafkaClient]], [[graft.sources.KafkaSubSource]]), which
  *    speaks real Kafka framing to a real loopback broker, so the
  *    consumer-group/offset-commit/rebalance semantics the reference
  *    relies on (kafka_db_agent/main.py:50-57) are EXERCISED in this
  *    sandbox (KafkaSpec), not just compiled against.
  *
  * Scale notes: the source maps Kafka partitions 1:1 onto input partitions
  * — ingest parallelism = topic partition count; `maxOffsetsPerTrigger`
  * is the admission-control lever (same role as the replay source's
  * rowsPerBatch); the decode is pure codegen'd projection (from_json),
  * no shuffle before the first aggregation.
  */
object KafkaBridge {

  /** Wire format of a Kafka source row, fixed by the connector contract. */
  val KafkaWireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)
  ))

  /** Streaming read of the reference topic. Requires the kafka connector on
    * the classpath at runtime (not at compile time).
    */
  def source(spark: org.apache.spark.sql.SparkSession, bootstrap: String,
      topic: String = "machine_events", maxOffsetsPerTrigger: Long = 10000L): DataFrame =
    decode(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)
      .load())

  /** [[source]] over the engine's own stack: same wire schema, same
    * decode, the broker end is a [[graft.net.KafkaBroker]]. Offsets live
    * in the streaming checkpoint (per-partition ranges) — the source is
    * REPLAYABLE, which with a transactional/idempotent sink gives the
    * exactly-once the push transports cannot (KafkaSpec pins this with a
    * crash-restart over one checkpoint).
    */
  def sourceLive(spark: org.apache.spark.sql.SparkSession, host: String, port: Int,
      topic: String = "machine_events", maxOffsetsPerTrigger: Long = 10000L): DataFrame =
    decode(spark.readStream
      .format("kafka-graft")
      .option("host", host)
      .option("port", port.toString)
      .option("topic", topic)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)
      .load())

  /** [[sink]] over the engine's own stack: per-task producers, murmur2
    * key partitioning — at-least-once into the loopback broker's log.
    */
  def sinkLive(events: DataFrame, host: String, port: Int, topic: String,
      checkpointDir: String): DataStreamWriter[Row] =
    encode(events)
      .writeStream
      .format("kafka-graft")
      .option("host", host)
      .option("port", port.toString)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)

  /** Kafka wire rows → the decoded envelope (SURVEY §1.2): the shared
    * [[graft.model.Envelope]] contract (value parsed as VARIANT so the
    * payload's number-vs-string type survives — the DB agent dispatches on
    * exactly that, kafka_db_agent/main.py:86-89), plus the consumer
    * metadata columns the DB agent logs (kafka_db_agent/main.py:58-63).
    * Malformed payloads are dropped, mirroring the reference consumer's
    * swallowed `json.loads` failure (see [[graft.model.Envelope.wellFormed]]).
    */
  def decode(raw: DataFrame): DataFrame =
    raw
      .select(
        col("topic"), col("partition"), col("offset").as("msg_offset"),
        col("key").cast("string").as("key"),
        // dual parse — type channel from the variant, string content from
        // the string parse (see Envelope.variantSchema for why)
        from_json(col("value").cast("string"), graft.model.Envelope.variantSchema).as("m"),
        from_json(col("value").cast("string"), graft.model.Envelope.stringSchema).as("ms"))
      .where(graft.model.Envelope.wellFormed)
      .select(Seq(col("topic"), col("partition"), col("msg_offset"), col("key")) ++
        graft.model.Envelope.decodedColumns: _*)

  /** Envelope rows → Kafka wire frame (key = metric for per-node ordering,
    * value = the JSON envelope — hydration_agent/main.py:77-86). When the
    * input carries the decoded `value_v` variant (decode output), the
    * ORIGINAL JSON type goes back on the wire — encode(decode(bytes))
    * keeps a number a number. String-typed values serialize from the
    * lossless `value` string view (the variant's string content mangles
    * non-ASCII — Envelope.variantSchema); numbers/booleans/null from the
    * variant (ASCII by construction). A plain string `value` column with
    * no variant sibling (the all-string wire IngestJob documents)
    * serializes quoted.
    */
  def encode(events: DataFrame): DataFrame = {
    // ignoreNullFields=false: the envelope contract REQUIRES explicit
    // null keys ("ts_us":null for a reading with no source timestamp —
    // Envelope's documented producer behavior); the generator default
    // would silently omit the key and a reference-style consumer
    // indexing msg["ts_us"] would KeyError-drop the row
    def env(valueCol: org.apache.spark.sql.Column) = to_json(struct(
      col("event_id"), col("metric").as("node_id"), valueCol.as("value"),
      unix_micros(col("ts")).as("ts_us"), col("user_id")),
      java.util.Map.of("ignoreNullFields", "false"))
    val payload =
      if (events.columns.contains("value_v"))
        when(expr("schema_of_variant(value_v)") === lit("STRING"), env(col("value")))
          .otherwise(env(col("value_v")))
      else env(col("value"))
    events.select(
      col("metric").cast("string").cast("binary").as("key"),
      payload.cast("binary").as("value"))
  }

  /** Streaming write to the reference topic; checkpointed, at-least-once
    * (Kafka's producer contract — exactly-once needs the idempotent sink
    * pattern keyed on batch id, see graft.pipeline.IdempotentSink).
    */
  def sink(events: DataFrame, bootstrap: String, topic: String,
      checkpointDir: String): DataStreamWriter[Row] =
    encode(events)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
}
