package graft.streaming

import graft.net.MqttClient
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Live-MQTT wiring for the reference's first transport hop
  * (opcua_mqtt_agent/main.py:54-59 publish → eclipse-mosquitto →
  * hydration_agent/main.py:64-71 subscribe, topic `machine/data`), built
  * on the engine's own MQTT 3.1.1 loopback stack
  * ([[graft.net.MqttBroker]]/[[graft.net.MqttClient]]/
  * [[graft.sources.MqttSource]]) — real wire framing, not a Kafka
  * substitution.
  *
  * Scale notes: QoS-0 MQTT pushes into ONE subscribing session, so this
  * leg is the ingestion EDGE; the data-plane hop stays MQTT→Kafka
  * (KafkaBridge) exactly as in the reference, because Kafka gives the
  * partitioned replayable log that parallel executors can own. decode()
  * is a pure codegen projection (from_json), no shuffle before the first
  * aggregation — identical shape to KafkaBridge.decode.
  */
object MqttBridge {

  val Topic = "machine/data"

  /** Streaming read from a live broker (see [[graft.sources.MqttSource]]
    * for schema and the driver-side admission caveat).
    */
  def source(spark: SparkSession, host: String, port: Int,
      topic: String = Topic): DataFrame =
    spark.readStream.format("mqtt-sub")
      .option("host", host).option("port", port.toString)
      .option("topic", topic)
      .load()

  /** Raw MQTT rows → decoded envelope — the shared [[graft.model.Envelope]]
    * contract (value parsed as VARIANT so the payload's number-vs-string
    * type survives for the downstream dispatch), applied to live-transport
    * payloads. `machine/data` is an OPEN topic: any client can publish
    * garbage to it, so malformed payloads are dropped here (the reference
    * consumer nets out the same — a `json.loads` failure in paho's
    * `on_message` is swallowed and the message lost) instead of poisoning
    * every downstream stateful twin with an all-null row.
    */
  def decode(raw: DataFrame): DataFrame =
    raw
      .select(col("msg_offset"), col("topic"),
        // dual parse — type channel from the variant, string content from
        // the string parse (see Envelope.variantSchema for why)
        from_json(col("payload"), graft.model.Envelope.variantSchema).as("m"),
        from_json(col("payload"), graft.model.Envelope.stringSchema).as("ms"))
      .where(graft.model.Envelope.wellFormed)
      .select(Seq(col("msg_offset"), col("topic")) ++
        graft.model.Envelope.decodedColumns: _*)

  /** foreachBatch publisher — the engine-side twin of the reference's
    * publish loop (opcua_mqtt_agent/main.py:54-59): each batch row's
    * `payload` column goes out as one QoS-0 PUBLISH on `topic`. The
    * payload is prepared IN the stream (to_json projection on executors);
    * the publish loop itself runs driver-side over the collected batch —
    * correct for an edge publisher whose counterpart is a single Python
    * process, and deliberately NOT the data-plane path (that is
    * KafkaBridge, where executors write partitions in parallel).
    */
  def publishBatch(batch: DataFrame, host: String, port: Int,
      topic: String = Topic, clientId: String = "graft-pub"): Long = {
    val payloads = batch.select(col("payload").cast("string")).collect()
    val client = new MqttClient(host, port, clientId)
    try {
      payloads.foreach { (r: Row) =>
        client.publish(topic, r.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      payloads.length.toLong
    } finally client.close()
  }

  /** Executor-side publisher — the distributed arm of [[publishBatch]]:
    * each partition's task opens ITS OWN broker connection, publishes its
    * rows, and closes it (the connection-per-partition idiom the RESP
    * enrichment uses — DataflowOps.enrichViaKv). Nothing is collected to
    * the driver, so batch size is bounded by executor memory per
    * partition, not driver memory; use this arm whenever the batch isn't
    * trivially small. At-least-once under task retries (a re-run
    * partition re-publishes its rows) on an at-most-once transport —
    * QoS-0 subscribers already own dedup/loss semantics.
    *
    * Returns the number of rows published this attempt, counted by
    * accumulator (retried tasks may over-count; the number is
    * diagnostic, like the driver arm's).
    */
  def publishBatchFromExecutors(batch: DataFrame, host: String, port: Int,
      topic: String = Topic, clientIdPrefix: String = "graft-pub"): Long = {
    val published = batch.sparkSession.sparkContext.longAccumulator("mqtt_published")
    batch.select(col("payload").cast("string"))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val client = new MqttClient(host, port, s"$clientIdPrefix-p$pid")
          try rows.foreach { r =>
            client.publish(topic,
              r.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            published.add(1L)
          } finally client.close()
        }
      }
    published.value
  }
}
