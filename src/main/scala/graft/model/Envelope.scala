package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The ONE definition of the pipeline's JSON wire envelope (SURVEY §1.2):
  * `{"event_id":…,"node_id":…,"value":…,"ts_us":…,"user_id":…}` — produced
  * by the OPC-UA agent (opcua_mqtt_agent/main.py:47-52 publishes
  * {node_id, value, timestamp}; event_id/user_id are the engine's
  * additions), carried over MQTT and Kafka, decoded at every consumer.
  *
  * Every decode path (KafkaBridge, MqttBridge, StreamingOps.ingest, the
  * batch surrogates in DataflowOps) parses THIS schema, parameterized only
  * by the `value` field's type, so the wire contract cannot silently
  * diverge between transports:
  *
  *   - `VariantType` (the transports): preserves the payload's JSON type —
  *     the reference dispatches on exactly that (`isinstance(val,
  *     (int, float)) and not bool`, kafka_db_agent/main.py:86-89), so a
  *     number on the wire must stay distinguishable from a string. A
  *     StringType field would coerce numbers, bools and strings to
  *     indistinguishable text.
  *   - `DoubleType`/`StringType` (batch surrogates over all-numeric or
  *     pre-stringified fixtures): cheaper parse where the type channel is
  *     statically known.
  */
object Envelope {

  def schema(valueType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("node_id", StringType),
    StructField("value", valueType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType)
  ))

  /** The transports' parse schema: `value` as VARIANT (type-preserving). */
  val variantSchema: StructType = schema(VariantType)

  /** Envelope struct column `m` → the decoded consumer columns shared by
    * KafkaBridge.decode and MqttBridge.decode. `value` is the string view;
    * `value_v` keeps the variant so an encode can put the ORIGINAL JSON
    * type back on the wire and a consumer can dispatch on it
    * (schema_of_variant). Note the variant parse normalizes numeric TEXT:
    * `41847.0` on the wire stores as an exact decimal and renders back as
    * `41847` — value-preserving (the reference's consumer reads it with
    * `float(val)`), but not byte-preserving for numbers carrying trailing
    * fractional zeros. `ts` may be null: a producer with no source
    * timestamp sends `"ts_us":null` rather than a fabricated epoch.
    */
  def decodedColumns: Seq[Column] = Seq(
    col("m.event_id").as("event_id"),
    timestamp_micros(col("m.ts_us")).as("ts"),
    col("m.node_id").as("metric"),
    col("m.value").cast("string").as("value"),
    col("m.value").as("value_v"),
    col("m.user_id").as("user_id")
  )

  /** Drop rows whose payload failed to parse (`from_json` → null struct)
    * or that lack the required `node_id`. The reference's consumer has the
    * same net behavior: a `json.loads`/KeyError in paho's `on_message`
    * callback is swallowed by the client loop and the message is dropped —
    * one garbled publish on the open topic must not kill ingestion.
    */
  def wellFormed: Column = col("m").isNotNull && col("m.node_id").isNotNull
}
