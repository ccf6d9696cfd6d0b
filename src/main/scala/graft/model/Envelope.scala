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

  /** The transports' parse schema: `value` as VARIANT (type-preserving).
    *
    * Why decode parses the payload TWICE (variant + string): Spark's
    * VARIANT reader (verified against 4.1.2) decodes non-ASCII string
    * content inside a variant to per-byte U+FFFD replacement chars —
    * raw UTF-8 and \\uXXXX-escaped input alike; plain string fields are
    * unaffected. So the variant channel is authoritative only for the
    * JSON TYPE (and for numeric/boolean content, which is ASCII by
    * construction), while string CONTENT must come from a parallel
    * StringType parse. [[decodedColumns]] wires exactly that split.
    */
  val variantSchema: StructType = schema(VariantType)

  /** The content-side parse twin: every field as its natural type, value
    * as STRING (lossless for any content, typeless).
    */
  val stringSchema: StructType = schema(StringType)

  /** Envelope struct columns `m` (variant parse) + `ms` (string parse) →
    * the decoded consumer columns shared by KafkaBridge.decode and
    * MqttBridge.decode. `value` is the lossless string view (from the
    * string parse — the variant's string channel mangles non-ASCII, see
    * [[variantSchema]]); `value_v` keeps the variant so a consumer can
    * dispatch on the ORIGINAL JSON type (schema_of_variant) and an encode
    * can put it back on the wire. `ts` may be null: a producer with no
    * source timestamp sends `"ts_us":null` rather than a fabricated
    * epoch.
    */
  def decodedColumns: Seq[Column] = Seq(
    col("m.event_id").as("event_id"),
    timestamp_micros(col("m.ts_us")).as("ts"),
    col("m.node_id").as("metric"),
    col("ms.value").as("value"),
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
