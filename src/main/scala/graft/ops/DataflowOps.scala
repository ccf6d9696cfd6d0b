package graft.ops

import graft.Tables
import graft.Tables.ResultOrdering
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2A pipeline dataflow operators — the four Python agents' semantics
  * (OPC-UA → MQTT → enrichment → Kafka → DB) re-expressed as batch DataFrame
  * ops over the fixture tables. The streaming twins (readStream/writeStream)
  * live in graft.streaming; these batch forms are what the DuckDB oracle can
  * verify.
  *
  * Scale notes: the enrichment dimension is explicitly `broadcast()` (a
  * shuffle join against a 1.5k-row dim would be an instant anti-pattern at
  * 100 TB); JSON envelope encode/decode is from_json/to_json (codegen'd, no
  * UDFs); the "sink" ops are pure projections/aggregations that foreachBatch
  * would append — micro-batched, never per-row like the reference
  * (kafka_db_agent/main.py:92-99).
  */
object DataflowOps {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** Envelope schema of the MQTT/Kafka JSON payload (§1.2) — the shared
    * contract ([[graft.model.Envelope]]) with `value` as DOUBLE: these
    * surrogates round-trip the all-numeric events fixture, so the type
    * channel is statically known. Timestamp is carried as epoch micros
    * (lossless round-trip; ISO strings would truncate sub-millisecond
    * precision under Spark's default JSON timestamp format).
    */
  private val envelopeSchema = graft.model.Envelope.schema(DoubleType)

  private def payloadJson(df: DataFrame): DataFrame =
    df.withColumn(
      "payload",
      to_json(struct(
        col("event_id"),
        col("event_type").as("node_id"),
        col("value"),
        unix_micros(col("ts")).as("ts_us")
      ))
    )

  /** Fixture-replay form of the OPC-UA subscription source
    * (opcua_mqtt_agent/main.py:93-130): every variable node emission as a
    * (node_id, value, timestamp) record.
    */
  def srcOpcua(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .select(
        col("event_id"),
        col("event_type").as("node_id"),
        col("value"),
        col("ts").as("source_ts")
      )
      .resultOrder(col("event_id"))

  /** Dynamic node discovery (opcua_mqtt_agent/main.py:115-125): the distinct
    * variable registry with the value type INFERRED from the samples' OPC-UA
    * variants, mirroring the reference's per-variant registration: any
    * boolean sample registers the node Boolean, else any non-numeric
    * (string-payload) sample registers it String, else Double. The variant
    * of each sample is `rawValue` — the same §1.3 model the dispatch and
    * sink ops use, so discovery and dispatch can never disagree on a
    * node's type. (An earlier version keyed on count(value) > 0, which is
    * true for every fixture node — the String branch was dead and the
    * 'error' node, whose payloads are JSON strings, registered as Double.)
    */
  def srcSchemaDiscovery(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("raw", rawValue)
      .groupBy(col("event_type").as("node_id"))
      .agg(
        count(lit(1)).as("n_samples"),
        min(col("ts")).as("first_seen"),
        when(sum(when(col("raw").isin("true", "false"), 1).otherwise(0)) > 0, "Boolean")
          .when(sum(when(expr("try_cast(raw AS DOUBLE)").isNull, 1).otherwise(0)) > 0, "String")
          .otherwise("Double").as("datatype"))
      .select(col("node_id"), col("n_samples"), col("first_seen"), col("datatype"))
      .resultOrder(col("node_id"))

  /** Record construction / projection with timestamp fallback
    * (opcua_mqtt_agent/main.py:35-52) + JSON attribute extraction from the
    * props payload.
    */
  def xformEnvelope(s: SparkSession, dir: String): DataFrame =
    Tables.fanOut(ev(s, dir)) // per-row JSON attribute extraction below
      .select(
        col("event_id"),
        col("event_type").as("node_id"),
        col("value"),
        coalesce(col("ts"), lit("2024-02-01 00:00:00").cast("timestamp")).as("timestamp"),
        expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k")
      )
      .resultOrder(col("event_id"))

  /** MQTT source surrogate (hydration_agent/main.py:64-71): serialize each
    * record to the JSON envelope, then parse it back with from_json — the
    * oracle checks the round-trip is lossless against the raw table.
    */
  def srcMqtt(s: SparkSession, dir: String): DataFrame =
    // fanOut: the envelope encode+decode (two Jackson passes per row) is
    // the expensive stage, and a single-row-group fixture scans as one
    // task (Tables.fanOut — no-op on a production-sized table)
    payloadJson(Tables.fanOut(ev(s, dir)))
      .select(from_json(col("payload"), envelopeSchema).as("m"))
      .select(
        col("m.event_id").as("event_id"),
        col("m.node_id").as("node_id"),
        col("m.value").as("value"),
        timestamp_micros(col("m.ts_us")).as("ts")
      )
      .resultOrder(col("event_id"))

  /** MQTT sink surrogate (opcua_mqtt_agent/main.py:54-59): QoS-0 publish
    * stats per topic/node.
    */
  def snkMqtt(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(col("event_type").as("node_id"))
      .agg(count(lit(1)).as("n_msgs"), graft.model.Model.exactSum(col("value"), 2).as("checksum"))
      .withColumn("topic", lit("machine/data"))
      .withColumn("qos", lit(0))
      .select(col("node_id"), col("topic"), col("qos"), col("n_msgs"), col("checksum"))
      .resultOrder(col("node_id"))

  /** Kafka source surrogate (kafka_db_agent/main.py:50-57): topic-partitioned
    * records with the JSON value deserialized.
    */
  def srcKafka(s: SparkSession, dir: String): DataFrame =
    payloadJson(Tables.fanOut(ev(s, dir)))
      .select(
        lit("machine_events").as("topic"),
        (col("event_id") % 4).cast("int").as("partition"),
        col("event_id").as("msg_offset"),
        from_json(col("payload"), envelopeSchema).as("m")
      )
      .select(
        col("topic"), col("partition"), col("msg_offset"),
        col("m.node_id").as("key"),
        col("m.value").as("value"),
        timestamp_micros(col("m.ts_us")).as("ts")
      )
      .resultOrder(col("msg_offset"))

  /** Kafka sink surrogate (hydration_agent/main.py:54-57,86): per-partition
    * producer batch stats for topic `machine_events`.
    */
  def snkKafka(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy((col("event_id") % 4).cast("int").as("partition"))
      .agg(count(lit(1)).as("n_records"), graft.model.Model.exactSum(col("value"), 2).as("checksum"))
      .withColumn("topic", lit("machine_events"))
      .select(col("topic"), col("partition"), col("n_records"), col("checksum"))
      .resultOrder(col("partition"))

  /** Stream-static enrichment join ("hydration", hydration_agent/main.py:68-86):
    * attach operator context to every event. The dim side is explicitly
    * broadcast — at 100 TB the fact side never shuffles for this join.
    */
  def enrichJoin(s: SparkSession, dir: String): DataFrame = {
    val context = Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        col("c_name").as("operator"),
        col("c_mktsegment").as("segment")
      )
    ev(s, dir)
      .join(broadcast(context), col("user_id") === col("c_custkey"), "left")
      .select(
        col("event_id"),
        col("event_type"),
        col("value"),
        col("operator"),
        col("segment"),
        lit("2025-10-01").as("last_maintenance")
      )
      .resultOrder(col("event_id"))
  }

  /** Live-KV enrichment variant — the reference's ACTUAL lookup shape
    * (hydration_agent/main.py:73-74: `redis_client.get("context:operator")`
    * / `get("context:last_maintenance")` per message) against a real RESP
    * server ([[graft.net.RespServer]]). The default `enrichJoin` broadcast
    * is semantically stronger for STATIC dims (and is the oracle-checked
    * path); this variant exists for context that MUTATES mid-stream,
    * where each row must see the value current at processing time — a
    * broadcast would pin stream start-time state.
    *
    * Scale: one connection per PARTITION (opened in mapPartitions, closed
    * by a task-completion listener), synchronous GETs per row against a
    * loopback/LAN KV — the connection-pool pattern; no shuffle, no
    * driver participation. Executors at 1000 nodes each hold one
    * connection per running task, which is exactly how the Python agent
    * fleet scales (one redis connection per process).
    */
  def enrichViaKv(events: DataFrame, host: String, port: Int): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val outSchema = StructType(events.schema.fields ++ Seq(
      StructField("operator", StringType),
      StructField("last_maintenance", StringType)))
    events.mapPartitions { it =>
      val client = new graft.net.RespClient(host, port)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => client.close()))
      it.map { r =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(
          client.get("context:operator").orNull,
          client.get("context:last_maintenance").orNull))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Raw dynamic value per event, pre-dispatch — numbers arrive as decimal
    * strings, 'error' rows as JSON text, 'signup' rows as booleans
    * (mirrors the OPC-UA variant union, §1.3). The boolean rule is
    * "above the signup setpoint" — the cutoff comes from
    * Model.MetricTargets (the declared single source), not a literal, so
    * a setpoint change cannot desynchronize the variant channel.
    */
  private val signupCutoff: Double = graft.model.Model.targetFor("signup")

  private def rawValue = when(col("event_type") === "error", col("props"))
    .when(col("event_type") === "signup",
      when(col("value") > signupCutoff, "true").otherwise("false"))
    .otherwise(col("value").cast("string"))

  private val rawValueSql: String =
    s"""CASE WHEN event_type = 'error' THEN props
       |     WHEN event_type = 'signup' THEN (CASE WHEN value > $signupCutoff THEN 'true' ELSE 'false' END)
       |     ELSE CAST(value AS VARCHAR) END""".stripMargin

  /** Type dispatch / value normalization (kafka_db_agent/main.py:83-89):
    * numeric-non-bool → value_num (widened to double), everything else →
    * value_str; booleans deliberately become the strings 'True'/'False'
    * (Python str() capitalization — :86), never 1.0/0.0.
    */
  def typeDispatch(s: SparkSession, dir: String): DataFrame =
    // no fanOut: the dispatch is a pure CASE/try_cast projection — a
    // rebalance exchange would shuffle the corpus to parallelize a cast,
    // a pessimization at any scale (contrast srcMqtt, where two Jackson
    // passes per row genuinely need the width)
    typeDispatchOn(ev(s, dir))

  /** The value type-dispatch rule (kafka_db_agent/main.py:83-89) on a raw
    * string column, by name — the SINGLE source for all three call sites
    * (batch dispatch, JDBC sink projection, streaming ingest), so a rule
    * change (e.g. new boolean spellings) cannot desynchronize the streaming
    * path from the oracle-checked batch path.
    *
    * The reference dispatches on the payload's TYPE
    * (isinstance(val, (int, float)) and not bool), not on parseability:
    * a string payload that merely LOOKS numeric ('123') stays value_str.
    * `isStr` is that type channel — in the batch EAV model the §1.3
    * str-variant carrier (event_type = 'error'), on the JSON wire whether
    * the value was quoted. Flattening to one string column WITHOUT the
    * channel (the earlier form) erased the string/number distinction the
    * envelope still carries.
    */
  def dispatchNum(name: String, isStr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isStr || col(name).isin("true", "false"), lit(null).cast("double"))
      .otherwise(expr(s"try_cast($name AS DOUBLE)"))

  def dispatchStr(name: String, isStr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isStr, col(name))
      .when(col(name) === "true", "True")
      .when(col(name) === "false", "False")
      .when(expr(s"try_cast($name AS DOUBLE)").isNull, col(name))

  /** The batch EAV model's string-variant channel (§1.3): 'error' nodes
    * carry JSON-text payloads; every other node's payload is numeric or
    * boolean.
    */
  private def isStrVariant: org.apache.spark.sql.Column =
    col("event_type") === "error"

  def typeDispatchOn(events: DataFrame): DataFrame =
    events
      .withColumn("raw", rawValue)
      .select(
        col("event_id"),
        dispatchNum("raw", isStrVariant).as("value_num"),
        dispatchStr("raw", isStrVariant).as("value_str")
      )
      .resultOrder(col("event_id"))

  /** DB sink surrogate (kafka_db_agent/main.py:92-103): the exact 5-column
    * opcua_data projection a foreachBatch append would write — dispatch +
    * enrichment composed.
    */
  def snkJdbc(s: SparkSession, dir: String): DataFrame = {
    val operators = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name").as("operator"))
    // no fanOut: CASE projection + broadcast hash join, both trivially
    // per-row — the scan parallelizes natively at production scale
    ev(s, dir)
      .withColumn("raw", rawValue)
      .join(broadcast(operators), col("user_id") === col("c_custkey"), "left")
      .select(
        col("event_id"),
        col("ts").as("time"),
        col("event_type").as("metric"),
        dispatchNum("raw", isStrVariant).as("value_num"),
        dispatchStr("raw", isStrVariant).as("value_str"),
        col("operator")
      )
      .resultOrder(col("event_id"))
  }

  private val dispatchNumSql =
    "CASE WHEN event_type = 'error' OR raw IN ('true','false') THEN NULL ELSE TRY_CAST(raw AS DOUBLE) END"
  private val dispatchStrSql =
    """CASE WHEN event_type = 'error' THEN raw
      |     WHEN raw = 'true' THEN 'True' WHEN raw = 'false' THEN 'False'
      |     WHEN TRY_CAST(raw AS DOUBLE) IS NULL THEN raw END""".stripMargin

  val oracles: Map[String, String] = Map(
    "src_opcua" ->
      """SELECT event_id, event_type AS node_id, value, ts AS source_ts
        |FROM events ORDER BY event_id""".stripMargin,
    "src_schema_discovery" ->
      s"""WITH r AS (SELECT event_type, ts, $rawValueSql AS raw FROM events)
        |SELECT event_type AS node_id, count(*) AS n_samples, min(ts) AS first_seen,
        |  CASE WHEN sum(CASE WHEN raw IN ('true', 'false') THEN 1 ELSE 0 END) > 0 THEN 'Boolean'
        |       WHEN sum(CASE WHEN TRY_CAST(raw AS DOUBLE) IS NULL THEN 1 ELSE 0 END) > 0 THEN 'String'
        |       ELSE 'Double' END AS datatype
        |FROM r GROUP BY event_type ORDER BY node_id""".stripMargin,
    "xform_envelope" ->
      """SELECT event_id, event_type AS node_id, value,
        |       coalesce(ts, TIMESTAMP '2024-02-01 00:00:00') AS timestamp,
        |       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "src_mqtt" ->
      """SELECT event_id, event_type AS node_id, value, ts
        |FROM events ORDER BY event_id""".stripMargin,
    "snk_mqtt" ->
      """SELECT event_type AS node_id, 'machine/data' AS topic, 0 AS qos,
        |       count(*) AS n_msgs, CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS checksum
        |FROM events GROUP BY event_type ORDER BY node_id""".stripMargin,
    "src_kafka" ->
      """SELECT 'machine_events' AS topic, CAST(event_id % 4 AS INTEGER) AS partition,
        |       event_id AS msg_offset, event_type AS key, value, ts
        |FROM events ORDER BY msg_offset""".stripMargin,
    "snk_kafka" ->
      """SELECT 'machine_events' AS topic, CAST(event_id % 4 AS INTEGER) AS partition,
        |       count(*) AS n_records, CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS checksum
        |FROM events GROUP BY 2 ORDER BY partition""".stripMargin,
    "q_enrich_join" ->
      """SELECT e.event_id, e.event_type, e.value, c.c_name AS operator,
        |       c.c_mktsegment AS segment, '2025-10-01' AS last_maintenance
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,
    "q_type_dispatch" ->
      s"""WITH t AS (SELECT event_id, event_type, $rawValueSql AS raw FROM events)
         |SELECT event_id, $dispatchNumSql AS value_num, $dispatchStrSql AS value_str
         |FROM t ORDER BY event_id""".stripMargin,
    "snk_jdbc" ->
      s"""WITH t AS (
         |  SELECT event_id, ts, event_type, user_id, $rawValueSql AS raw FROM events)
         |SELECT t.event_id, t.ts AS time, t.event_type AS metric,
         |       $dispatchNumSql AS value_num, $dispatchStrSql AS value_str,
         |       c.c_name AS operator
         |FROM t LEFT JOIN customer c ON t.user_id = c.c_custkey
         |ORDER BY t.event_id""".stripMargin
  )
}
