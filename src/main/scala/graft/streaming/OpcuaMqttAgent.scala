package graft.streaming

import graft.net.{MqttClient, OpcuaClient}
import graft.net.OpcuaWire._

/** The reference's OPC-UA→MQTT agent (opcua_mqtt_agent/main.py) as a
  * library component over the engine's OWN protocol stacks: a real
  * opc.tcp client (browse namespace → find the model root → collect its
  * Variable children → 500 ms subscription) publishing one JSON envelope
  * per data change to a real MQTT 3.1.1 broker — byte-for-byte the
  * topology's first hop, with both sockets live.
  *
  * Envelope: the engine's wire schema (`{"event_id":…,"node_id":…,
  * "value":…,"ts_us":…,"user_id":…}`, MqttBridge.decode's from_json
  * contract). The reference publishes `{node_id, value, timestamp}`
  * (main.py:47-52); event_id/user_id carry the subscription's own
  * monotonic counter / no user, so the same decode path serves both
  * producers. `value` is rendered as the JSON scalar of the Variant —
  * the all-string downstream dispatch (q_type_dispatch) exists exactly
  * because the reference flattens these to strings at the DB edge.
  */
object OpcuaMqttAgent {

  final class Handle private[OpcuaMqttAgent] (
      opc: OpcuaClient, mqtt: MqttClient,
      val variables: Seq[String]) extends AutoCloseable {
    override def close(): Unit = { opc.close(); mqtt.close() }
  }

  /** Connect both sides, wire the subscription, return a handle that
    * keeps publishing until closed. Mirrors main.py:88-130.
    */
  def run(
      opcHost: String, opcPort: Int, endpointUrl: String, namespaceUri: String,
      mqttHost: String, mqttPort: Int, topic: String = MqttBridge.Topic,
      rootName: String = "PickAndPlace"): Handle = {
    // a failure after either client connects must not leak its socket and
    // threads: a supervisor retrying run() in a loop would otherwise
    // accumulate live connections until fd exhaustion (MqttSource applies
    // the same guard to its client construction)
    val opc = new OpcuaClient(opcHost, opcPort, endpointUrl)
    try {
      val idx = opc.namespaceIndex(namespaceUri)
      require(idx >= 0, s"namespace $namespaceUri not registered")
      // browse Objects for the root object in the model namespace
      // (main.py:99-110: match browse name + namespace index)
      val root = opc.browse(NumericId(0, NodeObjectsFolder)).collectFirst {
        case (name, id @ StringId(ns, _), cls)
          if name == rootName && ns == idx && cls == NodeClassObject => id
      }.getOrElse(throw new IllegalStateException(s"'$rootName' not in namespace $idx"))
      // its Variable children (main.py:113-121)
      val vars = opc.browse(root).collect {
        case (name, _, cls) if cls == NodeClassVariable => name
      }
      val mqtt = new MqttClient(mqttHost, mqttPort, "graft-opcua-agent")
      try {
        val counter = new java.util.concurrent.atomic.AtomicLong(1)
        val sub = opc.createSubscription(500.0)
        opc.subscribeDataChange(sub, idx, vars) { (name, v, tsMicros) =>
          // absent source timestamp renders as JSON null (from_json then
          // yields a null ts column) — not a fabricated 1970 epoch
          val payload =
            s"""{"event_id":${counter.getAndIncrement()},"node_id":${jsonStr(name)},""" +
              s""""value":${jsonScalar(v)},"ts_us":${tsMicros.map(_.toString).getOrElse("null")},"user_id":null}"""
          mqtt.publish(topic, payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        new Handle(opc, mqtt, vars)
      } catch { case t: Throwable => mqtt.close(); throw t }
    } catch { case t: Throwable =>
      // close opc only on failure (the inner close cannot double-close it:
      // a successful Handle return throws nothing)
      opc.close(); throw t
    }
  }

  /** ensure_ascii escaping, exactly like the reference's `json.dumps`
    * default (opcua_mqtt_agent/main.py:54): every char outside printable
    * ASCII renders as \\uXXXX (astral chars as their surrogate pair).
    * This is not just fidelity — Spark's VARIANT JSON parser decodes raw
    * non-ASCII bytes inside a variant-typed field to U+FFFD mojibake
    * (verified against 4.1.2; plain string fields are fine), so an
    * ASCII-only wire is what keeps the type-preserving `value` channel
    * lossless for any content.
    */
  private[graft] def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Variant → JSON scalar. MqttBridge.decode reads `value` as string;
    * from_json coerces scalars, so numbers stay lossless text.
    */
  private[graft] def jsonScalar(v: Variant): String = v.v match {
    case null => "null"
    case s: String => jsonStr(s)
    case b: Boolean => b.toString
    case other => other.toString // Long / Double / Float — Double renders
                                 // "41847.0" like the reference's json.dumps
  }
}
