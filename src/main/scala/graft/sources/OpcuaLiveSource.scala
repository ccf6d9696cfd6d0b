package graft.sources

import graft.net.OpcuaClient
import graft.net.OpcuaWire._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** DataSource V2 streaming source subscribed to a LIVE opc.tcp server —
  * the direct-ingest twin of the reference's OPC-UA edge: where the
  * reference detours through MQTT (opcua_mqtt_agent → mosquitto →
  * hydration_agent), this source lets a Spark stream subscribe to the
  * machine itself over the engine's own binary protocol stack
  * ([[graft.net.OpcuaClient]]/[[graft.net.OpcuaServer]],
  * SecurityPolicy#None), one row per data-change notification.
  *
  * Usage: `spark.readStream.format("opcua-sub")
  *           .option("host", h).option("port", p)
  *           .option("endpointUrl", url)
  *           .option("namespaceUri", "urn:example:pick-and-place")
  *           .load()`
  * Schema: (msg_offset long, node_id string, value string,
  * source_ts timestamp) — `value` flattened to string exactly like the
  * MQTT envelope (the type-dispatch stage owns re-typing).
  *
  * Scale honesty (same caveat as [[MqttSource]], which see): an OPC-UA
  * subscription PUSHES into one subscribing session, so admission is
  * driver-side and each micro-batch ships as one task; restart rebase
  * semantics are [[MqttSource]]'s (checkpointed offsets never go
  * backwards, post-restart buffered rows are renumbered and kept, the
  * pre-crash window replays empty — at-most-once, matching the
  * reference's own loss mode on agent restart).
  */
class OpcuaLiveSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "opcua-sub"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = OpcuaLiveSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OpcuaLiveTable(properties)
}

object OpcuaLiveSource {
  val Schema: StructType = StructType(Seq(
    StructField("msg_offset", LongType),
    StructField("node_id", StringType),
    StructField("value", StringType),
    StructField("source_ts", TimestampType)
  ))

  /** Variant → the wire's string rendering (OpcuaMqttAgent's scalar). */
  private[sources] def valueString(v: Variant): String = v.v match {
    case null => null
    case s: String => s
    case other => other.toString
  }
}

private final class OpcuaLiveTable(props: util.Map[String, String])
    extends Table with SupportsRead {
  // the raw properties map is case-SENSITIVE and the documented option
  // key is camel-case "endpointUrl" — a bare get("endpointurl") rendered
  // every plan/UI name as "opcua-sub(null)"
  override def name(): String =
    s"opcua-sub(${new CaseInsensitiveStringMap(props).get("endpointurl")})"
  override def schema(): StructType = OpcuaLiveSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = OpcuaLiveSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new OpcuaMicroBatchStream(
          Option(options.get("host")).getOrElse("127.0.0.1"),
          Option(options.get("port")).getOrElse(throw new IllegalArgumentException(
            "opcua-sub requires option 'port'")).toInt,
          Option(options.get("endpointUrl")).getOrElse(""),
          Option(options.get("namespaceUri")).getOrElse("urn:example:pick-and-place"),
          Option(options.get("rootName")).getOrElse("PickAndPlace"),
          Option(options.get("maxBufferedRows")).map(_.toLong).getOrElse(1L << 20))
    }
}

/** Live opc.tcp subscription over [[PushBufferMicroBatchStream]] (which
  * owns the cap/shed/rebase/eviction machinery and its invariants — see
  * its scaladoc): browse the model root, monitor every Variable, buffer
  * (node, value, sourceTs) per notification. sourceTs is None when the
  * notification carried no source timestamp; the column emits null, not
  * 1970-01-01.
  */
private final class OpcuaMicroBatchStream(
    host: String, port: Int, endpointUrl: String, nsUri: String,
    rootName: String, maxBuffered: Long)
    extends PushBufferMicroBatchStream[(String, String, Option[Long])]("opcua-sub", maxBuffered) {

  private val client = new OpcuaClient(host, port, endpointUrl)
  // init failure (unknown namespace/root, browse fault) must close the
  // already-opened client — its socket + reader thread are otherwise
  // orphaned for the life of the JVM
  try {
    val idx = client.namespaceIndex(nsUri)
    require(idx >= 0, s"namespace $nsUri not registered")
    val root = client.browse(NumericId(0, NodeObjectsFolder)).collectFirst {
      case (name, id @ StringId(ns, _), cls)
        if name == rootName && ns == idx && cls == NodeClassObject => id
    }.getOrElse(throw new IllegalStateException(s"'$rootName' not in namespace $idx"))
    val vars = client.browse(root).collect {
      case (name, _, cls) if cls == NodeClassVariable => name
    }
    val sub = client.createSubscription(500.0)
    client.subscribeDataChange(sub, idx, vars) { (name, v, tsMicros) =>
      admit((name, OpcuaLiveSource.valueString(v), tsMicros))
    }
  } catch {
    case e: Throwable =>
      try client.close() catch { case _: Throwable => () }
      throw e
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(OpcuaBatchPartition(slice(start, end).map {
      case (off, (n, v, us)) => (off, n, v, us.map(Long.box).orNull)
    }))

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition.asInstanceOf[OpcuaBatchPartition].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = {
          val (off, n, v, us) = rows(i)
          new GenericInternalRow(Array[Any](
            off, UTF8String.fromString(n),
            if (v == null) null else UTF8String.fromString(v),
            if (us == null) null else us.longValue()))
        }
        override def close(): Unit = ()
      }
    }

  override def stop(): Unit = client.close()
}

private final case class OpcuaBatchPartition(
    rows: Array[(Long, String, String, java.lang.Long)]) extends InputPartition
