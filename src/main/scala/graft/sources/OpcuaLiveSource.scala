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
  override def name(): String = s"opcua-sub(${props.get("endpointurl")})"
  override def schema(): StructType = OpcuaLiveSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = OpcuaLiveSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new OpcuaMicroBatchStream(
          Option(options.get("host")).getOrElse("127.0.0.1"),
          options.get("port").toInt,
          Option(options.get("endpointUrl")).getOrElse(""),
          Option(options.get("namespaceUri")).getOrElse("urn:example:pick-and-place"),
          Option(options.get("rootName")).getOrElse("PickAndPlace"),
          Option(options.get("maxBufferedRows")).map(_.toLong).getOrElse(1L << 20))
    }
}

private final case class OpcuaOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Driver-side subscription buffer — [[MqttSource]]'s admission/rebase
  * machinery over the opc.tcp client: browse the model root, monitor
  * every Variable, buffer (node, value, sourceTs) per notification.
  */
private final class OpcuaMicroBatchStream(
    host: String, port: Int, endpointUrl: String, nsUri: String,
    rootName: String, maxBuffered: Long)
    extends MicroBatchStream {

  // (node, value, sourceTsMicros) — ts None when the notification carried
  // no source timestamp; the column emits null, not 1970-01-01
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, Option[Long])]
  private var base = 0L
  private var dropped = 0L
  private val lock = new Object

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
      lock.synchronized {
        if (buf.length < maxBuffered) {
          if (dropped > 0) {
            System.err.println(s"[opcua-sub] resumed after dropping $dropped notifications at cap $maxBuffered")
            dropped = 0
          }
          buf += ((name, OpcuaLiveSource.valueString(v), tsMicros))
        } else {
          if (dropped == 0)
            System.err.println(s"[opcua-sub] buffer cap $maxBuffered reached — shedding")
          dropped += 1
        }
      }
    }
  } catch {
    case e: Throwable =>
      try client.close() catch { case _: Throwable => () }
      throw e
  }

  override def initialOffset(): Offset = OpcuaOffset(0L)
  override def latestOffset(): Offset =
    lock.synchronized(OpcuaOffset(base + buf.length))
  override def deserializeOffset(json: String): Offset = {
    val o = json.toLong
    // restart rebase, buffer KEPT — see MqttSource.deserializeOffset for
    // the full argument (post-restart arrivals renumber from the
    // checkpoint; only the pre-crash window replays empty)
    lock.synchronized { if (o > base + buf.length) base = o }
    OpcuaOffset(o)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[OpcuaOffset].n
    val e = end.asInstanceOf[OpcuaOffset].n
    val rows = lock.synchronized {
      buf.slice((s - base).toInt.max(0), (e - base).toInt.max(0))
        .zipWithIndex
        .map { case ((n, v, us), i) => (s + i, n, v, us.map(Long.box).orNull) }
        .toArray
    }
    Array(OpcuaBatchPartition(rows))
  }

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

  override def commit(end: Offset): Unit = lock.synchronized {
    val e = end.asInstanceOf[OpcuaOffset].n
    val drop = (e - base).toInt
    if (drop > 0) { buf.remove(0, drop.min(buf.length)); base = e }
  }

  override def stop(): Unit = client.close()
}

private final case class OpcuaBatchPartition(
    rows: Array[(Long, String, String, java.lang.Long)]) extends InputPartition
