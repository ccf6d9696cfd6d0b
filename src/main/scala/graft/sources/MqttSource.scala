package graft.sources

import graft.net.MqttClient
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

/** DataSource V2 streaming source subscribed to a live MQTT broker — the
  * real-transport twin of the reference's ingestion edge
  * (hydration_agent/main.py:64-71: paho subscribe on `machine/data`,
  * JSON envelope per message). Pairs with [[graft.net.MqttBroker]] /
  * [[graft.net.MqttClient]], which speak actual MQTT 3.1.1 framing over
  * TCP.
  *
  * Usage: `spark.readStream.format("mqtt-sub")
  *           .option("host", "127.0.0.1").option("port", p)
  *           .option("topic", "machine/data")    // filter, +/# supported
  *           .load()`
  * Schema: (msg_offset long, topic string, payload string,
  * arrived_at timestamp) — payload stays raw JSON text; parsing is the
  * stream's first projection (from_json with envelopeSchema), exactly
  * where the Kafka path puts it.
  *
  * Scale honesty (same caveat as Spark's own socket source): MQTT QoS-0 is
  * a PUSH protocol into one subscribing session, so admission happens on
  * the driver and each micro-batch ships its slice to a single task —
  * at-most-once, no replay after restart. The production-scale path is the
  * MQTT→Kafka bridge (the reference's own hop, kafka_db_agent: Kafka gives
  * the partitioned, replayable log Spark wants); this source exists so the
  * reference's exact MQTT topology runs end-to-end with real wire
  * semantics.
  */
class MqttSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mqtt-sub"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MqttSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MqttTable(properties)
}

object MqttSource {
  val Schema: StructType = StructType(Seq(
    StructField("msg_offset", LongType),
    StructField("topic", StringType),
    StructField("payload", StringType),
    StructField("arrived_at", TimestampType)
  ))
}

private final class MqttTable(props: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"mqtt-sub(${props.get("topic")})"
  override def schema(): StructType = MqttSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = MqttSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MqttMicroBatchStream(
          Option(options.get("host")).getOrElse("127.0.0.1"),
          Option(options.get("port")).getOrElse(throw new IllegalArgumentException(
            "mqtt-sub requires option 'port'")).toInt,
          Option(options.get("topic")).getOrElse("#"),
          Option(options.get("clientId")).getOrElse("graft-sub"),
          Option(options.get("maxBufferedRows")).map(_.toLong).getOrElse(1L << 20))
    }
}

/** Live MQTT subscription over [[PushBufferMicroBatchStream]] (which owns
  * the cap/shed/rebase/eviction machinery and its invariants — see its
  * scaladoc; QoS-0 at-most-once is the transport contract being honored).
  */
private final class MqttMicroBatchStream(
    host: String, port: Int, topic: String, clientId: String, maxBuffered: Long)
    extends PushBufferMicroBatchStream[(String, String, Long)]("mqtt-sub", maxBuffered) {

  private val client = new MqttClient(host, port, clientId)
  // a failed SUBSCRIBE (broker dies between CONNACK and SUBACK) must not
  // orphan the connected client's socket + reader thread for the JVM's
  // life — same guard as the OPC-UA twin
  try {
    client.subscribe(topic) { (t, payload) =>
      admit((t, new String(payload, java.nio.charset.StandardCharsets.UTF_8),
        System.currentTimeMillis() * 1000L))
    }
  } catch {
    case e: Throwable =>
      try client.close() catch { case _: Throwable => () }
      throw e
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(MqttBatchPartition(slice(start, end).map {
      case (off, (t, p, us)) => (off, t, p, us)
    }))

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition.asInstanceOf[MqttBatchPartition].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = {
          val (off, t, p, us) = rows(i)
          new GenericInternalRow(Array[Any](
            off, UTF8String.fromString(t), UTF8String.fromString(p), us))
        }
        override def close(): Unit = ()
      }
    }

  override def stop(): Unit = client.close()
}

private final case class MqttBatchPartition(
    rows: Array[(Long, String, String, Long)]) extends InputPartition
