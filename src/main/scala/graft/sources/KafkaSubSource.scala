package graft.sources

import graft.net.{KafkaCursor, KafkaProducer}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** DataSource V2 Kafka source/sink over the engine's own wire stack
  * ([[graft.net.KafkaWire]]/[[graft.net.KafkaBroker]]/
  * [[graft.net.KafkaClient]]) — the replayable-log leg of the reference
  * topology (hydration_agent/main.py:54-57 produce →
  * kafka_db_agent/main.py:50-57 consume, topic `machine_events`).
  *
  * Usage: `spark.readStream.format("kafka-graft")
  *           .option("host", h).option("port", p)
  *           .option("topic", "machine_events")
  *           .option("maxOffsetsPerTrigger", "10000").load()`
  * Schema matches the stock connector's wire schema
  * ([[graft.streaming.KafkaBridge.KafkaWireSchema]]), so
  * `KafkaBridge.decode` applies unchanged; the sink
  * (`writeStream.format("kafka-graft").option("topic", t)`) takes the
  * `KafkaBridge.encode` output (key binary, value binary).
  *
  * This is the contract Spark's own Kafka connector uses, reproduced over
  * the native stack: the ENGINE owns offsets (per-partition ranges in the
  * streaming checkpoint), the broker is a seekable log — batches REPLAY
  * identically after a crash, which with an idempotent sink
  * ([[graft.pipeline.IdempotentSink]]) gives end-to-end exactly-once. The
  * push transports (MQTT/OPC-UA) can't offer that; this is why the
  * reference — and any production topology — bridges them into Kafka
  * before the heavy processing.
  *
  * Scale: one input partition per Kafka partition — ingest parallelism =
  * topic partition count; each TASK opens its own cursor against the
  * broker (connection-per-partition, the same idiom as the RESP
  * enrichment), nothing flows through the driver. `maxOffsetsPerTrigger`
  * is admission control, apportioned over partitions by backlog share.
  */
class KafkaSubSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka-graft"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaSubSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KafkaGraftTable(properties)
}

object KafkaSubSource {
  /** The stock connector's source schema, byte for byte. */
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)
  ))

  private[sources] def opt(options: CaseInsensitiveStringMap, key: String): String =
    Option(options.get(key)).getOrElse(
      throw new IllegalArgumentException(s"kafka-graft requires option '$key'"))
}

/** Per-partition offset map as a streaming Offset; json shape
  * `{"0":12,"1":34}` (partition -> next offset to read), hand-parsed so
  * the source carries no json library dependency.
  */
private[sources] final case class KafkaGraftOffset(parts: Map[Int, Long]) extends Offset {
  override def json(): String =
    parts.toSeq.sorted.map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

private[sources] object KafkaGraftOffset {
  def parse(json: String): KafkaGraftOffset = {
    val inner = json.trim.stripPrefix("{").stripSuffix("}")
    if (inner.isEmpty) KafkaGraftOffset(Map.empty)
    else KafkaGraftOffset(inner.split(",").map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap)
  }
}

private final class KafkaGraftTable(props: util.Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"kafka-graft(${props.get("topic")})"
  override def schema(): StructType = KafkaSubSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = KafkaSubSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new KafkaGraftMicroBatchStream(
          KafkaSubSource.opt(options, "host"),
          KafkaSubSource.opt(options, "port").toInt,
          KafkaSubSource.opt(options, "topic"),
          Option(options.get("startingOffsets")).getOrElse("earliest"),
          Option(options.get("maxOffsetsPerTrigger")).map(_.toLong))
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val options = info.options()
    val schema = info.schema()
    val keyIdx = schema.fieldIndex("key")
    val valueIdx = schema.fieldIndex("value")
    require(schema(keyIdx).dataType == BinaryType &&
      schema(valueIdx).dataType == BinaryType,
      "kafka-graft sink expects binary key/value columns (KafkaBridge.encode output)")
    val host = KafkaSubSource.opt(options, "host")
    val port = KafkaSubSource.opt(options, "port").toInt
    val topic = KafkaSubSource.opt(options, "topic")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new KafkaGraftStreamingWrite(host, port, topic, keyIdx, valueIdx)
      }
    }
  }
}

private final class KafkaGraftMicroBatchStream(
    host: String, port: Int, topic: String,
    startingOffsets: String, maxOffsetsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {

  // driver-side admin cursor: partition discovery + end offsets only —
  // record payloads never flow through this connection
  private val cursor = new KafkaCursor(host, port, "graft-spark-driver")

  override def initialOffset(): Offset = {
    val n = cursor.partitionCount(topic)
    require(n > 0, s"topic $topic does not exist on $host:$port")
    KafkaGraftOffset((0 until n).map { p =>
      val (earliest, latest) = cursor.offsets(topic, p)
      p -> (if (startingOffsets == "latest") latest else earliest)
    }.toMap)
  }

  // admission control lives in latestOffset(start, limit), NOT in
  // planInputPartitions: whatever end offset this returns is what the
  // checkpoint records as consumed, so truncating later in planning
  // would silently LOSE the truncated rows on the next batch
  override def getDefaultReadLimit: ReadLimit =
    maxOffsetsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val latest = cursor.latestOffsets(topic)
    val s = start.asInstanceOf[KafkaGraftOffset].parts
    limit match {
      case mr: ReadMaxRows =>
        // cap total rows this batch, apportioned by backlog share —
        // the same policy the stock connector's maxOffsetsPerTrigger uses
        val cap = mr.maxRows()
        val backlog = latest.map { case (p, o) => p -> math.max(0L, o - s.getOrElse(p, 0L)) }
        val total = backlog.values.sum
        if (total <= cap) KafkaGraftOffset(latest)
        else KafkaGraftOffset(latest.map { case (p, _) =>
          val share = math.max(1L, cap * backlog(p) / math.max(1L, total))
          p -> (s.getOrElse(p, 0L) + math.min(backlog(p), share))
        })
      case _ => KafkaGraftOffset(latest)
    }
  }

  override def reportLatestOffset(): Offset = KafkaGraftOffset(cursor.latestOffsets(topic))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def deserializeOffset(json: String): Offset = KafkaGraftOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaGraftOffset].parts
    val e = end.asInstanceOf[KafkaGraftOffset].parts
    e.toSeq.sorted.collect {
      case (p, endOff) if endOff > s.getOrElse(p, 0L) =>
        KafkaGraftPartition(host, port, topic, p, s.getOrElse(p, 0L), endOff)
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new KafkaGraftPartitionReader(partition.asInstanceOf[KafkaGraftPartition])

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = cursor.close()
}

private final case class KafkaGraftPartition(
    host: String, port: Int, topic: String, partition: Int,
    start: Long, end: Long) extends InputPartition

/** Executor-side reader: its own connection, fetch loop over
  * [start, end) — Int.MaxValue-free, re-fetches until the range is
  * drained (a fetch returns at most max-bytes worth).
  */
private final class KafkaGraftPartitionReader(p: KafkaGraftPartition)
    extends PartitionReader[InternalRow] {
  private val cursor = new KafkaCursor(p.host, p.port, s"graft-spark-task-${p.partition}")
  private var batch: Seq[graft.net.ConsumerRecord] = Seq.empty
  private var i = -1
  private var nextOffset = p.start

  override def next(): Boolean = {
    i += 1
    if (i < batch.length) true
    else if (nextOffset >= p.end) false
    else {
      batch = cursor.fetch(p.topic, p.partition, nextOffset)
        .filter(_.offset < p.end)
      if (batch.isEmpty) false // range truncated broker-side: stop cleanly
      else {
        nextOffset = batch.last.offset + 1
        i = 0
        true
      }
    }
  }

  override def get(): InternalRow = {
    val r = batch(i)
    new GenericInternalRow(Array[Any](
      r.key, r.value,
      UTF8String.fromString(r.topic), r.partition, r.offset,
      r.timestamp * 1000L, // ms -> TimestampType micros
      0 // CreateTime
    ))
  }

  override def close(): Unit = cursor.close()
}

/** At-least-once streaming sink: per-TASK producer (opened on the
  * executor, closed with the task), rows buffered per write and flushed
  * as one keyed batch in commit — a replayed epoch re-produces the same
  * rows (the log gets duplicates; the reference's own producer hop has
  * the same contract, and the downstream dedup is IdempotentSink's job).
  */
private final class KafkaGraftStreamingWrite(
    host: String, port: Int, topic: String, keyIdx: Int, valueIdx: Int)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    KafkaGraftWriterFactory(host, port, topic, keyIdx, valueIdx)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private final case class KafkaGraftWriterFactory(
    host: String, port: Int, topic: String, keyIdx: Int, valueIdx: Int)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val producer = new KafkaProducer(host, port, s"graft-spark-sink-$partitionId")
      private val buf = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])]
      override def write(row: InternalRow): Unit = {
        val k = if (row.isNullAt(keyIdx)) null else row.getBinary(keyIdx)
        val v = if (row.isNullAt(valueIdx)) null else row.getBinary(valueIdx)
        buf += ((k, v))
        if (buf.length >= 1000) flush()
      }
      private def flush(): Unit = {
        if (buf.nonEmpty) producer.sendBatch(topic, buf.toSeq)
        buf.clear()
      }
      override def commit(): WriterCommitMessage = {
        flush()
        new WriterCommitMessage {}
      }
      override def abort(): Unit = buf.clear()
      override def close(): Unit = producer.close()
    }
}
