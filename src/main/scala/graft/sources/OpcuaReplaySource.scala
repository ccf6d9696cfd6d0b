package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** DataSource V2 streaming source replaying the `events` fixture as an
  * OPC-UA subscription twin — the reference's ingestion boundary
  * (opcua_mqtt_agent/main.py:93-130: one client session subscribes to
  * monitored items and receives datachange notifications in publish order).
  *
  * Usage: `spark.readStream.format("opcua-replay")
  *           .option("path", ".../events.parquet")
  *           .option("rowsPerBatch", "2000")   // subscription publish rate
  *           .option("maxRows", "...")         // optional admission cap
  *           .load()`
  *
  * Schema: (event_id long, ts timestamp, user_id long, metric string,
  * value double) — the in-flight envelope of SURVEY §1.2 after decode.
  *
  * Scale notes. An OPC-UA subscription is a SINGLE ordered notification
  * channel at ~10-20 values/s (the reference's measured envelope), so each
  * micro-batch is planned as one input partition: parallelism correctly
  * begins downstream, at the first shuffle. The replay buffer lives on the
  * driver (bounded by `maxRows`); a production source would instead hold
  * the client session in the partition reader and buffer executor-side,
  * but offsets, admission control (`ReadLimit`), Trigger.AvailableNow
  * drain-and-stop, and checkpoint/restart — the parts Spark's contract
  * cares about — are identical and are what this class exercises.
  */
class OpcuaReplaySource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "opcua-replay"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OpcuaReplaySource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ReplayTable(properties)
}

object OpcuaReplaySource {
  val Schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("metric", StringType),
    StructField("value", DoubleType)
  ))

  /** One replayed notification; ts in epoch micros. */
  case class ReplayRow(eventId: Long, tsUs: Long, userId: Long, metric: String, value: Double)

  /** Fixture rows in (ts, event_id) order — the subscription's publish
    * order. Loaded through Tables.events so the nanos-long legacy handling
    * stays in one place.
    */
  def loadRows(path: String, maxRows: Option[Int]): Array[ReplayRow] = {
    val spark = SparkSession.active
    val dir = new java.io.File(path).getParent
    val df = graft.Tables.events(spark, dir)
      .select(
        col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
        col("event_type").as("metric"), col("value"))
      .orderBy(col("ts_us"), col("event_id"))
    val limited = maxRows.map(df.limit).getOrElse(df)
    limited.collect().map { r =>
      ReplayRow(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))
    }
  }
}

private[sources] class ReplayTable(properties: util.Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = "opcua_replay"
  override def schema(): StructType = OpcuaReplaySource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ReplayScan(options)
    }
}

private[sources] class ReplayScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = OpcuaReplaySource.Schema

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    val path = Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException("opcua-replay requires option 'path'"))
    val rowsPerBatch = Option(options.get("rowsPerBatch")).map(_.toInt).getOrElse(1000)
    val maxRows = Option(options.get("maxRows")).map(_.toInt)
    new ReplayMicroBatchStream(path, rowsPerBatch, maxRows)
  }

  override def toBatch: Batch =
    throw new UnsupportedOperationException("opcua-replay is a streaming source")
}

/** Offset = number of notifications consumed from the ordered replay log. */
private[sources] case class ReplayOffset(idx: Long) extends Offset {
  override def json(): String = idx.toString
}

private[sources] class ReplayMicroBatchStream(path: String, rowsPerBatch: Int, maxRows: Option[Int])
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private lazy val rows: Array[OpcuaReplaySource.ReplayRow] =
    OpcuaReplaySource.loadRows(path, maxRows)
  private def total: Long = rows.length.toLong

  // Trigger.AvailableNow: pin the drain target before the run starts so the
  // query stops at a fixed end even if the upstream keeps growing.
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = availableNowTarget = Some(total)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def initialOffset(): Offset = ReplayOffset(0L)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ReplayOffset].idx
    val capByLimit = limit match {
      case m: ReadMaxRows => s + m.maxRows()
      case _ => total
    }
    val end = math.min(availableNowTarget.getOrElse(total), capByLimit)
    ReplayOffset(math.max(s, end))
  }

  override def reportLatestOffset(): Offset = ReplayOffset(total)

  override def deserializeOffset(json: String): Offset = ReplayOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].idx.toInt
    val e = math.min(end.asInstanceOf[ReplayOffset].idx, total).toInt
    if (e <= s) Array.empty
    // one partition per batch: a subscription is a single ordered channel
    else Array(ReplayInputPartition(rows.slice(s, e)))
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val part = partition.asInstanceOf[ReplayInputPartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < part.rows.length }
        override def get(): InternalRow = {
          val r = part.rows(i)
          new GenericInternalRow(Array[Any](
            r.eventId, r.tsUs, r.userId, UTF8String.fromString(r.metric),
            if (r.value.isNaN) null else r.value))
        }
        override def close(): Unit = ()
      }
    }
  }
}

/** The batch's slice of the replay log travels in the partition descriptor
  * (same technique as Spark's own memory/rate test sources).
  */
private[sources] case class ReplayInputPartition(rows: Array[OpcuaReplaySource.ReplayRow])
    extends InputPartition
