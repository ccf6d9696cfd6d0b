package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-at-rest layout for the events fact table — the Spark mapping
  * of the reference's hypertable chunking + (metric, time DESC) index
  * (database/init.sql:11,14 and SURVEY §1.6):
  *
  *   - `partitionBy(day)` ≙ 1-day hypertable chunks: time-range predicates
  *     prune whole directories before any I/O (PartitionFilters in the
  *     scan node — asserted by PlanSpec).
  *   - `repartition(day, metric)` + `sortWithinPartitions(metric, ts desc)`
  *     ≙ the (metric, time DESC) index: one output file per (day-partition,
  *     task), rows clustered so a metric predicate skips row groups via
  *     parquet min/max stats, and "latest first" reads are sequential.
  *
  * At 100 TB this is the difference between a full scan and touching one
  * day × one metric's row groups; the writer is the missing producer for
  * the layout every read-side scale claim assumes.
  */
object PartitionedWriter {

  /** Write the events fixture to `outDir` day-partitioned. Returns the
    * partition count written.
    */
  def writeEvents(spark: SparkSession, sfDir: String, outDir: String): Long = {
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev
      .repartition(col("day"), col("event_type"))
      .sortWithinPartitions(col("event_type"), col("ts").desc)
      .write
      .mode("overwrite")
      .partitionBy("day")
      .parquet(outDir)
    spark.read.parquet(outDir).select("day").distinct().count()
  }

  /** Read back with a day predicate — the partition-pruned scan path. */
  def readDay(spark: SparkSession, outDir: String, day: String): DataFrame =
    spark.read.parquet(outDir).filter(col("day") === day)

  /** Retention policy twin of the reference's `drop_chunks` (the
    * TimescaleDB retention job the alarm_retention dashboard assumes):
    * delete whole day partitions strictly older than `cutoff`
    * (yyyy-MM-dd). O(partitions) directory deletes — no row-level scan or
    * rewrite, exactly the cost model of chunk drops; at 100 TB retention
    * must never be a filter-and-rewrite of the fact table.
    * Returns the dropped day values.
    */
  def dropDaysBefore(spark: SparkSession, outDir: String, cutoff: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else
      fs.listStatus(path).toSeq
        .filter(_.isDirectory)
        .map(_.getPath)
        .filter(_.getName.startsWith("day="))
        .filter(_.getName.stripPrefix("day=") < cutoff)
        .map { p => fs.delete(p, true); p.getName.stripPrefix("day=") }
        .sorted
  }
}
