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
    // partition count from the directory listing — the at-rest layout's
    // one definition (dayPartitionDirs); a read+distinct+count here paid
    // a full partition discovery and a shuffle for the same answer
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dayPartitionDirs(fs, root).map(_.getName).distinct.size.toLong
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
    dayPartitionDirs(fs, path)
      // valid-date partitions only: the dateless partition (null ts →
      // day=__HIVE_DEFAULT_PARTITION__) is never time-droppable
      .filter(p => DayName.matches(p.getName.stripPrefix("day=")))
      .filter(_.getName.stripPrefix("day=") < cutoff)
      .map { p => fs.delete(p, true); p.getName.stripPrefix("day=") }
      .distinct.sorted
  }

  /** The day-partition directories under `root` — the ONE definition of
    * the at-rest layout shared by drop and retain: day= dirs live either
    * at the top level (PartitionedWriter layout) or one level down inside
    * batch_id= dirs (IdempotentSink layout). Retention deriving its cutoff
    * from one layout while deleting against another would silently drop
    * the wrong days.
    */
  private def dayPartitionDirs(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
    if (!fs.exists(root)) Seq.empty
    else {
      val children = fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath)
      val batchDirs = children.filter(_.getName.startsWith("batch_id="))
      val parents = if (batchDirs.nonEmpty) batchDirs else Seq(root)
      parents.flatMap(parent =>
        fs.listStatus(parent).toSeq
          .filter(_.isDirectory)
          .map(_.getPath)
          .filter(_.getName.startsWith("day=")))
    }

  /** The reference's retention policy shape ("keep the last N days"),
    * scheduled from the ingest job loop: derive the cutoff from the newest
    * day AT REST (a directory listing — metadata only, no data scan) and
    * drop everything older. Returns the dropped day values.
    */
  def retainLastDays(spark: SparkSession, outDir: String, nDays: Int): Seq[String] = {
    require(nDays >= 1, s"retention must keep at least one day, got $nDays")
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // only real yyyy-MM-dd partitions participate in the cutoff: a null
    // timestamp (the envelope allows "ts_us":null) lands in
    // day=__HIVE_DEFAULT_PARTITION__, and '_' sorts above every digit, so
    // an unfiltered max would feed LocalDate.parse that token — throwing
    // inside foreachBatch and permanently crash-looping the ingest job on
    // restart replay. Dateless rows are outside time-based retention by
    // definition: they are kept (dropDaysBefore's string compare never
    // matches them below any cutoff).
    val days = dayPartitionDirs(fs, path).map(_.getName.stripPrefix("day="))
      .filter(DayName.matches)
    if (days.isEmpty) Seq.empty
    else {
      val cutoff = java.time.LocalDate.parse(days.max).minusDays(nDays - 1L).toString
      dropDaysBefore(spark, outDir, cutoff)
    }
  }

  private val DayName = "\\d{4}-\\d{2}-\\d{2}".r
}
