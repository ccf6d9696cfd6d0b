package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared reader construction for the replay-source pipeline jobs
  * (MvRefreshJob, AlarmJob, IngestJob) — one place to grow source options
  * instead of three parallel readStream blocks.
  */
private[pipeline] object ReplayStreams {

  def source(spark: SparkSession, eventsPath: String, rowsPerBatch: Int,
      maxRows: Option[Int]): DataFrame = {
    val reader = spark.readStream
      .format("opcua-replay")
      .option("path", eventsPath)
      .option("rowsPerBatch", rowsPerBatch.toString)
    maxRows.fold(reader)(n => reader.option("maxRows", n.toString)).load()
  }
}
