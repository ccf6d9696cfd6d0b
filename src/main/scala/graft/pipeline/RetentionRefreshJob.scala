package graft.pipeline

import graft.ops.SessionOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Scheduled RECOMPUTE job for the one operator with no incremental
  * story: `q_retention_cohorts`. A cohort×week retention matrix re-ranks
  * every cohort against the full history whenever a new week of activity
  * lands — an append-mode streaming twin would be misleading (documented
  * in SURVEY §2F), so freshness comes from the [[MvRefreshJob]] pattern
  * instead: the SAME checkpointed replay source paces the job, and each
  * micro-batch (a) lands its events into the batchId-keyed at-rest
  * directory (the [[IdempotentSink]] overwrite contract — a replayed
  * batch replaces its own partial output) and (b) recomputes the matrix
  * over everything at rest, publishing a FULL SNAPSHOT under
  * `version=<batchId>` with the same overwrite idempotence.
  *
  * Readers never see a torn matrix: [[read]] pins the LATEST version
  * directory Spark committed (its `_SUCCESS` marker exists) — each
  * snapshot is immutable once written, and a crash mid-publish leaves
  * only an uncommitted directory the reader skips and the restarted
  * batch overwrites. Kill/restart resumes from the checkpoint with no
  * duplicate events and no missing snapshot (PipelineSpec drives the
  * crash).
  *
  * At 100 TB the recompute reads the at-rest fact table, not the
  * stream: per-batch cost is the batch append plus one
  * user-cardinality aggregate chain ([[SessionOps.retentionCohortsOn]]'s
  * shape — map-side-combined distinct, broadcast-gated joins), and the
  * trigger cadence (production: e.g. daily) bounds how often that
  * price is paid — exactly TimescaleDB's scheduled
  * `refresh_continuous_aggregate` policy applied to a non-incremental
  * aggregate.
  */
object RetentionRefreshJob {

  case class Config(
      eventsPath: String,
      atRestDir: String,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      rowsPerBatch: Int = 1000,
      maxRows: Option[Int] = None)

  def start(spark: SparkSession, cfg: Config): StreamingQuery =
    ReplayStreams.source(spark, cfg.eventsPath, cfg.rowsPerBatch, cfg.maxRows)
      .writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(cfg.trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // (a) land the batch — batchId-keyed overwrite, replay-safe
        batch.write.mode("overwrite")
          .parquet(s"${cfg.atRestDir}/batch_id=$batchId")
        // (b) full recompute over the at-rest table, snapshot-published.
        // The at-rest read sees only batches whose write committed; the
        // current batch's write in (a) completed before this line.
        val events = spark.read.parquet(cfg.atRestDir)
          .select(col("user_id"), col("ts"))
        SessionOps.retentionCohortsOn(events)
          .write.mode("overwrite")
          .parquet(s"${cfg.outDir}/version=$batchId")
      }
      .start()

  /** The latest COMMITTED snapshot (max version with a `_SUCCESS`
    * marker). Immutable-per-version + pin-latest is what makes the
    * recompute publish atomic for readers.
    */
  def read(spark: SparkSession, outDir: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("version=") &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .map(p => (p.getName.stripPrefix("version=").toLong, p))
    require(versions.nonEmpty, s"no committed retention snapshot under $outDir")
    spark.read.parquet(versions.maxBy(_._1)._2.toString)
  }
}
