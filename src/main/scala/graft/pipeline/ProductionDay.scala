package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** The composed "production day": every scheduled job in this library
  * chained the way a deployment actually runs them, under one artifact
  * root —
  *
  *   1. [[IngestJob]]       — drain the day's OPC-UA arrivals through the
  *                            wire round-trip + enrichment into the fact
  *                            table (checkpointed streaming).
  *   2. [[MvRefreshJob]]    — the continuous-aggregate refresh over the
  *                            same arrivals (checkpointed streaming).
  *   3. [[DedupRefreshJob]] — tonight's dedup prune lists (versioned
  *                            publish).
  *   4. [[AnnIndexJob]]     — retrain + publish the ANN index models
  *                            (versioned publish).
  *   5. [[CurationJob]]     — the corpus build consuming step 3's
  *                            artifacts (versioned publish).
  *
  * Each leg is individually restart-safe (streaming checkpoints; the
  * [[VersionedStore]] torn-publish contract), and [[run]] composes them so
  * the WHOLE day inherits the property: re-invoking `run` after a scheduler
  * death resumes the streams from their checkpoints, skips batch legs whose
  * version already committed ([[ensureVersion]]), and re-publishes the ones
  * that tore — no leg ever re-does committed work and no reader ever sees a
  * partial day. TopologySpec drives exactly that: a day killed mid-chain,
  * resumed, and asserted leg-by-leg equal to the batch recomputes.
  *
  * At 100 TB the streaming legs run continuously rather than draining a
  * fixture ([[Config.trigger]] switches to a processing-time trigger and
  * the awaits are dropped by the caller holding the `StreamingQuery`s);
  * the batch cadence below is then a nightly scheduler invoking legs 3–5
  * with `version = <date>` — which is precisely [[ensureVersion]]'s
  * skip-if-committed key.
  */
object ProductionDay {

  case class Config(
      sfDir: String,
      rootDir: String,
      version: Long,
      rowsPerBatch: Int = 2000,
      maxRows: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()) {
    def eventsPath: String = s"$sfDir/events.parquet"
    def factsDir: String = s"$rootDir/facts"
    def mvDir: String = s"$rootDir/mv_minute"
    def dedupDir: String = s"$rootDir/dedup"
    def annDir: String = s"$rootDir/ann"
    def curationDir: String = s"$rootDir/curation"
  }

  case class Summary(
      factRows: Long,
      mvBuckets: Long,
      dedupVersion: Long,
      annVersion: Long,
      curationVersion: Long)

  /** Publish-once gate for the batch legs: a version that already
    * committed is skipped (the restart path — [[VersionedStore]] refuses
    * to overwrite it anyway), a torn or absent one is (re)published. */
  private[pipeline] def ensureVersion(
      spark: SparkSession, outDir: String, version: Long)(publish: => Unit): Long =
    VersionedStore.latestVersion(spark, outDir) match {
      case Some(v) if v >= version => v
      case _ => publish; version
    }

  /** Streaming legs 1+2, started CONCURRENTLY (they share nothing but the
    * source fixture) and awaited to drain — the "day's arrivals" under an
    * AvailableNow trigger. `maxRows` bounds the drain (the kill lever the
    * restart test uses); awaits are bounded so a wedged stream fails the
    * day loudly instead of hanging the scheduler. */
  def streamingLegs(spark: SparkSession, cfg: Config, awaitMs: Long = 300000): Unit = {
    val ingest = IngestJob.start(spark, IngestJob.Config(
      cfg.eventsPath, cfg.sfDir, cfg.factsDir, s"${cfg.rootDir}/ckpt/ingest",
      cfg.trigger, cfg.rowsPerBatch, cfg.maxRows))
    val mv = MvRefreshJob.start(spark, MvRefreshJob.Config(
      cfg.eventsPath, cfg.mvDir, s"${cfg.rootDir}/ckpt/mv",
      cfg.trigger, cfg.rowsPerBatch, cfg.maxRows))
    require(ingest.awaitTermination(awaitMs), "ingest leg did not drain in time")
    require(mv.awaitTermination(awaitMs), "mv refresh leg did not drain in time")
  }

  /** Batch legs 3–5 in dependency order (curation consumes the dedup
    * artifacts), each behind the skip-if-committed gate. */
  def batchLegs(spark: SparkSession, cfg: Config): (Long, Long, Long) = {
    val dedupV = ensureVersion(spark, cfg.dedupDir, cfg.version)(
      DedupRefreshJob.refresh(spark, cfg.sfDir, cfg.dedupDir, cfg.version))
    val annV = ensureVersion(spark, cfg.annDir, cfg.version)(
      AnnIndexJob.refresh(spark, cfg.sfDir, cfg.annDir, cfg.version))
    val curV = ensureVersion(spark, cfg.curationDir, cfg.version)(
      CurationJob.refresh(spark, cfg.sfDir, cfg.dedupDir, cfg.curationDir, cfg.version))
    (dedupV, annV, curV)
  }

  /** One full day: streams drained, artifacts published, summary counted.
    * Safe to re-invoke after a crash at ANY point in the chain. */
  def run(spark: SparkSession, cfg: Config): Summary = {
    streamingLegs(spark, cfg)
    val (dedupV, annV, curV) = batchLegs(spark, cfg)
    Summary(
      factRows = spark.read.parquet(cfg.factsDir).count(),
      mvBuckets = spark.read.parquet(cfg.mvDir).count(),
      dedupVersion = dedupV, annVersion = annV, curationVersion = curV)
  }
}
