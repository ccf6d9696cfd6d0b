package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic versioned artifact store — the one publish/pin contract every
  * train-once/serve-many job in the repo shares ([[DedupRefreshJob]]'s
  * prune lists, [[AnnIndexJob]]'s coarse centroids + PQ codebooks).
  *
  * Layout: `outDir/version=<v>/stage=<name>/` parquet per stage, with a
  * version-level `_COMMITTED` marker written only after every stage's
  * parquet commit. Readers pin the LATEST committed version, so:
  *
  *  - a publish killed mid-write leaves stage directories without the
  *    marker — invisible to every reader, overwritten wholesale by the
  *    restarted publish of the SAME version;
  *  - a COMMITTED version is immutable — republishing it is refused,
  *    because a reader that just resolved [[latestVersion]] may be
  *    mid-scan on its parquet (publishers emit monotonically new
  *    versions, which is what a scheduled refresh naturally does);
  *  - non-numeric `version=` directories (tooling scratch, manual
  *    copies) are simply not versions, never a parse error that breaks
  *    every reader of the store.
  *
  * At 100 TB the artifacts this stores are metadata-to-small-fraction
  * scale (model coordinates, prune lists); the store itself is a handful
  * of filesystem operations per refresh cadence.
  */
object VersionedStore {

  def stageDir(outDir: String, version: Long, stage: String): String =
    s"$outDir/version=$version/stage=$stage"

  private def fs(spark: SparkSession, outDir: String) =
    new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(outDir: String, version: Long) =
    new org.apache.hadoop.fs.Path(s"$outDir/version=$version", "_COMMITTED")

  /** Write every stage, then commit the version atomically (marker last).
    * Idempotent restart of a FAILED publish of the same version; refuses
    * to touch a committed one. */
  def publish(spark: SparkSession, outDir: String, version: Long,
      stages: Seq[(String, DataFrame)]): Unit = {
    val f = fs(spark, outDir)
    require(!f.exists(marker(outDir, version)),
      s"artifact version $version is already committed under $outDir and " +
        "committed versions are immutable; publish a new version")
    stages.foreach { case (stage, df) =>
      df.write.mode("overwrite").parquet(stageDir(outDir, version, stage))
    }
    f.create(marker(outDir, version), true).close()
  }

  /** Latest committed version under `outDir` (None if nothing has ever
    * committed — e.g. every publish so far was killed). */
  def latestVersion(spark: SparkSession, outDir: String): Option[Long] = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(root)) return None
    f.listStatus(root)
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("version="))
      .flatMap(n => scala.util.Try(n.stripPrefix("version=").toLong).toOption)
      .filter(v => f.exists(marker(outDir, v)))
      .maxOption
  }

  /** One stage of the latest committed version. */
  def readStage(spark: SparkSession, outDir: String, stage: String): DataFrame = {
    val v = latestVersion(spark, outDir)
      .getOrElse(throw new IllegalStateException(
        s"no committed artifacts under $outDir"))
    spark.read.parquet(stageDir(outDir, v, stage))
  }
}
