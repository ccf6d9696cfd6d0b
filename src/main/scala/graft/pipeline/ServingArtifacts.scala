package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Resolution + lazy bootstrap of the versioned serving artifacts the
  * registered `*_serve_*` / `*_artifacts` query keys read — the glue that
  * lets the PRODUCTION paths ([[AnnIndexJob]] model serving,
  * [[DedupRefreshJob]] prune-list apply, [[CurationJob]] corpus builds) be
  * scored and benched every round instead of living only in PERF prose.
  *
  * A deployment's refresh jobs run on their own cadence and serving reads
  * whatever version is committed. A scored query has no scheduler, so each
  * key ensures its artifact family exists (publishing version 1 through
  * the real refresh job on first touch — the bench premat does this
  * OUTSIDE the timed window, the same contract as the MV refresh) and then
  * serves from the committed version like any deployment reader.
  *
  * Artifact directories are keyed by a content signature of the corpus
  * tables the family derives from (total bytes + file count + latest
  * mtime), so a REGENERATED fixture at the same path gets a fresh
  * directory and serving can never read models trained on a corpus that
  * no longer exists — the staleness hazard of path-keyed caches.
  */
object ServingArtifacts {

  /** Artifact root, overridable per session (`spark.graft.artifactRoot`). */
  def rootDir(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.artifactRoot")
      .getOrElse("/tmp/graft_artifacts")

  /** Cheap content signature of the given corpus tables under `sfDir`:
    * length + file count + max modification time per table, hashed. A
    * driver-side metadata listing — never reads data bytes. */
  private def signature(spark: SparkSession, sfDir: String,
      tables: Seq[String]): String = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val parts = tables.map { t =>
      val p = new org.apache.hadoop.fs.Path(s"$sfDir/$t.parquet")
      val fs = p.getFileSystem(hconf)
      if (!fs.exists(p)) "absent"
      else {
        val sum = fs.getContentSummary(p)
        val st = fs.getFileStatus(p)
        val mtime =
          if (st.isFile) st.getModificationTime
          else fs.listStatus(p).map(_.getModificationTime)
            .maxOption.getOrElse(0L)
        s"${sum.getLength}-${sum.getFileCount}-$mtime"
      }
    }
    val h = scala.util.hashing.MurmurHash3
      .stringHash(sfDir + "|" + parts.mkString("|"))
    java.lang.Integer.toHexString(h)
  }

  def annDir(spark: SparkSession, sfDir: String): String =
    s"${rootDir(spark)}/ann-${signature(spark, sfDir, Seq("embeddings"))}"

  def dedupDir(spark: SparkSession, sfDir: String): String =
    s"${rootDir(spark)}/dedup-${signature(spark, sfDir, Seq("documents", "embeddings"))}"

  def curationDir(spark: SparkSession, sfDir: String): String =
    s"${rootDir(spark)}/curation-${signature(spark, sfDir, Seq("documents", "embeddings"))}"

  /** ANN model artifacts for this corpus, publishing version 1 through
    * [[AnnIndexJob.refresh]] if nothing has committed yet. Returns the
    * artifact dir. Synchronized: two concurrent first-touch queries in one
    * JVM must not race the same publish (VersionedStore would refuse the
    * second commit). */
  def ensureAnn(spark: SparkSession, sfDir: String): String = synchronized {
    val d = annDir(spark, sfDir)
    if (VersionedStore.latestVersion(spark, d).isEmpty)
      AnnIndexJob.refresh(spark, sfDir, d, 1L)
    d
  }

  /** Dedup prune-list artifacts for this corpus (publish-on-first-touch
    * via [[DedupRefreshJob.refresh]]). */
  def ensureDedup(spark: SparkSession, sfDir: String): String = synchronized {
    val d = dedupDir(spark, sfDir)
    if (VersionedStore.latestVersion(spark, d).isEmpty)
      DedupRefreshJob.refresh(spark, sfDir, d, 1L)
    d
  }

  /** Curation capstone artifacts (kept corpus + attrition ledger + eval
    * grams) for this corpus — ensures the dedup prune lists first, since
    * the curation DAG applies from them. */
  def ensureCuration(spark: SparkSession, sfDir: String): String = synchronized {
    val d = curationDir(spark, sfDir)
    if (VersionedStore.latestVersion(spark, d).isEmpty)
      CurationJob.refresh(spark, sfDir, ensureDedup(spark, sfDir), d, 1L)
    d
  }
}
