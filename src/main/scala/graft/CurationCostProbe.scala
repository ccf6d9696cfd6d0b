package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic (not part of the driver contract): price the corpus-build
  * capstone at a given fixture — the publish-cadence vs serve-read numbers
  * PERF's artifact-economics table reads. One JSON line per run:
  *
  *   dedup_refresh_s    — DedupRefreshJob.refresh to a fresh dir (the five
  *                        prune pipelines + writes; runs once per cadence)
  *   curation_publish_s — CurationJob.refresh to a fresh dir (quality gate
  *                        → artifact apply → decontam → budget → packing →
  *                        corpus/ledger/evalgrams publish; once per cadence)
  *   ledger_read_s      — ledgerFromArtifacts (the q_corpus_ledger serve
  *                        path: a 9-row at-rest read)
  *   corpus_read_s      — full count over the committed corpus stage (what
  *                        a training loader's first pass over the shard
  *                        listing costs)
  *   ledger_recompute_s — the recompute twin (the DAG every consumer would
  *                        re-pay per read without the artifact)
  *
  * Publishes land under java.io.tmpdir and a shutdown hook recursively
  * deletes them on normal JVM exit; the dedup
  * prune artifacts are ensured once OUTSIDE the timed publish (a curation
  * refresh consumes the latest committed prune lists — separate cadence).
  */
object CurationCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.graft.fixtureCache", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // deleteOnExit cannot remove non-empty directories — after the jobs
    // publish artifact trees into them it silently leaks the whole tree
    // per run; a shutdown hook walking deepest-first actually deletes them
    val tempDirs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    sys.addShutdownHook {
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      tempDirs.foreach { d =>
        if (Files.exists(d)) {
          val walk = Files.walk(d)
          try walk.sorted(java.util.Comparator.reverseOrder[Path]())
            .iterator().asScala.foreach(p => Files.deleteIfExists(p))
          finally walk.close()
        }
      }
    }
    def fresh(tag: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"curation_probe_$tag")
      tempDirs += d
      d.toString
    }

    // prune-list artifacts: ensured once, untimed here but the refresh
    // itself IS one of the priced arms (fresh dir per rep below)
    val dedupDir = pipeline.ServingArtifacts.ensureDedup(spark, sfDir)

    val dedupRefresh = (1 to reps).map { i =>
      time(pipeline.DedupRefreshJob.refresh(spark, sfDir, fresh(s"dedup$i"), 1L))
    }.min
    var lastPub: String = null
    val curationPublish = (1 to reps).map { i =>
      val out = fresh(s"cur$i"); lastPub = out
      time(pipeline.CurationJob.refresh(spark, sfDir, dedupDir, out, 1L))
    }.min
    val ledgerRead = (1 to reps).map { _ =>
      time(pipeline.CurationJob.ledgerFromArtifacts(spark, lastPub).collect())
    }.min
    val corpusRead = (1 to reps).map { _ =>
      time(pipeline.VersionedStore.readStage(spark, lastPub, "corpus").count())
    }.min
    val ledgerRecompute = (1 to reps).map { _ =>
      time(pipeline.CurationJob.ledgerRecompute(spark, sfDir, dedupDir).collect())
    }.min

    println(f"""{"sf":"$sfDir","reps":$reps,"dedup_refresh_s":$dedupRefresh%.3f,"curation_publish_s":$curationPublish%.3f,"ledger_read_s":$ledgerRead%.3f,"corpus_read_s":$corpusRead%.3f,"ledger_recompute_s":$ledgerRecompute%.3f}""")
    spark.stop()
  }
}
