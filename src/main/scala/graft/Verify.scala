package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // default to real cores (capped): correctness is width-blind but an
    // env-less driver invocation shouldn't run 59 queries on 4 threads
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 16).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // 8-wide shuffles for the same reason as Bench: fixture-scale
      // exchanges are scheduling-bound, and correctness is width-blind
      .config("spark.sql.shuffle.partitions",
        math.min(cpus.toInt, 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // tmpfs shuffle dir — see Bench.scala: the backing virtual disk
      // stalls shuffles for seconds under host contention
      .config("spark.local.dir", "/dev/shm/graft-spark")
      // reuse one analyzed DataFrame per fixture table across the suite
      // (see Tables.load — safe here: this main owns its only session)
      .config("spark.graft.fixtureCache", "true")
      .getOrCreate()
    // experiment passthrough ("k=v;k=v"), same contract as Bench's — lets
    // a gate arm (e.g. spark.graft.singlePhaseMaxBytes=0) be oracle-checked
    // directly; driver runs set nothing here
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated subset for local iteration (same contract as
    // Bench's SPARK_GRAFT_ONLY); the dumped oracle_sql.json is filtered to
    // the subset so check_oracle.py compares exactly what was dumped.
    // Driver runs set no subset and get the full registry.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(SparkEntry.queries)(ks => SparkEntry.queries.filter(kv => ks(kv._1)))
    var failures = List.empty[String]
    selected.foreach { case (name, fn) =>
      // delete any previous dump FIRST: a query that throws before its
      // overwrite starts must leave a missing dir (a red row in the
      // driver's compare), never a stale pass from an earlier run
      val target = java.nio.file.Paths.get(s"$outDir/$name")
      if (java.nio.file.Files.exists(target)) {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(target)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
        finally walk.close()
      }
      try {
        val out = fn(spark, sfDir)
        // Session TZ is UTC, so TIMESTAMP → TIMESTAMP_NTZ keeps the wall
        // clock; parquet then stores naive µs (isAdjustedToUTC=false), the
        // exact type DuckDB's oracle result has — tz-aware µs or INT96 ns
        // would hash-mismatch in the driver's compare.
        val casted = out.schema.fields.foldLeft(out) { (df, f) =>
          f.dataType match {
            case org.apache.spark.sql.types.TimestampType =>
              df.withColumn(f.name, df.col(f.name).cast("timestamp_ntz"))
            case _ => df
          }
        }
        casted.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        failures ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    if (failures.nonEmpty)
      System.err.println(
        s"[verify] ${failures.size} queries failed (missing dumps): ${failures.reverse.mkString(", ")}")
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${Jsons.quote(k)}: ${Jsons.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
