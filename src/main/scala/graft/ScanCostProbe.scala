package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic (not part of the driver contract): decompose
  * q_histogram's wall-clock into its physical stages at a given fixture —
  * the stage-timeline evidence PERF's weak-row audits require before a
  * residual-vs-oracle gap may be attributed to the parquet decode.
  *
  * Arms, each min-of-N over the SAME session and page-cached fixture:
  *   scan  — decode event_type + value, null-filter, noop-write (no
  *           exchange: the pure columnar-decode floor)
  *   vcnt  — scan + the (metric, cent) map-side-combined count aggregate
  *           (one distinct-value-volume exchange)
  *   hist  — the full registered operator (vcnt + bounds + binning)
  *
  * hist − vcnt ≈ 0 proves the binning adds nothing; vcnt − scan is the
  * aggregation cost; scan is irreducible without a different file format.
  */
object ScanCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(3)
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
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    def scan() = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type").as("metric"), cents.as("c"))
    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "scan" -> (() => scan()),
      "vcnt" -> (() => scan().groupBy(col("metric"), col("c"))
        .agg(count(lit(1)).as("cnt"))),
      "hist" -> (() => graft.ops.RelationalOps.histogram(spark, sfDir)))
    // warm once (codegen + footers), then min-of-reps per arm
    arms.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save()
    }
    arms.foreach { case (name, f) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-5s min ${ts.min}%.3f s  all ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
