package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: prints the gap-fill gate's planning-size statistic for each
  * fixture directory given as an argument (defaults to
  * `$SPARK_GRAFT_SF_DIR` so it runs anywhere the bench runs; no paths are
  * hardcoded).
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else sys.env.get("SPARK_GRAFT_SF_DIR").toSeq
    require(dirs.nonEmpty,
      "usage: GateProbe <fixture-dir>... (or set SPARK_GRAFT_SF_DIR)")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- dirs) {
      val rows = Tables.events(spark, d).select(
        col("event_type").as("metric"), col("ts"), col("value"))
      println(s"$d gapfill planningSize = ${Tables.planningSize(rows)}")
    }
    spark.stop()
  }
}
