package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val rows = Tables.events(spark, d).select(
        col("event_type").as("metric"), col("ts"), col("value"))
      println(s"$d gapfill planningSize = ${Tables.planningSize(rows)}")
    }
    spark.stop()
  }
}
