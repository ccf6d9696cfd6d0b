package graft
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("dump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    for (q <- args) {
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/plan_$q.txt"), p.getBytes)
    }
    spark.stop()
  }
}
