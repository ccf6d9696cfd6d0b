package graft
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("dump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // --exec: run the query first and dump the FINAL adaptive plan —
    // runtime-only effects (AQE exchange/stage reuse, skew splits) are
    // invisible in the static explain
    val (exec, keys) = args.partition(_ == "--exec")
    for (q <- keys) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val p =
        if (exec.nonEmpty) {
          df.collect()
          df.queryExecution.executedPlan.toString
        } else df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/plan_$q.txt"), p.getBytes)
    }
    spark.stop()
  }
}
