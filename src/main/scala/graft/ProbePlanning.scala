package graft

import org.apache.spark.sql.SparkSession

/** Local diagnostic: split a query's wall-clock into DataFrame
  * construction (analysis), physical planning (optimize + strategy +
  * codegen source), and execution (noop write). Not part of the driver
  * contract; used to aim floor work at the dominant phase.
  */
object ProbePlanning {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.graft.fixtureCache", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm: codegen + readers
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    println(f"${"query"}%-24s build   plan    exec")
    names.foreach { n =>
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force optimize + physical planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val b = reps.map(_._1).min; val p = reps.map(_._2).min; val e = reps.map(_._3).min
      println(f"$n%-24s $b%.3f   $p%.3f   $e%.3f")
    }
    spark.stop()
  }
}
