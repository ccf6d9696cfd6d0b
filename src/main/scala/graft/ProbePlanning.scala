package graft

import org.apache.spark.sql.SparkSession

/** Local diagnostic: split a query's wall-clock into DataFrame
  * construction (analysis), physical planning (optimize + strategy +
  * codegen source), and execution (consuming the SAME executedPlan's
  * toRdd — a noop write here would build a fresh QueryExecution over the
  * write command and re-pay the whole planning phase inside the "exec"
  * number, aiming floor work at the wrong phase). Not part of the driver
  * contract.
  */
object ProbePlanning {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown quer${if (unknown.size == 1) "y" else "ies"}: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.graft.fixtureCache", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm: codegen + readers (a failure here will recur in the timed
    // loop; surface it instead of hiding the first signal)
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[probe] warmup $n failed: $e")
      }
    }
    println(f"${"query"}%-24s build   plan    exec")
    names.foreach { n =>
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        val rdd = df.queryExecution.toRdd // force optimize + physical planning
        val t2 = System.nanoTime()
        rdd.foreachPartition(it => while (it.hasNext) it.next())
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val b = reps.map(_._1).min; val p = reps.map(_._2).min; val e = reps.map(_._3).min
      println(f"$n%-24s $b%.3f   $p%.3f   $e%.3f")
    }
    spark.stop()
  }
}
