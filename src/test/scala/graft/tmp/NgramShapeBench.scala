package graft.tmp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
object NgramShapeBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.sql.shuffle.partitions", args(1).toInt)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val docs = graft.Tables.documents(spark, dir)
    // the all-codegen join shape
    def joinShape(): DataFrame = {
      val grams = graft.ops.DedupOps.ngramGramsPlan(docs)
      val dfOk = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 20).select(col("gram"))
      val kept = grams.join(dfOk, "gram")
      val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = kept.select(col("gram"), col("doc_id").as("i"))
      val b = kept.select(col("gram"), col("doc_id").as("j"))
      val inter = a.join(b, Seq("gram")).filter(col("i") < col("j"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("i"), col("n").as("na")), "i")
        .join(sizes.select(col("doc_id").as("j"), col("n").as("nb")), "j")
        .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .filter(col("jaccard") >= 0.5)
        .select(col("i"), col("j"), col("inter"))
    }
    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time("codegen-join") { joinShape() }
    println(s"pairs: ${joinShape().count()}")
    spark.stop()
  }
}
