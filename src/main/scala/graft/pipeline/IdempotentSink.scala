package graft.pipeline

import org.apache.spark.sql.DataFrame

/** `foreachBatch` append sink with exactly-once-per-batch semantics — the
  * Spark form of the reference's DB writer loop (kafka_db_agent/
  * main.py:92-103: consume → INSERT → commit offset, where a crash between
  * INSERT and commit re-delivers and duplicates rows; the reference accepts
  * that, this sink does not).
  *
  * Idempotence contract: Structured Streaming re-runs a failed micro-batch
  * under the SAME batchId. Writing each batch to its own
  * `batch_id=<id>` directory with overwrite mode makes the replay replace
  * its previous (possibly partial) output instead of appending a duplicate
  * — the standard batchId-keyed idempotent-writer pattern for sinks without
  * transactions (a JDBC target would instead key a DELETE+INSERT or MERGE
  * on batch_id). Readers see the union via partition discovery on the
  * batch_id directory column.
  */
object IdempotentSink {

  /** The (DataFrame, batchId) function to pass to `writeStream.foreachBatch`. */
  def parquetAppend(outDir: String): (DataFrame, Long) => Unit =
    (df: DataFrame, batchId: Long) =>
      df.write
        .mode("overwrite")
        .parquet(s"$outDir/batch_id=$batchId")

  /** Day-partitioned variant with retention scheduled in the job loop — the
    * hypertable layout (day dirs under each batch dir, both partition
    * columns at read time) plus the reference's `drop_chunks` policy
    * applied after every committed batch: keep the newest `retainDays`
    * days, delete older day directories (metadata-only, no rewrite).
    * Retention runs AFTER the batch's own write, so a replayed batch that
    * re-creates an expired day is re-expired on its own commit.
    */
  def parquetAppendByDay(
      outDir: String, tsCol: String, retainDays: Option[Int]): (DataFrame, Long) => Unit =
    (df: DataFrame, batchId: Long) => {
      import org.apache.spark.sql.functions.{col, date_format}
      df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
        .write
        .mode("overwrite")
        .partitionBy("day")
        .parquet(s"$outDir/batch_id=$batchId")
      retainDays.foreach(n =>
        PartitionedWriter.retainLastDays(df.sparkSession, outDir, n))
    }
}
