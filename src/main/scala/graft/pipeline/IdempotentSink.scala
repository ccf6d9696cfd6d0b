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
}
