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

  /** JDBC arm of the same contract — the direct analog of the reference's
    * consume → INSERT → commit loop (kafka_db_agent/main.py:92-103), made
    * idempotent: each micro-batch's rows carry their batchId, and a replay
    * first DELETEs its own batchId's rows before re-INSERTing — the
    * DELETE+INSERT-keyed-on-batch_id pattern for transactional targets
    * (the parquet arm's batch_id directory overwrite, in SQL). The DELETE
    * + the batch INSERT run per batch exactly like the reference's
    * per-poll commit; a crash mid-INSERT re-delivers the same batchId and
    * the replay replaces the partial write.
    *
    * Exercised in PipelineSpec against an embedded Derby database (a real
    * `java.sql` engine in-JVM — the closest a zero-egress sandbox gets to
    * the reference's network Postgres).
    */
  def jdbcAppend(url: String, table: String,
      props: java.util.Properties = new java.util.Properties): (DataFrame, Long) => Unit =
    (df: DataFrame, batchId: Long) => {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val st = conn.createStatement()
        // Quoted column: Spark's JDBC writer creates case-preserved quoted
        // identifiers, and an unquoted batch_id would case-fold to a
        // different (absent) column on engines like Derby/Postgres — and
        // the absent-column error must NOT be swallowed below. The quote
        // character comes from the connection's own metadata, not a
        // hardcoded ANSI double quote: MySQL's default SQL mode reads
        // "batch_id" as a string literal, so the DELETE would silently
        // match zero rows and a replayed batch would duplicate — the
        // engine itself knows its identifier quote (backtick there).
        val q = Option(conn.getMetaData.getIdentifierQuoteString)
          .map(_.trim).filter(_.nonEmpty).getOrElse("\"")
        try st.executeUpdate(s"DELETE FROM $table WHERE ${q}batch_id$q = $batchId")
        catch {
          // only "table does not exist" is benign (first batch runs before
          // the writer's CREATE TABLE); anything else is a real failure
          // that must fail the batch, not silently skip idempotence
          case e: java.sql.SQLException if e.getSQLState != null &&
            // Derby 42X05 / Postgres 42P01 / MySQL+H2 42S02
            Set("42X05", "42P01", "42S02").contains(e.getSQLState) => ()
        }
        finally st.close()
      } finally conn.close()
      df.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
        .write.mode("append").jdbc(url, table, props)
    }

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
