package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata, with
  * decode/feature-extraction as a partition-local stage.
  *
  * The Spark-side shape is the real thing — BinaryType column, metadata
  * struct, mapPartitions with a typed Dataset so decode batches amortize any
  * per-partition setup (codec init, model load), partitioning untouched so
  * the stage pipelines with the scan. The decode itself is a clearly-marked
  * deterministic STUB (byte histogram standing in for image/audio decode +
  * feature extraction — no media libraries exist in this environment); a
  * real decoder replaces only the function body, not the plumbing.
  *
  * Registered as a rows-only check (binary payloads and stub features are
  * not SQL-oracle-expressible); invariants covered in ExtensionOpsSpec.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, format: String, n_bytes: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long, features: Seq[Double])

  /** Wrap each document as an opaque media payload with typed metadata —
    * the ingest shape for image/audio/video columns.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        lit("text/plain").as("format"),
        length(col("text")).cast("long").as("n_bytes"),
        encode(col("text"), "UTF-8").as("payload")
      )

  /** STUB decode + feature extraction: an 8-bin normalized byte histogram.
    * A real implementation decodes the payload (JPEG/PCM/container frames)
    * and emits model features; everything around this loop — batching,
    * schema, partition locality — is the production path.
    */
  def extractFeatures(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val hist = new Array[Double](8)
      r.payload.foreach(b => hist((b & 0xFF) >> 5) += 1.0)
      val n = math.max(r.payload.length, 1).toDouble
      MediaFeatures(r.doc_id, r.format, r.n_bytes, hist.map(_ / n).toSeq)
    }

  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .as[MediaRow]
      .mapPartitions(extractFeatures)
      .toDF()
      .orderBy(col("doc_id"))
  }
}
