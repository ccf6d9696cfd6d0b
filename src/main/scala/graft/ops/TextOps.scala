package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2E text-analysis operators for an LLM training-data pipeline, over the
  * `documents` table. All pure column expressions (codegen'd, no UDFs) —
  * at 100 TB these run as a single narrow scan + projection per document,
  * embarrassingly parallel, with one small shuffle only where grouped.
  */
object TextOps {

  /** Canonical text normalization used by dedup + fingerprinting:
    * lowercase, trim, collapse internal whitespace.
    */
  def normText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  val normTextSql: String = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  /** Per-document quality stats: char/token counts, mean token length,
    * stopword ratio, and an md5 content fingerprint. Token rule = split on
    * whitespace; stopword list is a fixed tiny function-word set.
    */
  def textStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .select(
        col("doc_id"),
        col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        round(
          length(regexp_replace(col("text"), "\\s", "")).cast("double") / size(col("toks")),
          4
        ).as("avg_token_len"),
        round(
          size(expr("filter(toks, t -> t IN ('the', 'a'))")).cast("double") / size(col("toks")),
          4
        ).as("stop_ratio"),
        md5(normText(col("text"))).as("fingerprint")
      )
      .orderBy(col("doc_id"))

  /** Exact dedup on normalized text (hash-groupBy): keep the smallest doc_id
    * per normalized form. One shuffle on the md5 of the normalized text —
    * at 100 TB, group keys are the 128-bit digests, uniformly distributed,
    * so no skew.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("fp", md5(normText(col("text"))))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"), col("fp").as("fingerprint"))
      .orderBy(col("doc_id"))

  val oracles: Map[String, String] = Map(
    "q_text_stats" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, text, string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents)
         |SELECT doc_id, lang,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(toks), 4)
         |    AS avg_token_len,
         |  round(CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS DOUBLE) / len(toks), 4)
         |    AS stop_ratio,
         |  md5($normTextSql) AS fingerprint
         |FROM t ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      s"""SELECT min(doc_id) AS doc_id, count(*) AS n_copies,
         |       md5($normTextSql) AS fingerprint
         |FROM documents GROUP BY 3 ORDER BY doc_id""".stripMargin
  )
}
