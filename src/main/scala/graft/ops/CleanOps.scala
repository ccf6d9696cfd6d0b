package graft.ops

import graft.Tables
import graft.Tables.ResultOrdering
import graft.model.Model.roundN
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2E cleaning-stage operators: the per-document scrub/filter/restructure
  * passes an LLM training-data pipeline runs BEFORE dedup and mix
  * selection. All four are deterministic and oracle-checked; three are pure
  * projections (no shuffle at any scale), and the repetition profiler's
  * shuffles carry pre-aggregated (doc, term) counts, never raw text.
  */
object CleanOps {

  // ---------------------------------------------------------------------
  // q_pii_redact
  // ---------------------------------------------------------------------

  /** Regex patterns for the scrubber. Deliberately RE2-compatible (no
    * lookaround, no backreferences) so Spark's java.util.regex and the
    * DuckDB oracle's RE2 compile the same language; `(?i)` is the one
    * inline flag both engines accept, and a scrubber must not leak
    * `User@Example.COM` because of case.
    */
  val EmailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val LongNumRe = "\\d{4,}"

  /** PII redaction: mask emails, IPv4 addresses, and long digit runs in a
    * log-line stream, reporting per-line match counts. The standard scrub
    * every pipeline runs over crawled/logged text before training.
    *
    * The synthetic corpus contains no PII-shaped strings (no digits or
    * '@' anywhere in `documents.text`), so the fixture synthesizes each
    * line deterministically from `events` columns — the same
    * honest-plumbing pattern as the multimodal decode stubs: the INPUT is
    * fixture-fabricated, the redaction rules, precedence (emails first,
    * then IPs, then bare digit runs — each count measured after the
    * previous mask so a digit inside an email is never double-counted)
    * and the counting are the real operator, and the oracle re-derives
    * the identical lines and masks in DuckDB.
    *
    * Scale: pure scan + codegen'd regex projection — no shuffle, no skew;
    * at 100 TB this pipelines with the scan like q_text_stats.
    */
  def piiRedact(s: SparkSession, dir: String): DataFrame =
    piiRedactOn(Tables.fanOut(Tables.events(s, dir)))
      .resultOrder(col("event_id"))

  /** The masking chain on an arbitrary text column — emails, then IPs,
    * then bare digit runs (each rule sees the previous rule's masks, so a
    * digit inside an email is never double-counted). Library API: apply
    * to any string column, batch or streaming.
    */
  def redactCol(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      LongNumRe, "<NUM>")

  /** Per-rule match counts under the same masked precedence. */
  def redactCounts(c: Column): Seq[Column] = {
    val noEmail = regexp_replace(c, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    Seq(
      size(regexp_extract_all(c, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(noEmail, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(noIp, lit(LongNumRe), lit(0))).cast("long").as("n_nums"))
  }

  /** The scrub transform alone — batch and streaming alike (stateless
    * projection, so the streaming twin IS this function).
    */
  def piiRedactOn(events: DataFrame): DataFrame = {
    val uid = col("user_id").cast("string")
    val line = concat(
      lit("user "), uid,
      lit(" <u"), uid, lit("@example.com> from 10.0."),
      (col("user_id") % 256).cast("string"), lit("."),
      (col("user_id") % 100).cast("string"),
      lit(" did "), col("event_type"))
    events
      .withColumn("line", line)
      .select(
        col("event_id") +: redactCounts(col("line")) :+
          redactCol(col("line")).as("redacted"): _*)
  }

  // ---------------------------------------------------------------------
  // q_repetition
  // ---------------------------------------------------------------------

  private def toks: Column = split(trim(col("text")), "\\s+")

  /** Gopher-style repetition signals per document: duplicate-word
    * fraction, most-common-word fraction, and most-common-bigram fraction
    * (Rae et al. 2021 §A1.1 use exactly these shapes to drop
    * boilerplate/spam). High values mean templated or repeated content.
    *
    * Scale: term frequencies are a PER-DOCUMENT property — no count ever
    * crosses a document boundary — so shipping the corpus's token stream
    * through an explode + groupBy (two exchanges over ≈ 2× corpus size
    * with bigrams) computes in a shuffle what one in-row pass computes in
    * O(tokens) time and O(distinct) memory, bounded by the document, not
    * the corpus. The native `term_freq_stats` codegen expression does
    * exactly that pass (same pattern as `ngram_hashes`/`minhash_sig`), and
    * the operator collapses to a pipelined scan + projection — no shuffle
    * at any scale. (An in-row HIGHER-ORDER-FUNCTION formulation without
    * the native expression would be O(tokens × distinct) per doc —
    * quadratic for exactly the repetitive documents this op exists to
    * catch; the expression's hash map keeps it linear.)
    */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    val st = termFreqStats(col("text"))
    Tables.fanOut(Tables.documents(s, dir))
      .select(col("doc_id"), st.as("st"))
      .select(
        col("doc_id"),
        col("st.n_tokens").as("n_tokens"),
        roundN(lit(1.0) - col("st.n_distinct").cast("double") / col("st.n_tokens"), 4)
          .as("dup_word_frac"),
        roundN(col("st.top_w").cast("double") / col("st.n_tokens"), 4).as("top_word_frac"),
        // a single-token doc has no bigrams: NULL, matching the oracle's
        // LEFT JOIN miss (never 0/0)
        when(col("st.n_bigrams") > 0,
          roundN(col("st.top_b").cast("double") / col("st.n_bigrams"), 4))
          .as("top_bigram_frac"))
      .resultOrder(col("doc_id"))
  }

  private def termFreqStats(c: Column): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(graft.functions.TermFreqStats(graftbridge.expression(c)))
  }

  // ---------------------------------------------------------------------
  // q_quality_filter
  // ---------------------------------------------------------------------

  /** Rule thresholds (operator config): Gopher-shaped bounds re-scaled to
    * the fixture corpus (docs are 10-99 tokens of a small shared
    * vocabulary, so the word-count floor and the duplicate-word ceiling
    * both split the corpus non-trivially — median dup fraction ≈ 0.54).
    */
  val MinTokens = 20L
  val MaxTokens = 100000L
  val MinAvgTokenLen = 2.0
  val MaxAvgTokenLen = 10.0
  val MinStopwords = 2L
  val MaxDupWordFrac = 0.55

  /** Gopher-style rule filter: hard accept/reject per document from cheap
    * surface signals — token count bounds, mean token length bounds, a
    * minimum stopword count, and a duplicate-word ceiling (Rae et al.
    * 2021 §A1.1; C4 applies the same shape of rules, Raffel et al. 2020
    * §2.2). Emits the signals AND the per-rule verdicts so a pipeline can
    * audit WHY a document was dropped — the score in q_quality_score
    * ranks, this gates.
    *
    * All predicates compare unrounded doubles: both engines divide the
    * same exact integers, so the IEEE results are bit-identical and the
    * keep decision cannot straddle a rounding boundary. Rounding applies
    * only to the reported columns.
    *
    * Scale: in-row `array_distinct` is O(tokens) per doc (hash set), so
    * the whole op is one scan + projection — no shuffle, nothing to skew.
    */
  def qualityFilter(s: SparkSession, dir: String): DataFrame =
    withFilterColumns(Tables.fanOut(Tables.documents(s, dir)))
      .select(
        col("doc_id"),
        col("lang"),
        col("n_tokens"),
        roundN(col("avg_token_len"), 4).as("avg_token_len"),
        col("n_stopwords"),
        roundN(col("dup_word_frac"), 4).as("dup_word_frac"),
        col("keep"))
      .resultOrder(col("doc_id"))

  /** Appends the unrounded signal columns and the `keep` verdict, keeping
    * the input columns (text included) so callers can chain — the
    * streaming cleanse path gates on `keep` and then chunks the survivor
    * text. Stateless, so it applies to streams unchanged.
    */
  private[graft] def withFilterColumns(docs: DataFrame): DataFrame = {
    val nTokens = size(col("toks")).cast("long")
    val avgLen = length(regexp_replace(col("text"), "\\s", "")).cast("double") / nTokens
    val nStop = size(expr("filter(toks, t -> t IN ('the', 'a'))")).cast("long")
    val dupFrac = lit(1.0) - size(array_distinct(col("toks"))).cast("double") / nTokens
    val keep = nTokens.between(MinTokens, MaxTokens) &&
      avgLen.between(MinAvgTokenLen, MaxAvgTokenLen) &&
      nStop >= MinStopwords && dupFrac < MaxDupWordFrac
    docs
      .withColumn("toks", toks)
      .withColumn("n_tokens", nTokens)
      .withColumn("avg_token_len", avgLen)
      .withColumn("n_stopwords", nStop)
      .withColumn("dup_word_frac", dupFrac)
      .withColumn("keep", keep)
  }

  // ---------------------------------------------------------------------
  // q_chunk_docs
  // ---------------------------------------------------------------------

  /** Chunk geometry (operator config): 200-char windows every 160 chars —
    * 40 chars of overlap so no boundary-spanning content is lost, the
    * standard RAG/context-window chunking shape.
    */
  val ChunkChars = 200
  val ChunkStride = 160

  /** Fixed-size overlapping chunking: split each document into
    * `ChunkChars`-char windows starting every `ChunkStride` chars, with
    * per-chunk digests — the restructuring step that turns documents into
    * training sequences or RAG index entries.
    *
    * Scale: `posexplode(sequence(...))` is a generate (flat-map) with
    * ~len/stride output rows per input row, fully pipelined with the scan
    * — no shuffle, and chunk fan-out is bounded by document length, not
    * corpus size.
    */
  def chunkDocs(s: SparkSession, dir: String): DataFrame =
    chunkDocsOn(Tables.fanOut(Tables.documents(s, dir)))
      .resultOrder(col("doc_id"), col("chunk_idx"))

  /** The chunking transform alone — a pipelined Generate, stateless, so
    * it runs on streams unchanged (the streaming cleanse path applies it
    * to quality-gate survivors).
    */
  def chunkDocsOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        // empty (zero-length, non-null) text must yield zero chunks, not an
        // 'Illegal sequence boundaries' runtime error: sequence(1, 0, k)
        // throws in Spark, while the oracle's range(1, 1, k) is empty — the
        // null arm here is skipped by the generate, matching the oracle
        posexplode(when(length(col("text")) > 0,
          expr(s"sequence(1, length(text), $ChunkStride)")))
          .as(Seq("chunk_idx", "chunk_start")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        length(expr(s"substr(text, chunk_start, $ChunkChars)")).cast("long")
          .as("n_chunk_chars"),
        md5(expr(s"substr(text, chunk_start, $ChunkChars)")).as("chunk_md5"))

  // ---------------------------------------------------------------------
  // oracles
  // ---------------------------------------------------------------------

  private def r4(e: String) = graft.model.Model.roundNSql(e, 4)

  val oracles: Map[String, String] = Map(
    "q_pii_redact" ->
      s"""WITH l AS (
         |  SELECT event_id,
         |    'user ' || user_id || ' <u' || user_id || '@example.com> from 10.0.'
         |      || (user_id % 256) || '.' || (user_id % 100) || ' did ' || event_type AS line
         |  FROM events),
         |m AS (
         |  SELECT event_id, line,
         |    regexp_replace(line, '$EmailRe', '<EMAIL>', 'g') AS no_email
         |  FROM l),
         |m2 AS (
         |  SELECT event_id, line, no_email,
         |    regexp_replace(no_email, '$Ipv4Re', '<IP>', 'g') AS no_ip
         |  FROM m)
         |SELECT event_id,
         |  CAST(len(regexp_extract_all(line, '$EmailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(no_email, '$Ipv4Re')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(no_ip, '$LongNumRe')) AS BIGINT) AS n_nums,
         |  regexp_replace(no_ip, '$LongNumRe', '<NUM>', 'g') AS redacted
         |FROM m2 ORDER BY event_id""".stripMargin,
    "q_repetition" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
         |w AS (
         |  SELECT doc_id, u.w, count(*) AS c
         |  FROM t, unnest(toks) AS u(w) GROUP BY 1, 2),
         |wa AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |         CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(c) AS BIGINT) AS top_w
         |  FROM w GROUP BY 1),
         |b AS (
         |  SELECT doc_id, u.b, count(*) AS c
         |  FROM t, unnest(list_transform(range(1, len(toks)),
         |                                i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER) + 1])) AS u(b)
         |  GROUP BY 1, 2),
         |ba AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, CAST(max(c) AS BIGINT) AS top_b
         |  FROM b GROUP BY 1)
         |SELECT wa.doc_id, wa.n_tokens,
         |  ${r4("1.0 - CAST(n_distinct AS DOUBLE) / n_tokens")} AS dup_word_frac,
         |  ${r4("CAST(top_w AS DOUBLE) / n_tokens")} AS top_word_frac,
         |  ${r4("CAST(top_b AS DOUBLE) / n_bigrams")} AS top_bigram_frac
         |FROM wa LEFT JOIN ba USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_quality_filter" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, text, string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(toks) AS avg_len,
         |    CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS BIGINT) AS n_stopwords,
         |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_frac
         |  FROM t)
         |SELECT doc_id, lang, n_tokens,
         |  ${r4("avg_len")} AS avg_token_len,
         |  n_stopwords,
         |  ${r4("dup_frac")} AS dup_word_frac,
         |  (n_tokens BETWEEN $MinTokens AND $MaxTokens
         |   AND avg_len BETWEEN $MinAvgTokenLen AND $MaxAvgTokenLen
         |   AND n_stopwords >= $MinStopwords
         |   AND dup_frac < $MaxDupWordFrac) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_chunk_docs" ->
      s"""SELECT doc_id,
         |  (u.s - 1) // $ChunkStride AS chunk_idx,
         |  u.s AS chunk_start,
         |  CAST(length(substr(text, CAST(u.s AS INTEGER), $ChunkChars)) AS BIGINT) AS n_chunk_chars,
         |  md5(substr(text, CAST(u.s AS INTEGER), $ChunkChars)) AS chunk_md5
         |FROM documents, unnest(range(1, length(text) + 1, $ChunkStride)) AS u(s)
         |ORDER BY doc_id, chunk_idx""".stripMargin
  )
}
