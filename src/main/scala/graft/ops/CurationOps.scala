package graft.ops

import graft.Tables
import graft.Tables.ResultOrdering
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2E training-data curation operators: the selection steps a pipeline
  * runs AFTER cleaning/dedup to assemble a training mix from the
  * `documents` corpus.
  *
  * Both are deterministic by construction (content-hash sampling, total
  * tie-broken orderings) — a rebuilt mix is byte-identical across runs,
  * engines and cluster layouts, which is what makes training data
  * reproducible and is why both are hash-checked against the DuckDB
  * oracle rather than rows-only.
  */
object CurationOps {

  /** Per-language keep-rates in per-mille — the mix weights. A real
    * pipeline derives these from the target data mixture; the values are
    * operator config, not plan shape.
    */
  val SampleRatesPerMille: Map[String, Int] =
    Map("en" -> 250, "de" -> 500, "fr" -> 750, "es" -> 1000)

  /** Deterministic stratified sampling: keep a doc iff the integer value
    * of the first 6 hex chars of md5(doc_id) modulo 1000 falls under its
    * language's per-mille rate.
    *
    * Content-hash sampling beats RNG sampling for corpus work: the same
    * doc is kept or dropped regardless of partitioning, run order, or
    * engine (no seed state to ship), so downstream incremental rebuilds
    * see a stable subset. md5 is the one hash both engines compute
    * identically (same trick as the simhash oracle); 6 hex chars < 2^24
    * so the conv-to-long is exact in both.
    *
    * Scale: pure scan + projection + filter — no shuffle, no skew concern
    * (md5 buckets are uniform per language by construction). The
    * per-language rate lookup is a literal CASE chain, not a join.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("long") % 1000).as("bucket")
    val rate = SampleRatesPerMille.foldLeft(lit(0)) { case (acc, (lang, r)) =>
      when(col("lang") === lang, r).otherwise(acc)
    }
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), bucket)
      .filter(col("bucket") < rate)
      .resultOrder(col("doc_id"))
  }

  /** Per-language token budget for `tokenBudget` — how many whitespace
    * tokens of each language the mix may contain.
    */
  val TokensPerLang = 10000L

  /** Quality-ranked selection under a token budget: rank each language's
    * docs by the q_quality_score quality value (tie-broken by doc_id), and
    * keep docs while the running token total stays within the language's
    * budget — the greedy knapsack every mix-building pipeline runs.
    *
    * Determinism: quality is the already-oracle-exact rounded score, the
    * window order is total (quality DESC, doc_id), and the running sum is
    * a ROWS frame — so the cut point is identical in both engines.
    *
    * Scale: one shuffle on lang, then an ordered within-partition scan.
    * Language cardinality is small, so each partition is a full per-lang
    * sort — the honest cost of an exact global ranking. At 100 TB a mix
    * builder would first threshold on an approximate quality histogram
    * (percentile_approx) to cut the corpus to ~budget size, then run this
    * exact ranking on the survivors; the operator's semantics (and the
    * oracle) are the exact step.
    */
  def tokenBudget(s: SparkSession, dir: String): DataFrame =
    tokenBudgetOn(Tables.documents(s, dir))

  /** The registered (whitespace-token) budget; like [[packSequencesOn]]
    * the token rule is pluggable so a mix builder can budget in TRAINED
    * tokenizer units ([[TextOps.bpeApply]]'s count — CurationOpsSpec
    * exercises the arm; PERF.md round 13 records the measured A/B that
    * keeps whitespace the registered default). The override is a pure
    * in-row expression either way, so the plan shape (one lang shuffle +
    * ordered scan) is identical.
    */
  private[graft] def tokenBudgetOn(
      documents: DataFrame,
      nTokens: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    // quality columns come from TextOps.withQualityColumns — the one
    // definition of the score, shared with the oracle-checked
    // q_quality_score so the ranking cannot drift from it
    val d0 = TextOps.withQualityColumns(Tables.fanOut(documents))
    val d = nTokens.fold(d0)(c => d0.withColumn("n_tokens", c))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= TokensPerLang)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"), col("cum_tokens"))
      .resultOrder(col("lang"), col("cum_tokens"))
  }

  /** The held-out evaluation corpus: docs from this source are the
    * "benchmark" whose content must not leak into training data. In a
    * deployment this is the eval-suite text itself; the fixture nominates
    * one of the twenty sources.
    */
  val EvalSource = "src0"

  /** Benchmark decontamination: flag every training doc (source ≠
    * EvalSource) that shares at least one character 8-gram with any eval
    * doc, reporting how many distinct grams and eval docs it collides
    * with. This is the standard pre-training hygiene step (n-gram-overlap
    * decontamination of eval sets), expressed with the same native
    * `ngram_hashes` gram extraction as q_dedup_ngram.
    *
    * Scale: the eval side is SMALL by construction (a benchmark is MBs
    * against a 100 TB corpus), so its distinct (gram, eval_doc) set is
    * explicitly `broadcast` — the training gram stream joins it map-side
    * and never shuffles. Per-gram fan-out is bounded by the eval set's
    * size, not the corpus's, so no df-cap is needed (unlike the dedup
    * pair join, which is quadratic per gram in corpus df).
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.fanOut(
      Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text")))
    trainingGrams(docs)
      .join(broadcast(evalGramsOn(docs)), "gram")
      .groupBy(col("doc_id"))
      .agg(
        count_distinct(col("gram")).as("n_shared_grams"),
        count_distinct(col("eval_doc")).as("n_eval_docs"))
      .resultOrder(col("doc_id"))
  }

  /** The distinct (gram, eval_doc) set of the held-out eval source — the
    * ONE producer behind the batch decontamination join, the capstone's
    * decontam stage, and the versioned eval-gram artifact the streaming
    * admission path reads ([[graft.pipeline.CurationJob]] publishes it).
    * Small by construction: a benchmark is MBs against the corpus. */
  private[graft] def evalGramsOn(docs: DataFrame): DataFrame = {
    import graft.ops.TextOps.normText
    docs.filter(col("source") === EvalSource)
      .select(explode(DedupOps.ngramHashSet(normText(col("text")))).as("gram"),
        col("doc_id").as("eval_doc"))
  }

  /** Per-(doc, gram) stream of the training side (source ≠ EvalSource) —
    * in-row native gram extraction, distinct per doc by `ngramHashSet`. */
  private def trainingGrams(docs: DataFrame): DataFrame = {
    import graft.ops.TextOps.normText
    docs.filter(col("source") =!= EvalSource)
      .select(col("doc_id"),
        explode(DedupOps.ngramHashSet(normText(col("text")))).as("gram"))
  }

  /** The decontamination REMOVAL set — distinct training docs sharing at
    * least one gram with any eval doc (what [[decontaminate]] reports
    * counts for). */
  private[graft] def contaminatedOn(docs: DataFrame, evalGrams: DataFrame): DataFrame =
    trainingGrams(docs)
      .join(broadcast(evalGrams.select(col("gram")).distinct()), "gram")
      .select(col("doc_id")).distinct()

  /** The capstone's decontamination REMOVAL rule: training docs sharing a
    * verbatim [[DedupOps.SubstrWindow]]-word window with any eval doc —
    * the long-N-token verbatim-overlap rule release pipelines actually
    * drop on (the GPT-3 appendix-C shape), reusing the same native
    * `word_window_hashes` extraction as the substring dedup pass. The
    * char-8-gram [[decontaminate]]/[[contamCoverage]] operators stay the
    * REPORT surface: on a bounded-vocabulary corpus every doc shares some
    * 8-char gram (measured sf0.01: 474/475 docs ≥50% coverage), which is
    * exactly why removal keys on long verbatim windows, not short grams.
    * Scale shape as [[decontaminate]]: the eval window set is MB-scale by
    * construction and broadcast; one corpus scan, in-row extraction. */
  private[graft] def verbatimContaminatedOn(docs: DataFrame): DataFrame = {
    val win = docs
      .select(col("doc_id"), col("source"),
        explode(DedupOps.windowHashes(col("text"))).as("h"))
    val evalWins = win.filter(col("source") === EvalSource)
      .select(col("h")).distinct()
    win.filter(col("source") =!= EvalSource)
      .join(broadcast(evalWins), "h")
      .select(col("doc_id")).distinct()
  }

  /** Training-mix report: per (source, lang), document count, token mass,
    * mean quality, and the cell's share of the corpus's tokens — the
    * summary a mix designer reads before choosing SampleRatesPerMille /
    * TokensPerLang, and the audit artifact after a rebuild.
    *
    * Determinism: token sums are integer-exact; the quality mean sums
    * DECIMAL(18,4) (quality is already rounded to 4 places, so the cast is
    * lossless) — order-independent, so Spark's parallel sum and DuckDB's
    * sequential sum agree bit-for-bit (same trick as the IVF centroids).
    *
    * Scale: one partial+final hash aggregate on (source, lang); the share
    * denominator is a 1-row scalar aggregate broadcast back onto the
    * cells (the q_alarm_feed CTE pattern) — NOT an unpartitioned window,
    * which would funnel every cell through one partition and break the
    * moment `source` is a high-cardinality domain column (millions of web
    * domains at corpus scale).
    */
  def sourceMix(s: SparkSession, dir: String): DataFrame = {
    val d = TextOps.withQualityColumns(Tables.fanOut(Tables.documents(s, dir)))
    val g = d.groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("quality").cast("decimal(18,4)")).as("sum_q"))
    val total = g.agg(sum(col("n_tokens")).as("total_tokens"))
    g.crossJoin(broadcast(total))
      .select(
        col("source"),
        col("lang"),
        col("n_docs"),
        col("n_tokens"),
        graft.model.Model.roundN(col("sum_q").cast("double") / col("n_docs"), 4)
          .as("avg_quality"),
        graft.model.Model.roundN(
          col("n_tokens").cast("double") / col("total_tokens").cast("double"),
          6).as("token_share"))
      .resultOrder(col("source"), col("lang"))
  }

  /** Context-window length for sequence packing (tokens). */
  val PackCtxLen = 2048L

  /** Coarse doc-id range width for the two-phase packing prefix sum. */
  val PackBucket = 4096L

  /** Sequence packing: lay the corpus out as ONE token stream (documents
    * concatenated in doc_id order) and cut it into fixed `PackCtxLen`
    * context windows — the standard pretraining packing layout where a
    * document starts mid-window and may span window boundaries. Emits the
    * per-doc placement: global start offset, the window holding the
    * doc's first token, the offset inside that window, and whether the
    * doc crosses a boundary (the fraction a loss-masking policy cares
    * about).
    *
    * Scale (the two-phase trick the counter-rate/SPC family uses): an
    * UNPARTITIONED running sum over the corpus would funnel every row
    * through one task. Instead: (1) partition the cumsum by a coarse
    * doc_id range bucket — per-bucket windows run wide; (2) aggregate one
    * row per bucket and prefix-sum THAT (bucket-cardinality = N/4096
    * rows through one task — metadata-scale; recurse the same trick for
    * another /4096 if a corpus ever outgrows it); (3) broadcast the
    * bucket offsets back. Token counts are the whitespace tokenization
    * already validated cross-engine by q_token_count.
    */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    packSequencesOn(Tables.documents(s, dir))

  /** The registered (whitespace-token) packing; the token rule is
    * pluggable so a pipeline can pack under the TRAINED tokenizer instead
    * ([[TextOps.bpeApply]]'s count — CurationOpsSpec exercises that arm).
    * The token column is a pure in-row expression either way, so the plan
    * shape (two-phase bucket prefix sum) is identical.
    */
  private[graft] def packSequencesOn(
      documents: DataFrame,
      nTokens: org.apache.spark.sql.Column =
        size(split(trim(col("text")), "\\s+")).cast("long")): DataFrame = {
    val docs = Tables.fanOut(documents)
      .select(col("doc_id"), nTokens.as("n_tokens"))
      .withColumn("bucket", expr(s"doc_id div $PackBucket"))
    val local = docs.withColumn("local_end",
      sum(col("n_tokens")).over(
        Window.partitionBy(col("bucket")).orderBy(col("doc_id"))))
    // bucket totals come off the SAME windowed stream (max running sum =
    // bucket total), so the two branches share one identical bucket
    // exchange and ReuseExchange scans + tokenizes the corpus ONCE —
    // a separate groupBy over the raw docs planned a second full scan
    val offsets = local.groupBy(col("bucket"))
      .agg(max(col("local_end")).as("btok"))
      .withColumn("boff",
        coalesce(
          sum(col("btok")).over(
            Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("boff"))
    // LEFT join (equivalent: offsets holds every bucket by construction):
    // an inner join plants an isnotnull(bucket) filter on the streamed
    // side only, making the two branches' exchange subtrees differ — with
    // symmetric branches ReuseExchange scans + tokenizes the corpus ONCE
    local.join(Tables.broadcastIfSmall(offsets), Seq("bucket"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("boff") + col("local_end") - col("n_tokens")).as("start_tok"))
      .select(col("doc_id"), col("n_tokens"), col("start_tok"),
        expr(s"start_tok div $PackCtxLen").as("window_id"),
        expr(s"start_tok % $PackCtxLen").as("pos_in_window"),
        (expr(s"(start_tok + n_tokens - 1) div $PackCtxLen") >
          expr(s"start_tok div $PackCtxLen")).as("spans_boundary"))
      .resultOrder(col("doc_id"))
  }

  /** Contamination coverage report — the diagnostic sibling of
    * [[decontaminate]] (which only emits the overlapping docs): EVERY
    * training document scored by what fraction of its distinct character
    * 8-grams appear anywhere in the eval set, bucketed into the verdict a
    * release review reads (`clean` / `trace` / `contaminated` at 10%).
    * The contaminated bucket is what decontaminate would drop; `trace`
    * is the gray zone a human samples.
    *
    * Scale: identical shape to decontaminate — in-row gram sets (native
    * `ngram_hashes`, no corpus-wide distinct), per-doc gram cardinality
    * is an in-row `size`, the eval side is MB-scale and broadcast. The
    * training side is extracted ONCE: each gram row carries its doc's
    * in-row gram count (`explode_outer`, so zero-gram docs survive as one
    * null-gram row), the broadcast eval lookup marks hits, and one
    * doc_id-keyed aggregate yields both the cardinality and the hit
    * count — the earlier spine+join-back form ran the normalization +
    * gram extraction over the corpus TWICE (two scans at 100 TB) to
    * rejoin what one aggregate already had. Collision note as in
    * DedupOps: counts compare hashed grams to the oracle's raw grams —
    * identical up to ~n²/2^64 FNV collisions.
    */
  def contamCoverage(s: SparkSession, dir: String): DataFrame =
    contamCoverageOn(Tables.documents(s, dir))

  private[graft] def contamCoverageOn(documents: DataFrame): DataFrame = {
    import graft.ops.TextOps.normText
    val evalGrams = documents
      .filter(col("source") === EvalSource)
      .select(explode(DedupOps.ngramHashSet(normText(col("text")))).as("gram"))
      .distinct()
      .withColumn("hit", lit(1))
    val stream = Tables.fanOut(
      documents.filter(col("source") =!= EvalSource))
      .select(col("doc_id"),
        DedupOps.ngramHashSet(normText(col("text"))).as("grams"))
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode_outer(col("grams")).as("gram"))
    val agg = stream
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      // grams are already distinct IN-ROW (ngram_hashes set semantics),
      // so counting hit markers is a distinct-shared-gram count; n_grams
      // is constant per doc (the in-row set size), so max == the value
      .agg(max(col("n_grams")).as("n_grams"), count(col("hit")).as("n_shared"))
    val cov = graft.model.Model.roundN(
      col("n_shared").cast("double") /
        greatest(col("n_grams"), lit(1L)).cast("double"), 4)
    agg
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        cov.as("coverage"),
        when(cov === 0.0, "clean")
          .when(cov < 0.1, "trace")
          .otherwise("contaminated").as("verdict"))
      .resultOrder(col("doc_id"))
  }

  // ─────────────────────── URL / domain curation ───────────────────────

  /** Deterministic synthetic `url` column over the documents fixture —
    * the driver data carries no URL, so the pair below derives one as a
    * pure function of doc_id (disclosed in TESTDATA.md): md5 buckets pick
    * PRESENTATION variants (scheme, www/WWW/blog subdomains, mixed-case
    * host, default ports, trailing slash, tracking params, fragments —
    * everything canonicalization must collapse), small moduli pick the
    * IDENTITY (site number, path, query id) so distinct doc_ids collide
    * on the canonical form at every scale. Both engines build
    * bit-identical strings (md5 + integer arithmetic only).
    */
  private[graft] def docUrl: org.apache.spark.sql.Column = {
    def hb(off: Int) =
      conv(substring(md5(col("doc_id").cast("string")), off, 6), 16, 10).cast("long")
    val a = hb(1) % 4   // subdomain/case variant
    val b = hb(7) % 3   // trailing slash
    val q = hb(13) % 4  // query variant
    val d = hb(19)      // scheme + port
    val e = hb(25) % 5  // fragment
    val hostNum = col("doc_id") % 11
    val qid = (col("doc_id") % 3).cast("string")
    concat(
      when(d % 2 === 0, "https").otherwise("http"), lit("://"),
      when(a === 1, "www.").when(a === 2, "WWW.").when(a === 3, "blog.").otherwise(""),
      when(a === 2, "Site").otherwise("site"),
      hostNum.cast("string"),
      when(hostNum % 4 === 0, ".com").when(hostNum % 4 === 1, ".org")
        .when(hostNum % 4 === 2, ".co.uk").otherwise(".net"),
      when(d % 2 === 0 && d % 5 === 0, ":443")
        .when(d % 2 === 1 && d % 5 === 1, ":80").otherwise(""),
      lit("/p/"), (col("doc_id") % 5).cast("string"),
      when(b === 0, "/").otherwise(""),
      when(q === 1, concat(lit("?id="), qid))
        .when(q === 2, concat(lit("?id="), qid, lit("&utm_source=feed")))
        .when(q === 3, "?utm_campaign=x").otherwise(""),
      when(e === 0, concat(lit("#s"), (col("doc_id") % 3).cast("string"))).otherwise(""))
  }

  /** (doc_id …) → + `host`, `restc` (canonical parts) — the PROJECTION
    * form the operators consume. The single-Column [[docUrl]] →
    * [[canonicalParts]] composition inlines the md5/conv subtrees once
    * per REFERENCE; at whole-stage codegen that multiplied into a
    * >64 KB generated method and janino refused it (caught by the
    * factor-100 sf10 sweep — Spark fell back to interpreted mode, so
    * results stayed correct while every row paid ~20 redundant md5
    * evaluations). Staged withColumn projections keep each non-cheap
    * subexpression (md5, conv buckets, the regexp canon chain) as ONE
    * named column: CollapseProject never merges a projection that would
    * duplicate a non-cheap expression, so codegen evaluates each once
    * into a local and the method stays small.
    */
  private[graft] def withCanonicalParts(df: DataFrame): DataFrame = {
    val hb = (off: Int) =>
      conv(substring(col("_uh"), off, 6), 16, 10).cast("long")
    val hostNum = col("doc_id") % 11
    val qid = (col("doc_id") % 3).cast("string")
    df
      .withColumn("_uh", md5(col("doc_id").cast("string")))
      .withColumn("_ua", hb(1) % 4)
      .withColumn("_ub", hb(7) % 3)
      .withColumn("_uq", hb(13) % 4)
      .withColumn("_ud", hb(19))
      .withColumn("_ue", hb(25) % 5)
      .withColumn("_url", concat(
        when(col("_ud") % 2 === 0, "https").otherwise("http"), lit("://"),
        when(col("_ua") === 1, "www.").when(col("_ua") === 2, "WWW.")
          .when(col("_ua") === 3, "blog.").otherwise(""),
        when(col("_ua") === 2, "Site").otherwise("site"),
        hostNum.cast("string"),
        when(hostNum % 4 === 0, ".com").when(hostNum % 4 === 1, ".org")
          .when(hostNum % 4 === 2, ".co.uk").otherwise(".net"),
        when(col("_ud") % 2 === 0 && col("_ud") % 5 === 0, ":443")
          .when(col("_ud") % 2 === 1 && col("_ud") % 5 === 1, ":80").otherwise(""),
        lit("/p/"), (col("doc_id") % 5).cast("string"),
        when(col("_ub") === 0, "/").otherwise(""),
        when(col("_uq") === 1, concat(lit("?id="), qid))
          .when(col("_uq") === 2, concat(lit("?id="), qid, lit("&utm_source=feed")))
          .when(col("_uq") === 3, "?utm_campaign=x").otherwise(""),
        when(col("_ue") === 0, concat(lit("#s"), (col("doc_id") % 3).cast("string")))
          .otherwise("")))
      .withColumn("_u", regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("_url"), "#.*", ""),
            "(utm_[a-z]+|fbclid|gclid)=[^&]*&?", ""),
          "[?&]$", ""),
        "^http://", "https://"))
      .withColumn("_sl", locate("/", col("_u"), 9))
      .withColumn("_hostraw", when(col("_sl") > 0, col("_u").substr(lit(9), col("_sl") - 9))
        .otherwise(col("_u").substr(lit(9), length(col("_u")))))
      .withColumn("_rest", when(col("_sl") > 0, col("_u").substr(col("_sl"), length(col("_u"))))
        .otherwise(lit("")))
      .withColumn("_lh", lower(col("_hostraw")))
      .withColumn("host", regexp_replace(
        when(col("_lh").like("www.%"), col("_lh").substr(lit(5), length(col("_lh"))))
          .otherwise(col("_lh")),
        ":(443|80)$", ""))
      .withColumn("restc", regexp_replace(col("_rest"), "/(\\?|$)", "$1"))
      .drop("_uh", "_ua", "_ub", "_uq", "_ud", "_ue", "_url", "_u", "_sl",
        "_hostraw", "_rest", "_lh")
  }

  /** URL canonicalization, the C4/RefinedWeb normalization stage: strip
    * fragment, drop tracking query params (utm_ prefix, fbclid, gclid)
    * plus any dangling separator, fold http→https, lowercase the host,
    * strip a leading `www.` and a default port, and collapse the
    * trailing path slash. Pure in-row string work — zero shuffle at any
    * scale.
    */
  private[graft] def canonicalParts(url: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val u = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(url, "#.*", ""),
          "(utm_[a-z]+|fbclid|gclid)=[^&]*&?", ""),
        "[?&]$", ""),
      "^http://", "https://")
    // host spans position 9 (after 'https://') up to the first '/'
    val slash = locate("/", u, 9)
    val hostRaw = when(slash > 0, u.substr(lit(9), slash - 9))
      .otherwise(u.substr(lit(9), length(u)))
    val rest = when(slash > 0, u.substr(slash, length(u))).otherwise(lit(""))
    val lh = lower(hostRaw)
    val host = regexp_replace(
      when(lh.like("www.%"), lh.substr(lit(5), length(lh))).otherwise(lh),
      ":(443|80)$", "")
    (host, regexp_replace(rest, "/(\\?|$)", "$1"))
  }

  private[graft] def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val (host, rest) = canonicalParts(url)
    concat(lit("https://"), host, rest)
  }

  /** Registrable domain (public-suffix-lite: the common two-part
    * suffixes; everything else takes the last two labels — a full
    * public-suffix-list lookup is a broadcast-join swap-in).
    */
  private[graft] val TwoPartSuffixes = Seq("co.uk", "com.au", "ac.uk")

  private[graft] def registrableDomain(host: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(TwoPartSuffixes.map(sfx => host.endsWith("." + sfx) || host === sfx)
        .reduce(_ || _),
      regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .otherwise(regexp_extract(host, "([^.]+\\.[^.]+)$", 1))

  /** Exact-URL dedup keep-first — the C4/RefinedWeb URL-level pass that
    * runs BEFORE any content dedup: canonicalize in-row, group by the
    * canonical form, keep the smallest doc_id. One corpus exchange on
    * the (high-cardinality) canonical URL, map-side combined; no skew
    * concern because a canonical URL's copy count is bounded by refetch
    * policy, not corpus size.
    */
  def urlDedup(s: SparkSession, dir: String): DataFrame =
    urlDedupOn(Tables.documents(s, dir))

  private[graft] def urlDedupOn(documents: DataFrame): DataFrame =
    withCanonicalParts(Tables.fanOut(documents.select(col("doc_id"))))
      .select(col("doc_id"),
        concat(lit("https://"), col("host"), col("restc")).as("url"))
      .groupBy(col("url"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("url"), col("n_copies"))
      .resultOrder(col("doc_id"))

  /** Per-domain cap for [[domainMix]]. */
  val DomainDocCap = 15

  /** Per-domain corpus mix with deterministic caps — the C4/RefinedWeb
    * domain-balancing stage: registrable domain in-row, per-domain doc
    * counts, and a cap of [[DomainDocCap]] docs per domain where the
    * kept set is chosen by content-hash rank (md5 of doc_id, doc_id
    * tie-break — the [[sampleStratified]] determinism idiom), reported
    * as (domain, n_docs, n_kept, kept_chars, share_permille).
    *
    * Scale shape (round 12, third arm wins): the capped selection is a
    * MERGEABLE AGGREGATE ([[graft.functions.TopKKeep]] — partial
    * buffers bounded at cap entries, truncating sorted merge), computed
    * in the SAME groupBy as the per-domain totals. One scan, one
    * canonicalization, one map-side-combined exchange carrying ≤ cap
    * rows per (domain, map task), no ranking window anywhere — bounded
    * state per task regardless of domain skew. The two rejected arms
    * stay selectable via `spark.graft.domainMixArm` with their measured
    * numbers in the match below: `twoscan` (rank-filter WindowGroupLimit
    * branches — never moves the corpus but canonicalizes twice) and
    * `window` (single scan whose fused count kills WindowGroupLimit —
    * the whole corpus funnels through ≤ |domains| sort tasks).
    */
  def domainMix(s: SparkSession, dir: String): DataFrame =
    domainMixOn(Tables.documents(s, dir))

  private[graft] def domainMixOn(documents: DataFrame): DataFrame = {
    // coalesce makes `domain` provably NON-NULLABLE: without it the
    // totals⋈kept inner join infers isnotnull(domain), and predicate
    // pushdown re-inlines the ENTIRE url+canon expression tree into a
    // scan filter — the second way the sf10 sweep's >64 KB codegen
    // blowup came back after the projection staging (value unchanged:
    // regexp_extract never returns null on non-null input)
    val docs = withCanonicalParts(
        Tables.fanOut(documents.select(col("doc_id"), col("n_chars"))))
      .select(col("doc_id"), col("n_chars"),
        coalesce(registrableDomain(col("host")), lit("")).as("domain"),
        substring(md5(col("doc_id").cast("string")), 1, 6).as("hk"))
    docs.sparkSession.conf
        .getOption("spark.graft.domainMixArm").getOrElse("topk") match {
      case "twoscan" =>
        // round-11 shape: two corpus scans, zero corpus exchanges — the
        // kept branch's rank-filter plans as WindowGroupLimit (≤ cap
        // rows per domain per map), the totals branch map-side combines.
        // Loses to both single-scan arms at every measured scale because
        // the canonicalization projection runs twice (sf1 0.80 vs
        // 0.59 s fused; sf10 1.55 vs 1.38 s), but never moves the corpus.
        val kept = docs
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("domain")).orderBy(col("hk"), col("doc_id"))))
          .filter(col("rn") <= DomainDocCap)
          .groupBy(col("domain"))
          .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
        val totals = docs.groupBy(col("domain")).agg(count(lit(1)).as("n_docs"))
        totals.join(Tables.broadcastIfSmall(kept), Seq("domain"))
          .withColumn("total", sum(col("n_docs")).over(Window.partitionBy()))
          .select(col("domain"), col("n_docs"), col("n_kept"), col("kept_chars"),
            expr("(n_docs * 1000) div total").as("share_permille"))
          .resultOrder(col("domain"))
      case "window" =>
        // single-scan window arm: one canonicalization, but the count
        // over ALL rows fuses into the rank window, so WindowGroupLimit
        // cannot fire — the ENTIRE corpus crosses one exchange into
        // ≤ |domains| sort tasks. Fastest measured fixture arm after
        // twoscan's double scan (sf10 1.38 s) yet the structural funnel
        // is real: 11 fixture domains = 11 sort tasks at any scale.
        docs
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("domain")).orderBy(col("hk"), col("doc_id"))))
          .groupBy(col("domain"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("rn") <= DomainDocCap, 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("rn") <= DomainDocCap, col("n_chars"))).as("kept_chars"))
          // total via an unpartitioned window over the |domains|-row
          // aggregate — a scalar-subquery crossJoin would RE-SCAN the
          // corpus (the aggregate's lineage is not reused across the join)
          .withColumn("total", sum(col("n_docs")).over(Window.partitionBy()))
          .select(col("domain"), col("n_docs"), col("n_kept"), col("kept_chars"),
            expr("(n_docs * 1000) div total").as("share_permille"))
          .resultOrder(col("domain"))
      case _ =>
        // default: ONE scan, ONE map-side-combined exchange, bounded
        // state — the per-group capped selection runs as the mergeable
        // TopKKeep aggregate (≤ cap entries per partial buffer), so
        // each map task ships ≤ cap rows per domain and a domain with
        // 10⁹ docs costs a task no more memory than one with 16. The
        // only sort anywhere is the |domains|-row presentation order.
        val topk = udaf(new graft.functions.TopKKeep(DomainDocCap),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(String, Long, Long)]())
        docs.groupBy(col("domain")).agg(
            count(lit(1)).as("n_docs"),
            topk(col("hk"), col("doc_id"), col("n_chars")).as("kept"))
          // total via an unpartitioned window over the |domains|-row
          // aggregate — a scalar-subquery crossJoin would RE-SCAN the
          // corpus (the aggregate's lineage is not reused across the join)
          .withColumn("total", sum(col("n_docs")).over(Window.partitionBy()))
          .select(col("domain"), col("n_docs"),
            col("kept._1").as("n_kept"), col("kept._2").as("kept_chars"),
            expr("(n_docs * 1000) div total").as("share_permille"))
          .resultOrder(col("domain"))
    }
  }

  private val ratesCaseSql: String =
    SampleRatesPerMille
      .map { case (lang, r) => s"WHEN lang = '$lang' THEN $r" }
      .mkString("CASE ", " ", " ELSE 0 END")

  /** DuckDB twin of [[docUrl]] + [[canonicalParts]]: same md5 buckets,
    * same component CASEs, same canonicalization steps (RE2's `\\1`
    * backref vs Java's `$1` is the only dialect difference).
    */
  private def hbSql(off: Int): String =
    s"CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), $off, 6)) AS BIGINT)"

  private[graft] lazy val urlCanonCteSql: String = {
    val url = s"""concat(
      |  CASE WHEN ${hbSql(19)} % 2 = 0 THEN 'https' ELSE 'http' END, '://',
      |  CASE ${hbSql(1)} % 4 WHEN 1 THEN 'www.' WHEN 2 THEN 'WWW.' WHEN 3 THEN 'blog.' ELSE '' END,
      |  CASE WHEN ${hbSql(1)} % 4 = 2 THEN 'Site' ELSE 'site' END,
      |  CAST(doc_id % 11 AS VARCHAR),
      |  CASE (doc_id % 11) % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.org' WHEN 2 THEN '.co.uk' ELSE '.net' END,
      |  CASE WHEN ${hbSql(19)} % 2 = 0 AND ${hbSql(19)} % 5 = 0 THEN ':443'
      |       WHEN ${hbSql(19)} % 2 = 1 AND ${hbSql(19)} % 5 = 1 THEN ':80' ELSE '' END,
      |  '/p/', CAST(doc_id % 5 AS VARCHAR),
      |  CASE WHEN ${hbSql(7)} % 3 = 0 THEN '/' ELSE '' END,
      |  CASE ${hbSql(13)} % 4 WHEN 1 THEN concat('?id=', CAST(doc_id % 3 AS VARCHAR))
      |       WHEN 2 THEN concat('?id=', CAST(doc_id % 3 AS VARCHAR), '&utm_source=feed')
      |       WHEN 3 THEN '?utm_campaign=x' ELSE '' END,
      |  CASE WHEN ${hbSql(25)} % 5 = 0 THEN concat('#s', CAST(doc_id % 3 AS VARCHAR)) ELSE '' END)""".stripMargin
    raw"""u0 AS (SELECT doc_id, n_chars, $url AS raw FROM documents),
      |c1 AS (SELECT doc_id, n_chars, regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
      |         '#.*', '', 'g'), '(utm_[a-z]+|fbclid|gclid)=[^&]*&?', '', 'g'), '[?&]$$', '', 'g'),
      |         '^http://', 'https://') AS u FROM u0),
      |c2 AS (SELECT *,
      |  CASE WHEN instr(substr(u, 9), '/') > 0
      |       THEN substr(u, 9, instr(substr(u, 9), '/') - 1) ELSE substr(u, 9) END AS hostraw,
      |  CASE WHEN instr(substr(u, 9), '/') > 0
      |       THEN substr(u, 8 + instr(substr(u, 9), '/')) ELSE '' END AS rest FROM c1),
      |c3 AS (SELECT *,
      |  regexp_replace(CASE WHEN lower(hostraw) LIKE 'www.%' THEN substr(lower(hostraw), 5)
      |                      ELSE lower(hostraw) END, ':(443|80)$$', '') AS host,
      |  regexp_replace(rest, '/(\?|$$)', '\1', 'g') AS restc FROM c2)""".stripMargin
  }

  /** The corpus-build capstone ledger oracle — the [[graft.pipeline.CurationJob]]
    * attrition ledger recomputed from the raw tables: the dedup-apply
    * perdoc chain ([[DedupOps.ApplyCtesSql]]) layered with the quality
    * gate (the q_quality_filter predicate), the held-out-source exclusion,
    * the verbatim 20-word-window decontamination set (reusing the apply
    * chain's swin windows — [[verbatimContaminatedOn]]'s rule), the
    * survivor-ranked token
    * budget (the q_token_budget window over survivors only), and the
    * terminal substring token-cut row. All `cl_`-prefixed CTEs to stay
    * clear of the apply chain's names.
    */
  private lazy val corpusLedgerSql: String = {
    import graft.ops.CleanOps._
    val stagesVals = graft.pipeline.CurationJob.Stages.zipWithIndex
      .map { case (st, i) => s"(${i + 1}, '$st')" }.mkString(", ")
    s"""WITH RECURSIVE ${DedupOps.ApplyCtesSql},
       |cl_t AS (
       |  SELECT doc_id, lang, source, text,
       |         string_split_regex(trim(text), '\\s+') AS toks,
       |         CAST(length(text) AS DOUBLE) AS n_chars
       |  FROM documents),
       |cl_r AS (
       |  SELECT doc_id, lang, source,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(toks) AS avg_len,
       |    CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS BIGINT) AS n_stopwords,
       |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_frac,
       |    (n_chars - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / n_chars AS punct_ratio,
       |    CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio
       |  FROM cl_t),
       |cl_q AS (
       |  SELECT doc_id, lang, source,
       |    (n_tokens BETWEEN $MinTokens AND $MaxTokens
       |     AND avg_len BETWEEN $MinAvgTokenLen AND $MaxAvgTokenLen
       |     AND n_stopwords >= $MinStopwords
       |     AND dup_frac < $MaxDupWordFrac) AS q_keep,
       |    floor(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
       |          * (1.0 - punct_ratio) * (0.5 + least(stop_ratio, 0.5)) * 10000.0 + 0.5) / 10000.0 AS quality
       |  FROM cl_r),
       |cl_src AS (SELECT doc_id, source FROM documents),
       |cl_ew AS (
       |  SELECT DISTINCT s.g FROM swin s JOIN cl_src c USING (doc_id)
       |  WHERE c.source = '$EvalSource'),
       |cl_dec AS (
       |  SELECT DISTINCT s.doc_id FROM swin s JOIN cl_src c USING (doc_id)
       |  WHERE c.source <> '$EvalSource' AND s.g IN (SELECT g FROM cl_ew)),
       |cl_early AS (
       |  SELECT q.doc_id, q.lang, p.n_tokens, q.quality, p.tokens_kept,
       |    CASE WHEN NOT q.q_keep THEN 'quality'
       |         WHEN p.stage <> 'kept' THEN p.stage
       |         WHEN q.source = '$EvalSource' THEN 'eval'
       |         WHEN d.doc_id IS NOT NULL THEN 'decontam'
       |         END AS early_stage
       |  FROM cl_q q JOIN perdoc p USING (doc_id)
       |  LEFT JOIN cl_dec d USING (doc_id)),
       |cl_surv AS (
       |  SELECT doc_id, n_tokens, tokens_kept,
       |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id
       |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM cl_early WHERE early_stage IS NULL),
       |cl_final AS (
       |  SELECT doc_id, n_tokens, tokens_kept, early_stage AS stage
       |  FROM cl_early WHERE early_stage IS NOT NULL
       |  UNION ALL
       |  SELECT doc_id, n_tokens, tokens_kept,
       |    CASE WHEN cum > $TokensPerLang THEN 'budget' ELSE 'kept' END
       |  FROM cl_surv),
       |cl_stages(stage_id, stage) AS (VALUES $stagesVals),
       |cl_rm AS (
       |  SELECT stage, CAST(count(*) AS BIGINT) AS docs_removed,
       |         CAST(sum(n_tokens) AS BIGINT) AS tokens_removed
       |  FROM cl_final WHERE stage <> 'kept' GROUP BY stage
       |  UNION ALL
       |  SELECT 'substring', CAST(0 AS BIGINT),
       |         CAST(coalesce(sum(n_tokens - tokens_kept), 0) AS BIGINT)
       |  FROM cl_final WHERE stage = 'kept'),
       |cl_tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
       |                  CAST(sum(n_tokens) AS BIGINT) AS nt FROM cl_final),
       |cl_led AS (
       |  SELECT s.stage_id, s.stage,
       |         coalesce(r.docs_removed, 0) AS docs_removed,
       |         coalesce(r.tokens_removed, 0) AS tokens_removed
       |  FROM cl_stages s LEFT JOIN cl_rm r USING (stage))
       |SELECT CAST(l.stage_id AS INTEGER) AS stage_id, l.stage, l.docs_removed, l.tokens_removed,
       |       t.nd - CAST(sum(l.docs_removed) OVER (ORDER BY l.stage_id) AS BIGINT) AS docs_remaining,
       |       t.nt - CAST(sum(l.tokens_removed) OVER (ORDER BY l.stage_id) AS BIGINT) AS tokens_remaining
       |FROM cl_led l, cl_tot t ORDER BY stage_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_corpus_ledger" -> corpusLedgerSql,
    "q_url_dedup" ->
      s"""WITH $urlCanonCteSql
         |SELECT min(doc_id) AS doc_id, concat('https://', host, restc) AS url,
         |       CAST(count(*) AS BIGINT) AS n_copies
         |FROM c3 GROUP BY url ORDER BY doc_id""".stripMargin,
    "q_domain_mix" ->
      raw"""WITH $urlCanonCteSql,
         |dom AS (SELECT doc_id, n_chars,
         |  CASE WHEN host LIKE '%.co.uk' OR host LIKE '%.com.au' OR host LIKE '%.ac.uk'
         |       THEN regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$$', 1)
         |       ELSE regexp_extract(host, '([^.]+\.[^.]+)$$', 1) END AS domain FROM c3),
         |ranked AS (SELECT doc_id, n_chars, domain,
         |  row_number() OVER (PARTITION BY domain
         |    ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 6), doc_id) AS rn FROM dom),
         |k AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_kept,
         |             CAST(sum(n_chars) AS BIGINT) AS kept_chars
         |      FROM ranked WHERE rn <= $DomainDocCap GROUP BY domain),
         |t AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs FROM dom GROUP BY domain)
         |SELECT t.domain, t.n_docs, k.n_kept, k.kept_chars,
         |       CAST((t.n_docs * 1000) // (sum(t.n_docs) OVER ()) AS BIGINT) AS share_permille
         |FROM t JOIN k USING (domain) ORDER BY t.domain""".stripMargin,
    "q_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
         |  FROM t)
         |SELECT doc_id, n_tokens, start_tok,
         |       start_tok // $PackCtxLen AS window_id,
         |       start_tok % $PackCtxLen AS pos_in_window,
         |       ((start_tok + n_tokens - 1) // $PackCtxLen) > (start_tok // $PackCtxLen)
         |         AS spans_boundary
         |FROM c ORDER BY doc_id""".stripMargin,
    "q_contam_coverage" ->
      s"""WITH n AS (
         |  SELECT doc_id, source,
         |         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
         |  FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id, source, substr(t, CAST(i AS INTEGER), ${DedupOps.NgramLen}) AS gram
         |  FROM n, unnest(range(1, length(t) - ${DedupOps.NgramLen - 2})) AS u(i)
         |  WHERE length(t) >= ${DedupOps.NgramLen}),
         |e AS (SELECT DISTINCT gram FROM g WHERE source = '$EvalSource'),
         |tr AS (SELECT doc_id, gram FROM g WHERE source <> '$EvalSource'),
         |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM tr GROUP BY doc_id),
         |sh AS (
         |  SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM tr JOIN e USING (gram) GROUP BY tr.doc_id),
         |base AS (
         |  SELECT b.doc_id,
         |         coalesce(c.n_grams, 0) AS n_grams,
         |         coalesce(s.n_shared, 0) AS n_shared,
         |         ${graft.model.Model.roundNSql(
              "CAST(coalesce(s.n_shared, 0) AS DOUBLE) / greatest(coalesce(c.n_grams, 0), 1)", 4)} AS coverage
         |  FROM (SELECT doc_id FROM n WHERE source <> '$EvalSource') b
         |  LEFT JOIN cnt c USING (doc_id)
         |  LEFT JOIN sh s USING (doc_id))
         |SELECT doc_id, n_grams, n_shared, coverage,
         |       CASE WHEN coverage = 0.0 THEN 'clean'
         |            WHEN coverage < 0.1 THEN 'trace'
         |            ELSE 'contaminated' END AS verdict
         |FROM base ORDER BY doc_id""".stripMargin,
    "q_source_mix" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, lang, text,
         |         string_split_regex(trim(text), '\\s+') AS toks,
         |         CAST(length(text) AS DOUBLE) AS n_chars
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source, lang,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    (n_chars - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / n_chars AS punct_ratio,
         |    CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio
         |  FROM t),
         |q AS (
         |  SELECT doc_id, source, lang, n_tokens,
         |    floor(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
         |          * (1.0 - punct_ratio) * (0.5 + least(stop_ratio, 0.5)) * 10000.0 + 0.5) / 10000.0 AS quality
         |  FROM r),
         |g AS (
         |  SELECT source, lang,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |    sum(CAST(quality AS DECIMAL(18,4))) AS sum_q
         |  FROM q GROUP BY 1, 2)
         |SELECT source, lang, n_docs, n_tokens,
         |  ${graft.model.Model.roundNSql("CAST(sum_q AS DOUBLE) / n_docs", 4)} AS avg_quality,
         |  ${graft.model.Model.roundNSql(
              "CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE)", 6)} AS token_share
         |FROM g ORDER BY source, lang""".stripMargin,
    "q_decontaminate" ->
      s"""WITH n AS (
         |  SELECT doc_id, source, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
         |  FROM documents
         |  WHERE length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) >= ${DedupOps.NgramLen}),
         |g AS (
         |  SELECT DISTINCT doc_id, source, substr(t, CAST(i AS INTEGER), ${DedupOps.NgramLen}) AS gram
         |  FROM n, unnest(range(1, length(t) - ${DedupOps.NgramLen - 2})) AS u(i)),
         |e AS (SELECT gram, doc_id AS eval_doc FROM g WHERE source = '$EvalSource'),
         |tr AS (SELECT doc_id, gram FROM g WHERE source <> '$EvalSource')
         |SELECT tr.doc_id,
         |       count(DISTINCT tr.gram) AS n_shared_grams,
         |       count(DISTINCT e.eval_doc) AS n_eval_docs
         |FROM tr JOIN e USING (gram)
         |GROUP BY tr.doc_id
         |ORDER BY tr.doc_id""".stripMargin,
    "q_sample_stratified" ->
      s"""SELECT doc_id, lang,
         |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1000 AS bucket
         |FROM documents
         |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1000
         |      < ($ratesCaseSql)
         |ORDER BY doc_id""".stripMargin,
    "q_token_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, text,
         |         string_split_regex(trim(text), '\\s+') AS toks,
         |         CAST(length(text) AS DOUBLE) AS n_chars
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    (n_chars - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / n_chars AS punct_ratio,
         |    CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS DOUBLE) / len(toks) AS stop_ratio
         |  FROM t),
         |q AS (
         |  SELECT doc_id, lang, n_tokens,
         |    floor(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
         |          * (1.0 - punct_ratio) * (0.5 + least(stop_ratio, 0.5)) * 10000.0 + 0.5) / 10000.0 AS quality
         |  FROM r),
         |c AS (
         |  SELECT doc_id, lang, n_tokens, quality,
         |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id
         |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM q)
         |SELECT doc_id, lang, n_tokens, quality, cum_tokens
         |FROM c WHERE cum_tokens <= ${TokensPerLang}
         |ORDER BY lang, cum_tokens""".stripMargin
  )
}
