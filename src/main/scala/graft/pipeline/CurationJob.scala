package graft.pipeline

import graft.Tables
import graft.Tables.ResultOrdering
import graft.ops.{CleanOps, CurationOps, DedupOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The corpus-build CAPSTONE — one scheduled job running the whole
  * curation DAG the individual operators expose piecewise:
  *
  *   quality gate → dedup apply (from [[DedupRefreshJob]]'s at-rest prune
  *   artifacts) → eval-set exclusion → n-gram decontamination → per-lang
  *   quality-ranked token budget → sequence packing
  *
  * and publishing, via the [[VersionedStore]] marker-last contract, the
  * three artifacts a training run consumes:
  *
  *  - `corpus`: the kept documents with their pack placement (global
  *    token offset, context window, intra-window position, boundary
  *    flag), language, and quality — the training-data manifest;
  *  - `ledger`: the per-stage attrition ledger (docs/tokens removed and
  *    remaining after each stage) — the audit artifact a release review
  *    reads, and the registered `q_corpus_ledger` surface;
  *  - `evalgrams`: the eval source's distinct (gram, eval_doc) set — the
  *    admission-control input the STREAMING decontamination path
  *    stream-static joins instead of re-collecting per stream start.
  *
  * Stage semantics (disclosed, order-dependent — first list wins, the
  * same rule as [[graft.ops.DedupOps.dedupApply]]): `quality` is the
  * Gopher-rule gate ([[CleanOps]] thresholds); the four dedup stages are
  * the at-rest prune lists in [[DedupOps.ApplyStages]] order; `eval`
  * removes the held-out source itself (it IS the benchmark); `decontam`
  * removes training docs sharing a verbatim 20-word window with any eval
  * doc ([[CurationOps.verbatimContaminatedOn]] — the long-N-token rule;
  * the char-8-gram report operators would remove this whole corpus);
  * `budget` is the greedy per-lang knapsack over the SURVIVORS
  * ([[CurationOps.TokensPerLang]], quality-desc/doc_id order); the
  * terminal `substring` row carries the verbatim-span token mass cut from
  * kept docs (removing no documents). PII scrubbing
  * ([[CleanOps.redactCol]]) is a content transform, not a removal — it
  * has no attrition row and applies to the kept text downstream.
  *
  * Scale shape: three corpus scans total (the quality/signal projection,
  * the dedup-apply spine, the gram stream), all doc_id-keyed equi-joins
  * co-partition, the eval gram side is broadcast (MB-scale by
  * construction), the budget ranking funnels only the SURVIVOR set
  * through per-lang sorts (the exact-knapsack cost [[CurationOps]]
  * documents, run on the post-attrition corpus — at 100 TB a builder
  * pre-thresholds on an approximate quality histogram first), and packing
  * is the two-phase bucket prefix sum. Each artifact is written once per
  * refresh cadence; every consumer reads at-rest parquet.
  */
object CurationJob {

  /** Ledger stages in application order (first list wins), ending with
    * the document-preserving substring token-cut row. */
  private[graft] val Stages: Seq[String] =
    Seq("quality") ++ DedupOps.ApplyStages.filterNot(_ == "substring") ++
      Seq("eval", "decontam", "budget", "substring")

  /** Per-document verdict frame: (doc_id, lang, n_tokens, quality, stage,
    * tokens_kept) — `stage` is the FIRST removal list holding the doc
    * ('kept' if none), `tokens_kept` its post-substring-cut training
    * contribution (0 when removed). The one producer behind the ledger,
    * the kept-corpus artifact, and the spec equalities. */
  private[graft] def perDocOn(docs: DataFrame,
      dedupArts: Map[String, DataFrame]): DataFrame = {
    val sig = TextOps.withQualityColumns(
        CleanOps.withFilterColumns(Tables.fanOut(docs)))
      .select(col("doc_id"), col("source"), col("lang"),
        col("keep").as("q_keep"), col("quality"))
    val dd = DedupOps.applyArtifactsOn(docs, dedupArts)
      .select(col("doc_id"), col("stage").as("dd_stage"),
        col("n_tokens"), col("tokens_kept"))
    val flagged = CurationOps.verbatimContaminatedOn(
        Tables.fanOut(docs.select(col("doc_id"), col("source"), col("text"))))
      .withColumn("contaminated", lit(true))
    val early = dd
      .join(sig, "doc_id")
      .join(flagged, Seq("doc_id"), "left")
      .withColumn("early_stage",
        when(!col("q_keep"), "quality")
          .when(col("dd_stage") =!= "kept", col("dd_stage"))
          .when(col("source") === CurationOps.EvalSource, "eval")
          .when(col("contaminated"), "decontam"))
    // budget ranks the SURVIVORS only: per-lang running token sum in
    // (quality desc, doc_id) order — the same total order as
    // CurationOps.tokenBudget, applied post-attrition
    val wB = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val removed = early.filter(col("early_stage").isNotNull)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"),
        col("early_stage").as("stage"), lit(0L).as("tokens_kept"))
    val surv = early.filter(col("early_stage").isNull)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wB))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"),
        when(col("cum_tokens") > CurationOps.TokensPerLang, "budget")
          .otherwise("kept").as("stage"),
        when(col("cum_tokens") > CurationOps.TokensPerLang, lit(0L))
          .otherwise(col("tokens_kept")).as("tokens_kept"))
    removed.unionByName(surv)
  }

  /** The attrition ledger over a per-doc verdict frame: one row per
    * [[Stages]] entry with docs/tokens removed and the running remainder.
    * Stage rows are a literal frame (stages that removed nothing report
    * zeros); the running sums are a window over ≤9 metadata rows. Caller
    * checkpoints `per` (three aggregate consumers below). */
  private[graft] def ledgerOn(spark: SparkSession, per: DataFrame): DataFrame = {
    import spark.implicits._
    val rm = per.filter(col("stage") =!= "kept")
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("docs_removed"),
        sum(col("n_tokens")).as("tokens_removed"))
    val sub = per.filter(col("stage") === "kept")
      .agg(coalesce(sum(col("n_tokens") - col("tokens_kept")), lit(0L))
        .as("tokens_removed"))
      .select(lit("substring").as("stage"), lit(0L).as("docs_removed"),
        col("tokens_removed"))
    val tot = per.agg(count(lit(1)).as("nd"), sum(col("n_tokens")).as("nt"))
    val stages = Stages.zipWithIndex
      .map { case (st, i) => (i + 1, st) }.toDF("stage_id", "stage")
    val w = Window.orderBy(col("stage_id"))
    stages
      .join(rm.unionByName(sub), Seq("stage"), "left")
      .crossJoin(broadcast(tot))
      .select(col("stage_id"), col("stage"),
        coalesce(col("docs_removed"), lit(0L)).as("docs_removed"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"),
        col("nd"), col("nt"))
      .withColumn("docs_remaining", col("nd") - sum(col("docs_removed")).over(w))
      .withColumn("tokens_remaining", col("nt") - sum(col("tokens_removed")).over(w))
      .select(col("stage_id"), col("stage"), col("docs_removed"),
        col("tokens_removed"), col("docs_remaining"), col("tokens_remaining"))
      .resultOrder(col("stage_id"))
  }

  /** Run the full curation DAG for the corpus at `sfDir` (prune lists
    * read from `dedupArtDir`'s latest committed version) and atomically
    * publish `outDir/version=<version>` with stages corpus/ledger/
    * evalgrams. Kill/restart and immutability semantics are
    * [[VersionedStore.publish]]'s. */
  def refresh(spark: SparkSession, sfDir: String, dedupArtDir: String,
      outDir: String, version: Long): Unit = {
    val docs = Tables.documents(spark, sfDir)
    val arts = DedupRefreshJob.readArtifacts(spark, dedupArtDir)
    // the ledger's three aggregates and the kept-corpus filter all
    // consume the verdict frame — materialize it once
    val per = perDocOn(docs, arts).localCheckpoint(eager = false)
    val kept = per.filter(col("stage") === "kept")
      .select(col("doc_id"), col("lang"), col("quality"), col("tokens_kept"))
    // pack the kept corpus by its POST-CUT token mass (tokens_kept):
    // the training stream a loss mask sees is the corpus minus the
    // excised verbatim spans, so placement arithmetic uses what ships
    val packed = CurationOps.packSequencesOn(
        docs.join(kept.select(col("doc_id"), col("tokens_kept")), "doc_id"),
        nTokens = col("tokens_kept"))
      .select(col("doc_id"), col("n_tokens").as("tokens_kept"),
        col("start_tok"), col("window_id"), col("pos_in_window"),
        col("spans_boundary"))
    val corpus = packed.join(
      kept.select(col("doc_id"), col("lang"), col("quality")), "doc_id")
    VersionedStore.publish(spark, outDir, version, Seq(
      "corpus" -> corpus,
      "ledger" -> ledgerOn(spark, per),
      "evalgrams" -> CurationOps.evalGramsOn(
        Tables.fanOut(docs.select(col("doc_id"), col("source"), col("text"))))))
  }

  def latestVersion(spark: SparkSession, outDir: String): Option[Long] =
    VersionedStore.latestVersion(spark, outDir)

  /** The registered `q_corpus_ledger` surface: the ledger of the latest
    * committed corpus build — a 9-row at-rest parquet read (the
    * production path; the oracle recomputes the identical ledger from the
    * raw tables, and PipelineSpec pins artifact ≡ recompute). */
  def ledgerFromArtifacts(spark: SparkSession, outDir: String): DataFrame =
    VersionedStore.readStage(spark, outDir, "ledger")
      .resultOrder(col("stage_id"))

  /** The recompute twin of [[ledgerFromArtifacts]] — same producer, live
    * frames (PipelineSpec equality; also the honest-cost arm PERF prices
    * against the artifact read). */
  private[graft] def ledgerRecompute(spark: SparkSession, sfDir: String,
      dedupArtDir: String): DataFrame =
    ledgerOn(spark,
      perDocOn(Tables.documents(spark, sfDir),
        DedupRefreshJob.readArtifacts(spark, dedupArtDir))
        .localCheckpoint(eager = false))
}
