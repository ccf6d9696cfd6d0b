package graft

import graft.ops.PqOps
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression guards: the properties PLANS.md claims must
  * hold at 100 TB are asserted here against explain output, so a future
  * edit that silently degrades a plan (drops a pushdown, turns a broadcast
  * into a shuffle join, a top-k into a global sort) fails the build.
  */
class PlanSpec extends SparkSuite {

  /** The query's physical plan with resultOrder's pre-sort checkpoint
    * disabled: the checkpoint replaces the whole producing plan with one
    * `Scan ExistingRDD`, and these pins exist to assert the PRODUCING
    * plan's shape (join strategy, pushdown, exchange count). The default
    * (checkpoint ON) surface is pinned separately below. */
  private def plan(key: String): String = {
    spark.conf.set("spark.graft.resultOrderCheckpoint", "false")
    try SparkEntry.queries(key)(spark, SfDir).queryExecution.explainString(FormattedMode)
    finally spark.conf.unset("spark.graft.resultOrderCheckpoint")
  }

  test("resultOrder large branch: heavy plans checkpoint pre-sort, flat exports do not") {
    // q_dedup_minhash's pair-join estimate exceeds the single-reducer
    // bound AND its plan aggregates, so its resultOrder takes the
    // parallel range sort over a CHECKPOINTED child — otherwise
    // RangePartitioning's SAMPLING job re-executes the whole producing
    // chain. Pin the default (checkpointed) shape; the producing plan's
    // own pins run with the spec escape hatch above.
    val heavy = SparkEntry.queries("q_dedup_minhash")(spark, SfDir)
      .queryExecution.explainString(FormattedMode)
    assert(heavy.contains("rangepartitioning"),
      "large-result branch no longer a parallel range sort:\n" + heavy)
    assert(heavy.contains("ExistingRDD"),
      "pre-sort checkpoint missing — the range sampler re-executes the plan:\n" + heavy)
    // q_enrich_join is a flat scan→broadcast-join export: recomputing it
    // for the sampler is one extra streaming pass, cheaper than a
    // result-sized disk round-trip — it must NOT checkpoint (measured
    // 5-10% loss when it did)
    val flat = SparkEntry.queries("q_enrich_join")(spark, SfDir)
      .queryExecution.explainString(FormattedMode)
    assert(flat.contains("rangepartitioning"), flat)
    assert(!flat.contains("ExistingRDD"),
      "flat export pays a pre-sort checkpoint it does not need:\n" + flat)
  }

  test("q_last_value: top-1 via TakeOrderedAndProject with pushed metric filter") {
    val p = plan("q_last_value")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,"), p)
    assert(!p.contains("Exchange rangepartitioning"), "global sort crept in:\n" + p)
  }

  test("q_scan_filter: predicate reaches the parquet scan; schema pruned") {
    val p = plan("q_scan_filter")
    assert(p.contains("EqualTo(event_type,"), p)
    assert(!p.contains("props"), "scan reads unused props column:\n" + p)
  }

  test("q_latest_per_group: partial aggregation, no ranking-window sort") {
    val p = plan("q_latest_per_group")
    // max_by with a string payload is not hash-buffer-compatible, so Spark
    // plans SortAggregate — the load-bearing property is partial (map-side)
    // aggregation: two aggregate stages around the group-key exchange.
    // The formatted plan prints each node twice (tree + detail), so two
    // STAGES = four matches; a bare >= 2 would pass with a single
    // complete-mode aggregate and silently stop enforcing the property
    assert("(Sort|Hash)Aggregate".r.findAllIn(p).size / 2 >= 2, p)
    assert(!p.contains("Window"), "window-function ranking instead of max_by:\n" + p)
  }

  test("q_enrich_join / snk_jdbc: dimension side broadcast, fact side unshuffled") {
    Seq("q_enrich_join", "snk_jdbc").foreach { k =>
      val p = plan(k)
      assert(p.contains("BroadcastHashJoin"), s"$k:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$k shuffles the fact side:\n$p")
    }
  }

  test("q_bucket_agg: partial+final hash aggregate, pruned scan") {
    val p = plan("q_bucket_agg")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("ReadSchema: struct<ts:"), p)
    assert(!p.contains("event_id"), "scan reads unused event_id:\n" + p)
  }

  test("q_sim_topk: broadcast query vector + TakeOrderedAndProject, native cosine") {
    val p = plan("q_sim_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("Broadcast"), p)
    assert(p.contains("cosine_sim"), "native expression not in plan:\n" + p)
  }

  test("q_alarm_feed: top-50 via TakeOrderedAndProject, scalar CTE broadcast") {
    val p = plan("q_alarm_feed")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("Broadcast"), p)
  }

  test("dedup candidate generation never plans a corpus cross join") {
    Seq("q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram").foreach { k =>
      val p = plan(k)
      assert(!p.contains("CartesianProduct"), s"$k has a cross join:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$k has a nested-loop join:\n$p")
    }
  }

  test("q_dedup_minhash: in-row native signature — corpus never exploded pre-banding") {
    // the signature stage is materialized (eager localCheckpoint — the
    // cache-lifecycle fix), so its plan is asserted on the lazy accessor
    val sig = graft.ops.DedupOps.minhashDocsPlan(Tables.documents(spark, SfDir))
      .queryExecution.explainString(FormattedMode)
    assert(sig.contains("word_shingle_hashes") && sig.contains("minhash_sig"),
      "native in-row expressions missing from plan:\n" + sig)
    assert(!sig.toLowerCase.contains("scalaudf"), "signature fell back to a UDF:\n" + sig)
    // the old pipeline exploded the corpus into a ~200x shingle stream and
    // shuffled it back through an aggregation; the in-row form must plan
    // neither — the only aggregation left in the registered query is the
    // candidate distinct
    val p = plan("q_dedup_minhash")
    assert(!p.contains("collect_set"), "shingle aggregation reappeared:\n" + p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q_source_overlap: in-row shingles, one corpus aggregate, no cross join") {
    // the counted table is checkpointed in the registered query, so the
    // corpus-side shape is asserted on the unmaterialized accessor
    // fixture scale sits under the probe gate: the set arm, probe-free
    val c = graft.ops.DedupOps.sourceOverlapCounted(Tables.documents(spark, SfDir))
      .queryExecution.explainString(FormattedMode)
    assert(c.contains("word_shingle_hashes"), "native expression missing:\n" + c)
    assert(!c.toLowerCase.contains("scalaudf"), c)
    assert(c.contains("collect_set"), "the single corpus-stream aggregate is gone:\n" + c)
    // past the gate (forced by zeroing it) the ≤64-source BITMASK arm:
    // the corpus aggregate is a codegen bit_or, no ObjectHashAggregate
    spark.conf.set("spark.graft.overlapSetMaxBytes", "0")
    try {
      val m = graft.ops.DedupOps.sourceOverlapCounted(Tables.documents(spark, SfDir))
        .queryExecution.explainString(FormattedMode)
      assert(m.contains("bit_or"), "the bitmask corpus aggregate is gone:\n" + m)
      assert(!m.contains("collect_set"), "mask arm fell back to the object aggregate:\n" + m)
    } finally spark.conf.unset("spark.graft.overlapSetMaxBytes")
    val p = plan("q_source_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_dedup_incremental: banded cross join only, rank-1 via WindowGroupLimit") {
    val p = plan("q_dedup_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit"),
      "best-match rank filter not pushed into WindowGroupLimit:\n" + p)
  }

  test("q_embed_quantize: literal-folded quantizer — no join, no window in pass 2") {
    val p = plan("q_embed_quantize")
    assert(!p.contains("Join"), "quantizer joined instead of literal-folded:\n" + p)
    assert(!p.contains("Window"), p)
    assert(p.contains("Generate"), p) // the posexplode feeding the combine
  }

  test("q_dedup_ngram: every stage codegen fixed-width — no object-state aggregate anywhere") {
    // the factor-999 lesson: an aggregate holding OBJECT state per
    // distinct gram (collect_list, typed Aggregators) OOMs the JVM when
    // key cardinality ~ corpus size, regardless of per-buffer bounds.
    // The registered plan must stay primitive counts + spillable SMJs.
    val p = plan("q_dedup_ngram")
    assert(!p.contains("ObjectHashAggregate"),
      "object-state aggregate crept back into the ngram plan:\n" + p)
    assert(!p.contains("collect_list"),
      "posting-list build crept back (the OOM shape):\n" + p)
  }

  test("q_dedup_ngram: gram extraction is the native codegen expression, not a UDF") {
    val g = graft.ops.DedupOps.ngramGramsPlan(Tables.documents(spark, SfDir))
      .queryExecution.explainString(FormattedMode)
    assert(g.contains("ngram_hashes"), "native expression missing from plan:\n" + g)
    assert(!g.toLowerCase.contains("scalaudf"), "gram extraction fell back to a UDF:\n" + g)
  }

  test("q_sim_topk_lsh: codegen'd sign buckets (no UDF), broadcast probe ring, top-k") {
    val p = plan("q_sim_topk_lsh")
    assert(!p.toLowerCase.contains("scalaudf") && !p.contains("BatchEvalPython"),
      "bucket computation fell out of codegen:\n" + p)
    assert(p.contains("Broadcast"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_sim_topk_ivf: broadcast probed labels, native cosine rescore, top-k") {
    val p = plan("q_sim_topk_ivf")
    assert(p.contains("Broadcast"), p)
    assert(p.contains("cosine_sim"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), "corpus shuffled for the probe join:\n" + p)
  }

  test("q_mv_read: scans the materialized MV with day-partition pruning") {
    val p = plan("q_mv_read")
    // the bucket-range predicate lands on the day partition column at
    // planning time — whole day directories are pruned before any I/O
    assert(p.contains("PartitionFilters: [isnotnull(day"), s"no partition pruning:\n$p")
    // the metric equality pushes into the parquet scan
    assert(p.contains("EqualTo(metric,click)"), s"metric filter not pushed:\n$p")
    // a recompute would aggregate the events table here — the read path
    // must scan the written MV, not re-derive it
    assert(!p.contains("HashAggregate"), s"mv_read recomputes the aggregate:\n$p")
  }

  test("q_dedup_embed: one blocking-key shuffle, never an all-pairs join") {
    val p = plan("q_dedup_embed")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"embed dedup plans an all-pairs join:\n$p")
    // the corpus moves once: a single hash exchange on the composite
    // (label, sign-bucket) grouping key feeding the block-local scorer
    // (the only other exchange is the final orderBy's rangepartitioning)
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"embed dedup shuffles the corpus more than once:\n$p")
  }

  test("q_decontaminate: eval grams broadcast, native gram extraction, no corpus shuffle join") {
    val p = plan("q_decontaminate")
    assert(p.contains("ngram_hashes"), "native expression missing from plan:\n" + p)
    assert(p.contains("BroadcastHashJoin"), "eval gram set not broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"), "training gram stream shuffled for the eval join:\n" + p)
    assert(!p.toLowerCase.contains("scalaudf"), "gram extraction fell back to a UDF:\n" + p)
  }

  test("Tables.fanOut: rebalances a row-group-bound scan, no-op above the size bound") {
    // small input (fixture scan: planning-time bytes << cores × 128 MB):
    // a rebalance exchange must appear so the per-row stage behind it can
    // use every core even though the file is a single row group
    val small = Tables.fanOut(Tables.documents(spark, SfDir))
    assert(small.queryExecution.explainString(FormattedMode)
      .contains("RoundRobinPartitioning"),
      "fanOut left a row-group-bound scan serial")
    // large input (planning-time stats above cores × 128 MB): partitioning
    // must pass through untouched — at production scale the scan already
    // fans out and the rebalance would be a full extra shuffle of the table
    val big = spark.range((4L << 30) / 8 * spark.sparkContext.defaultParallelism).toDF("doc_id")
    assert(big.queryExecution.optimizedPlan.stats.sizeInBytes >
      BigInt(spark.sparkContext.defaultParallelism) * (128L << 20))
    assert(!Tables.fanOut(big).queryExecution.explainString(FormattedMode)
      .contains("RoundRobinPartitioning"),
      "fanOut shuffled a production-sized input")
  }

  test("clean-stage projections: codegen'd, no UDF, no aggregation exchange") {
    // piiRedact / qualityFilter / chunkDocs are scan + projection ops: the
    // only exchanges allowed are the size-gated fanOut round-robin and the
    // single-reducer presentation sort — never a hash exchange (that would
    // mean an aggregation/join crept into a per-row pipeline) and never a
    // UDF (regex/digest work must stay inside codegen)
    Seq("q_pii_redact", "q_quality_filter", "q_chunk_docs").foreach { k =>
      val p = plan(k)
      assert(!p.toLowerCase.contains("scalaudf"), s"$k fell back to a UDF:\n$p")
      assert(!p.contains("hashpartitioning"), s"$k shuffles a per-row pipeline:\n$p")
      assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
        s"$k aggregates in a projection-only op:\n$p")
    }
  }

  test("q_repetition: in-row native stats — pure projection, no corpus token shuffle") {
    val p = plan("q_repetition")
    assert(p.contains("term_freq_stats"), s"native expression missing from plan:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"), s"UDF in the repetition pipeline:\n$p")
    // per-doc term frequencies never cross a document boundary: the plan
    // must be scan + projection — no explode of the token stream, no
    // aggregation, no hash exchange (the only exchanges are the size-gated
    // fanOut round-robin and the single-reducer presentation sort)
    assert(!p.contains("Generate"), s"token stream exploded:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"repetition aggregates a per-doc property:\n$p")
    assert(!p.contains("hashpartitioning"), s"corpus token shuffle crept in:\n$p")
    assert(!p.contains("Join"), s"per-doc join crept in:\n$p")
  }

  test("q_source_mix: share denominator broadcast as a 1-row scalar, no global window") {
    val p = plan("q_source_mix")
    // partial+final aggregate on (source, lang)
    assert(p.contains("HashAggregate"), p)
    // the corpus token total joins back as a broadcast 1-row side — an
    // unpartitioned window here would funnel every cell through one
    // partition and break on a high-cardinality source domain
    assert(!p.contains("Window"), s"global window over the cells:\n$p")
    assert(p.contains("Broadcast"), s"total not broadcast:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q_asof_join: tagged-union window carry — zero join nodes, one key shuffle") {
    val p = plan("q_asof_join")
    // a range-join formulation would plan BroadcastNestedLoopJoin (the
    // inequality keeps it out of hash joins) and buffer per key; the
    // union+window form has NO join operator at all
    assert(!p.contains("Join"), s"as-of planned as a join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), s"window carry missing:\n$p")
    // one hash exchange on user_id for the window; the only other
    // exchange is the single-reducer presentation sort
    assert("Arguments: hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"extra shuffles in the as-of pipeline:\n$p")
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"shuffle on a non-user_id key crept in:\n$p")
  }

  test("gapfill family: segment-expanded, join-free — no spine-wide carries") {
    import graft.ops.RelationalOps
    import org.apache.spark.sql.functions.col
    val rows = Tables.events(spark, SfDir).select(
      col("event_type").as("metric"), col("ts"), col("value"))
    // the registered queries end in checkpoint + range sort (below); the
    // expansion shape is pinned on the exposed pre-checkpoint plan — the
    // minhashDocsPlan convention
    Seq[(String, org.apache.spark.sql.DataFrame)](
      "q_gapfill_locf" -> RelationalOps.gapfillLocfPlan(rows, twoPhase = false),
      "q_gapfill_interp" -> RelationalOps.gapfillInterpPlan(rows, twoPhase = false)
    ).foreach { case (k, df) =>
      val p = df.queryExecution.explainString(FormattedMode)
      // gap minutes are generated FROM their enclosing segment (one
      // Generate), born knowing both endpoints — never a dense spine
      // left-joined back to the observations, and never a cartesian of
      // metrics x minutes
      assert(p.contains("Generate"), s"$k gap rows not generated:\n$p")
      assert(!p.contains("Join") && !p.contains("CartesianProduct"),
        s"$k rebuilt the spine-join formulation:\n$p")
      // one lead() window over the OBSERVED buckets; the fill itself is a
      // projection of the Generate output, so exactly two hash exchanges
      // exist: the (metric, bucket) aggregation and the (metric) window
      assert(p.contains("Window"), s"$k segment lead window missing:\n$p")
      assert("Arguments: hashpartitioning\\(metric".r.findAllIn(p).size <= 2,
        s"$k shuffles beyond agg + segment window:\n$p")
      assert(!p.toLowerCase.contains("scalaudf"), p)
    }
    // the registered query's final range sort samples its CHILD before
    // shuffling; the pre-sort checkpoint pins that child to a materialized
    // RDD scan so the spine is computed once, not twice
    Seq("q_gapfill_locf", "q_gapfill_interp").foreach { k =>
      val p = plan(k)
      assert(p.contains("rangepartitioning"),
        s"$k lost its parallel range sort:\n$p")
      assert(p.contains("Scan ExistingRDD"),
        s"$k range sort samples an unmaterialized spine (double compute):\n$p")
      assert(!p.contains("Scan parquet"),
        s"$k sort subtree recomputes from the raw scan:\n$p")
    }
  }

  test("gap-fill two-phase arm: (metric, day) lead windows, broadcast day carry") {
    import graft.ops.RelationalOps
    import org.apache.spark.sql.functions.col
    val rows = Tables.events(spark, SfDir).select(
      col("event_type").as("metric"), col("ts"), col("value"))
    Seq[org.apache.spark.sql.DataFrame => String](
      df => RelationalOps.gapfillLocfPlan(df, twoPhase = true)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode),
      df => RelationalOps.gapfillInterpPlan(df, twoPhase = true)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    ).foreach { mk =>
      val p = mk(rows)
      // the successor window partitions on (metric, day) — days × metrics
      // tasks, never |metrics| tasks over the whole observed history
      assert("windowspecdefinition\\(metric#\\d+, day#\\d+".r.findFirstIn(p).isDefined,
        s"two-phase arm lost its day-bucketed window:\n$p")
      // the day-boundary carry joins back broadcast (day-level table)
      assert(p.contains("BroadcastHashJoin"),
        s"day carry must broadcast, not shuffle:\n$p")
      assert(!p.contains("SortMergeJoin"), s"carry join went corpus-scale:\n$p")
    }
  }

  test("q_percentiles: value-counting rank — windows over distinct values, no join, one corpus exchange") {
    val p = plan("q_percentiles")
    // value counting collapses the corpus to distinct (metric, value)
    // rows BEFORE any window: the only corpus-wide exchange is the
    // map-side-combined count aggregate, the running-rank window sorts
    // value-cardinality rows, and no join exists anywhere — targets come
    // from a whole-partition sum over the same window partitioning
    assert(!p.contains("Join"), s"percentile rank regrew a join:\n$p")
    assert(!"row_number".r.findFirstIn(p).isDefined,
      s"row-level ranking crept back (rank must be counted, not numbered):\n$p")
    // the window's input is the aggregate, so a HashAggregate must sit
    // below the Window in the tree (corpus rows never reach the sort)
    assert(p.contains("Window") && p.contains("HashAggregate"),
      s"count-then-rank shape missing:\n$p")
    assert(!p.contains("Union"), s"per-percentile union crept back:\n$p")
    assert(p.contains("Generate"), s"target explode missing:\n$p")
    // one corpus hash exchange (the count agg) + one value-cardinality
    // window exchange + the single-reducer result sort
    assert("Arguments: hashpartitioning".r.findAllIn(p).size <= 2,
      s"q_percentiles grew extra shuffles:\n$p")
  }

  // prepared input frames for the counter/SPC family's explicit-phase
  // forms (same projections the public operators build)
  private def counterRows = {
    import org.apache.spark.sql.functions._
    graft.Tables.events(spark, SfDir).filter(col("value").isNotNull)
      .select(col("event_type").as("metric"), col("ts"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
  }
  private def spcRows = {
    import org.apache.spark.sql.functions._
    graft.Tables.events(spark, SfDir).filter(col("value").isNotNull)
      .select(col("event_type").as("metric"), col("ts"), col("event_id"),
        col("value"), floor(col("value") * 100 + 0.5).cast("long").as("c"))
  }
  /** By-name for the same reason plan(key) toggles the conf: the
    * resultOrder checkpoint decision happens at DataFrame CONSTRUCTION,
    * so the frame must be built with the spec escape hatch set. */
  private def planOf(df: => org.apache.spark.sql.DataFrame): String = {
    spark.conf.set("spark.graft.resultOrderCheckpoint", "false")
    try df.queryExecution.explainString(FormattedMode)
    finally spark.conf.unset("spark.graft.resultOrderCheckpoint")
  }

  test("q_counter_rate: fixture scale takes the single-phase path — one window, no join") {
    // below SinglePhaseMaxBytes the per-metric-sort ceiling is provably
    // irrelevant, so the registered query must NOT pay the two-phase
    // branch + carry join (pure scheduler floor at this scale)
    val p = plan("q_counter_rate")
    assert("windowspecdefinition\\(metric#\\d+, ts#".r.findFirstIn(p).isDefined,
      s"single-phase per-metric lag window missing:\n$p")
    assert(!"windowspecdefinition\\(metric#\\d+, day#\\d+".r.findFirstIn(p).isDefined,
      s"two-phase (metric, day) window below the gate:\n$p")
    assert(!p.contains("Join"), s"carry join below the gate:\n$p")
    // one corpus exchange (the window's; the hour agg rides it as a
    // subset key) + the single-reducer presentation sort
    assert("Arguments: hashpartitioning".r.findAllIn(p).size <= 1,
      s"single-phase grew extra corpus shuffles:\n$p")
  }

  test("q_counter_rate two-phase form: (metric, day) lag with broadcast boundary carries") {
    val p = planOf(graft.ops.RelationalOps.counterRateOn(counterRows, twoPhase = true))
    assert(!"windowspecdefinition\\(metric#\\d+, ts#".r.findFirstIn(p).isDefined,
      s"per-metric corpus lag window in the two-phase form:\n$p")
    assert("windowspecdefinition\\(metric#\\d+, day#\\d+, ts#".r.findFirstIn(p).isDefined,
      s"(metric, day) in-bucket lag window missing:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"day-carry table not broadcast:\n$p")
    // the final hour aggregate carries `day` in its grouping so the lag
    // window's (metric, day) partitioning satisfies it (subset key) —
    // exactly 3 hash exchanges exist (main window, carry agg, carry
    // window); a 4th means the aggregate re-shuffled the corpus
    assert("Arguments: hashpartitioning".r.findAllIn(p).size <= 3,
      s"final aggregate regrew its corpus exchange:\n$p")
  }

  test("q_spc_rules: fixture scale takes the single-phase path — oracle shape, one exchange") {
    val p = plan("q_spc_rules")
    // the three rank windows all run off the one hash(metric) exchange
    assert("windowspecdefinition\\(metric#\\d+, ts#".r.findFirstIn(p).isDefined &&
      "windowspecdefinition\\(metric#\\d+, above#\\d+, ts#".r.findFirstIn(p).isDefined,
      s"single-phase gaps-and-islands windows missing:\n$p")
    assert(!"windowspecdefinition\\(metric#\\d+, day#\\d+".r.findFirstIn(p).isDefined,
      s"two-phase day windows below the gate:\n$p")
    // exactly the stats broadcast — no offsets join, no checkpoint scan
    // (stats is consumed once; formatted explain prints nodes twice)
    assert("BroadcastHashJoin".r.findAllIn(p).size / 2 == 1,
      s"expected only the stats broadcast:\n$p")
    assert(!p.contains("ExistingRDD"),
      s"single-use stats grew a checkpoint stage:\n$p")
    assert("Arguments: hashpartitioning".r.findAllIn(p).size <= 2,
      s"single-phase grew extra corpus shuffles:\n$p")
  }

  test("q_spc_rules two-phase form: day-bucket ranks, one offset branch, checkpointed stats") {
    val p = planOf(graft.ops.RelationalOps.spcRulesOn(spcRows, twoPhase = true))
    assert(!"windowspecdefinition\\(metric#\\d+, ts#".r.findFirstIn(p).isDefined &&
      !"windowspecdefinition\\(metric#\\d+, above#\\d+, ts#".r.findFirstIn(p).isDefined,
      s"per-metric corpus rank window in the two-phase form:\n$p")
    assert("windowspecdefinition\\(metric#\\d+, day#\\d+, ts#".r.findFirstIn(p).isDefined &&
      "windowspecdefinition\\(metric#\\d+, above#\\d+, day#\\d+, ts#".r.findFirstIn(p).isDefined,
      s"(metric[, above], day) in-bucket rank windows missing:\n$p")
    // BOTH lift offsets come from ONE count branch joined back as ONE
    // broadcast: exactly 3 join nodes (stats onto main, stats onto the
    // count branch — both against the materialized checkpoint, never a
    // recomputed stats subtree — and the single offsets join); a 4th
    // means the dual offset-branch form is back. Formatted explain
    // prints each node twice (tree + detail).
    assert("BroadcastHashJoin".r.findAllIn(p).size / 2 == 3,
      s"expected exactly stats(x2) + offsets broadcasts:\n$p")
    // the stats subtree is materialized once — branches scan its
    // checkpoint blocks, not a duplicated corpus aggregate
    assert(p.contains("ExistingRDD"), s"stats checkpoint missing:\n$p")
    assert("Scan parquet".r.findAllIn(p).size / 2 <= 2,
      s"a third corpus scan branch appeared:\n$p")
  }

  test("counter/SPC/percentile window ceilings hold in both phases") {
    // A regrown offset branch or a lost exchange-sharing opportunity
    // shows up as extra Window nodes sorting the corpus. Fixture scale
    // (single-phase): counter 1 window, spc 3, percentiles 2. Forced
    // two-phase forms: the round-7/8 ceilings (counter 2, spc 4 — the
    // shared-exchange derivation was tried and REVERTED, see PERF.md:
    // sameResult() reuse is conf-fragile and a miss re-sorts the corpus).
    Seq("q_counter_rate" -> 1, "q_spc_rules" -> 3, "q_percentiles" -> 2).foreach {
      case (q, maxWindows) =>
        val p = plan(q)
        val n = "windowspecdefinition".r.findAllIn(p).size / 2 // plan prints each twice (tree + detail)
        assert(n <= maxWindows,
          s"$q grew to $n window nodes (max $maxWindows):\n$p")
    }
    Seq(
      ("counter two-phase",
        planOf(graft.ops.RelationalOps.counterRateOn(counterRows, twoPhase = true)), 2),
      ("spc two-phase",
        planOf(graft.ops.RelationalOps.spcRulesOn(spcRows, twoPhase = true)), 4)
    ).foreach { case (name, p, maxWindows) =>
      val n = "windowspecdefinition".r.findAllIn(p).size / 2
      assert(n <= maxWindows,
        s"$name grew to $n window nodes (max $maxWindows):\n$p")
    }
  }

  test("broadcastIfSmall: hints under the bound, falls back to planner choice when the estimate is large") {
    import org.apache.spark.sql.functions.col
    // small side: estimate far under the bound -> hinted broadcast join
    // (the trio/histogram plans above pin this at fixture scale; here the
    // gate itself is exercised in isolation on both sides of the bound)
    val small = spark.range(100).select(col("id"), (col("id") % 7).as("k"))
    val fact = spark.range(10000).select(col("id").as("fid"), (col("id") % 7).as("k"))
    val hinted = fact.join(graft.Tables.broadcastIfSmall(small), "k")
    val pSmall = hinted.queryExecution.executedPlan.toString
    assert(pSmall.contains("BroadcastHashJoin"), s"small side not broadcast:\n$pSmall")
    // large side: a range whose 8-bytes-per-row estimate exceeds any sane
    // broadcast bound -> the hint is DROPPED (no forced driver-side
    // collect of a huge table); with the static planner's own threshold
    // shrunk below the estimate, the join degrades to shuffle/sort-merge
    val big = spark.range(1L << 32).select(col("id"), (col("id") % 7).as("k"))
    assert(graft.Tables.broadcastIfSmall(big) eq big,
      "broadcastIfSmall hinted a table whose estimate exceeds the bound")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val unhinted = fact.join(graft.Tables.broadcastIfSmall(big), "k")
      val pBig = unhinted.queryExecution.executedPlan.toString
      assert(!pBig.contains("BroadcastHashJoin") && pBig.contains("SortMergeJoin"),
        s"large side still forced a broadcast:\n$pBig")
    } finally spark.conf.set(key, saved)
  }

  test("q_histogram / q_spc_rules: per-metric stats broadcast back, fact side unshuffled for the join") {
    Seq("q_histogram", "q_spc_rules").foreach { k =>
      val p = plan(k)
      assert(p.contains("BroadcastHashJoin"), s"$k stats not broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$k shuffles the value stream to join 5 stat rows:\n$p")
      assert(!p.toLowerCase.contains("scalaudf"), p)
    }
    // round-14 value-counting shape: the corpus collapses ONCE to the
    // checkpointed distinct-value table and BOTH consumers (bounds +
    // binning) read it — zero parquet scans remain in the downstream plan
    val ph = plan("q_histogram")
    assert(!ph.contains("Scan parquet"),
      "histogram re-scans the corpus instead of the checkpointed value table:\n" + ph)
    assert(ph.contains("ExistingRDD") || ph.contains("LocalTableScan"),
      "distinct-value table not materialized once:\n" + ph)
  }

  test("q_dedup_clusters: CC ran as joins — no GraphX RDD scans, no cross join") {
    val p = plan("q_dedup_clusters")
    assert(!p.contains("CartesianProduct"), p)
    // the component table enters the final plan as materialized data — a
    // LocalTableScan when the pair graph fit the union-find local budget,
    // a checkpoint scan (ExistingRDD) when the distributed rounds ran — NOT
    // a recompute of the whole minhash pipeline, whose signature/shingle
    // aggregation (collect_set) must be absent from this plan
    assert(p.contains("LocalTableScan") || p.contains("ExistingRDD"),
      "pair graph/component table not materialized:\n" + p)
    assert(!p.contains("collect_set"), "minhash pipeline recomputed inside clusters:\n" + p)
  }
  test("q_top_terms: in-row term_counts — one vocabulary exchange, top-k heap") {
    val p = plan("q_top_terms")
    assert(p.contains("term_counts"), "native term_counts not in plan:\n" + p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), "global sort crept in:\n" + p)
    // the ONLY hash exchange is the term-level aggregate (map-side partials
    // reduce each partition to <= vocabulary rows before the wire); a
    // second one means the corpus-scale (term, doc_id) shuffle came back
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1,
      "more than one hash exchange — corpus-scale token shuffle returned:\n" + p)
  }

  test("q_tfidf: tf in-row, df broadcast back, ONE corpus exchange with rank-limit pushdown") {
    val p = plan("q_tfidf")
    // the term stream is extracted ONCE and checkpointed; both consumers
    // (df aggregate, scoring join) must read the materialized RDD instead
    // of re-running the extraction (r17: two term_counts subtrees)
    assert(p.contains("ExistingRDD"), "term stream not materialized once:\n" + p)
    assert(!p.contains("term_counts"),
      "an extraction subtree bypassed the checkpointed term stream:\n" + p)
    // the extraction itself keeps the in-row native shape — asserted on
    // the exposed pre-checkpoint plan (the minhashDocsPlan convention)
    val stream = ops.TextOps.tfidfTermStream(Tables.documents(spark, SfDir))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(stream.contains("term_counts"), "native term_counts not in plan:\n" + stream)
    assert(!stream.contains("hashpartitioning"),
      "tf extraction shuffles the corpus:\n" + stream)
    assert(p.contains("BroadcastHashJoin"), "df table not broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"), "corpus shuffled to join the vocabulary table:\n" + p)
    // per-doc top-3 must push a WindowGroupLimit below the exchange
    assert(p.contains("WindowGroupLimit"), "rank-limit pushdown missing:\n" + p)
    // exactly one doc_id exchange (the final window); the tf/ntok branch
    // computes per-document properties in-row and must not shuffle
    assert("hashpartitioning\\(doc_id".r.findAllIn(p).size == 1,
      "tf branch shuffles the corpus:\n" + p)
  }

  test("kmeans iteration: zero-shuffle assignment, map-side-combined (cluster, d) sums") {
    val pts = ops.ClusterOps.quantizedPoints(spark, SfDir)
    val cens = Array.fill(4)(Array.fill(64)(0L))
    val clusters = Array.tabulate(4)(identity)
    val p = ops.ClusterOps.iterationStats(pts, clusters, cens)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("nearest_centroid"), "native assignment expression not in plan:\n" + p)
    // one exchange total: the (cluster, d) aggregate; assignment itself is
    // a projection — any additional exchange means the corpus is shuffled
    assert("Exchange".r.findAllIn(p).size <= 2, // tree + detail of ONE node
      "assignment shuffles the corpus:\n" + p)
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "no map-side partial aggregation:\n" + p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }
  test("q_sim_topk_ivf_trained: serving is one scan — in-row assignment, broadcast query, top-k heap") {
    val p = plan("q_sim_topk_ivf_trained")
    assert(p.contains("nearest_centroid"), "assignment not the native in-row expression:\n" + p)
    assert(p.contains("cosine_sim"), "rescore not the native cosine:\n" + p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "serving path shuffles the corpus:\n" + p)
    assert(!p.contains("Exchange hashpartitioning"),
      "serving path should have no hash exchange at all:\n" + p)
  }
  test("q_sim_topk_ivfpq: one scan — in-row coarse assignment, probe filter, zero exchanges, top-k heap") {
    val p = plan("q_sim_topk_ivfpq")
    assert(p.contains("nearest_centroid"),
      "assignment not the native in-row expression:\n" + p)
    assert(p.contains("cluster#") && p.contains(" IN "),
      "probe filter missing — the corpus is ranked unpruned:\n" + p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Join"), "serving path joins something:\n" + p)
    assert(!p.contains("Exchange hashpartitioning"),
      "serving path should have no hash exchange at all:\n" + p)
  }

  test("q_multimodal_dedup: in-row codegen keys, one combined exchange, no join/window") {
    val p = plan("q_multimodal_dedup")
    assert(p.contains("media_stats"),
      "decode/key stage is not the native in-row expression:\n" + p)
    assert("hashpartitioning\\(pkey".r.findAllIn(p).size === 1,
      "expected exactly one exchange, keyed by pkey:\n" + p)
    assert(p.contains("partial_min") || p.contains("partial_count"),
      "no map-side partial aggregation before the exchange:\n" + p)
    assert(!p.contains("Join"), "dedup should not join anything:\n" + p)
    assert(!p.contains("Window"), "keeper must come from the aggregate, not a window:\n" + p)
    assert(!p.contains("MapPartitions") && !p.contains("SerializeFromObject"),
      "decode left whole-stage codegen for an object boundary:\n" + p)
  }

  test("multimodal batch family: decode is the codegen expression, zero object boundaries") {
    // round-14 de-stub pin: features/resize/frames are pure one-scan
    // projections — the media_stats expression fused with the scan, no
    // mapPartitions/Dataset-encoder round-trip, no exchange at all below
    // the presentation sort
    for (k <- Seq("q_multimodal_features", "q_multimodal_resize", "q_multimodal_frames")) {
      val p = plan(k)
      assert(p.contains("media_stats"), s"$k lost the native decode expression:\n" + p)
      assert(!p.contains("MapPartitions") && !p.contains("SerializeFromObject"),
        s"$k decode left whole-stage codegen for an object boundary:\n" + p)
      assert(!p.contains("Join") && !p.contains("Window"), s"$k is not one scan:\n" + p)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$k shuffled a per-row projection:\n" + p)
    }
  }

  test("q_sim_recall: batched arms group-limit per query; membership joins stay broadcast") {
    val p = plan("q_sim_recall")
    // the exact-set membership and the 7-row presentation joins are
    // broadcasts of ≤ NQ·k rows, never a shuffle join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "a metadata-scale membership join shuffled the candidates:\n" + p)
    // every batched arm's per-query top-k (and each probe selection and
    // the exact baseline) must plan as a group-limited rank window —
    // map-side cap at k·NQ rows per partition, the windowed
    // generalization of TakeOrderedAndProject. The formatted plan prints
    // each node twice (tree + detail): 7 arm cuts + 2 shortlists + the
    // exact baseline is a 10-stage floor.
    assert("WindowGroupLimit".r.findAllIn(p).size / 2 >= 10,
      "a per-query top-k lost its WindowGroupLimit cap:\n" + p)
    // presentation sort of 7 rows: single reducer, no range exchange
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_cluster_stats: in-row assignment + distance — one k-sized exchange, no join") {
    val p = plan("q_cluster_stats")
    assert(p.contains("nearest_centroid") && p.contains("squared_l2"),
      "assignment/distance not the native in-row expressions:\n" + p)
    assert(!p.contains("Join"), "evaluation should not join anything:\n" + p)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "no map-side partial aggregation:\n" + p)
  }

  test("q_dedup_rate_by_source: two-level digest aggregation, no count-distinct expand") {
    val p = plan("q_dedup_rate_by_source")
    assert(!p.contains("Expand"), "count-distinct expand crept in:\n" + p)
    assert("(Sort|Hash)Aggregate".r.findAllIn(p).size / 2 >= 2,
      "missing the two-level (source, digest) -> source aggregation:\n" + p)
  }

  test("q_pack_sequences: corpus window bucket-partitioned, bucket offsets broadcast") {
    val p = plan("q_pack_sequences")
    // the corpus-wide running sum must NOT be a single-partition window;
    // only the bucket-cardinality offset table may pass through one task
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets not broadcast back onto the stream:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "offset join shuffles the corpus:\n" + p)
    // two Window nodes: the bucket-partitioned cumsum + the bucket-table
    // prefix sum (which sees N/4096 rows, not N)
    assert("Window".r.findAllIn(p).size >= 2, p)
    // the offsets branch derives from the SAME windowed stream; at
    // runtime AQE must reuse the corpus bucket exchange so the scan +
    // tokenization run once (the reuse is invisible in static explain).
    // Built with the spec escape hatch: under the default resultOrder
    // checkpoint the producing plan (and its ReusedExchange) executes
    // inside the checkpointed subtree, invisible to this executedPlan.
    spark.conf.set("spark.graft.resultOrderCheckpoint", "false")
    try {
      val df = SparkEntry.queries("q_pack_sequences")(spark, SfDir)
      df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
        "corpus scanned/tokenized twice — bucket exchange not reused:\n" +
          df.queryExecution.executedPlan.toString)
    } finally spark.conf.unset("spark.graft.resultOrderCheckpoint")
  }

  test("q_contam_coverage: eval grams broadcast, native gram extraction, in-row gram counts") {
    val p = plan("q_contam_coverage")
    assert(p.contains("ngram_hashes"), "native expression missing from plan:\n" + p)
    assert(p.contains("BroadcastHashJoin"), "eval gram set not broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "a corpus-shuffling join crept into the coverage path:\n" + p)
    assert(!p.toLowerCase.contains("scalaudf"), "gram extraction fell back to a UDF:\n" + p)
  }

  test("q_dedup_semantic: zero-shuffle assignment, one cluster shuffle, no all-pairs join") {
    val p = plan("q_dedup_semantic")
    assert(p.contains("nearest_centroid"),
      "assignment not the native in-row expression:\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("SortMergeJoin"),
      s"semantic dedup plans a corpus join:\n$p")
    // the corpus moves once: the cluster-key exchange into flatMapGroups
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"semantic dedup shuffles the corpus more than once:\n$p")
  }

  test("q_top_bigrams / q_lm_score: in-row pair extraction, bounded exchanges, broadcast counts") {
    val pTop = plan("q_top_bigrams")
    assert(pTop.contains("TakeOrderedAndProject"), pTop)
    assert("hashpartitioning\\(".r.findAllIn(pTop).size == 1,
      s"bigram counting shuffles more than the vocabulary aggregate:\n$pTop")
    val pLm = plan("q_lm_score")
    assert(pLm.contains("BroadcastHashJoin"), "count table not broadcast:\n" + pLm)
    assert(!pLm.contains("SortMergeJoin"), s"corpus shuffled to join the count table:\n$pLm")
    // two corpus exchanges (bigram aggregate; doc_id aggregate) — the
    // presentation sort is the single-reducer repartition, not a hash one
    assert("hashpartitioning\\(".r.findAllIn(pLm).size <= 2,
      s"unexpected extra exchange:\n$pLm")
    // the pair stream is extracted ONCE and checkpointed: both consumers
    // read the materialized RDD (r17: two tokenize+explode subtrees)
    assert(pLm.contains("ExistingRDD"), "pair stream not materialized once:\n" + pLm)
    val pStream = ops.TextOps.lmPairStream(Tables.documents(spark, SfDir))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(pStream.contains("Generate"), "in-row pair extraction missing:\n" + pStream)
    assert(!pStream.contains("hashpartitioning"),
      "pair extraction shuffles the corpus:\n" + pStream)
  }

  test("q_funnel: ONE corpus scan, pushed stage-set filter, one user exchange, no joins") {
    val p = plan("q_funnel")
    // the K-branch join form read the corpus once per stage; the fold form
    // reads it ONCE (formatted mode prints the scan in tree + detail)
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      "funnel reads the events table more than once:\n" + p)
    assert(p.contains("In(event_type"),
      "stage-set membership filter not pushed to the scan:\n" + p)
    assert(!p.contains("Join"), s"fold form must not join:\n$p")
    // one corpus exchange (user_id for the per-user fold); the stage-count
    // rollup is a SinglePartition global aggregate, not a hash exchange
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1,
      s"funnel shuffles the corpus more than once:\n$p")
  }

  test("q_dedup_substring: no self-join; fingerprint + doc exchanges only; pruned scan") {
    val p = plan("q_dedup_substring")
    assert(!p.contains("Join"), s"substring dedup must never self-join the corpus:\n$p")
    // exchange 1: hash(h) for the keeper window; exchange 2: hash(doc_id)
    // for the island window — the (doc_id, island) span aggregate reuses
    // it via subset-key clustering; the presentation sort is the
    // single-reducer repartition, not a hash one
    assert("hashpartitioning\\(".r.findAllIn(p).size == 2,
      s"expected exactly 2 hash exchanges:\n$p")
    assert(!p.contains("source") && !p.contains("props"),
      "scan reads columns beyond (doc_id, text):\n" + p)
    // opt-in skew arm: keeper becomes a map-side-combined aggregate
    // (partial_min collapses a hot fingerprint per map task) hash-joined
    // back — never a window sort over partitionBy(h)
    spark.conf.set("spark.graft.substrSkewSafe", "true")
    val ps = try plan("q_dedup_substring")
      finally spark.conf.unset("spark.graft.substrSkewSafe")
    assert(ps.contains("partial_min"),
      s"skew arm keeper lost its map-side combine:\n$ps")
    assert(ps.contains("Join"), s"skew arm should join keepers back:\n$ps")
    assert(!ps.contains("Window partitionBy") &&
      !"Window \\[min".r.findFirstIn(ps).isDefined,
      s"skew arm must not compute the keeper in a window:\n$ps")
  }

  test("q_url_dedup: in-row canonicalization, one corpus exchange, no joins") {
    val p = plan("q_url_dedup")
    assert(!p.contains("Join"), s"url dedup must not join:\n$p")
    // one hash exchange on the canonical url for the keep-first aggregate;
    // fanOut is RoundRobin and the presentation sort is single-reducer
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1,
      s"expected exactly 1 hash exchange:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_count") ||
      p.contains("HashAggregate"), s"keep-first aggregate missing map-side combine:\n$p")
  }

  test("q_domain_mix: capped selection is a bounded mergeable aggregate — no window") {
    val p = plan("q_domain_mix")
    // default (topk) arm: ONE corpus exchange feeds the partial+final
    // ObjectHashAggregate carrying ≤ cap TopKKeep entries per (domain,
    // map); no ranking window exists, so no domain-key sort funnel either
    assert(p.contains("ObjectHashAggregate"),
      s"TopKKeep aggregate must run as ObjectHashAggregate:\n$p")
    assert(!p.contains("WindowGroupLimit") && !"Window \\[".r.findFirstIn(p).isDefined,
      s"default arm must not rank through a window:\n$p")
    assert("hashpartitioning\\(domain".r.findAllIn(p).size == 1,
      s"expected exactly 1 domain exchange:\n$p")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"default arm must canonicalize in ONE corpus scan:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-scale join exists here:\n$p")
  }

  test("q_domain_mix twoscan arm: cap rank plans as WindowGroupLimit on both exchange sides") {
    spark.conf.set("spark.graft.domainMixArm", "twoscan")
    val p = try plan("q_domain_mix")
      finally spark.conf.unset("spark.graft.domainMixArm")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"rank-filter must prune to cap per domain on BOTH sides of the exchange:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"domain-cardinality kept/totals join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-scale join exists here:\n$p")
  }

  test("q_uptime: fixture scale takes the single-phase path — one metric exchange") {
    val p = plan("q_uptime")
    // window partitioning == group key → ONE corpus exchange feeds both;
    // the only other exchange is the single-reducer presentation sort
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1,
      s"uptime shuffles the corpus twice:\n$p")
    assert(!"windowspecdefinition\\(metric#\\d+, day#\\d+".r.findFirstIn(p).isDefined,
      s"two-phase day windows below the gate:\n$p")
    assert(!p.contains("props"), "scan reads unused props column:\n" + p)
  }

  test("q_uptime two-phase form: (metric, day) lead with broadcast day-boundary carries") {
    val p = planOf(graft.ops.SessionOps.uptimeOn(
      Tables.events(spark, SfDir), twoPhase = true))
    assert(!"windowspecdefinition\\(metric#\\d+, ts#".r.findFirstIn(p).isDefined,
      s"per-metric corpus window in the two-phase form:\n$p")
    assert("windowspecdefinition\\(metric#\\d+, day#\\d+, ts#".r.findFirstIn(p).isDefined,
      s"(metric, day) in-day lead window missing:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"day-carry table not broadcast:\n$p")
    // exchange budget: main (metric, day) window, carry agg, carry window —
    // counter-rate's three — plus ONE day-cardinality exchange for the
    // final per-metric rollup (its input is the ≤ metrics×days partial
    // rows, never the corpus; counter-rate keeps (metric, day) in its
    // output key and so never needs it). The per-day partial aggregate
    // itself rides the window's (metric, day) partitioning (subset key).
    assert("Arguments: hashpartitioning".r.findAllIn(p).size <= 4,
      s"two-phase uptime regrew a corpus exchange:\n$p")
  }

  test("q_sim_topk_batch: broadcast query set, rank limit pushed to both sides of the qid exchange") {
    val p = plan("q_sim_topk_batch")
    assert(p.contains("BroadcastNestedLoopJoin"), "query set not broadcast:\n" + p)
    // WindowGroupLimit must appear PARTIAL (before the exchange — each map
    // partition forwards <= k rows per query) and FINAL: two nodes, each
    // printed twice in formatted mode
    assert("WindowGroupLimit".r.findAllIn(p).size / 2 >= 2,
      "rank limit not pushed below the exchange — the scored corpus would shuffle into |queries| reducers:\n" + p)
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1, s"extra corpus exchange:\n$p")
  }

  test("q_sim_topk_pq: compressed-domain serving is one scan — zero exchanges, in-row codes") {
    val p = plan("q_sim_topk_pq")
    assert(p.contains("TakeOrderedAndProject"), p)
    // eight in-row sub-assignments against literal codebooks; the ADC
    // table is a folded literal — nothing shuffles, nothing joins
    assert("nearest_centroid".r.findAllIn(p).size >= PqOps.SubM, p)
    assert(!p.contains("hashpartitioning("), s"PQ serving shuffled the corpus:\n$p")
    assert(!p.contains("Join"), s"PQ serving planned a join:\n$p")
  }

  test("q_pq_stats: in-row assignment+distortion, one partial+final aggregate") {
    val p = plan("q_pq_stats")
    assert(p.contains("squared_l2"), "native distance not in plan:\n" + p)
    assert("HashAggregate".r.findAllIn(p).size / 2 >= 2, "no map-side combine:\n" + p)
    // each sub's 16-centroid argmin is PROJECTED once, not inlined twice
    // (Generate input expressions get no subexpression elimination).
    // Counted on the UNTRUNCATED plan string — FormattedMode elides long
    // expression lines
    val full = SparkEntry.queries("q_pq_stats")(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert("nearest_centroid".r.findAllIn(full).size == PqOps.SubM,
      s"sub-assignments duplicated or missing:\n$full")
    // exchanges: the fixture-scale fanOut round-robin (gated away at real
    // scale) + ONE exchange for the ≤ SubM·PqK-row aggregate — which under
    // the fuseSmall gate is SinglePartition feeding agg AND sort in one
    // stage; no hash exchange may shuffle the scored corpus
    assert("hashpartitioning\\(".r.findAllIn(p).size <= 1,
      s"stats shuffled more than the SubM·PqK-row aggregate:\n$p")
  }

  test("q_downsample_ohlc: pure partial+final aggregation — no window, no ranking sort") {
    val p = plan("q_downsample_ohlc")
    // open/close must combine map-side: two aggregate STAGES (each node
    // prints twice in formatted mode) around one group-key exchange; the
    // flat-buffer argmax keeps the whole candlestick aggregate hash-based
    // (max_by's struct buffer forced a SortAggregate pair — r18)
    assert("partial_arg_max_key".r.findAllIn(p).size == 2,
      "OHLC extrema not map-side combined:\n" + p)
    assert(!p.contains("SortAggregate"),
      "candlestick aggregate fell back to sort aggregation:\n" + p)
    assert(!p.contains("Window"), "window-function ranking instead of argmax:\n" + p)
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1,
      s"OHLC shuffles the corpus more than once:\n$p")
  }

  test("q_downsample_lttb: anchors broadcast back, hash-aggregated typed argmax selection") {
    val p = plan("q_downsample_lttb")
    assert(p.contains("BroadcastHashJoin"), "anchor table not broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "corpus shuffled to join the bucket-average anchors:\n" + p)
    assert(p.contains("partial_arg_max_key"),
      "LTTB selection not map-side combined:\n" + p)
    // the selection is the flat-buffer declarative argmax: the built-in
    // max_by's struct buffer forced a SortAggregate pair, i.e. a full
    // corpus-local sort below the selection exchange (r18)
    assert(!p.contains("SortAggregate"),
      "selection fell back to sort aggregation:\n" + p)
    // the only corpus-scale exchanges are the two aggregates (bucket
    // averages; selection); the anchor window runs on the tiny average
    // table — 3 hash exchanges total, anything more means the corpus
    // started moving for the window or the join
    assert("hashpartitioning\\(".r.findAllIn(p).size <= 3,
      s"unexpected extra exchange:\n$p")
  }
}
