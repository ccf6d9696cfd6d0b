package graft

import graft.ops.CurationOps
import org.apache.spark.sql.functions._

/** Invariants of the training-mix curation ops beyond the oracle hash:
  * determinism, rate semantics, and greedy-budget maximality.
  */
class CurationOpsSpec extends SparkSuite {

  test("q_sample_stratified: deterministic, rate-1000 keeps everything, rates bound strata") {
    val a = CurationOps.sampleStratified(spark, SfDir).collect()
    val b = CurationOps.sampleStratified(spark, SfDir).collect()
    assert(a.toSeq == b.toSeq, "content-hash sampling must be run-deterministic")

    val docs = Tables.documents(spark, SfDir)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = CurationOps.sampleStratified(spark, SfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate 1000/1000 = keep all

    assert(kept("es") == totals("es"), s"es rate is 1000 per-mille: $kept vs $totals")
    // lower-rate strata keep strictly less than everything (statistically
    // safe at fixture size: P[all 120+ docs land under 250/1000] ~ 0)
    assert(kept("en") < totals("en"), s"en stratum not subsampled: $kept vs $totals")
  }

  test("q_token_budget: per-language budget respected and greedily maximal") {
    val sel = CurationOps.tokenBudget(spark, SfDir)
    val perLang = sel.groupBy("lang")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"), max("cum_tokens").as("cum"))
      .collect()
    assert(perLang.nonEmpty)
    perLang.foreach { r =>
      assert(r.getAs[Long]("t") <= CurationOps.TokensPerLang,
        s"budget exceeded for ${r.getAs[String]("lang")}")
      assert(r.getAs[Long]("t") == r.getAs[Long]("cum"),
        "cum_tokens of the last kept doc must equal the kept total")
    }
    // prefix property: the kept docs of each language are exactly the top
    // of the (quality DESC, doc_id) ranking — the budget cut never skips a
    // higher-ranked doc to admit a lower-ranked one
    import org.apache.spark.sql.expressions.Window
    val keptIds = sel.select("doc_id").collect().map(_.getLong(0)).toSet
    val keptPerLang = sel.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rankW = Window.partitionBy(col("lang")).orderBy(col("quality").desc, col("doc_id"))
    val ranked = graft.ops.TextOps.qualityScore(spark, SfDir)
      .withColumn("rank", row_number().over(rankW))
      .select(col("doc_id"), col("lang"), col("rank"))
      .collect()
    ranked.foreach { r =>
      val expectKept = r.getAs[Int]("rank") <= keptPerLang.getOrElse(r.getAs[String]("lang"), 0L)
      assert(keptIds.contains(r.getAs[Long]("doc_id")) == expectKept,
        s"budget cut is not a rank prefix at doc ${r.getAs[Long]("doc_id")}")
    }
  }

  private def docs(rows: (Long, String, String)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .repartition(3) // placement must not depend on physical layout
  }

  test("q_pack_sequences: two-phase placement equals the sequential scan, across bucket seams") {
    // doc_ids straddle the 4096 bucket boundary AND arrive unordered, so
    // the per-bucket cumsum + bucket-offset join must reconstruct the
    // exact global sequential layout
    val d = docs(
      (4098L, "a b c", "s1"),          // 3 tokens
      (1L, ("x " * 1500).trim, "s1"),  // 1500
      (4095L, ("y " * 600).trim, "s1"),// 600
      (7L, ("z " * 500).trim, "s1"),   // 500
      (4100L, "one two", "s1"),        // 2
      (9000L, ("w " * 50).trim, "s1")) // 50
    val got = graft.ops.CurationOps.packSequencesOn(d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // independent sequential recompute (plain Scala, doc_id order)
    val expect = {
      var cum = 0L
      Seq((1L, 1500L), (7L, 500L), (4095L, 600L), (4098L, 3L), (4100L, 2L), (9000L, 50L))
        .map { case (id, n) =>
          val start = cum
          cum += n
          val ctx = graft.ops.CurationOps.PackCtxLen
          (id, n, start, start / ctx, start % ctx, (start + n - 1) / ctx > start / ctx)
        }
    }
    assert(got.toSeq == expect, s"got ${got.toSeq}\nexpect $expect")
    // sanity of the fixture: the 1500+500 run crosses the 2048 boundary
    assert(expect.exists(_._6), "fixture never spans a window boundary")
  }

  test("q_pack_sequences: windows partition the token stream exactly") {
    val out = graft.ops.CurationOps.packSequences(spark, SfDir).collect()
    val total = out.map(_.getLong(1)).sum
    // consecutive starts tile the stream with no gap or overlap
    val sorted = out.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) + a.getLong(1) == b.getLong(2),
          s"gap/overlap between docs ${a.getLong(0)} and ${b.getLong(0)}")
      case _ => ()
    }
    assert(sorted.head.getLong(2) == 0L)
    assert(sorted.last.getLong(2) + sorted.last.getLong(1) == total)
  }

  test("pack_sequences tokenizer-true arm: packing under the trained BPE counts") {
    // the pluggable token column lets the packer lay the corpus out in
    // TRAINED-tokenizer units; placement must equal the sequential scan
    // over q_bpe_apply's per-doc counts
    val merges = graft.ops.TextOps.trainedMerges(spark, SfDir)
    val bpeCol = graft.ops.TextOps.bpeCountCol(
      graft.ops.TextOps.bpeEncodeCol(col("text"), merges))
    val got = graft.ops.CurationOps.packSequencesOn(
        Tables.documents(spark, SfDir), bpeCol)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val counts = graft.ops.TextOps.bpeApply(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    var cum = 0L
    val expect = counts.map { case (id, n) => val s = cum; cum += n; (id, n, s) }
    assert(got.toSeq == expect.toSeq)
  }

  test("token_budget tokenizer-true arm: budgeting under the trained BPE counts") {
    // the pluggable token column budgets in TRAINED-tokenizer units; the
    // cut must equal the greedy scan over q_bpe_apply's per-doc counts
    // with the same (quality DESC, doc_id) ranking
    val merges = graft.ops.TextOps.trainedMerges(spark, SfDir)
    val bpeCol = graft.ops.TextOps.bpeCountCol(
      graft.ops.TextOps.bpeEncodeCol(col("text"), merges))
    val got = graft.ops.CurationOps.tokenBudgetOn(
        Tables.documents(spark, SfDir), Some(bpeCol))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
    val bpeCount = graft.ops.TextOps.bpeApply(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    val ranked = graft.ops.TextOps.qualityScore(spark, SfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Double]("quality")))
      .groupBy(_._2)
    // greedy running-sum semantics replicated exactly: the window filter
    // keeps rows while the (monotone) running total stays within budget
    val expect = ranked.toSeq.flatMap { case (lang, ds) =>
      var cum = 0L
      ds.sortBy(d => (-d._3, d._1)).toSeq.flatMap { case (id, _, _) =>
        val n = bpeCount(id)
        cum += n
        if (cum <= graft.ops.CurationOps.TokensPerLang) Some((id, lang, n, cum)) else None
      }
    }.toSet
    assert(got.toSet === expect)
  }

  test("q_contam_coverage: verbatim eval copy is fully contaminated, disjoint doc is clean") {
    val evalText = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(
      (0L, evalText, graft.ops.CurationOps.EvalSource),
      (1L, evalText, "s1"),                       // identical -> coverage 1.0
      (2L, "completely different words here with zero gram overlap QQQQ", "s1"),
      (3L, "tiny", "s1"),                         // < 8 chars: no grams at all
      (4L, "the quick brown fox PLUS unrelated tail material beyond", "s1")) // partial
    val got = graft.ops.CurationOps.contamCoverageOn(d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))).toMap
    assert(!got.contains(0L), "eval docs must not be scored")
    assert(got(1L)._3 == 1.0 && got(1L)._4 == "contaminated", got(1L).toString)
    assert(got(2L)._2 == 0L && got(2L)._3 == 0.0 && got(2L)._4 == "clean", got(2L).toString)
    assert(got(3L) == ((0L, 0L, 0.0, "clean")), got(3L).toString)
    val (ng4, ns4, cov4, v4) = got(4L)
    assert(ns4 > 0 && ns4 < ng4 && cov4 > 0.0 && cov4 < 1.0, got(4L).toString)
    assert(v4 == (if (cov4 < 0.1) "trace" else "contaminated"))
  }

  test("q_contam_coverage: fixture-wide internal consistency with q_decontaminate") {
    val cov = graft.ops.CurationOps.contamCoverage(spark, SfDir).collect()
    val trainDocs = Tables.documents(spark, SfDir)
      .filter(col("source") =!= graft.ops.CurationOps.EvalSource).count()
    assert(cov.length == trainDocs, "coverage must score EVERY training doc")
    cov.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"shared > total at doc ${r.getLong(0)}")
      assert((r.getDouble(3) == 0.0) == (r.getLong(2) == 0L))
    }
    // the docs decontaminate flags are exactly the docs with coverage > 0
    val flagged = graft.ops.CurationOps.decontaminate(spark, SfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nonzero = cov.filter(_.getDouble(3) > 0.0).map(_.getLong(0)).toSet
    assert(flagged == nonzero, "coverage>0 set diverged from decontaminate's flag set")
  }
}
