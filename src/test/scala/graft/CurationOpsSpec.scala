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
}
