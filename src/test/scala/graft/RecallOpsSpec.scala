package graft

import graft.ops.{PqOps, RecallOps, SimilarityOps}

/** The multi-query recall audit vs the outputs of its own batched arms,
  * plus the structural guarantees the audit's meaning rests on: per-query
  * candidate caps, consistency of each batched twin with its registered
  * single-query arm at qid 0, and re-rank dominance.
  */
class RecallOpsSpec extends SparkSuite {

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSeq

  private def arms = Seq(
    "ivf" -> RecallOps.ivfBatch(spark, SfDir),
    "ivf_p4" -> RecallOps.ivfBatch(spark, SfDir, SimilarityOps.IvfWideProbes),
    "ivf_trained" -> RecallOps.ivfTrainedBatch(spark, SfDir),
    "ivfpq" -> RecallOps.ivfPqBatch(spark, SfDir),
    "ivfpq_rr" -> RecallOps.ivfPqRrBatch(spark, SfDir),
    "lsh" -> RecallOps.lshBatch(spark, SfDir),
    "lsh_r2" -> RecallOps.lshBatch(spark, SfDir, radius = 2),
    "pq" -> RecallOps.pqBatch(spark, SfDir),
    "pq_rr" -> RecallOps.pqRrBatch(spark, SfDir))

  test("q_sim_recall: per-arm hits equal the intersections of each batched arm's own output") {
    val exact = pairs(SimilarityOps.simTopKBatch(spark, SfDir)
      .select("qid", "vec_id")).toSet
    // non-degenerate audit: full exact top-k for every batch query
    assert(exact.size === RecallOps.RecallK * RecallOps.NQ)
    val want = arms.map { case (n, df) =>
      val cand = pairs(df)
      assert(cand.distinct.size === cand.size, s"$n emitted duplicate candidates")
      cand.groupBy(_._1).values.foreach(g =>
        assert(g.size <= RecallOps.RecallK, s"$n emitted more than k for one query"))
      val hits = cand.count(exact)
      (n, RecallOps.RecallK, RecallOps.NQ.toLong, hits.toLong,
        exact.size.toLong, hits.toDouble / exact.size)
    }
    val got = RecallOps.simRecall(spark, SfDir).collect()
      .map(r => (r.getAs[String]("arm"), r.getAs[Int]("k"),
        r.getAs[Long]("queries"), r.getAs[Long]("hits"),
        r.getAs[Long]("denom"), r.getAs[Double]("recall"))).toSeq
    assert(got === want)
  }

  test("batched twins restrict to the registered single-query arms at qid 0") {
    // the audit's qid-0 slice and the registered arm must return the SAME
    // candidate set — the batched generalizations cannot drift from the
    // operators they claim to audit
    def q0(df: org.apache.spark.sql.DataFrame): Set[Long] =
      pairs(df).collect { case (0L, v) => v }.toSet
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getAs[Long]("vec_id")).toSet
    val singles = Map(
      "ivf" -> SimilarityOps.simTopKIvf(spark, SfDir),
      "ivf_p4" -> SimilarityOps.simTopKIvf(spark, SfDir,
        nProbe = SimilarityOps.IvfWideProbes),
      "ivf_trained" -> SimilarityOps.simTopKIvfTrained(spark, SfDir),
      "ivfpq" -> PqOps.simTopKIvfPq(spark, SfDir),
      "ivfpq_rr" -> PqOps.simTopKIvfPqRr(spark, SfDir),
      "lsh" -> SimilarityOps.simTopKLsh(spark, SfDir),
      "lsh_r2" -> SimilarityOps.simTopKLsh(spark, SfDir, radius = 2),
      "pq" -> PqOps.simTopKPq(spark, SfDir),
      "pq_rr" -> PqOps.simTopKPqRr(spark, SfDir))
    arms.foreach { case (n, df) =>
      assert(q0(df) === ids(singles(n)), s"batched $n drifted from the registered arm at qid 0")
    }
  }

  test("re-rank dominance: every exact hit of a compressed arm survives its _rr twin") {
    // provable, not just empirical: an exact-top-k member in the ADC
    // shortlist can be displaced from the re-ranked top-k only by vectors
    // with strictly better (cos, vec_id) — of which there are < k by
    // definition of the exact top-k. So hits(arm) ⊆ hits(arm_rr) per qid.
    val exact = pairs(SimilarityOps.simTopKBatch(spark, SfDir)
      .select("qid", "vec_id")).toSet
    val byName = arms.toMap
    for ((base, rr) <- Seq("pq" -> "pq_rr", "ivfpq" -> "ivfpq_rr")) {
      val baseHits = pairs(byName(base)).filter(exact).toSet
      val rrHits = pairs(byName(rr)).filter(exact).toSet
      assert(baseHits.subsetOf(rrHits), s"$rr lost exact hits that $base had")
    }
  }
}
