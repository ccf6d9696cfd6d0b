package graft

import graft.ops.{ClusterOps, PqOps}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Product quantization vs an independent plain-Scala replay: the trainer
  * (all eight codebooks), the ADC serving ranks, and the distortion stats
  * are each recomputed with sequential loops that share no Spark
  * expressions with the operators.
  */
class PqOpsSpec extends SparkSuite {

  private val M = PqOps.SubM
  private val SD = PqOps.SubDim
  private val K = PqOps.PqK

  private def ptsDf(rows: Seq[(Long, Seq[Long])]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("q", ArrayType(LongType, containsNull = false))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3), schema)
  }

  /** Independent trainer: sequential Lloyd per subspace over plain Scala
    * collections — seed = vec_id < K ascending, exact integer L2 argmin
    * with lowest-id ties, floor(sum/count) update, empty keeps previous.
    */
  private def referenceTrain(pts: Seq[(Long, Seq[Long])]): Array[Array[Array[Long]]] = {
    val seed = pts.filter(_._1 < K).sortBy(_._1)
    Array.tabulate(M) { m =>
      var cens = seed.map(_._2.slice(m * SD, (m + 1) * SD).toArray).toArray
      val subs = pts.map(_._2.slice(m * SD, (m + 1) * SD).toArray)
      for (_ <- 1 to PqOps.PqIters) {
        val assigned = subs.map { sq =>
          cens.zipWithIndex.map { case (c, i) =>
            (c.zip(sq).map { case (a, b) => (b - a) * (b - a) }.sum, i)
          }.min._2
        }
        cens = cens.zipWithIndex.map { case (old, i) =>
          val mine = subs.zip(assigned).collect { case (sq, a) if a == i => sq }
          if (mine.isEmpty) old
          else Array.tabulate(SD)(d =>
            math.floor(mine.map(_(d)).sum.toDouble / mine.size).toLong)
        }
      }
      cens
    }
  }

  test("trainPqOn: all eight codebooks equal a sequential plain-Scala Lloyd replay") {
    // deterministic synthetic corpus, 40 vectors × 64 dims, three partitions
    val pts = (0L until 40L).map(i =>
      i -> Seq.tabulate(64)(d => ((i * 37 + d * 101) % 211) - 105L))
    val model = PqOps.trainPqOn(ptsDf(pts))
    val expect = referenceTrain(pts)
    assert(model.clusters.toSeq === (0 until K))
    for (m <- 0 until M)
      assert(model.books(m).map(_.toSeq).toSeq === expect(m).map(_.toSeq).toSeq,
        s"subspace $m diverged")
  }

  test("trainPqOn: an empty subspace cluster keeps its seed centroid") {
    // pairwise-identical seeds: every odd cluster ties with its even twin
    // and loses the lowest-id tie-break on all members, staying EMPTY in
    // both iterations — it must keep its (non-zero) seed centroid, not
    // zero out or crash on the missing aggregate rows
    val pts = (0L until 20L).map(i =>
      i -> Seq.tabulate(64)(d => if (i < 16) (i / 2) * 1000L + d else 500000L + d))
    val model = PqOps.trainPqOn(ptsDf(pts))
    val expect = referenceTrain(pts)
    for (m <- 0 until M)
      assert(model.books(m).map(_.toSeq).toSeq === expect(m).map(_.toSeq).toSeq,
        s"subspace $m diverged")
  }

  test("q_pq_train: the registered artifact rows reconstruct exactly the trained model") {
    // the build leg's DataFrame must be a lossless flattening of the
    // memoized PqModel the serving/stats legs consume — same source of
    // truth, no second training
    val model = PqOps.trainedPq(spark, SfDir)
    val rows = PqOps.pqTrain(spark, SfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(rows.size === M * K * SD)
    for {
      m <- 0 until M
      (cid, cen) <- model.clusters.zip(model.books(m))
      d <- 0 until SD
    } assert(rows((m, cid, d)) === cen(d), s"sub=$m cluster=$cid d=$d")
  }

  test("q_sim_topk_pq: fixture ranks equal a brute-force plain-Scala ADC recompute") {
    val model = PqOps.trainedPq(spark, SfDir)
    val pts = ClusterOps.quantizedPoints(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val q = pts.find(_._1 == 0L).get._2
    val adc = pts.filter(_._1 != 0L).map { case (id, v) =>
      val d = (0 until M).map { m =>
        val sq = v.slice(m * SD, (m + 1) * SD)
        val cen = model.books(m)(model.assign(m, sq))
        val qs = q.slice(m * SD, (m + 1) * SD)
        qs.zip(cen).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
      (id, d)
    }.sortBy(t => (t._2, t._1)).take(PqOps.PqTopK).toSeq
    val got = PqOps.simTopKPq(spark, SfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("adc_dist"))).toSeq
    assert(got === adc)
    // compression is real: adc ranking disagrees with at least some exact
    // ordering only through quantization — sanity: distances non-negative
    assert(adc.forall(_._2 >= 0))
  }

  test("q_sim_topk_ivfpq: equals the plain-Scala probe-filter + ADC recompute") {
    val km = graft.ops.ClusterOps.trainedModel(spark, SfDir)
    val model = PqOps.trainedPq(spark, SfDir)
    val pts = ClusterOps.quantizedPoints(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val q = pts.find(_._1 == 0L).get._2
    val probed = km.nearest(q, PqOps.IvfPqProbes).toSet
    val want = pts.filter(_._1 != 0L)
      .map { case (id, v) => (id, km.nearest(v, 1).head, v) }
      .filter { case (_, c, _) => probed.contains(c) }
      .map { case (id, c, v) =>
        val d = (0 until M).map { m =>
          val sq = v.slice(m * SD, (m + 1) * SD)
          val cen = model.books(m)(model.assign(m, sq))
          val qs = q.slice(m * SD, (m + 1) * SD)
          qs.zip(cen).map { case (a, b) => (a - b) * (a - b) }.sum
        }.sum
        (id, c, d)
      }.sortBy(t => (t._3, t._1)).take(PqOps.PqTopK).toSeq
    val got = PqOps.simTopKIvfPq(spark, SfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cluster"),
        r.getAs[Long]("adc_dist"))).toSeq
    assert(got === want)
    // the probe filter bites: the composed result must differ from (be a
    // strict restriction of) the full-corpus ADC corpus unless the probes
    // happen to cover all clusters
    assert(got.forall(t => probed.contains(t._2)))
  }

  test("q_sim_topk_pq_rr: shortlist covers the fixture corpus — re-rank equals the exact top-k") {
    import graft.ops.SimilarityOps
    // RerankC (512) >= corpus size (500): the ADC shortlist passes every
    // candidate through, so the re-ranked result must equal the exact
    // brute-force top-k BIT FOR BIT — the strongest pin on the re-rank
    // tail's cosine, rounding, and (cos desc, vec_id) tie-break. (At
    // corpus > C the arms diverge exactly by ADC shortlist quality —
    // that regime is what q_sim_recall measures at sf0.1.)
    assert(ClusterOps.quantizedPoints(spark, SfDir).count() <= PqOps.RerankC)
    val exact = SimilarityOps.simTopK(spark, SfDir).collect().toSeq
    val got = PqOps.simTopKPqRr(spark, SfDir).collect().toSeq
    assert(got === exact)
  }

  test("q_sim_topk_ivfpq_rr: equals the trained-IVF exact rescore when the shortlist covers the probes") {
    import graft.ops.SimilarityOps
    // Same coverage argument restricted to the probed clusters: with
    // every probed-cluster row in the shortlist, ADC ordering is
    // irrelevant and the composed arm must equal q_sim_topk_ivf_trained
    // (identical trained model, probe count, assignment expression,
    // rescore, and output schema) — pinning the two serving paths to the
    // same semantics with zero shared plan code.
    assert(PqOps.IvfPqProbes === SimilarityOps.IvfTrainedProbes)
    val want = SimilarityOps.simTopKIvfTrained(spark, SfDir).collect().toSeq
    val got = PqOps.simTopKIvfPqRr(spark, SfDir).collect().toSeq
    assert(got === want)
  }

  test("q_pq_stats: populations cover the corpus once per subspace") {
    val n = ClusterOps.quantizedPoints(spark, SfDir).count()
    val got = PqOps.pqStats(spark, SfDir).collect()
    val bySub = got.groupBy(_.getAs[Int]("sub"))
    assert(bySub.keySet === (0 until M).toSet)
    bySub.foreach { case (m, rows) =>
      assert(rows.map(_.getAs[Long]("n")).sum === n, s"subspace $m lost rows")
      rows.foreach(r => assert(r.getAs[Long]("mean_dist") <= r.getAs[Long]("max_dist")))
    }
  }

  test("embedQuantizeOn: SQ8 artifact equals a plain-Scala replay (incl. a constant dim)") {
    // 30 vectors × 5 dims: dim 0 is CONSTANT (span = 0 — the division
    // guard), the rest mix negative and positive grid values so codes
    // span the byte range; three partitions so the combines are real
    val pts = (0L until 30L).map(i => i -> Seq.tabulate(5) {
      case 0 => 7L
      case d => (i * 193 + d * 37) % 1009 - 700L
    })
    val got = PqOps.embedQuantizeOn(ptsDf(pts)).collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    // sequential replay sharing no Spark expressions: nonneg numerators
    // make Scala's truncating / identical to both engines' floor division
    val expect = (0 until 5).map { d =>
      val xs = pts.map(_._2(d))
      val vmin = xs.min
      val span = xs.max - vmin
      val errs = xs.map { x =>
        val code = if (span == 0) 0L else ((x - vmin) * 510 + span) / (2 * span)
        assert(code >= 0 && code <= 255, s"code $code out of byte range")
        math.abs(x - vmin - (2 * code * span + 255) / 510)
      }
      // reconstruction never exceeds half a quantization step (+1 grid
      // unit of dequant rounding) — the bound that makes SQ8 usable
      assert(errs.max <= span / 510 + 1, s"dim $d err ${errs.max} > step/2")
      d -> ((vmin, xs.max, xs.size.toLong, errs.max,
        math.floor(errs.sum.toDouble / errs.size).toLong,
        errs.map(e => e * e).sum))
    }.toMap
    assert(got === expect)
  }
}
