package graft

import graft.ops.ClusterOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** k-means (ClusterOps) + the native nearest_centroid expression:
  * assignment semantics (argmin, tie-break, null contract), Lloyd
  * convergence on a separable fixture, empty-cluster carry, and exactness
  * of the quantized arithmetic against an independent computation.
  */
class ClusterOpsSpec extends SparkSuite {

  private def ptsDf(rows: Seq[(Long, Seq[Long])]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("q", ArrayType(LongType, containsNull = true))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, q) => Row(id, q) }, 2), schema)
  }

  test("nearest_centroid: argmin, lowest-index tie-break, null contract") {
    val cens = typedlit(Seq(Seq(0L, 0L), Seq(10L, 0L), Seq(0L, 10L)))
    val df = ptsDf(Seq(
      (0L, Seq(1L, 1L)),    // nearest origin -> 0
      (1L, Seq(9L, 1L)),    // nearest (10,0) -> 1
      (2L, Seq(5L, 0L)),    // tie between 0 and 1 (25 vs 25) -> lowest index 0
      (3L, Seq(0L, 11L)),   // nearest (0,10) -> 2
      (4L, null),           // null vector -> null
      (5L, Seq(1L, 2L, 3L)) // length mismatch -> null
    ))
    val out = df.select(col("vec_id"),
        ClusterOps.nearestCentroid(col("q"), cens).as("c"))
      .orderBy("vec_id").collect()
    assert(out(0).getInt(1) == 0)
    assert(out(1).getInt(1) == 1)
    assert(out(2).getInt(1) == 0, "tie must break to the LOWEST index")
    assert(out(3).getInt(1) == 2)
    assert(out(4).isNullAt(1))
    assert(out(5).isNullAt(1))
  }

  test("nearest_centroid: codegen and interpreted paths agree") {
    val q = Seq(3L, -4L, 5L)
    val cs = Seq(Seq(0L, 0L, 0L), Seq(3L, -4L, 5L), Seq(100L, 100L, 100L))
    val viaDf = ptsDf(Seq((0L, q)))
      .select(ClusterOps.nearestCentroid(col("q"), typedlit(cs)))
      .head.getInt(0)
    val interp = graft.functions.NearestCentroid(
      org.apache.spark.sql.catalyst.expressions.Literal.create(q, ArrayType(LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(cs, ArrayType(ArrayType(LongType))))
      .eval(null)
    assert(viaDf == 1 && interp == 1)
  }

  test("nearest_centroid registered in SQL via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT nearest_centroid(array(CAST(1 AS BIGINT), CAST(1 AS BIGINT)), " +
        "array(array(CAST(5 AS BIGINT), CAST(5 AS BIGINT)), array(CAST(0 AS BIGINT), CAST(0 AS BIGINT))))")
      .head.getInt(0)
    assert(r == 1)
  }

  test("kmeans converges on a separable fixture and sizes the clusters") {
    // two tight groups around (0,0) and (1000,1000); seeds vec_id 0,1
    val near0 = (0L to 9L).map(i => (i * 2, Seq(i, -i)))       // even ids
    val near1 = (0L to 9L).map(i => (i * 2 + 1, Seq(1000L + i, 1000L - i)))
    val out = ClusterOps.kmeansOn(spark, ptsDf(near0 ++ near1), k = 2, iters = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 4, "2 clusters x 2 dims")
    val byCluster = out.groupBy(_._1)
    // cluster 0 seeded at (0,0) captures the near0 group, centroid = its mean
    assert(byCluster(0).map(_._4).distinct.toSeq == Seq(10L))
    assert(byCluster(1).map(_._4).distinct.toSeq == Seq(10L))
    val c0 = byCluster(0).sortBy(_._2).map(_._3)
    val c1 = byCluster(1).sortBy(_._2).map(_._3)
    // exact means: sum(0..9)=45 -> floor(45/10)=4; floor(-45/10)=-5
    assert(c0.sameElements(Array(4L, -5L)), s"c0=${c0.mkString(",")}")
    assert(c1.sameElements(Array(1004L, 995L)), s"c1=${c1.mkString(",")}")
  }

  test("empty cluster keeps its seed centroid with size 0") {
    // seed 1 is identical to seed 0, so every distance ties and the
    // lowest-index tie-break drains cluster 1 on the first assignment —
    // the carry path must keep its seed centroid and report size 0
    val tie = ptsDf(Seq(
      (0L, Seq(0L, 0L)),
      (1L, Seq(0L, 0L)),     // seed 1 identical to seed 0: every dist ties -> all go to 0
      (2L, Seq(3L, 4L))))
    // ONE iteration: with identical seeds every distance ties to cluster 0;
    // a second iteration would re-separate on the updated centroids
    val out = ClusterOps.kmeansOn(spark, tie, k = 2, iters = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val c1 = out.filter(_._1 == 1)
    assert(c1.forall(_._4 == 0L), "cluster 1 must be empty (tie-break sends all to 0)")
    assert(c1.sortBy(_._2).map(_._3).sameElements(Array(0L, 0L)),
      "empty cluster must carry its seed centroid")
    val c0 = out.filter(_._1 == 0)
    assert(c0.forall(_._4 == 3L))
    assert(c0.sortBy(_._2).map(_._3).sameElements(Array(1L, 1L)),
      "floor mean of {0,0,3}/{0,0,4} is 1/1")
  }

  test("kmeans on the fixture: balanced non-trivial clustering, exact quantization") {
    val out = SparkEntry.queries("q_kmeans")(spark, SfDir).collect()
    assert(out.length == ClusterOps.K * 64)
    val sizes = out.map(r => (r.getInt(0), r.getLong(3))).distinct.toMap
    assert(sizes.values.sum == Tables.embeddings(spark, SfDir)
      .filter(!exists(col("embedding"), x => isnan(x))).count())
    assert(sizes.values.count(_ > 0) >= 2, "clustering degenerated to one cluster")
    // quantization formula spot-check against an independent computation
    val (vid, emb) = Tables.embeddings(spark, SfDir).filter(col("vec_id") === 3)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])](
        org.apache.spark.sql.Encoders.product[(Long, Seq[Float])]).head()
    val q = ClusterOps.quantizedPoints(spark, SfDir)
      .filter(col("vec_id") === vid).select("q").head.getSeq[Long](0)
    emb.zip(q).foreach { case (f, l) =>
      assert(math.floor(f.toDouble * ClusterOps.Scale + 0.5).toLong == l)
    }
  }
  test("cluster stats: populations match kmeans sizes; dispersion internally consistent") {
    val stats = graft.ops.ClusterOps.clusterStats(spark, SfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stats.nonEmpty)
    stats.foreach { case (c, n, mean, mx) =>
      assert(n > 0 && mean >= 0 && mean <= mx, s"cluster $c: n=$n mean=$mean max=$mx")
    }
    // q_kmeans.size is the LAST TRAINING assignment (the one that produced
    // the final centroids); cluster_stats re-assigns under those final
    // centroids — one Lloyd step later, so per-cluster populations may
    // differ, but both partitions cover the identical corpus
    val kmSizes = SparkEntry.queries("q_kmeans")(spark, SfDir).collect()
      .map(r => (r.getInt(0), r.getLong(3))).distinct.toMap
    assert(stats.map(_._2).sum == kmSizes.values.sum,
      "cluster_stats and q_kmeans cover different corpora")
    // spot-check one point: its assigned-centroid distance bounded by max_dist
    val model = ClusterOps.trainedModel(spark, SfDir)
    val q = ClusterOps.quantizedPoints(spark, SfDir)
      .filter(col("vec_id") === 17).select("q").head.getSeq[Long](0).toArray
    val cid = model.nearest(q, 1).head
    val cen = model.cens(model.clusters.indexOf(cid))
    val d = q.zip(cen).map { case (a, b) => (a - b) * (a - b) }.sum
    val mx = stats.find(_._1 == cid).get._4
    assert(d <= mx, s"point dist $d exceeds cluster $cid max $mx")
  }

  test("trained IVF: exact rescore within probed clusters, consistent with the model") {
    val ivf = graft.ops.SimilarityOps.simTopKIvfTrained(spark, SfDir, k = 10, nProbe = 2).collect()
    assert(ivf.nonEmpty)
    // probed clusters cover at most nProbe distinct ids
    assert(ivf.map(_.getAs[Int]("cluster")).distinct.length <= 2)
    // exact scoring: any hit also in the brute-force top-10 carries the
    // identical rounded cosine
    val all = graft.ops.SimilarityOps.simTopK(spark, SfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toMap
    ivf.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      all.get(id).foreach(s => assert(s == r.getAs[Double]("cos_sim"), s"vec $id"))
    }
    val sims = ivf.map(_.getAs[Double]("cos_sim"))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
    // the reported cluster of every hit is the model's own nearest centroid
    val model = ClusterOps.trainOn(
      ClusterOps.quantizedPoints(spark, SfDir), ClusterOps.K, ClusterOps.Iters)
    val qByVec = ClusterOps.quantizedPoints(spark, SfDir)
      .filter(col("vec_id").isin(ivf.map(r => Long.box(r.getLong(0))): _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    ivf.foreach { r =>
      assert(model.nearest(qByVec(r.getLong(0)), 1).head == r.getAs[Int]("cluster"),
        s"vec ${r.getLong(0)} cluster mismatch vs driver-side model")
    }
  }

  test("q_dedup_semantic: matches a driver-side brute-force keep-first recompute") {
    val got = ClusterOps.semanticDedup(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("cluster"),
        r.getLong(2), r.getDouble(3)))
    // independent recompute: same model via the driver-side nearest()
    // twin, plain-Scala pairwise scan per cluster
    val model = ClusterOps.trainOn(
      ClusterOps.quantizedPoints(spark, SfDir), ClusterOps.K, ClusterOps.Iters)
    val pts = ClusterOps.quantizedPoints(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    val byCluster = pts.groupBy { case (_, q) => model.nearest(q, 1).head }
    val expect = byCluster.toSeq.flatMap { case (cid, vs) =>
      val arr = vs.map { case (id, q) =>
        val v = q.map(_.toDouble)
        (id, v, math.sqrt(v.map(x => x * x).sum))
      }.sortBy(_._1)
      arr.indices.flatMap { b =>
        (0 until b).iterator.map { a =>
          val dot = arr(a)._2.zip(arr(b)._2).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
          (a, dot / (arr(a)._3 * arr(b)._3))
        }.find(_._2 >= ClusterOps.SemanticThreshold).map { case (a, cos) =>
          (arr(b)._1, cid, arr(a)._1,
            math.floor(cos * 10000.0 + 0.5) / 10000.0)
        }
      }
    }.sortBy(_._1)
    assert(got.length == expect.length,
      s"prune-list size ${got.length} vs brute-force ${expect.length}")
    assert(got.sortBy(_._1).toSeq == expect, "prune list diverged from brute force")
    // keep-first invariant: no surviving pair in one cluster is similar
    val pruned = got.map(_._1).toSet
    byCluster.foreach { case (_, vs) =>
      val survivors = vs.filterNot { case (id, _) => pruned.contains(id) }
        .map { case (id, q) =>
          val v = q.map(_.toDouble)
          (id, v, math.sqrt(v.map(x => x * x).sum))
        }
      for (i <- survivors.indices; j <- 0 until i) {
        val dot = survivors(i)._2.zip(survivors(j)._2)
          .foldLeft(0.0) { case (s, (x, y)) => s + x * y }
        assert(dot / (survivors(i)._3 * survivors(j)._3) < ClusterOps.SemanticThreshold,
          s"survivors ${survivors(j)._1} and ${survivors(i)._1} are still near-dups")
      }
    }
  }
}
