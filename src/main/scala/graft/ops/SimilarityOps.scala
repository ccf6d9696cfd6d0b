package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2E similarity search over the `embeddings` table (Array[Float], 64-dim).
  *
  * `simTopK` is the exact brute-force baseline: broadcast the 1-row query
  * vector, compute cosine via higher-order array functions (codegen'd — no
  * UDF), then orderBy+limit which Spark plans as TakeOrderedAndProject
  * (per-partition top-k heap + driver merge of k×partitions rows — never a
  * global sort). At 100 TB that is: one scan, zero shuffles, k rows moved.
  *
  * `simTopKLsh` is the scale path: random-hyperplane (SimHash) bucketing —
  * probe only the query's bucket ring instead of the full corpus. Kept out
  * of the oracle registry (approximate recall); its invariants are covered
  * by ScalaTest instead.
  */
object SimilarityOps {

  /** Fused single-pass cosine similarity — a native codegen'd Catalyst
    * expression (graft.functions.CosineSimilarity): dot product and both
    * norms accumulate in one primitive loop, left-to-right in double,
    * structurally identical to the DuckDB oracle's list_dot_product
    * composition so the IEEE results agree bit-for-bit.
    */
  def cosineSim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(graft.functions.CosineSimilarity(
      graftbridge.expression(a), graftbridge.expression(b)))
  }

  /** Exact top-10 cosine neighbors of vec_id 0. */
  def simTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    emb
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(query))
      .withColumn("cos_sim", round(cosineSim(col("embedding"), col("q")), 4))
      .select(col("vec_id"), col("label"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  private val LshPlanes = 8
  private val LshDims = 64

  /** Hyperplane weights: MurmurHash3-derived, fixed at class load —
    * deterministic across runs and partitions, no RNG state.
    */
  private lazy val lshWeights: Array[Array[Double]] =
    Array.tabulate(LshPlanes, LshDims) { (p, d) =>
      scala.util.hashing.MurmurHash3.productHash((p, d)).toDouble / Int.MaxValue
    }

  /** 16-bit sign bucket of a vector — compiled loop over the broadcast-safe
    * weight table (the interpreted HOF formulation re-built the 16×64 weight
    * arrays per row with boxed lambdas; this is a plain JVM loop).
    */
  private val lshBucketUdf = udf { (e: Seq[Float]) =>
    var bucket = 0
    var p = 0
    while (p < LshPlanes) {
      val w = lshWeights(p)
      var acc = 0.0
      var d = 0
      val n = math.min(e.length, LshDims)
      while (d < n) { acc += e(d).toDouble * w(d); d += 1 }
      if (acc >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** Multi-probe SimHash-bucketed ANN variant: 8 fixed hash-derived
    * hyperplanes, bucket = 8 sign bits; the query probes its own bucket plus
    * every bucket at hamming distance 1 (9 probes of 256 buckets ≈ 3.5% of
    * the corpus). Candidates are ranked exactly by the native cosine
    * expression. At 100 TB the probe list is a broadcast handful of bucket
    * ids and the bucket equi-join replaces the full scan — candidate volume
    * scales as N × probes / 2^planes.
    */
  def simTopKLsh(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val bucketed = emb.withColumn("bucket", lshBucketUdf(col("embedding")))
    val probes = bucketed.filter(col("vec_id") === 0)
      .select(col("bucket"), col("embedding").as("q"))
      .select(explode(expr(
        s"transform(sequence(0, $LshPlanes), i -> CASE WHEN i = 0 THEN bucket ELSE int(bucket) ^ shiftleft(1, i - 1) END)"
      )).as("probe"), col("q"))
    bucketed
      .filter(col("vec_id") =!= 0)
      .join(broadcast(probes), col("bucket") === col("probe"))
      .withColumn("cos_sim", round(cosineSim(col("embedding"), col("q")), 4))
      .select(col("vec_id"), col("label"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-bucketed ANN variant: coarse quantizer = per-label centroids (one
    * cheap aggregate pass — in a real corpus the coarse pass is a k-means
    * lite; here labels are the precomputed coarse assignment), probe =
    * nProbe nearest centroids to the query, candidates = their posting
    * lists, ranked exactly by the native cosine expression. At 100 TB:
    * centroids are a broadcast handful of rows, posting lists are
    * partitioned by the same label key they were written with (no shuffle
    * of the corpus), candidate volume ≈ N × nProbe / nLists.
    */
  def simTopKIvf(s: SparkSession, dir: String, k: Int = 10, nProbe: Int = 2): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val centroids = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("label"), col("d"))
      .agg(avg(col("x")).as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(d, c))), s -> CAST(s.c AS FLOAT))")
        .as("centroid"))
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q"))
    val probed = centroids.crossJoin(broadcast(query))
      .withColumn("c_sim", cosineSim(col("centroid"), col("q")))
      .orderBy(col("c_sim").desc, col("label"))
      .limit(nProbe)
      .select(col("label"), col("q"))
    emb
      .filter(col("vec_id") =!= 0)
      .join(broadcast(probed), "label")
      .withColumn("cos_sim", round(cosineSim(col("embedding"), col("q")), 4))
      .select(col("vec_id"), col("label"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Threshold for embedding near-dup pairs. 0.4 yields a non-trivial pair
    * set on the synthetic embeddings (max in-label cosine ≈ 0.47); real
    * dedup corpora would run ~0.95 — a constant, not a plan change.
    */
  val EmbedCosineThreshold = 0.4

  /** Embedding-cosine near-duplicate pairs, blocked on `label` (the corpus's
    * coarse partition key — e.g. a cluster id from a cheap pre-pass). At
    * 100 TB each block scores against itself only, blocks are shuffled once
    * by the blocking key, never all-pairs across the corpus.
    *
    * The block-local quadratic loop runs as `flatMapGroups` over primitive
    * double arrays — one shuffle of the raw vectors, then pure JVM
    * arithmetic. The SQL-join + UDF alternative re-evaluates the dot UDF
    * per projection/filter copy and pays Seq[Float] boxing per call; this
    * path computes each norm once per vector and each dot once per pair,
    * accumulating left-to-right in double exactly like DuckDB's
    * list_dot_product, so oracle results agree bitwise.
    */
  def dedupEmbed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val thr = EmbedCosineThreshold
    Tables.embeddings(s, dir)
      .select(col("label"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (label: Int, rows: Iterator[(Int, Long, Array[Float])]) =>
        val vs = rows.map { case (_, id, e) =>
          val v = new Array[Double](e.length)
          var i = 0
          while (i < e.length) { v(i) = e(i).toDouble; i += 1 }
          var acc = 0.0
          i = 0
          while (i < v.length) { acc += v(i) * v(i); i += 1 }
          (id, v, math.sqrt(acc))
        }.toArray.sortBy(_._1)
        for {
          a <- vs.indices.iterator
          b <- (a + 1 until vs.length).iterator
          dot = {
            val (va, vb) = (vs(a)._2, vs(b)._2)
            var acc = 0.0
            var i = 0
            val n = math.min(va.length, vb.length)
            while (i < n) { acc += va(i) * vb(i); i += 1 }
            acc
          }
          cos = dot / (vs(a)._3 * vs(b)._3)
          if cos >= thr
        } yield (vs(a)._1, vs(b)._1, label,
          BigDecimal(cos).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF("i", "j", "label", "cos_sim")
      .orderBy(col("i"), col("j"))
  }

  val oracles: Map[String, String] = Map(
    "q_dedup_embed" ->
      s"""WITH n AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings)
         |SELECT a.vec_id AS i, b.vec_id AS j, a.label AS label,
         |       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cos_sim
         |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $EmbedCosineThreshold
         |ORDER BY i, j""".stripMargin,
    "q_sim_topk" ->
      """WITH q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  round(list_dot_product(CAST(embedding AS DOUBLE[]), qe)
        |    / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
        |       * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin
  )
}
