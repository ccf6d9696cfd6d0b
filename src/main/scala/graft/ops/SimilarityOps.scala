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

  /** Σ aᵢbᵢ over two float arrays, accumulated in double, left-to-right —
    * structurally identical to the DuckDB oracle's list_dot_product so the
    * IEEE results agree bit-for-bit.
    */
  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  private def norm(a: String): Column =
    sqrt(expr(s"aggregate(transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))

  /** Exact top-10 cosine neighbors of vec_id 0. */
  def simTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    emb
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(query))
      .withColumn("cos_sim", round(dot("embedding", "q") / (norm("embedding") * norm("q")), 4))
      .select(col("vec_id"), col("label"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** SimHash-bucketed ANN variant: 16 fixed random hyperplanes (deterministic
    * seed via per-dimension hash), bucket = sign-bit string; candidates =
    * same-bucket vectors, ranked exactly within the bucket. At 100 TB the
    * bucket join replaces the full scan with ~N/2^16 of the corpus.
    */
  def simTopKLsh(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // plane p weight for dim d = a fixed hash in [-1, 1]: deterministic, no RNG.
    val bucketExpr =
      """aggregate(sequence(0, 15), '', (acc, p) ->
        |  concat(acc, CASE WHEN aggregate(
        |    zip_with(embedding, transform(sequence(0, 63), d ->
        |      CAST(hash(p, d) AS DOUBLE) / 2147483647.0D),
        |    (x, w) -> CAST(x AS DOUBLE) * w),
        |    CAST(0.0 AS DOUBLE), (a2, v) -> a2 + v) >= 0 THEN '1' ELSE '0' END))""".stripMargin
    val bucketed = emb.withColumn("bucket", expr(bucketExpr))
    val queryB = bucketed.filter(col("vec_id") === 0)
      .select(col("bucket").as("qbucket"), col("embedding").as("q"))
    bucketed
      .filter(col("vec_id") =!= 0)
      .join(broadcast(queryB), col("bucket") === col("qbucket"))
      .withColumn("cos_sim", round(dot("embedding", "q") / (norm("embedding") * norm("q")), 4))
      .select(col("vec_id"), col("label"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  val oracles: Map[String, String] = Map(
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
