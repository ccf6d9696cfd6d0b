package graft

import graft.ops.SimilarityOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native cosine_sim expression: codegen vs interpreted agreement, null
  * semantics, equivalence with the higher-order-function composition it
  * replaced, and SQL registration via GraftExtensions.
  */
class CosineSimilaritySpec extends SparkSuite {

  private def vecDf(rows: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])]) = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b) => Row(a, b) }, 2), schema)
  }

  test("matches the HOF dot/norm composition bitwise on real embeddings") {
    val emb = Tables.embeddings(spark, SfDir).limit(200)
    val hof =
      expr("""aggregate(zip_with(embedding, embedding2, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
             |/ (sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
             |   * sqrt(aggregate(transform(embedding2, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))""".stripMargin)
    val q = Tables.embeddings(spark, SfDir).filter(col("vec_id") === 0)
      .select(col("embedding").as("embedding2"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        SimilarityOps.cosineSim(col("embedding"), col("embedding2")).as("native"),
        hof.as("hof"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"bitwise: $r")
    }
  }

  test("null semantics: null array, length mismatch, null element, zero norm") {
    val f = (x: Double) => java.lang.Float.valueOf(x.toFloat)
    val df = vecDf(Seq(
      (Seq(f(1), f(2)), Seq(f(1), f(2))),          // ok
      (null, Seq(f(1), f(2))),                     // null array
      (Seq(f(1), f(2)), Seq(f(1))),                // length mismatch
      (Seq(f(1), null), Seq(f(1), f(2))),          // null element
      (Seq(f(0), f(0)), Seq(f(1), f(2)))           // zero norm
    ))
    val out = df.select(SimilarityOps.cosineSim(col("a"), col("b")).as("c")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    (1 to 4).foreach(i => assert(out(i).isNullAt(0), s"row $i should be null"))
  }

  test("codegen and interpreted paths agree") {
    val f = (x: Double) => java.lang.Float.valueOf(x.toFloat)
    val df = vecDf(Seq((Seq(f(0.5), f(-1.5), f(3.25)), Seq(f(2.0), f(0.25), f(-0.75)))))
    val withCodegen = df.select(SimilarityOps.cosineSim(col("a"), col("b"))).head.getDouble(0)
    val expr = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0, ArrayType(FloatType), nullable = true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1, ArrayType(FloatType), nullable = true))
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0.5f, -1.5f, 3.25f)),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(2.0f, 0.25f, -0.75f)))
    val interpreted = expr.eval(row).asInstanceOf[Double]
    assert(java.lang.Double.doubleToLongBits(withCodegen) ==
      java.lang.Double.doubleToLongBits(interpreted))
  }

  test("SQL registration: cosine_sim callable from spark.sql") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      s"""SELECT round(cosine_sim(a.embedding, b.embedding), 4) AS c
         |FROM parquet.`$SfDir/embeddings.parquet` a
         |JOIN parquet.`$SfDir/embeddings.parquet` b ON b.vec_id = 0
         |WHERE a.vec_id = 1""".stripMargin).head.getDouble(0)
    val want = SimilarityOps.cosineSim(col("embedding"), col("q"))
    val emb = Tables.embeddings(spark, SfDir)
    val expected = emb.filter(col("vec_id") === 1)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))))
      .select(round(want, 4).as("c")).head.getDouble(0)
    assert(got == expected)
  }
}
