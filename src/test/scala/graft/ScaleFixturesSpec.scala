package graft

import org.apache.spark.sql.functions._

/** The scale-fixture embedding perturbation (round 17): replicated copies
  * must be deterministic near-neighbors of their originals — close enough
  * that every operator threshold keeps its planted structure, far enough
  * that ANN recall at scale measures generalization instead of
  * verbatim-duplicate lookup (the r16 verdict's fixture caveat).
  */
class ScaleFixturesSpec extends SparkSuite {

  private def base = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, -2.0f, 0.5f, 4.0f)),
      (1L, Array(0.0f, Float.NaN, 3.0f, -1.0f)),
      (2L, Array(2.0f, 2.0f, 2.0f, 2.0f))
    ).toDF("vec_id", "embedding")
  }

  // NaN-tolerant value identity: compare canonical float bits
  private def bits(m: Map[Long, Seq[Float]]): Map[Long, Seq[Int]] =
    m.map { case (k, vs) => k -> vs.map(java.lang.Float.floatToIntBits) }

  test("perturbation: k=0 is identity; k>0 is deterministic, bounded, NaN-preserving") {
    val id = base.select(col("vec_id"), ScaleFixtures.perturbedVector(0).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val orig = base.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(bits(id) === bits(orig), "identity copy must be byte-identical")

    def copy1 = base.select(col("vec_id"), ScaleFixtures.perturbedVector(1).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val a = copy1
    assert(bits(a) === bits(copy1), "perturbation must be deterministic across evaluations")

    val c2 = base.select(col("vec_id"), ScaleFixtures.perturbedVector(2).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(bits(a)(0L) !== bits(c2)(0L), "different copies must perturb differently")

    // elementwise relative bound: |x' - x| <= eps * |x| (+ float rounding),
    // zeros stay zero, NaN stays NaN
    for ((vid, vs) <- a; (x, i) <- orig(vid).zipWithIndex) {
      val y = vs(i)
      if (x.isNaN) assert(y.isNaN, s"NaN sentinel lost at vec $vid dim $i")
      else if (x == 0.0f) assert(y == 0.0f)
      else {
        assert((y != x) || math.abs(x) < 1e-6f,
          s"vec $vid dim $i unperturbed") // u=0 has probability 1/2001
        assert(math.abs(y - x) <= ScaleFixtures.PerturbEps * math.abs(x) * 1.0001,
          s"vec $vid dim $i moved more than eps: $x -> $y")
      }
    }

    // cosine to the original stays far above every operator threshold:
    // worst case |u|=1 on every dim gives cos >= (1-eps)/(1+eps) ~ 0.82
    val n = orig(2L).zip(a(2L)).map { case (x, y) => x.toDouble * y }.sum /
      (math.sqrt(orig(2L).map(x => x.toDouble * x).sum) *
        math.sqrt(a(2L).map(x => x.toDouble * x).sum))
    assert(n > 0.8 && n < 1.0, s"copy should be a near-neighbor, cos=$n")
  }
}
