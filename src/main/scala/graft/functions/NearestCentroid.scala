package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: index of the nearest centroid (squared-L2,
  * ties to the LOWEST index) for a quantized integer vector against an
  * in-row centroid matrix.
  *
  * This is the assignment step of distributed Lloyd's k-means expressed as
  * a pure per-row projection: the centroid matrix rides in as a broadcast
  * 1-row cross join, so assigning the whole corpus needs ZERO shuffle —
  * the scalable alternative to the cross-join + per-point argmin
  * aggregation, which reshuffles the full corpus once per iteration. The
  * generated code is two nested primitive loops over `ArrayData` (no
  * allocation, whole-stage codegen), the same shape MLlib's KMeans uses
  * inside `mapPartitions` but declarative and Catalyst-visible.
  *
  * All arithmetic is exact Long (quantized inputs |v| ≤ ~10^6, 64 dims →
  * distances ≤ ~2.6·10^14 « 2^63, and « 2^53 so the DuckDB oracle's
  * double-domain dot products are IEEE-exact on the same integers).
  *
  * Null semantics: null if either input is null, the matrix is empty, any
  * element is null, or any centroid's length differs from the point's.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid requires (array<bigint>, array<array<bigint>>), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val n = q.numElements()
    val k = cs.numElements()
    if (k == 0) return null
    var best = -1
    var bestDist = Long.MaxValue
    var j = 0
    while (j < k) {
      if (cs.isNullAt(j)) return null
      val c = cs.getArray(j)
      if (c.numElements() != n) return null
      var dist = 0L
      var i = 0
      while (i < n) {
        if (q.isNullAt(i) || c.isNullAt(i)) return null
        val d = q.getLong(i) - c.getLong(i)
        dist += d * d
        i += 1
      }
      if (dist < bestDist) { bestDist = dist; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      s"""
         |int $n = $a.numElements();
         |int $k = $b.numElements();
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = -1;
         |  long $bestDist = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $k && !${ev.isNull}; $j++) {
         |    if ($b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    org.apache.spark.sql.catalyst.util.ArrayData $c = $b.getArray($j);
         |    if ($c.numElements() != $n) { ${ev.isNull} = true; break; }
         |    long $dist = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if ($a.isNullAt($i) || $c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      long $d = $a.getLong($i) - $c.getLong($i);
         |      $dist += $d * $d;
         |    }
         |    if (!${ev.isNull} && $dist < $bestDist) { $bestDist = $dist; $best = $j; }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $best; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {

  val identifier: FunctionIdentifier = FunctionIdentifier("nearest_centroid")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NearestCentroid].getCanonicalName,
    null,
    "nearest_centroid",
    "_FUNC_(q, centroids) - index of the squared-L2-nearest centroid (ties to lowest index).",
    "")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "nearest_centroid expects exactly 2 arguments")
    NearestCentroid(children.head, children(1))
  }

  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(identifier, info, builder)
}
