package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors in a
  * single fused pass (dot product and both norms accumulate in one loop).
  *
  * This replaces the `aggregate(zip_with(...))` higher-order-function
  * composition on the ANN hot path: HOFs evaluate interpreted with boxed
  * lambda variables per element, while this expression participates in
  * whole-stage codegen — the generated Java is a primitive loop over the
  * two `ArrayData`, so scoring N candidates is N tight loops with zero
  * allocation. Accumulation is left-to-right in double, structurally
  * identical to DuckDB's `list_dot_product`, so oracle results agree
  * bitwise.
  *
  * Null semantics: null if either array is null, lengths differ, any
  * element is null, or either norm is zero (no NaN leaks).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"cosine_sim requires two array<float> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    // NaN/Infinity elements (a standard upstream-encoder failure mode)
    // make the norms NaN/Inf and would leak NaN through the division —
    // and a NaN silently fails every downstream >= threshold filter.
    // The documented contract is an explicit null instead.
    if (nx == 0.0 || ny == 0.0 ||
        java.lang.Double.isNaN(nx) || java.lang.Double.isNaN(ny) ||
        java.lang.Double.isInfinite(nx) || java.lang.Double.isInfinite(ny)) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($nx == 0.0 || $ny == 0.0 ||
         |        Double.isNaN($nx) || Double.isNaN($ny) ||
         |        Double.isInfinite($nx) || Double.isInfinite($ny)) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny)); }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  val identifier: FunctionIdentifier = FunctionIdentifier("cosine_sim")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getCanonicalName,
    null,
    "cosine_sim",
    "_FUNC_(a, b) - cosine similarity of two float vectors, fused single-pass.",
    "")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "cosine_sim expects exactly 2 arguments")
    CosineSimilarity(children.head, children(1))
  }

  /** Register `cosine_sim` on an existing session's function registry. */
  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(identifier, info, builder)
}
