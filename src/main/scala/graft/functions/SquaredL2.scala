package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact squared L2 distance of two quantized
  * integer vectors — the VALUE companion of [[NearestCentroid]]'s argmin
  * (cluster-quality diagnostics need the distance itself). One fused
  * primitive loop in whole-stage codegen; exact Long arithmetic, inside
  * the 2^53 range where the DuckDB oracle's double-domain dot-product
  * composition sees the same integers.
  *
  * Null semantics: null if either array is null, lengths differ, or any
  * element is null — same contract as the sibling expressions.
  */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"squared_l2 requires two array<bigint> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "squared_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dist = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      dist += d * d
      i += 1
    }
    dist
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val dist = ctx.freshName("dist")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dist = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $dist += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dist; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)
}

object SquaredL2 {

  val identifier: FunctionIdentifier = FunctionIdentifier("squared_l2")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SquaredL2].getCanonicalName,
    null,
    "squared_l2",
    "_FUNC_(a, b) - exact squared L2 distance of two bigint vectors.",
    "")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "squared_l2 expects exactly 2 arguments")
    SquaredL2(children.head, children(1))
  }

  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(identifier, info, builder)
}
