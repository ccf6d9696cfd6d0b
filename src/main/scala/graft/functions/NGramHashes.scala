package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct 64-bit FNV-1a hashes of a
  * string's code-point n-grams — the candidate-key extraction of the
  * n-gram near-dup operator, expressed so it stays inside whole-stage
  * codegen instead of crossing a ScalaUDF boundary (per-row
  * UTF8String→String→Scala-closure conversion plus boxed Array[Long]
  * encoder on the way back). The generated code is a single static call on
  * the raw `UTF8String`; the loop body is one JIT-compiled method with
  * zero per-element allocation.
  *
  * Semantics (identical to the UDF it replaces, and to the DuckDB oracle's
  * substr/length arithmetic): slide over Unicode CODE POINTS, hash each
  * n-window with FNV-1a 64, de-dup in first-seen order inside the row.
  * Strings shorter than n yield an empty array; null yields null.
  */
case class NGramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"ngram_hashes n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"ngram_hashes requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(s: Any): Any =
    NGramHashes.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramHashes =
    copy(child = newChild)
}

object NGramHashes {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    if (cps.length < n) UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    else {
      val set = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i <= cps.length - n) {
        var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
        var k = i
        while (k < i + n) { h ^= cps(k); h *= 0x100000001b3L; k += 1 }
        set.add(h)
        i += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("ngram_hashes")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NGramHashes].getCanonicalName,
    null,
    "ngram_hashes",
    "_FUNC_(s, n) - distinct FNV-1a hashes of the code-point n-grams of s.",
    "")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "ngram_hashes expects exactly 2 arguments")
    // accept any foldable integral expression (bare literal, CAST, 4+4 —
    // the builder runs before constant folding, so eval() it here)
    val nExpr = children(1)
    val n = nExpr.dataType match {
      case _ if !nExpr.foldable =>
        throw new IllegalArgumentException(
          s"ngram_hashes n must be a constant integer, got non-foldable ${nExpr.sql}")
      case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType =>
        nExpr.eval() match {
          case null => throw new IllegalArgumentException("ngram_hashes n must not be null")
          case v: java.lang.Number =>
            val l = v.longValue()
            if (l < 1 || l > Int.MaxValue)
              throw new IllegalArgumentException(
                s"ngram_hashes n must be in [1, ${Int.MaxValue}], got $l")
            l.toInt
        }
      case t =>
        throw new IllegalArgumentException(
          s"ngram_hashes n must be an integer, got ${t.sql}")
    }
    NGramHashes(children.head, n)
  }

  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(identifier, info, builder)
}
