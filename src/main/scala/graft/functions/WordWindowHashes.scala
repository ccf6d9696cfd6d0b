package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the POSITIONAL xxhash64 fingerprints of a
  * string's word n-token windows — [[WordShingleHashes]] minus the in-row
  * de-dup, because the exact-substring dedup operator
  * ([[graft.ops.DedupOps.dedupSubstring]]) needs every occurrence WITH its
  * token offset: element i of the result is the hash of tokens
  * [i+1, i+n] (1-based), so `posexplode` recovers (position, fingerprint)
  * pairs without a second pass over the text. This is the fixed-stride
  * rolling-fingerprint half of the Lee et al. 2022 exact-substring recipe
  * (the suffix-array pass re-expressed as a fingerprint equi-group, never
  * a corpus self-join).
  *
  * Semantics per element are bit-identical to [[WordShingleHashes]] and to
  * the split/slice SQL pipeline both replace: `trim()` → split on `\s+` →
  * `concatWs(" ", tok_i..tok_{i+n-1})` → `XxHash64Function.hash(_, 42)`.
  * Fewer than n tokens yields an empty array; null yields null.
  */
case class WordWindowHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"word_window_hashes n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"word_window_hashes requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_window_hashes"

  override def nullSafeEval(s: Any): Any =
    WordWindowHashes.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordWindowHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordWindowHashes =
    copy(child = newChild)
}

object WordWindowHashes {

  // precompiled once; String#split would recompile the Pattern per ROW
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")
  private val Space = UTF8String.fromString(" ")

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val stoks = Whitespace.split(s.trim().toString, -1)
    if (stoks.length < n) UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    else {
      val toks = new Array[UTF8String](stoks.length)
      var t = 0
      while (t < stoks.length) { toks(t) = UTF8String.fromString(stoks(t)); t += 1 }
      val out = new Array[Long](toks.length - n + 1)
      var i = 0
      while (i <= toks.length - n) {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) { parts(k) = toks(i + k); k += 1 }
        out(i) = XxHash64Function.hash(UTF8String.concatWs(Space, parts: _*),
          StringType, 42L)
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("word_window_hashes")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordWindowHashes].getCanonicalName,
    null,
    "word_window_hashes",
    "_FUNC_(s, n) - positional xxhash64 fingerprints of the word n-token windows of s.",
    "")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "word_window_hashes expects exactly 2 arguments")
    val ne = children(1)
    require(ne.foldable, s"word_window_hashes n must be a constant, got ${ne.sql}")
    val n = ne.eval() match {
      case v: java.lang.Number => v.longValue()
      case other => throw new IllegalArgumentException(
        s"word_window_hashes n must be an integer, got $other")
    }
    // reject instead of truncating (2^32+3 must not silently become 3)
    require(n >= 1 && n <= Int.MaxValue,
      s"word_window_hashes n must be in [1, ${Int.MaxValue}], got $n")
    WordWindowHashes(children.head, n.toInt)
  }

  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(identifier, info, builder)
}
