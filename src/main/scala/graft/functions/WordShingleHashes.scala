package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct word-n-gram shingle hashes of a
  * string — the per-document shingle set of the MinHash dedup operator
  * computed IN-ROW. Hashes are the RAW 64-bit xxhash64 values: the exact
  * Jaccard verification downstream compares these sets, and raw-64 keeps
  * per-pair collision odds at ~n²/2^64 (an earlier mod-p fold here put the
  * verification set in a 2^31 space, whose ~n²/2^32 collisions would show
  * at verify scales beyond the fixture). The MinHash permutation's mod-p
  * reduction happens inside minhash_sig, where the algebra needs it.
  *
  * This replaces a 4-operator pipeline (`split` → `transform/sequence/slice`
  * HOFs → `explode` → `groupBy(collect_set)`): the explode multiplied the
  * row count by the shingle count and the groupBy shuffled that whole stream
  * back together just to undo the explode. At 100 TB that shuffle carries
  * ~200× the corpus row count; in-row computation carries zero — the only
  * shuffles left in the operator are the banded candidate join and the
  * verification lookups.
  *
  * Semantics are bit-identical to the pipeline it replaces because it calls
  * the SAME engine primitives on the raw `UTF8String`:
  * `trim()` → `split("\s+", -1)` (Spark's StringSplit semantics) →
  * `concatWs(" ", tok_i..tok_{i+n-1})` → `XxHash64Function.hash(_, 42)`,
  * de-duped in first-seen order.
  * Fewer than n tokens yields an empty array; null yields null.
  */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"word_shingle_hashes n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"word_shingle_hashes requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingle_hashes"

  override def nullSafeEval(s: Any): Any =
    WordShingleHashes.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {

  // precompiled: UTF8String.split with a multi-char regex delegates to
  // String#split, which recompiles the Pattern per call — per ROW here.
  // Pattern.split(str, -1) is byte-identical output (String#split itself
  // delegates to Pattern.compile(regex).split), so bit parity with the
  // SQL pipeline's split(trim(text), "\s+") is preserved.
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")
  private val Space = UTF8String.fromString(" ")

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val stoks = Whitespace.split(s.trim().toString, -1)
    val toks = new Array[UTF8String](stoks.length)
    var t = 0
    while (t < stoks.length) { toks(t) = UTF8String.fromString(stoks(t)); t += 1 }
    if (toks.length < n) UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    else {
      val set = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i <= toks.length - n) {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) { parts(k) = toks(i + k); k += 1 }
        val shingle = UTF8String.concatWs(Space, parts: _*)
        set.add(XxHash64Function.hash(shingle, StringType, 42L))
        i += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("word_shingle_hashes")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordShingleHashes].getCanonicalName,
    null,
    "word_shingle_hashes",
    "_FUNC_(s, n) - distinct xxhash64 hashes of the word n-gram shingles of s.",
    "")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "word_shingle_hashes expects exactly 2 arguments")
    def constLong(e: Expression, what: String): Long = {
      require(e.foldable, s"word_shingle_hashes $what must be a constant, got ${e.sql}")
      e.eval() match {
        case v: java.lang.Number => v.longValue()
        case other => throw new IllegalArgumentException(
          s"word_shingle_hashes $what must be an integer, got $other")
      }
    }
    val n = constLong(children(1), "n")
    // reject instead of truncating (2^32+3 must not silently become 3)
    require(n >= 1 && n <= Int.MaxValue,
      s"word_shingle_hashes n must be in [1, ${Int.MaxValue}], got $n")
    WordShingleHashes(children.head, n.toInt)
  }

  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(identifier, info, builder)
}
