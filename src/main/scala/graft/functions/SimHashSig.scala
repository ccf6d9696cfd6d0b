package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the `bits`-bit SimHash signature of a
  * string, computed IN-ROW.
  *
  * Replaces a 3-shuffle pipeline (`explode(split(...))` → global
  * `(doc_id, tok)` distinct → `groupBy(doc_id).agg(SimHashAggregator)`):
  * both shuffles carried the corpus token stream; in-row computation
  * carries nothing — the only shuffle left in the simhash operator is the
  * band candidate join.
  *
  * Semantics are bit-identical to that pipeline: `trim()` →
  * `split("\s+", -1)` (the same UTF8String primitives — an empty/blank
  * string yields the single empty token, matching explode-of-split),
  * per-doc DISTINCT tokens, token hash = first 15 hex chars of md5 (the
  * top 60 bits of the digest — the one hash the DuckDB oracle rebuilds
  * identically), per-bit ±1 sign sums, bit set iff sum > 0 (the
  * SimHashAggregator.finish fold). Null input yields null.
  */
case class SimHashSig(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 60, s"simhash_sig bits must be in [1, 60], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"simhash_sig requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(s: Any): Any =
    SimHashSig.compute(s.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSig.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {

  // precompiled: UTF8String.split with a multi-char regex delegates to
  // String#split, which recompiles the Pattern per call — per ROW here
  // (same fix TermFreqStats already carries); Pattern.split(str, -1) is
  // byte-identical output, so the stated bit parity holds
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String, bits: Int): Long = {
    val toks = Whitespace.split(s.trim().toString, -1)
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](bits)
    val digest = md5.get()
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        digest.reset()
        val d = digest.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex chars of the digest == top 60 bits: the big-endian
        // long of bytes 0..7, shifted right 4 — what the SQL pipeline's
        // CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT) yields
        var v = 0L
        var k = 0
        while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
        val h = v >>> 4
        var b = 0
        while (b < bits) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("simhash_sig")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHashSig].getCanonicalName,
    null,
    "simhash_sig",
    "_FUNC_(s, bits) - bits-bit SimHash of s over distinct whitespace tokens (md5 token hash).",
    "")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "simhash_sig expects exactly 2 arguments")
    val bitsExpr = children(1)
    require(bitsExpr.foldable, s"simhash_sig bits must be a constant, got ${bitsExpr.sql}")
    val bits = bitsExpr.eval() match {
      case v: java.lang.Number => v.longValue()
      case other => throw new IllegalArgumentException(
        s"simhash_sig bits must be an integer, got $other")
    }
    // reject instead of truncating (2^32+16 must not silently become 16)
    require(bits >= 1 && bits <= 60, s"simhash_sig bits must be in [1, 60], got $bits")
    SimHashSig(children.head, bits.toInt)
  }

  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(identifier, info, builder)
}
