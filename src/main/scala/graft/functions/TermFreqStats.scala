package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document term-frequency statistics —
  * token count, distinct-token count, the most frequent token's count,
  * bigram count, and the most frequent bigram's count — in ONE in-row
  * pass over the whitespace-tokenized text.
  *
  * This exists because repetition profiling (Gopher-style duplicate-word
  * and top-n-gram fractions) is a PER-DOCUMENT property: an
  * explode-then-groupBy formulation shuffles the corpus's entire token
  * stream (≈ corpus size × 2 with bigrams) through two exchanges to
  * compute counts that never cross a document boundary. In-row, the same
  * counts cost O(tokens) time and O(distinct) memory — bounded by the
  * document, not the corpus — and the operator collapses to a pipelined
  * scan + projection with no shuffle at any scale.
  *
  * Tokenization matches `split(trim(text), '\\s+')` (and the DuckDB
  * oracle's `string_split_regex(trim(text), '\s+')`): leading/trailing
  * spaces stripped, runs of whitespace as one separator. Null in → null
  * out.
  */
case class TermFreqStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"term_freq_stats requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = TermFreqStats.Schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "term_freq_stats"

  override def nullSafeEval(s: Any): Any =
    TermFreqStats.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TermFreqStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TermFreqStats =
    copy(child = newChild)
}

object TermFreqStats {

  // String#split with a multi-char regex recompiles the Pattern per call
  // — per ROW here; compile once (Pattern is thread-safe for split)
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** THE whitespace tokenizer — the single definition shared by every
    * in-row native (TermFreqStats, TermCounts) and documented to match
    * `split(trim(text), "\s+")` / the oracle's `string_split_regex`:
    * Spark's trim strips 0x20 only (String#trim would also strip control
    * chars), runs of whitespace are one separator. Two hand-synced copies
    * of this preamble drifted a review once; keep it in one place.
    */
  private[functions] def tokenize(s: UTF8String): Array[String] = {
    var str = s.toString
    var lo = 0
    var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    str = str.substring(lo, hi)
    Whitespace.split(str, -1)
  }

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_w", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_b", LongType, nullable = false)))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String): InternalRow = {
    val toks = tokenize(s)

    val wordCounts = new java.util.HashMap[String, Int](toks.length * 2)
    var topW = 0
    var i = 0
    while (i < toks.length) {
      val c = wordCounts.merge(toks(i), 1, Integer.sum)
      if (c > topW) topW = c
      i += 1
    }

    val bigramCounts = new java.util.HashMap[String, Int](toks.length * 2)
    var topB = 0
    i = 1
    while (i < toks.length) {
      val c = bigramCounts.merge(toks(i - 1) + " " + toks(i), 1, Integer.sum)
      if (c > topB) topB = c
      i += 1
    }

    new GenericInternalRow(Array[Any](
      toks.length.toLong,
      wordCounts.size.toLong,
      topW.toLong,
      math.max(toks.length - 1, 0).toLong,
      topB.toLong))
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("term_freq_stats")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TermFreqStats].getCanonicalName,
    null,
    "term_freq_stats",
    "_FUNC_(s) - struct(n_tokens, n_distinct, top_w, n_bigrams, top_b) of the whitespace-tokenized s.",
    "")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "term_freq_stats expects exactly 1 argument")
    TermFreqStats(children.head)
  }

  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(identifier, info, builder)
}
