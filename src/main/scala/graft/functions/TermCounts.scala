package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document term-frequency VECTOR —
  * `array<struct<term: string, c: bigint>>` over the whitespace-tokenized
  * text, terms in ascending order, one in-row pass.
  *
  * Same rationale as [[TermFreqStats]], for the operators that need the
  * terms themselves (top-terms, TF-IDF): term frequency within a document
  * is a PER-DOCUMENT property, so the explode-then-groupBy(doc_id, term)
  * formulation shuffles the corpus's entire token stream through a
  * corpus-scale exchange to compute counts that never cross a document
  * boundary. In-row, the counts cost O(tokens) time and O(distinct)
  * memory per document; downstream term-level aggregates then see one row
  * per (document, distinct term) and reduce map-side to vocabulary-scale
  * wire volume.
  *
  * Tokenization matches `split(trim(text), '\\s+')` and the DuckDB
  * oracle's `string_split_regex(trim(text), '\s+')` — identical to
  * TermFreqStats. Output order is ascending by term in Java String order
  * (UTF-16 code-unit order — differs from UTF-8 byte order only above
  * the BMP; the order is deterministic and presentation-only: every
  * consumer explodes and aggregates, so no result depends on it).
  * Null in → null out.
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"term_counts requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = TermCounts.Schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "term_counts"

  override def nullSafeEval(s: Any): Any =
    TermCounts.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {

  val Schema: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  /** Static entry point shared by interpreted eval and generated code;
    * token stream = [[TermFreqStats.tokenize]], the one shared tokenizer. */
  def compute(s: UTF8String): ArrayData = {
    val toks = TermFreqStats.tokenize(s)

    // TreeMap: counts and the ascending term order in one structure —
    // O(tokens · log distinct), bounded by the document, not the corpus
    val counts = new java.util.TreeMap[String, Long]()
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }

    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      i += 1
    }
    new GenericArrayData(out)
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("term_counts")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TermCounts].getCanonicalName,
    null,
    "term_counts",
    "_FUNC_(s) - array<struct<term, c>> of whitespace-token frequencies in s, terms ascending.",
    "")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "term_counts expects exactly 1 argument")
    TermCounts(children.head)
  }

  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(identifier, info, builder)
}
