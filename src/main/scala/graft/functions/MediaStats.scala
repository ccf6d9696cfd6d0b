package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StructField, StructType}

/** Native Catalyst expression: the multimodal family's decode +
  * feature/resize/frame statistics in ONE in-row pass over the payload —
  * `struct<n_units, hist: array<bigint>, resize_sum, n_sampled,
  * frame_sum>`.
  *
  * This replaces the round-9 `mapPartitions` stubs: the decode stage of
  * the media family is a pure per-row projection, so expressing it as a
  * codegen'd expression keeps the whole batch family inside
  * WholeStageCodegen (no object serialization boundary, no Dataset
  * encoder round-trip) and lets every consumer share one decode via
  * ordinary subexpression reuse. The decode body itself remains the
  * clearly-marked deterministic STUB the family documents (a code-point
  * histogram + strided checksums standing in for image/audio decode —
  * no media libraries exist in this environment); a real decoder
  * replaces [[MediaStats.compute]]'s loop, not the plumbing.
  *
  * Semantics over the decoded UTF-8 code-point stream cp(0..n-1):
  *  - `n_units`    — code-point count;
  *  - `hist(b)`    — count of cp with ((cp & 0xFF) >> 5) = b, b in 0..7
  *                   (the feature-histogram / perceptual-key input);
  *  - `resize_sum` — Σ cp(i) over i ≡ 0 (mod [[MediaStats.ResizeStride]])
  *                   (stride-decimation checksum ≙ image resize);
  *  - `n_sampled`, `frame_sum` — count and Σ of the leading code points
  *                   of every [[MediaStats.FrameStride]]-th
  *                   [[MediaStats.FrameSize]]-unit frame (≙ video
  *                   keyframe sampling).
  * All arithmetic is exact integers, so the DuckDB oracles reproduce
  * every field from `ord(substr(...))` identically. Null in → null out;
  * empty payload → zeros.
  */
case class MediaStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"media_stats requires a binary argument, got ${t.sql}")
    }

  override def dataType: DataType = MediaStats.Schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "media_stats"

  override def nullSafeEval(b: Any): Any =
    MediaStats.compute(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaStats =
    copy(child = newChild)
}

object MediaStats {

  /** Feature-histogram bins (bucket = (cp & 0xFF) >> 5). */
  val HistBins = 8

  /** Stride of the resize decimation (≙ image scale factor). */
  val ResizeStride = 4

  /** Code points per synthetic "frame". */
  val FrameSize = 64

  /** Keep every FrameStride-th frame (≙ keyframe extraction). */
  val FrameStride = 8

  val Schema: DataType = StructType(Seq(
    StructField("n_units", LongType, nullable = false),
    StructField("hist", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("resize_sum", LongType, nullable = false),
    StructField("n_sampled", LongType, nullable = false),
    StructField("frame_sum", LongType, nullable = false)))

  /** Static entry point shared by interpreted eval and generated code —
    * the ONE decode point of the batch and streaming media family. */
  def compute(payload: Array[Byte]): InternalRow = {
    val text =
      if (payload == null) ""
      else new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    val hist = new Array[Long](HistBins)
    var n = 0L
    var resizeSum = 0L
    var frameSum = 0L
    var nSampled = 0L
    val it = text.codePoints().iterator()
    while (it.hasNext) {
      val cp = it.nextInt()
      hist((cp & 0xFF) >> 5) += 1
      if (n % ResizeStride == 0) resizeSum += cp
      if (n % FrameSize == 0 && (n / FrameSize) % FrameStride == 0) {
        frameSum += cp
        nSampled += 1
      }
      n += 1
    }
    new GenericInternalRow(Array[Any](
      n, new GenericArrayData(hist), resizeSum, nSampled, frameSum))
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("media_stats")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MediaStats].getCanonicalName,
    null,
    "media_stats",
    "_FUNC_(payload) - struct<n_units, hist, resize_sum, n_sampled, frame_sum> media decode statistics.",
    "")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "media_stats expects exactly 1 argument")
    MediaStats(children.head)
  }

  def register(registry: FunctionRegistry): Unit =
    registry.registerFunction(identifier, info, builder)
}
