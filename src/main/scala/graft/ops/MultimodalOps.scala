package graft.ops

import graft.Tables
import graft.Tables.ResultOrdering
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with decode/feature-extraction as a native in-row expression.
  *
  * The Spark-side shape is the real thing — BinaryType column, metadata
  * columns, and ONE decode point: [[graft.functions.MediaStats]], a
  * codegen'd Catalyst expression that folds the whole decode +
  * statistics pass into the scan's WholeStageCodegen stage (round 14
  * replaced the earlier typed-`mapPartitions` stubs: the decode is a pure
  * per-row projection, so an expression keeps the family free of object
  * serialization boundaries and Dataset encoder round-trips — the same
  * reasoning as every other native expression; PlanSpec pins the
  * batch family free of `mapPartitions`/`SerializeFromObject`). The
  * decode body itself is a clearly-marked deterministic STUB (code-point
  * histogram + strided checksums standing in for image/audio decode — no
  * media libraries exist in this environment); a real decoder replaces
  * `MediaStats.compute`'s loop, not the plumbing.
  *
  * The stub is deterministic integer arithmetic, so every registered
  * query IS oracle-checked: the DuckDB oracles recompute the same
  * statistics from `ord(substr(text, i, 1))`.
  */
object MultimodalOps {

  /** Histogram bins of the stub feature extractor — the one constant,
    * owned by the expression. */
  val HistBins: Int = graft.functions.MediaStats.HistBins

  /** Stride of the resize downsample (≙ image scale factor). */
  val ResizeStride: Int = graft.functions.MediaStats.ResizeStride

  /** Code points per synthetic "frame" and the frame-sampling stride
    * (≙ video keyframe extraction: every 8th frame of 64-unit frames). */
  val FrameSize: Int = graft.functions.MediaStats.FrameSize
  val FrameStride: Int = graft.functions.MediaStats.FrameStride

  /** Wrap each document as an opaque media payload with typed metadata —
    * the ingest shape for image/audio/video columns.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        lit("text/plain").as("format"),
        // null text ingests as EMPTY media (0 bytes, empty payload), the
        // oracles apply the same coalesce. octet_length, not length:
        // n_bytes documents the PAYLOAD's size, and code-point count
        // undercounts any non-ASCII text's UTF-8 bytes
        octet_length(coalesce(col("text"), lit(""))).cast("long").as("n_bytes"),
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload")
      )

  /** The decode + statistics expression over a payload column. */
  private[graft] def mediaStats(payload: Column): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(graft.functions.MediaStats(
      graftbridge.expression(payload)))
  }

  /** Media table with the decoded statistics struct alongside. */
  private def withStats(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).withColumn("ms", mediaStats(col("payload")))

  /** Typed library API: normalized feature histogram as an array column —
    * (doc_id, format, n_chars, features: array<double>). */
  def multimodalFeaturesTyped(s: SparkSession, dir: String): DataFrame =
    withStats(s, dir)
      .select(col("doc_id"), col("format"),
        col("ms.n_units").as("n_chars"),
        expr("transform(ms.hist, h -> CAST(h AS DOUBLE) / CAST(greatest(ms.n_units, 1) AS DOUBLE))")
          .as("features"))

  /** Registered (driver-scored) form: histogram flattened to scalar columns
    * so the result is sortable/hashable by the compare harness, rounded to
    * 4 decimals like every float the oracle reproduces.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    // read the struct fields directly rather than through the typed API's
    // transform() array: a higher-order function between the decode and
    // the 8 flattened projections adds an interpreted array layer per
    // column (measured sf100, min-of-2: 9.8 s via transform → 8.1 s
    // struct-direct; the remaining cost is the decode loop itself)
    val flat = (0 until HistBins).map(i =>
      graft.model.Model.roundN(
        col("ms.hist").getItem(i).cast("double") /
          greatest(col("ms.n_units"), lit(1L)).cast("double"), 4).as(s"f$i"))
    withStats(s, dir)
      .select(Seq(col("doc_id"), col("format"), col("ms.n_units").as("n_chars")) ++ flat: _*)
      .resultOrder(col("doc_id"))
  }

  /** STUB resize: stride-decimate the decoded payload (every 4th code
    * point), emitting the new size + a checksum over the kept units. A
    * real implementation decodes pixels and area-averages; the in-row
    * decode, metadata projection, and deterministic output contract are
    * the production path.
    */
  def multimodalResize(s: SparkSession, dir: String): DataFrame =
    withStats(s, dir)
      .select(col("doc_id"), col("format"),
        col("ms.n_units").as("orig_units"),
        expr(s"(ms.n_units + ${ResizeStride - 1}) div $ResizeStride").as("resized_units"),
        col("ms.resize_sum").as("checksum"))
      .resultOrder(col("doc_id"))

  /** STUB frame sampling: treat the payload as FrameSize-unit frames, keep
    * every FrameStride-th frame, checksum the kept frames' leading units —
    * the video keyframe-extraction shape (count, sampled count, digest).
    */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame =
    withStats(s, dir)
      .select(col("doc_id"),
        expr(s"(ms.n_units + ${FrameSize - 1}) div $FrameSize").as("n_frames"),
        col("ms.n_sampled").as("n_sampled"),
        col("ms.frame_sum").as("checksum"))
      .resultOrder(col("doc_id"))

  /** Quantization levels per histogram bin for the perceptual key
    * (level = count·levels ∕ n, integer — 0..levels inclusive, 7 bits;
    * 8 levels collapsed the whole sf0.01 corpus into ONE group — text
    * histograms concentrate in two bins, so the key needs sub-bin
    * resolution to separate genuinely different docs while still
    * colliding the fixture's small-edit near-dup pairs). */
  val PkeyLevels = 64

  /** STUB perceptual hash over the statistics struct column: quantize each
    * feature-histogram bin to an integer level and pack the 8 levels into
    * one 56-bit key — the pHash shape and width (aHash/dHash quantize
    * decoded pixels the same way; a real implementation swaps the
    * histogram for DCT coefficients and changes no plumbing). All
    * arithmetic is integer (counts, not the normalized doubles), so the
    * key is exactly reproducible cross-engine.
    */
  private def pkeyOf(ms: String): Column = expr(
    (0 until HistBins)
      .map(b => s"shiftleft(($ms.hist[$b] * $PkeyLevels) div greatest($ms.n_units, 1), ${7 * b})")
      .mkString(" + "))

  /** (doc_id, n_units, pkey) over a media frame — the decode + perceptual
    * key as one in-row projection, shared by the batch dedup and the
    * streaming admission twin (a pure projection is trivially
    * streaming-safe). */
  private[graft] def withPerceptualKey(media: DataFrame): DataFrame =
    media.withColumn("ms", mediaStats(col("payload")))
      .select(col("doc_id"), col("ms.n_units").as("n_units"), pkeyOf("ms").as("pkey"))

  /** Perceptual near-dup dedup over the media corpus — the image-pipeline
    * analog of [[TextOps.dedupExact]]: media whose decoded feature
    * histograms quantize to the SAME perceptual key are near-duplicates
    * (re-encodes, crops, small edits move raw bytes but not the coarse
    * feature distribution); one keeper (lowest doc_id) survives per key.
    *
    * Plan shape at 100 TB: the decode/key stage is an in-row codegen
    * projection fused with the scan (the expensive decode runs once per
    * payload, exactly where the bytes are), then ONE map-side-combined
    * exchange keyed by the 8-byte key carrying ≤ |distinct keys| rows per
    * map task. No window, no join, no second scan.
    */
  def multimodalDedup(s: SparkSession, dir: String): DataFrame =
    withPerceptualKey(mediaTable(s, dir))
      .groupBy(col("pkey"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_docs"))
      .select(col("doc_id"), col("n_docs"), col("pkey"))
      .resultOrder(col("doc_id"))

  val oracles: Map[String, String] = Map(
    "q_multimodal_resize" ->
      s"""WITH d AS (SELECT doc_id, coalesce(text, '') AS text, length(coalesce(text, '')) AS n FROM documents),
         |cp AS (
         |  SELECT doc_id, ord(substr(text, CAST(i AS INTEGER), 1)) AS c
         |  FROM d, unnest(range(1, n + 1)) AS u(i)
         |  WHERE (i - 1) % $ResizeStride = 0)
         |SELECT d.doc_id, 'text/plain' AS format, CAST(d.n AS BIGINT) AS orig_units,
         |       CAST((d.n + ${ResizeStride - 1}) // $ResizeStride AS BIGINT) AS resized_units,
         |       CAST(coalesce(sum(cp.c), 0) AS BIGINT) AS checksum
         |FROM d LEFT JOIN cp USING (doc_id)
         |GROUP BY d.doc_id, d.n
         |ORDER BY d.doc_id""".stripMargin,
    "q_multimodal_frames" ->
      s"""WITH d AS (SELECT doc_id, coalesce(text, '') AS text, length(coalesce(text, '')) AS n FROM documents),
         |f AS (
         |  SELECT doc_id, ord(substr(text, CAST(fi * $FrameSize + 1 AS INTEGER), 1)) AS c
         |  FROM d, unnest(range(0, (n + ${FrameSize - 1}) // $FrameSize)) AS u(fi)
         |  WHERE fi % $FrameStride = 0)
         |SELECT d.doc_id,
         |       CAST((d.n + ${FrameSize - 1}) // $FrameSize AS BIGINT) AS n_frames,
         |       CAST(count(f.c) AS BIGINT) AS n_sampled,
         |       CAST(coalesce(sum(f.c), 0) AS BIGINT) AS checksum
         |FROM d LEFT JOIN f USING (doc_id)
         |GROUP BY d.doc_id, d.n
         |ORDER BY d.doc_id""".stripMargin,
    "q_multimodal_dedup" -> {
      val counts = (0 until HistBins)
        .map(b => s"count(CASE WHEN cp.bin = $b THEN 1 END) AS c$b")
        .mkString(", ")
      val key = (0 until HistBins)
        .map(b => s"(c$b * $PkeyLevels // greatest(n, 1)) * ${1L << (7 * b)}")
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id, coalesce(text, '') AS text, length(coalesce(text, '')) AS n FROM documents),
         |cp AS (
         |  SELECT doc_id, (ord(substr(text, CAST(i AS INTEGER), 1)) % 256) // 32 AS bin
         |  FROM d, unnest(range(1, n + 1)) AS u(i)),
         |hist AS (
         |  SELECT d.doc_id, d.n, $counts
         |  FROM d LEFT JOIN cp USING (doc_id)
         |  GROUP BY d.doc_id, d.n),
         |keys AS (SELECT doc_id, CAST($key AS BIGINT) AS pkey FROM hist)
         |SELECT min(doc_id) AS doc_id, count(*) AS n_docs, pkey
         |FROM keys
         |GROUP BY pkey
         |ORDER BY doc_id""".stripMargin
    },
    "q_multimodal_features" -> {
      val bins = (0 until HistBins)
        .map(b => s"${graft.model.Model.roundNSql(s"CAST(count(CASE WHEN bin = $b THEN 1 END) AS DOUBLE) / greatest(d.n, 1)", 4)} AS f$b")
        .mkString(", ")
      s"""WITH d AS (SELECT doc_id, coalesce(text, '') AS text, length(coalesce(text, '')) AS n FROM documents),
         |cp AS (
         |  SELECT doc_id, (ord(substr(text, CAST(i AS INTEGER), 1)) % 256) // 32 AS bin
         |  FROM d, unnest(range(1, n + 1)) AS u(i))
         |SELECT d.doc_id, 'text/plain' AS format, CAST(d.n AS BIGINT) AS n_chars, $bins
         |FROM d LEFT JOIN cp ON cp.doc_id = d.doc_id
         |GROUP BY d.doc_id, d.n
         |ORDER BY d.doc_id""".stripMargin
    }
  )
}
