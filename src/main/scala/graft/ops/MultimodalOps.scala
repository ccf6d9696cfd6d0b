package graft.ops

import graft.Tables
import graft.Tables.ResultOrdering
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata, with
  * decode/feature-extraction as a partition-local stage.
  *
  * The Spark-side shape is the real thing — BinaryType column, metadata
  * struct, mapPartitions with a typed Dataset so decode batches amortize any
  * per-partition setup (codec init, model load), partitioning untouched so
  * the stage pipelines with the scan. Typed `mapPartitions` is the Scala
  * equivalent of PySpark's `mapInPandas` batch shape: the decode function
  * receives an iterator of rows per partition and streams results out, so a
  * Python deployment would swap in `mapInPandas` with the same schema and
  * batching contract and change nothing upstream or downstream. The decode itself is a clearly-marked
  * deterministic STUB (a code-point histogram standing in for image/audio
  * decode + feature extraction — no media libraries exist in this
  * environment); a real decoder replaces only the function body, not the
  * plumbing.
  *
  * The stub is deterministic scalar arithmetic, so the registered query IS
  * oracle-checked: the 8 histogram bins are flattened to scalar f0..f7
  * columns (the driver's canonicalizer cannot sort array columns), and the
  * DuckDB oracle recomputes the same histogram from code points. The typed
  * `MediaFeatures` (array) API remains for library callers.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, format: String, n_bytes: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, format: String, n_chars: Long, features: Seq[Double])

  val HistBins = 8

  /** Wrap each document as an opaque media payload with typed metadata —
    * the ingest shape for image/audio/video columns.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        lit("text/plain").as("format"),
        // null text ingests as EMPTY media (0 bytes, empty payload): the
        // typed MediaRow has a primitive n_bytes, so a null here would
        // fault in the encoder before any decode-side guard could run;
        // the oracles apply the same coalesce. octet_length, not length:
        // n_bytes documents the PAYLOAD's size, and code-point count
        // undercounts any non-ASCII text's UTF-8 bytes
        octet_length(coalesce(col("text"), lit(""))).cast("long").as("n_bytes"),
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload")
      )

  /** Null payload (belt-and-braces; mediaTable already coalesces) decodes
    * as empty media.
    */
  private def decodeText(payload: Array[Byte]): String =
    if (payload == null) ""
    else new String(payload, java.nio.charset.StandardCharsets.UTF_8)

  /** STUB decode + feature extraction: an 8-bin normalized code-point
    * histogram (bucket = (cp mod 256) >> 5, counted over Unicode code points
    * so the arithmetic is identical to the DuckDB oracle's
    * ord(substr(t,i,1)) regardless of encoding). A real implementation
    * decodes the payload (JPEG/PCM/container frames) and emits model
    * features; everything around this loop — batching, schema, partition
    * locality — is the production path.
    */
  def extractFeatures(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val text = decodeText(r.payload)
      val hist = new Array[Double](HistBins)
      var n = 0L
      val it = text.codePoints().iterator()
      while (it.hasNext) {
        val cp = it.nextInt()
        hist((cp & 0xFF) >> 5) += 1.0
        n += 1
      }
      val d = math.max(n, 1L).toDouble
      MediaFeatures(r.doc_id, r.format, n, hist.map(_ / d).toSeq)
    }

  /** Typed library API: features as an array column. */
  def multimodalFeaturesTyped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .as[MediaRow]
      .mapPartitions(extractFeatures)
      .toDF()
  }

  /** Registered (driver-scored) form: histogram flattened to scalar columns
    * so the result is sortable/hashable by the compare harness, rounded to
    * 4 decimals like every float the oracle reproduces.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val flat = (0 until HistBins).map(i =>
      graft.model.Model.roundN(col("features").getItem(i), 4).as(s"f$i"))
    multimodalFeaturesTyped(s, dir)
      .select(Seq(col("doc_id"), col("format"), col("n_chars")) ++ flat: _*)
      .resultOrder(col("doc_id"))
  }

  case class ResizedMedia(doc_id: Long, format: String, orig_units: Long,
      resized_units: Long, checksum: Long)
  case class FrameSample(doc_id: Long, n_frames: Long, n_sampled: Long, checksum: Long)

  /** Stride of the resize downsample (≙ image scale factor). */
  val ResizeStride = 4
  /** Code points per synthetic "frame" and the frame-sampling stride
    * (≙ video keyframe extraction: every 8th frame of 64-unit frames).
    */
  val FrameSize = 64
  val FrameStride = 8

  /** STUB resize: stride-decimate the decoded payload (every 4th code
    * point), emitting the new size + a checksum over the kept units. A real
    * implementation decodes pixels and area-averages; the partition-local
    * batch shape, metadata projection, and deterministic output contract
    * are the production path.
    */
  def resizeStub(rows: Iterator[MediaRow]): Iterator[ResizedMedia] =
    rows.map { r =>
      val cps = decodeText(r.payload).codePoints().toArray
      var sum = 0L
      var i = 0
      while (i < cps.length) { sum += cps(i); i += ResizeStride }
      ResizedMedia(r.doc_id, r.format, cps.length,
        (cps.length + ResizeStride - 1) / ResizeStride, sum)
    }

  /** STUB frame sampling: treat the payload as FrameSize-unit frames, keep
    * every FrameStride-th frame, checksum the kept frames' leading units —
    * the video keyframe-extraction shape (count, sampled count, digest).
    */
  def frameSampleStub(rows: Iterator[MediaRow]): Iterator[FrameSample] =
    rows.map { r =>
      val cps = decodeText(r.payload).codePoints().toArray
      val nf = (cps.length + FrameSize - 1) / FrameSize
      var sum = 0L
      var n = 0L
      var f = 0
      while (f < nf) { sum += cps(f * FrameSize); n += 1; f += FrameStride }
      FrameSample(r.doc_id, nf, n, sum)
    }

  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions(resizeStub).toDF()
      .resultOrder(col("doc_id"))
  }

  def multimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions(frameSampleStub).toDF()
      .resultOrder(col("doc_id"))
  }

  case class PerceptualKey(doc_id: Long, n_units: Long, pkey: Long)

  /** Quantization levels per histogram bin for the perceptual key
    * (level = count·levels ∕ n, integer — 0..levels inclusive, 7 bits;
    * 8 levels collapsed the whole sf0.01 corpus into ONE group — text
    * histograms concentrate in two bins, so the key needs sub-bin
    * resolution to separate genuinely different docs while still
    * colliding the fixture's small-edit near-dup pairs). */
  val PkeyLevels = 64

  /** STUB perceptual hash: quantize each feature-histogram bin to an
    * integer level and pack the 8 levels into one 56-bit key — the pHash
    * shape and width (aHash/dHash quantize decoded pixels the same way; a
    * real implementation swaps the histogram for DCT coefficients and
    * changes no plumbing). All arithmetic is integer (counts, not the
    * normalized doubles), so the key is exactly reproducible cross-engine.
    */
  def perceptualKeys(rows: Iterator[MediaRow]): Iterator[PerceptualKey] =
    rows.map { r =>
      val text = decodeText(r.payload)
      val hist = new Array[Long](HistBins)
      var n = 0L
      val it = text.codePoints().iterator()
      while (it.hasNext) {
        val cp = it.nextInt()
        hist((cp & 0xFF) >> 5) += 1
        n += 1
      }
      var key = 0L
      var b = 0
      while (b < HistBins) {
        key |= ((hist(b) * PkeyLevels) / math.max(n, 1L)) << (7 * b)
        b += 1
      }
      PerceptualKey(r.doc_id, n, key)
    }

  /** Perceptual near-dup dedup over the media corpus — the image-pipeline
    * analog of [[TextOps.dedupExact]]: media whose decoded feature
    * histograms quantize to the SAME perceptual key are near-duplicates
    * (re-encodes, crops, small edits move raw bytes but not the coarse
    * feature distribution); one keeper (lowest doc_id) survives per key.
    *
    * Plan shape at 100 TB: the decode/key stage is partition-local
    * (mapPartitions pipelines with the scan — the expensive decode runs
    * once per payload, exactly where the bytes are), then ONE map-side-
    * combined exchange keyed by the 8-byte key carrying ≤ |distinct keys|
    * rows per map task. No window, no join, no second scan.
    */
  def multimodalDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions(perceptualKeys).toDF()
      .groupBy(col("pkey"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_docs"))
      .select(col("doc_id"), col("n_docs"), col("pkey"))
      .resultOrder(col("doc_id"))
  }

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
