package graft.ops

import graft.Tables
import graft.Tables.ResultOrdering
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dashboard downsampling — the reduce-before-render stage Grafana asks of
  * its datasource when a panel's `maxDataPoints` is smaller than the raw
  * series (TimescaleDB ships both shapes as hyperfunctions: `candlestick_agg`
  * and `lttb`; the reference's dashboards render raw series today,
  * machine_dashboard.json:109, and hit exactly this wall at production row
  * counts).
  *
  * Two operators:
  *  - [[downsampleOhlc]]: per (metric, hour) open/high/low/close — the
  *    candlestick/decimation shape. Pure partial+final HASH aggregation:
  *    the flat-buffer argmax ([[graft.functions.ArgMaxKey]]) on a
  *    (ts, event_id) tie-broken ordering key map-side-combines like any
  *    min/max, so the corpus crosses the wire as one row per (metric,
  *    bucket, partition). No window, no sort (the former min_by/max_by
  *    struct buffers planned a SortAggregate pair — r18).
  *  - [[downsampleLttb]]: largest-triangle-three-buckets with FIXED anchors
  *    (each bucket's candidate areas are computed against the neighboring
  *    buckets' average points, not the previously SELECTED point). Classic
  *    LTTB's left anchor is the previous selection — an inherently
  *    sequential recurrence per metric; anchoring both sides at bucket
  *    averages (the right anchor already is, Steinarsson §4.2) removes the
  *    recurrence, so selection becomes an embarrassingly parallel
  *    per-bucket argmax: two corpus exchanges total (bucket-average
  *    aggregate; selection aggregate) with the tiny per-bucket anchor
  *    table broadcast back. First/last buckets keep their first/last raw
  *    point (the endpoint rule of the exact algorithm).
  *
  * Determinism/oracle notes: triangle areas are exact integers (µs × cents,
  * doubled — the /2 is monotone and dropped), ties broken by smallest
  * event_id — a lexicographic (area, −event_id) key pair under the typed
  * argmax here (unbounded id domain), the equivalent `area·2^63 − event_id`
  * HUGEINT encode in DuckDB (order-correct for every non-negative BIGINT
  * id). Integer bucket averages subtract a per-bucket base
  * (bx for x, min for y) before summing so the division operands are
  * non-negative — `div` (truncate) and DuckDB's `//` (floor) agree only
  * there — and so a bucket's sum is bounded by width·n (no epoch·n BIGINT
  * overflow until ~2.5e9 points per bucket).
  *
  * Scale: state is O(buckets × metrics) everywhere past the two corpus
  * aggregates, both of which combine map-side; the anchor join is
  * size-gated broadcast. A 100 TB series downsamples without any
  * per-metric single-task stage.
  */
object DownsampleOps {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)


  /** LTTB bucket width in microseconds (1 hour). */
  val LttbBucketUs: Long = 3600L * 1000000L

  // (The oracle's former single-integer selection key `area·2^63 −
  // event_id` is gone: with the sparse-series area widened to HUGEINT,
  // multiplying it by 2^63 again could exceed even int128. The oracle now
  // orders by the explicit (k1, k2) pair — DuckDB's ordered `first`
  // aggregate is its native lexicographic max_by.)

  /** Per-(metric, hour) candlestick: open/high/low/close + sample count.
    * Buckets are epoch-hour floors (`pmod` on unix µs), NOT session-tz
    * `date_trunc('hour', …)`: the streaming twin ([[graft.streaming
    * .StreamingOps.ohlcFlatMap]]) buckets on `floorMod` of epoch µs, and
    * the two agree under every session timezone only on the epoch form —
    * `date_trunc` shifts by the zone offset, so a fractional-offset
    * session (e.g. +05:30) would put stream and batch candles 30 min
    * apart. The batch LTTB sibling already buckets on epoch µs; this
    * makes OHLC the matching pair (identical output in a UTC session).
    */
  def downsampleOhlc(s: SparkSession, dir: String): DataFrame =
    downsampleOhlcOn(ev(s, dir))

  def downsampleOhlcOn(events: DataFrame): DataFrame = {
    val hourUs = 3600L * 1000000L
    events.filter(col("value").isNotNull)
      .withColumn("x", unix_micros(col("ts")))
      .select(col("event_type").as("metric"),
        timestamp_micros(expr(s"x - pmod(x, ${hourUs}L)")).as("bucket"),
        col("x"), col("ts"), col("event_id"), col("value"))
      .groupBy(col("metric"), col("bucket"))
      // open/close via the flat-buffer argmax (graft.functions.ArgMaxKey),
      // not min_by/max_by over a (ts, event_id) STRUCT: the struct buffer
      // forced the whole candlestick aggregate into a SortAggregate pair
      // (corpus-local sort below the exchange and above it). unix_micros
      // is strictly monotone in ts, so ordering by (x, event_id) is the
      // same order and min-selection is the argmax of the negated keys.
      .agg(
        graft.functions.ArgMaxKey.scalar(-col("x"), -col("event_id"),
          col("value")).as("open_v"),
        max(col("value")).as("high_v"),
        min(col("value")).as("low_v"),
        graft.functions.ArgMaxKey.scalar(col("x"), col("event_id"),
          col("value")).as("close_v"),
        count(lit(1)).as("n_samples"))
      .resultOrder(col("metric"), col("bucket"))
  }

  /** Fixed-anchor LTTB downsample to one representative point per
    * (metric, hour); first/last buckets keep their first/last raw point.
    * A single-bucket metric resolves through the first-bucket rule.
    */
  def downsampleLttb(s: SparkSession, dir: String): DataFrame =
    downsampleLttbOn(ev(s, dir))

  def downsampleLttbOn(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = events.filter(col("value").isNotNull)
      .select(col("event_type").as("metric"),
        col("ts"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("x"),
        floor(col("value") * 100 + 0.5).cast("long").as("y"))
      // pmod, not %: floor semantics keep pre-1970 timestamps in their
      // correct (lower) bucket and match the streaming twin's floorMod;
      // bare % truncates toward zero and would shift them up one bucket
      .withColumn("bx", expr(s"x - pmod(x, ${LttbBucketUs}L)"))
    val avgs = pts.groupBy(col("metric"), col("bx"))
      .agg(expr("bx + ((sum(x - bx)) div count(*))").as("xa"),
        // sum(y) − n·min(y) is the non-nested spelling of sum(y − min(y)):
        // a non-negative div operand without a second aggregation pass
        expr("min(y) + ((sum(y) - count(*) * min(y)) div count(*))").as("ya"))
    val w = Window.partitionBy(col("metric")).orderBy(col("bx"))
    val anchors = avgs.select(col("metric"), col("bx"),
      lag(col("xa"), 1).over(w).as("xl"), lag(col("ya"), 1).over(w).as("yl"),
      lead(col("xa"), 1).over(w).as("xr"), lead(col("ya"), 1).over(w).as("yr"))
    // area × 2 — exact DECIMAL(38,0). The factors are bounded by bucket
    // width only on a DENSE series; lag/lead run over the POPULATED
    // buckets, so on a sparse series (xl − xr) is the µs gap between
    // neighboring populated buckets — months of silence make it ~1e13 and
    // a BIGINT product of that against a large cents-diff silently wraps
    // under Spark's non-ANSI arithmetic, selecting the wrong point. Each
    // operand therefore widens to decimal(38,0) BEFORE the subtraction
    // (the µs values themselves can sit anywhere in the BIGINT domain)
    // and the whole area computes in 38-digit decimal; the oracle runs
    // the identical formula in HUGEINT. Both engines are exact while
    // |µs-diff| × |cents-diff| < 10^38 — every real timestamp span (±300
    // ky in µs ≈ 1e19) against cents up to ~1e19, vs the old silent wrap
    // at 9.2e18. The selection key is a lexicographic (primary, tie)
    // STRUCT, never a widened integer encode: an encode factor bounds the
    // domain it can order while struct comparison has no bound. The
    // endpoint branches negate to turn min-selection into the same max_by:
    // first bucket (−x, −id) ⇒ earliest point, last bucket (x, id) ⇒
    // latest, interior (area, −id) ⇒ largest triangle, smallest id on ties.
    def wide(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("decimal(38,0)")
    val area2 = abs((wide(col("xl")) - wide(col("xr"))) * (wide(col("y")) - wide(col("yl"))) -
      (wide(col("xl")) - wide(col("x"))) * (wide(col("yr")) - wide(col("yl"))))
    // the two key parts stay SEPARATE columns (k1 decimal(38,0), k2 long —
    // the same types the `when` coercion gave the former selkey STRUCT's
    // fields, so the comparison order is bit-identical): built-in
    // max_by(payload, struct(k1, k2)) keeps the struct in its aggregation
    // buffer, a non-UnsafeRow-mutable type that makes HashAggregateExec
    // ineligible and forced the selection into a SortAggregate PAIR — a
    // full corpus-local sort below the exchange and another above it
    // (r17 before-plan nodes 22-26). ArgMaxKey flattens the buffer to
    // mutable scalars so the identical (k1, k2) argmax hash-aggregates in
    // whole-stage codegen, no sort on either side (guide §4 — per-task
    // work — after the r17 rounds fixed the job shape).
    val selK1 =
      when(col("xl").isNull, wide(-col("x")))
        .when(col("xr").isNull, wide(col("x")))
        .otherwise(area2)
    val selK2 =
      when(col("xl").isNull, -col("event_id"))
        .when(col("xr").isNull, col("event_id"))
        .otherwise(-col("event_id"))
    pts.join(Tables.broadcastIfSmall(anchors), Seq("metric", "bx"))
      .groupBy(col("metric"), col("bx"))
      .agg(graft.functions.ArgMaxKey.structOf(selK1, selK2,
        "ts" -> col("ts"), "value" -> col("value")).as("sel"))
      .select(col("metric"), timestamp_micros(col("bx")).as("bucket"),
        col("sel.ts").as("ts"), col("sel.value").as("sel_value"))
      .resultOrder(col("metric"), col("bucket"))
  }

  val oracles: Map[String, String] = Map(
    "q_downsample_ohlc" ->
      """WITH p AS (
        |  SELECT event_type AS metric,
        |         make_timestamp(epoch_us(ts)
        |           - ((epoch_us(ts) % 3600000000 + 3600000000) % 3600000000)) AS bucket,
        |         ts, event_id, value
        |  FROM events WHERE value IS NOT NULL)
        |SELECT metric, bucket,
        |  first(value ORDER BY ts, event_id) AS open_v,
        |  max(value) AS high_v,
        |  min(value) AS low_v,
        |  last(value ORDER BY ts, event_id) AS close_v,
        |  count(*) AS n_samples
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_downsample_lttb" ->
      s"""WITH b AS (
         |  SELECT event_type AS metric, ts, event_id, value,
         |    epoch_us(ts) AS x,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
         |    epoch_us(ts) - ((epoch_us(ts) % ${LttbBucketUs} + ${LttbBucketUs}) % ${LttbBucketUs}) AS bx
         |  FROM events WHERE value IS NOT NULL),
         |a AS (
         |  SELECT metric, bx,
         |    bx + (sum(x - bx) // count(*)) AS xa,
         |    min(y) + ((sum(y) - count(*) * min(y)) // count(*)) AS ya
         |  FROM b GROUP BY 1, 2),
         |anch AS (
         |  SELECT metric, bx,
         |    lag(xa)  OVER w AS xl, lag(ya)  OVER w AS yl,
         |    lead(xa) OVER w AS xr, lead(ya) OVER w AS yr
         |  FROM a WINDOW w AS (PARTITION BY metric ORDER BY bx)),
         |c AS (
         |  SELECT b.metric, b.bx, b.ts, b.value, b.event_id,
         |    CASE WHEN xl IS NULL THEN -b.x::HUGEINT
         |         WHEN xr IS NULL THEN  b.x::HUGEINT
         |         ELSE abs((xl::HUGEINT - xr) * (b.y::HUGEINT - yl)
         |                - (xl::HUGEINT - b.x) * (yr::HUGEINT - yl))
         |    END AS k1,
         |    CASE WHEN xl IS NOT NULL AND xr IS NULL THEN b.event_id
         |         ELSE -b.event_id END AS k2
         |  FROM b JOIN anch USING (metric, bx))
         |SELECT metric, make_timestamp(bx) AS bucket,
         |  first(ts    ORDER BY k1 DESC, k2 DESC) AS ts,
         |  first(value ORDER BY k1 DESC, k2 DESC) AS sel_value
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
