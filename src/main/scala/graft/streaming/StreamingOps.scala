package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured-Streaming twins of the batch operators — the reference's actual
  * execution mode (3 daemon agents + TimescaleDB continuous aggregates).
  *
  * Batch results are the driver-scored signal; these twins prove the same
  * semantics hold incrementally:
  *  - `mvMinuteStream` ≙ the continuous aggregate with its 1-minute
  *    end_offset (init.sql:37-54) — watermark = end_offset: the in-progress
  *    bucket is never materialized, late rows beyond it are dropped.
  *  - `trendAlarms`/`edgeAlarms` ≙ DeviationTracker's ring buffer and the
  *    feeder edge flags (opcua_server/main.py:14-40,319-332) as
  *    flatMapGroupsWithState, keyed by (entity, metric) — state is O(1) per
  *    key, shuffled once; at 100 TB the state store is
  *    RocksDBStateStoreProvider and keys are high-cardinality safe.
  *  - `ingest` ≙ the MQTT→Kafka→DB dataflow (§3.1) collapsed into one job:
  *    JSON envelope decode → type dispatch → broadcast enrichment.
  */
object StreamingOps {

  // ---- shared scalar twins of the batch operators' numeric formulas.
  // These are load-bearing for digit-for-digit stream==batch parity:
  // every stateful twin must use THESE, never a local re-derivation, so
  // a future change to the half-adjust or rounding cannot silently split
  // the twins' arithmetic from Model.exactAvg4Sql / Model.roundN. ----

  /** Exact event-time micros of a Timestamp — getTime truncates to
    * millis; the sub-milli remainder lives in getNanos. The batch
    * windows order by full-microsecond ts, so per-batch twin sorts MUST
    * use this, not getTime: a millisecond-truncated key lets two
    * same-milli events process out of time order.
    */
  /** Inverse of [[tsMicros]]: a full-µs-precision Timestamp (the bare
    * millisecond constructor silently drops sub-ms digits — fine for
    * bucket-aligned instants, lossy for raw event times). */
  private[streaming] def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(java.lang.Math.floorDiv(us, 1000L))
    t.setNanos((java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private[streaming] def tsMicros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  /** DECIMAL(28,2) cents of a fixture-exact 2-decimal value. */
  private[streaming] def centsOf(value: Double): Long =
    BigDecimal(value)
      .setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValue

  /** Model.exactAvg4Sql re-expressed on longs: integer half-up mean of a
    * cents sum (sign-carrying half-adjust, truncating division — both
    * identical to Spark's `div` and DuckDB's `//` on these operands).
    */
  private[streaming] def exactAvg4Cents(sumCents: Long, n: Long): Double = {
    val half = if (sumCents < 0) -n else n
    ((sumCents * 200L + half) / (2L * n)).toDouble / 10000.0
  }

  /** Model.roundN(_, 4) re-expressed on doubles (portable half-up). */
  private[streaming] def round4(x: Double): Double =
    math.floor(x * 10000.0 + 0.5) / 10000.0

  case class MetricEvent(event_id: Long, ts: Timestamp, user_id: Long, metric: String, value: Double)
  case class TrendAlarm(user_id: Long, metric: String, event_id: Long, min_abs_pct: Double)
  case class EdgeAlarm(user_id: Long, metric: String, event_id: Long, value: Double)
  case class TrendState(recent: List[Double])
  case class EdgeState(below: Boolean)

  /** Continuous aggregate, streaming form, parameterized by grain and end
    * offset — the two knobs that distinguish the reference's two refresh
    * policies (init.sql:51-54 minute: 1-min end offset; init.sql:31-34
    * hourly: 1-hour end offset). Append mode: a bucket row is emitted
    * exactly once, when the watermark passes its end — the watermark IS the
    * end_offset: the in-progress bucket is never materialized.
    */
  def mvStream(events: DataFrame, grain: String, endOffset: String): DataFrame =
    events
      .withWatermark("ts", endOffset)
      .filter(col("value").isNotNull)
      .groupBy(window(col("ts"), grain), col("metric"))
      .agg(
        // the SAME order-independent decimal average as the batch MV
        // (RelationalOps.bucketAggOn / Model.exactAvg4): a plain double
        // avg is partition-order-dependent, so the streaming MV parquet
        // would differ digit-for-digit from the oracle-checked batch MV
        graft.model.Model.exactAvg4("value").as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(col("value")).as("sample_count")
      )
      .select(
        col("window.start").as("bucket"), col("metric"),
        col("avg_value"), col("min_value"), col("max_value"), col("sample_count")
      )

  /** The minute-grain policy (init.sql:51-54). */
  def mvMinuteStream(events: DataFrame): DataFrame =
    mvStream(events, "1 minute", "1 minute")

  val outputModeAppend: OutputMode = OutputMode.Append()

  /** Gap-session twin of SessionOps.sessionizeOn: `session_window` merges
    * in-progress sessions in the state store; a session row is emitted once,
    * when the watermark passes its close (start of a 30-min silence). Same
    * one-shuffle-on-user_id shape as the batch op.
    */
  def sessionizeStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.model.Model.exactSum(col("value"), 2).as("total_value")
      )
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"),
        col("total_value")
      )

  private def pctOf(metric: String, value: Double): Option[Double] = {
    // same per-metric setpoints as the batch twin (Model.targetCol) — one
    // source of truth, so a threshold change cannot split the twins
    val target = graft.model.Model.targetFor(metric)
    if (target == 0.0) None // guard: opcua_server/main.py:28-29
    else Some((value - target) / target * 100.0)
  }

  /** DeviationTracker ring buffer (3 deep) as explicit state: alarm iff the
    * buffer holds exactly 3 and all exceed 2% (opcua_server/main.py:31-39).
    */
  def trendFlatMap(
      key: (Long, String),
      rows: Iterator[MetricEvent],
      state: GroupState[TrendState]
  ): Iterator[TrendAlarm] = {
    val (userId, metric) = key
    var recent = state.getOption.map(_.recent).getOrElse(Nil)
    val out = scala.collection.mutable.ListBuffer.empty[TrendAlarm]
    // micro-batch rows are not ordered: sort by (ts, event_id) within batch
    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      pctOf(metric, e.value).foreach { pct =>
        recent = (recent :+ math.abs(pct)).takeRight(graft.model.Model.TrendWindow)
        // immediate precedence (opcua_server/main.py:35-36): record()
        // returns on the >10% check before the trend rule, so this cycle
        // feeds the buffer but cannot emit a trend alarm itself
        if (recent.size == graft.model.Model.TrendWindow &&
          recent.forall(_ > graft.model.Model.TrendDeviationPct) &&
          math.abs(pct) <= graft.model.Model.ImmediateDeviationPct)
          // round like the batch twin (round(min_abs_pct, 4)) so the two
          // output contracts agree digit-for-digit
          out += TrendAlarm(userId, metric, e.event_id,
            // same portable rounding as the batch twin (Model.roundN)
            round4(recent.min))
      }
    }
    state.update(TrendState(recent))
    out.iterator
  }

  /** Feeder edge flags (opcua_server/main.py:319-332): fire on the downward
    * crossing, re-arm at/above threshold. Initial state un-alarmed (:130).
    */
  def edgeFlatMap(threshold: Double)(
      key: (Long, String),
      rows: Iterator[MetricEvent],
      state: GroupState[EdgeState]
  ): Iterator[EdgeAlarm] = {
    val (userId, metric) = key
    var below = state.getOption.exists(_.below)
    val out = scala.collection.mutable.ListBuffer.empty[EdgeAlarm]
    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      if (e.value < threshold) {
        if (!below) out += EdgeAlarm(userId, metric, e.event_id, e.value)
        below = true
      } else below = false
    }
    state.update(EdgeState(below))
    out.iterator
  }

  def trendAlarms(events: Dataset[MetricEvent]): Dataset[TrendAlarm] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.metric))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(trendFlatMap)
  }

  def edgeAlarms(events: Dataset[MetricEvent], threshold: Double): Dataset[EdgeAlarm] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.metric))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(edgeFlatMap(threshold))
  }

  case class CounterState(lastCents: Long)
  case class CounterInc(metric: String, event_id: Long, inc_cents: Long)

  /** Streaming twin of RelationalOps.counterRate's per-sample increases:
    * one long of state per metric (the last counter reading in exact
    * cents), reset detection identical to the batch CASE. Emits the
    * per-sample increase stream; the hour-bucket rollup downstream is the
    * standard watermarked window aggregate and is already covered by the
    * mv twins. First sample of a metric establishes the baseline and
    * emits nothing, matching the batch lag-null drop.
    *
    * IN-ORDER ARRIVAL ASSUMPTION: rows are sorted by (ts, event_id) only
    * WITHIN each micro-batch; a sample arriving in a later micro-batch
    * with an earlier event time is applied against the carried state out
    * of order, and the reset heuristic then reads the backward jump as a
    * counter restart, inflating the increase. Feed this operator from an
    * ordered-per-key transport (the replay source and Kafka-per-partition
    * both guarantee it); under genuinely disordered delivery, buffer by
    * event-time watermark upstream before applying deltas.
    */
  def counterIncFlatMap(
      metric: String,
      rows: Iterator[MetricEvent],
      state: GroupState[CounterState]
  ): Iterator[CounterInc] = {
    var last = state.getOption.map(_.lastCents)
    val out = scala.collection.mutable.ListBuffer.empty[CounterInc]
    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      val cents = math.floor(e.value * 100 + 0.5).toLong
      last match {
        case Some(prev) =>
          out += CounterInc(metric, e.event_id, if (cents >= prev) cents - prev else cents)
        case None => () // baseline sample: no increase yet
      }
      last = Some(cents)
    }
    last.foreach(c => state.update(CounterState(c)))
    out.iterator
  }

  def counterIncrements(events: Dataset[MetricEvent]): Dataset[CounterInc] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(counterIncFlatMap)
  }

  case class SpcLimits(mean: Double, sd: Double)
  case class SpcState(above: Boolean, runLen: Int)
  case class SpcAlarm(metric: String, event_id: Long, value: Double,
      rule1_3sigma: Boolean, rule4_run: Boolean)

  /** Streaming twin of RelationalOps.spcRules, run the way production SPC
    * actually runs: control limits are FIXED, computed once from a
    * baseline period (the batch operator's mean/σ), and the stream is
    * judged against them — rule 1 is a stateless compare, rule 4 carries
    * one (side, runLength) pair of state per metric. Emits only rows
    * that fire a rule.
    *
    * Same in-order arrival assumption as [[counterIncFlatMap]]: ordering
    * is per-micro-batch; rule 4's run counter is only meaningful when the
    * per-metric stream arrives in event-time order (true for the replay
    * source and per-partition Kafka). Rule 1 is order-independent.
    */
  def spcFlatMap(limits: Map[String, SpcLimits], runLen: Int)(
      metric: String,
      rows: Iterator[MetricEvent],
      state: GroupState[SpcState]
  ): Iterator[SpcAlarm] = {
    val out = scala.collection.mutable.ListBuffer.empty[SpcAlarm]
    limits.get(metric).foreach { lim =>
      var st = state.getOption.getOrElse(SpcState(above = false, runLen = 0))
      rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
        val above = e.value > lim.mean
        st = if (st.runLen > 0 && above == st.above) SpcState(above, st.runLen + 1)
          else SpcState(above, 1)
        val rule1 = math.abs(e.value - lim.mean) > 3.0 * lim.sd
        val rule4 = st.runLen >= runLen
        if (rule1 || rule4) out += SpcAlarm(metric, e.event_id, e.value, rule1, rule4)
      }
      state.update(st)
    }
    out.iterator
  }

  def spcAlarms(events: Dataset[MetricEvent], limits: Map[String, SpcLimits],
      runLen: Int = graft.ops.RelationalOps.SpcRunLen): Dataset[SpcAlarm] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        spcFlatMap(limits, runLen))
  }

  case class TwState(bucketUs: Long, lastTsUs: Long, lastCents: Long,
      sumCentsDt: Long, sumDtUs: Long, n: Long)
  case class TwRow(metric: String, bucket: Timestamp, twa: Double, n_samples: Long)

  /** Streaming twin of RelationalOps.timeWeight (the irregular-sampling
    * time-weighted hourly average): per metric, each sample's weight is
    * the microseconds until the next sample in the same hour bucket, the
    * last sample extending to the bucket end — so a bucket's row is fully
    * determined the moment the first sample of a LATER bucket arrives,
    * and that is when the twin emits it (closed-bucket convention, same
    * as the mv twins' watermark close). State per metric is O(1): the
    * open bucket's running exact-integer sums plus the last sample. The
    * tail bucket stays open awaiting its closing sample, exactly like an
    * in-progress bucket under the batch recompute's next refresh.
    *
    * Arithmetic is the batch operator's, verbatim: integer cents × exact
    * integer microseconds, one double division, portable half-up rounding
    * to 4 digits — so closed buckets match the batch output
    * digit-for-digit. Same in-order arrival assumption as
    * [[counterIncFlatMap]] (sorted within each micro-batch; ordered-per-
    * key transport across batches).
    */
  def timeWeightFlatMap(
      metric: String,
      rows: Iterator[MetricEvent],
      state: GroupState[TwState]
  ): Iterator[TwRow] = {
    val HourUs = 3600L * 1000000L
    val out = scala.collection.mutable.ListBuffer.empty[TwRow]
    var st = state.getOption.orNull
    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      val tsUs = tsMicros(e.ts)
      val cents = math.floor(e.value * 100 + 0.5).toLong
      val bucket = tsUs - java.lang.Math.floorMod(tsUs, HourUs)
      if (st == null) st = TwState(bucket, tsUs, cents, 0L, 0L, 1L)
      else if (bucket == st.bucketUs) {
        val dt = tsUs - st.lastTsUs
        st = TwState(bucket, tsUs, cents,
          st.sumCentsDt + st.lastCents * dt, st.sumDtUs + dt, st.n + 1L)
      } else {
        val dt = st.bucketUs + HourUs - st.lastTsUs
        val sumCd = st.sumCentsDt + st.lastCents * dt
        val sumDt = st.sumDtUs + dt
        out += TwRow(metric, new Timestamp(st.bucketUs / 1000L),
          round4(sumCd.toDouble / sumDt.toDouble / 100.0),
          st.n)
        st = TwState(bucket, tsUs, cents, 0L, 0L, 1L)
      }
    }
    if (st != null) state.update(st)
    out.iterator
  }

  def timeWeightStream(events: Dataset[MetricEvent]): Dataset[TwRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(timeWeightFlatMap)
  }

  case class OhlcState(bucketUs: Long, openV: Double, highV: Double,
      lowV: Double, closeV: Double, n: Long)
  case class OhlcRow(metric: String, bucket: Timestamp, open_v: Double,
      high_v: Double, low_v: Double, close_v: Double, n_samples: Long)

  /** Streaming twin of the candlestick downsample
    * (DownsampleOps.downsampleOhlc): per metric, O(1) state — the open
    * hour's open/high/low/close/count — emitted when the first sample of a
    * later hour arrives. Values are the raw doubles the batch operator
    * aggregates with min_by/max_by on (ts, event_id), reproduced here by
    * the family's in-order arrival convention (sorted within each
    * micro-batch; ordered-per-key transport across batches), so closed
    * buckets equal the batch rows exactly. Same closed-bucket emission
    * convention as [[timeWeightFlatMap]].
    */
  def ohlcFlatMap(
      metric: String,
      rows: Iterator[MetricEvent],
      state: GroupState[OhlcState]
  ): Iterator[OhlcRow] = {
    val HourUs = 3600L * 1000000L
    val out = scala.collection.mutable.ListBuffer.empty[OhlcRow]
    var st = state.getOption.orNull
    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      val tsUs = tsMicros(e.ts)
      val bucket = tsUs - java.lang.Math.floorMod(tsUs, HourUs)
      if (st == null) st = OhlcState(bucket, e.value, e.value, e.value, e.value, 1L)
      else if (bucket == st.bucketUs)
        st = OhlcState(bucket, st.openV, math.max(st.highV, e.value),
          math.min(st.lowV, e.value), e.value, st.n + 1L)
      else {
        out += OhlcRow(metric, new Timestamp(st.bucketUs / 1000L),
          st.openV, st.highV, st.lowV, st.closeV, st.n)
        st = OhlcState(bucket, e.value, e.value, e.value, e.value, 1L)
      }
    }
    if (st != null) state.update(st)
    out.iterator
  }

  def ohlcStream(events: Dataset[MetricEvent]): Dataset[OhlcRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(ohlcFlatMap)
  }

  case class LttbPt(xUs: Long, yCents: Long, eventId: Long, ts: Timestamp, value: Double)
  case class LttbState(
      hasLeft: Boolean, leftXa: Long, leftYa: Long,
      pendingBx: Long, pendingPts: Seq[LttbPt],
      curBx: Long, curPts: Seq[LttbPt])
  case class LttbRow(metric: String, bucket: Timestamp, ts: Timestamp, sel_value: Double)

  private def lttbAvg(bx: Long, pts: Seq[LttbPt]): (Long, Long) = {
    // the batch operator's integer averages verbatim: per-bucket base (bx
    // for x, min for y) keeps the division operands non-negative
    val n = pts.size
    val ymin = pts.map(_.yCents).min
    (bx + pts.map(_.xUs - bx).sum / n,
      ymin + (pts.map(_.yCents).sum - n * ymin) / n)
  }

  /** Streaming twin of the fixed-anchor LTTB downsample
    * (DownsampleOps.downsampleLttb). A bucket's selection needs its
    * neighbors' AVERAGE points, so a closed bucket waits in state as
    * `pending` until its right-anchor bucket also closes, then emits; the
    * metric's FIRST bucket keeps its first raw point (the batch endpoint
    * rule) and needs no right anchor, so it emits at its own close. The
    * stream therefore emits exactly the batch rows for every bucket
    * except each metric's last two (the still-open bucket, and the
    * pending one whose right anchor is still accumulating) — the
    * two-sided anchor dependency made explicit.
    *
    * State per metric is O(2 bucket populations) — the pending bucket's
    * points (selection candidates) plus the open bucket's; bounded by
    * bucket width × arrival rate, independent of stream length. Exact
    * integer area arithmetic and tie-breaks are the batch operator's;
    * same in-order arrival convention as [[timeWeightFlatMap]].
    */
  def lttbFlatMap(
      metric: String,
      rows: Iterator[MetricEvent],
      state: GroupState[LttbState]
  ): Iterator[LttbRow] = {
    val BUs = graft.ops.DownsampleOps.LttbBucketUs
    val out = scala.collection.mutable.ListBuffer.empty[LttbRow]

    // local mutable view of the state: the open bucket accumulates in an
    // ArrayBuffer (appending through the immutable state Seq per point is
    // O(points²) per bucket), written back to the case class once per
    // invocation
    var hasLeft = false
    var leftXa = 0L
    var leftYa = 0L
    var pendingBx = -1L
    var pendingPts: Seq[LttbPt] = Nil
    var curBx = -1L
    val curPts = scala.collection.mutable.ArrayBuffer.empty[LttbPt]
    var started = false
    state.getOption.foreach { s =>
      hasLeft = s.hasLeft; leftXa = s.leftXa; leftYa = s.leftYa
      pendingBx = s.pendingBx; pendingPts = s.pendingPts
      curBx = s.curBx; curPts ++= s.curPts
      started = true
    }

    def selectFirst(pts: Seq[LttbPt]): LttbPt =
      pts.minBy(p => (p.xUs, p.eventId))
    // area in BigInt, matching the batch operator's decimal(38,0)
    // widening: on a sparse series (xl − xr) spans the gap between
    // populated buckets, and the Long product would silently wrap
    def selectMid(pts: Seq[LttbPt], xl: Long, yl: Long, xr: Long, yr: Long): LttbPt =
      pts.maxBy(p => (((BigInt(xl) - BigInt(xr)) * (BigInt(p.yCents) - BigInt(yl)) -
        (BigInt(xl) - BigInt(p.xUs)) * (BigInt(yr) - BigInt(yl))).abs, -p.eventId))
    def emit(bx: Long, p: LttbPt): Unit =
      out += LttbRow(metric, new Timestamp(bx / 1000L), p.ts, p.value)

    def close(): Unit = {
      val closed = curPts.toSeq
      val cAvg = lttbAvg(curBx, closed)
      if (pendingPts.nonEmpty) {
        emit(pendingBx, selectMid(pendingPts, leftXa, leftYa, cAvg._1, cAvg._2))
        val pAvg = lttbAvg(pendingBx, pendingPts)
        hasLeft = true; leftXa = pAvg._1; leftYa = pAvg._2
        pendingBx = curBx; pendingPts = closed
      } else if (!hasLeft) {
        emit(curBx, selectFirst(closed))
        hasLeft = true; leftXa = cAvg._1; leftYa = cAvg._2
      } else {
        pendingBx = curBx; pendingPts = closed
      }
      curPts.clear()
    }

    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      val tsUs = tsMicros(e.ts)
      val bucket = tsUs - java.lang.Math.floorMod(tsUs, BUs)
      val pt = LttbPt(tsUs, centsOf(e.value), e.event_id, e.ts, e.value)
      if (!started) { started = true; curBx = bucket }
      else if (bucket != curBx) { close(); curBx = bucket }
      curPts += pt
    }
    if (started)
      state.update(LttbState(hasLeft, leftXa, leftYa, pendingBx, pendingPts, curBx, curPts.toSeq))
    out.iterator
  }

  def lttbStream(events: Dataset[MetricEvent]): Dataset[LttbRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(lttbFlatMap)
  }

  case class HeartbeatState(lastTsUs: Long)
  case class Interruption(metric: String, down_from: Timestamp, down_us: Long)

  /** Streaming twin of the liveness operator's interruption counting
    * (SessionOps.uptimeOn): one long of state per metric — the last
    * heartbeat's timestamp — and an [[Interruption]] row fires the moment
    * a heartbeat arrives more than the timeout after the previous one
    * (the alert shape a monitoring pipeline actually wants; the batch
    * operator's `interruptions` column is exactly the count of these
    * rows, and `down_from`/`down_us` name the silent interval). Same
    * in-order arrival convention as [[counterIncFlatMap]].
    */
  def heartbeatFlatMap(
      metric: String,
      rows: Iterator[MetricEvent],
      state: GroupState[HeartbeatState]
  ): Iterator[Interruption] = {
    val timeoutUs = graft.ops.SessionOps.UptimeTimeoutMin * 60L * 1000000L
    val out = scala.collection.mutable.ListBuffer.empty[Interruption]
    var last = state.getOption.map(_.lastTsUs).getOrElse(Long.MinValue)
    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      val tsUs = tsMicros(e.ts)
      if (last != Long.MinValue && tsUs - last > timeoutUs)
        out += Interruption(metric, tsFromMicros(last), tsUs - last)
      last = math.max(last, tsUs)
    }
    if (last != Long.MinValue) state.update(HeartbeatState(last))
    out.iterator
  }

  def heartbeatStream(events: Dataset[MetricEvent]): Dataset[Interruption] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(heartbeatFlatMap)
  }

  case class StateAggState(state: String, enteredUs: Long)
  case class StateDwell(user_id: Long, state: String, entered_at: Timestamp, dwell_us: Long)

  /** Streaming twin of the time-in-state operator
    * (SessionOps.stateAggOn): per user the state is ONE (state,
    * entered_at) pair — the currently-open state — and a user's arriving
    * event CLOSES it, emitting a [[StateDwell]] row with the exact-µs
    * dwell (the event's own state then opens). The emitted closures are
    * the batch operator's dwell terms verbatim: batch `total_us` per
    * state equals the sum of streamed dwells (open states contribute
    * zero there too), and batch `n_entries` equals closed rows + open
    * states — StreamingSpec recomputes both across random batch splits.
    * Same in-order arrival convention as [[counterIncFlatMap]]; state is
    * O(1) per user.
    */
  def stateAggFlatMap(
      userId: Long,
      rows: Iterator[MetricEvent],
      state: GroupState[StateAggState]
  ): Iterator[StateDwell] = {
    val out = scala.collection.mutable.ListBuffer.empty[StateDwell]
    var cur = state.getOption
    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      val tsUs = tsMicros(e.ts)
      cur.foreach { c =>
        out += StateDwell(userId, c.state, tsFromMicros(c.enteredUs), tsUs - c.enteredUs)
      }
      cur = Some(StateAggState(e.metric, tsUs)) // metric carries event_type here
    }
    cur.foreach(state.update)
    out.iterator
  }

  def stateAggStream(events: Dataset[MetricEvent]): Dataset[StateDwell] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(stateAggFlatMap)
  }

  case class FunnelState(firsts: Seq[Long])
  case class StageAdvance(user_id: Long, stage: Int, event_type: String, at: Timestamp)

  /** Streaming twin of the ordered-sequence funnel
    * (SessionOps.funnelOn): per user the state is the K-vector of first
    * qualifying stage times (Long.MinValue = unreached — the batch
    * fold's null slots), and a [[StageAdvance]] row emits the moment a
    * user advances a stage. The sequential per-user fold is the batch
    * operator's verbatim (stage k advances iff unreached and strictly
    * after stage k−1's first time), so the streamed advances ARE the
    * batch counts: per stage, batch `n_users` equals the advance rows —
    * StreamingSpec reconciles across random batch splits. `metric`
    * carries the event_type; same in-order arrival convention as
    * [[counterIncFlatMap]]; state is O(K) per user.
    */
  def funnelFlatMap(stages: Seq[String])(
      userId: Long,
      rows: Iterator[MetricEvent],
      state: GroupState[FunnelState]
  ): Iterator[StageAdvance] = {
    val out = scala.collection.mutable.ListBuffer.empty[StageAdvance]
    val firsts = state.getOption.map(_.firsts.toArray)
      .getOrElse(Array.fill(stages.size)(Long.MinValue))
    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      val idx = stages.indexOf(e.metric)
      if (idx >= 0 && firsts(idx) == Long.MinValue &&
          (idx == 0 || (firsts(idx - 1) != Long.MinValue && tsMicros(e.ts) > firsts(idx - 1)))) {
        firsts(idx) = tsMicros(e.ts)
        out += StageAdvance(userId, idx + 1, stages(idx), tsFromMicros(firsts(idx)))
      }
    }
    state.update(FunnelState(firsts.toSeq))
    out.iterator
  }

  def funnelStream(events: Dataset[MetricEvent],
      stages: Seq[String] = graft.ops.SessionOps.FunnelStages): Dataset[StageAdvance] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        funnelFlatMap(stages))
  }

  case class DistinctState(users: Seq[Long])
  case class DistinctRow(metric: String, n_users: Long)

  /** Streaming twin of the per-metric distinct-user cardinality
    * (SessionOps.approxDistinct's exact column): per metric, the state is
    * the user-id set itself, and a batch emits the new running count
    * whenever it grew — so the latest row per metric always equals the
    * batch recompute over everything seen. State is O(distinct users per
    * metric), the reference's bounded entity space; an unbounded id
    * domain wants the mergeable HLL sketch the batch operator's
    * approx_n_users column demonstrates (constant memory, ±2%) instead
    * of exactness — the same exact/approx pairing as percentiles.
    */
  def distinctFlatMap(
      metric: String,
      rows: Iterator[MetricEvent],
      state: GroupState[DistinctState]
  ): Iterator[DistinctRow] = {
    val before = state.getOption.map(_.users.toSet).getOrElse(Set.empty[Long])
    val after = before ++ rows.map(_.user_id)
    state.update(DistinctState(after.toSeq))
    if (after.size != before.size) Iterator.single(DistinctRow(metric, after.size.toLong))
    else Iterator.empty
  }

  def distinctStream(events: Dataset[MetricEvent]): Dataset[DistinctRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(distinctFlatMap)
  }

  case class PctState(bucketUs: Long, counts: Map[Long, Long])
  case class PctRow(metric: String, bucket: Timestamp, p_permille: Int,
      p_value: Double, n_samples: Long)

  /** Streaming twin of the discrete-percentile family
    * (RelationalOps.percentiles) at the continuous-aggregate grain: per
    * metric, the open HOUR accumulates a value→count map; when the first
    * sample of a later hour arrives, the closed hour emits one row per
    * target in [[graft.ops.RelationalOps.PercentilesPerMille]], selecting
    * the value whose ascending rank interval covers
    * `max(1, ceil(p·n/1000))` — the batch operator's exact integer rank
    * arithmetic on the same integer-cents domain, so the returned value
    * is an actual sample, never an interpolation.
    *
    * State per metric is O(distinct values in the open hour), the same
    * bound that makes the batch value-counting plan scale (the
    * reference's 2-decimal bounded sensor domains keep it in the
    * thousands regardless of rate); an unbounded continuous domain wants
    * the constant-memory sketch (percentilesApprox) instead. Same
    * closed-bucket convention and in-order arrival assumption as
    * [[timeWeightFlatMap]].
    */
  def percentilesFlatMap(
      metric: String,
      rows: Iterator[MetricEvent],
      state: GroupState[PctState]
  ): Iterator[PctRow] = {
    val HourUs = 3600L * 1000000L
    val out = scala.collection.mutable.ListBuffer.empty[PctRow]
    var st = state.getOption.orNull
    def emit(s: PctState): Unit = {
      val n = s.counts.valuesIterator.sum
      val sorted = s.counts.toSeq.sortBy(_._1)
      graft.ops.RelationalOps.PercentilesPerMille.foreach { pm =>
        val target = math.max(1L, (n * pm + 999L) / 1000L)
        var cum = 0L
        val hit = sorted.find { case (_, c) => cum += c; cum >= target }.get._1
        out += PctRow(metric, new Timestamp(s.bucketUs / 1000L), pm,
          hit.toDouble / 100.0, n)
      }
    }
    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      val tsUs = tsMicros(e.ts)
      val cents = centsOf(e.value)
      val bucket = tsUs - java.lang.Math.floorMod(tsUs, HourUs)
      if (st == null) st = PctState(bucket, Map(cents -> 1L))
      else if (bucket == st.bucketUs)
        st = st.copy(counts = st.counts.updated(cents, st.counts.getOrElse(cents, 0L) + 1L))
      else {
        emit(st)
        st = PctState(bucket, Map(cents -> 1L))
      }
    }
    if (st != null) state.update(st)
    out.iterator
  }

  def percentilesStream(events: Dataset[MetricEvent]): Dataset[PctRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(percentilesFlatMap)
  }

  case class LocfState(bucketUs: Long, sumCents: Long, n: Long)
  case class LocfRow(metric: String, bucket: Timestamp, avg_value: Option[Double],
      locf_value: Double, is_gap: Boolean, sample_count: Long)

  /** Streaming twin of RelationalOps.gapfillLocf (minute-grain gap-fill
    * with last-observation-carried-forward): per metric, a minute bucket
    * closes — and every empty minute between it and the next observation
    * fills with its carried average — the moment the first sample of a
    * LATER minute arrives. Same closed-bucket convention and in-order
    * arrival assumption as [[timeWeightFlatMap]]; state per metric is
    * O(1) (the open minute's exact-decimal running sum). The average is
    * the batch operator's integer half-up formula (Model.exactAvg4Sql)
    * re-expressed on longs, so closed rows match digit-for-digit.
    */
  /** Upper bound on synthetic rows per gap in the streaming gap-fill
    * twins (30 days of minutes). The batch operators are spine-bounded —
    * the generate cannot outrun the data's own time range — but a stream
    * has no spine: ONE corrupt far-future timestamp (e.g. nanoseconds
    * where micros belong, a 1000× forward jump) would otherwise expand
    * into millions of in-memory rows inside one flatMapGroupsWithState
    * call AND burn the poisoned bucket into the state store, so recovery
    * replays the explosion. A wider gap fills its first 30 days and warns
    * (task log); real observations are never dropped.
    */
  val MaxGapFillMinutes: Long = 60L * 24L * 30L

  private def warnGapTruncated(metric: String, fromUs: Long, toUs: Long): Unit =
    System.err.println(
      s"[graft] gap-fill truncated at $MaxGapFillMinutes minutes for metric " +
        s"'$metric': gap ${fromUs}us -> ${toUs}us exceeds the bound " +
        "(corrupt timestamp?)")

  def gapfillLocfFlatMap(
      metric: String,
      rows: Iterator[MetricEvent],
      state: GroupState[LocfState]
  ): Iterator[LocfRow] = {
    val MinUs = 60L * 1000000L
    val out = scala.collection.mutable.ListBuffer.empty[LocfRow]
    var st = state.getOption.orNull
    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      val tsUs = tsMicros(e.ts)
      val bucket = tsUs - java.lang.Math.floorMod(tsUs, MinUs)
      val cents = centsOf(e.value)
      if (st == null) st = LocfState(bucket, cents, 1L)
      else if (bucket == st.bucketUs) st = LocfState(bucket, st.sumCents + cents, st.n + 1L)
      else {
        val avg = exactAvg4Cents(st.sumCents, st.n)
        out += LocfRow(metric, new Timestamp(st.bucketUs / 1000L),
          Some(avg), avg, is_gap = false, st.n)
        var g = st.bucketUs + MinUs
        var filled = 0L
        while (g < bucket && filled < MaxGapFillMinutes) {
          out += LocfRow(metric, new Timestamp(g / 1000L), None, avg, is_gap = true, 0L)
          g += MinUs
          filled += 1L
        }
        if (g < bucket) warnGapTruncated(metric, st.bucketUs, bucket)
        st = LocfState(bucket, cents, 1L)
      }
    }
    if (st != null) state.update(st)
    out.iterator
  }

  def gapfillLocfStream(events: Dataset[MetricEvent]): Dataset[LocfRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(gapfillLocfFlatMap)
  }

  case class InterpState(bucketUs: Long, sumCents: Long, n: Long,
      prevBucketUs: Long, prevAvg: Double, hasPrev: Boolean)
  case class InterpRow(metric: String, bucket: Timestamp, avg_value: Option[Double],
      interp_value: Double, is_gap: Boolean)

  /** Streaming twin of RelationalOps.gapfillInterp (linear interpolation
    * between observed minutes): a gap minute's value needs BOTH
    * endpoints, so the segment between two observations — its gap rows
    * and its right endpoint — emits when the right endpoint's minute
    * CLOSES (first sample of a later minute arrives). That is one bucket
    * later than the locf twin's emission, the structural price of
    * interpolation in a stream. State per metric is O(1): the open
    * minute's running sum plus the last closed observation. The double
    * operation sequence (seconds-ratio multiply-add, portable half-up
    * round) is the batch operator's, so emitted rows match
    * digit-for-digit.
    */
  def gapfillInterpFlatMap(
      metric: String,
      rows: Iterator[MetricEvent],
      state: GroupState[InterpState]
  ): Iterator[InterpRow] = {
    val MinUs = 60L * 1000000L
    val out = scala.collection.mutable.ListBuffer.empty[InterpRow]
    var st = state.getOption.orNull
    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      val tsUs = tsMicros(e.ts)
      val bucket = tsUs - java.lang.Math.floorMod(tsUs, MinUs)
      val cents = centsOf(e.value)
      if (st == null)
        st = InterpState(bucket, cents, 1L, 0L, 0.0, hasPrev = false)
      else if (bucket == st.bucketUs)
        st = st.copy(sumCents = st.sumCents + cents, n = st.n + 1L)
      else {
        val vN = exactAvg4Cents(st.sumCents, st.n)
        if (st.hasPrev) {
          // gap minutes between the previous observation and this one:
          // the batch ratio is integer SECONDS divided as doubles
          val spanS = ((st.bucketUs - st.prevBucketUs) / 1000000L).toDouble
          var g = st.prevBucketUs + MinUs
          var filled = 0L
          while (g < st.bucketUs && filled < MaxGapFillMinutes) {
            val ratio = ((g - st.prevBucketUs) / 1000000L).toDouble / spanS
            out += InterpRow(metric, new Timestamp(g / 1000L), None,
              round4(st.prevAvg + (vN - st.prevAvg) * ratio), is_gap = true)
            g += MinUs
            filled += 1L
          }
          if (g < st.bucketUs) warnGapTruncated(metric, st.prevBucketUs, st.bucketUs)
        }
        out += InterpRow(metric, new Timestamp(st.bucketUs / 1000L),
          Some(vN), round4(vN), is_gap = false)
        st = InterpState(bucket, cents, 1L, st.bucketUs, vN, hasPrev = true)
      }
    }
    if (st != null) state.update(st)
    out.iterator
  }

  def gapfillInterpStream(events: Dataset[MetricEvent]): Dataset[InterpRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(gapfillInterpFlatMap)
  }

  case class AsofEvent(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class AsofState(clickTs: Timestamp, clickValue: Double)
  case class AsofRow(event_id: Long, user_id: Long, ts: Timestamp, value: Double,
      click_ts: Timestamp, click_value: Double)

  /** Streaming twin of RelationalOps.asofJoin (attach to every 'error'
    * the most recent prior-or-same-instant 'click' of the same user):
    * per user, one click of state — the stream-native form of the batch
    * tagged-union carry, emitting each enriched error the moment it
    * arrives (no closed-bucket lag: the as-of lookup only ever needs the
    * PAST). Same-instant click-before-error ordering (the batch side
    * marker) falls out of the per-batch sort; same in-order arrival
    * assumption as the other twins, and errors with no prior click drop
    * (inner as-of).
    */
  def asofFlatMap(
      userId: Long,
      rows: Iterator[AsofEvent],
      state: GroupState[AsofState]
  ): Iterator[AsofRow] = {
    val out = scala.collection.mutable.ListBuffer.empty[AsofRow]
    var st = state.getOption.orNull
    // (ts, click-before-error, event_id): the batch window's exact order
    rows.toSeq.sortBy(e => (tsMicros(e.ts), if (e.event_type == "click") 0 else 1, e.event_id))
      .foreach { e =>
        e.event_type match {
          case "click" => st = AsofState(e.ts, e.value)
          case "error" if st != null =>
            out += AsofRow(e.event_id, userId, e.ts, e.value, st.clickTs, st.clickValue)
          case _ => ()
        }
      }
    if (st != null) state.update(st)
    out.iterator
  }

  def asofStream(events: Dataset[AsofEvent]): Dataset[AsofRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(asofFlatMap)
  }

  case class RecoveryState(latest: Map[String, Double], wasRecoverable: Boolean)
  case class Recovery(user_id: Long, event_id: Long, last_error: Double)

  /** Auto-recovery rule as a stream (opcua_server/main.py:411-431): per
    * entity, track the latest value of each metric; emit a recovery event on
    * the transition into "recoverable" (latest error > 100 while all three
    * feed metrics are healthy > 5) — edge-triggered like the reference's
    * resume path, which fires once per Error episode. State is O(metrics)
    * per entity.
    */
  def recoveryFlatMap(
      userId: Long,
      rows: Iterator[MetricEvent],
      state: GroupState[RecoveryState]
  ): Iterator[Recovery] = {
    var st = state.getOption.getOrElse(RecoveryState(Map.empty, wasRecoverable = false))
    val out = scala.collection.mutable.ListBuffer.empty[Recovery]
    rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      val latest = st.latest.updated(e.metric, e.value)
      val recoverable =
        latest.getOrElse("error", 0.0) > 100.0 &&
          Seq("click", "view", "purchase").forall(m => latest.getOrElse(m, 0.0) > 5.0)
      if (recoverable && !st.wasRecoverable)
        out += Recovery(userId, e.event_id, latest("error"))
      st = RecoveryState(latest, recoverable)
    }
    state.update(st)
    out.iterator
  }

  def recoveries(events: Dataset[MetricEvent]): Dataset[Recovery] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(recoveryFlatMap)
  }

  case class BandedDoc(band: Int, bh: Int, doc_id: Long)
  case class BucketDocs(docIds: List[Long])
  case class CandPair(i: Long, j: Long)

  /** Per-bucket incremental candidate emission: a new doc pairs with every
    * doc already resident in its (band, bandHash) bucket, exactly once.
    * Within a micro-batch, docs are processed in doc_id order so output is
    * deterministic under any batch split. State per bucket is the doc-id
    * list — LSH buckets are small by construction (that is the point of
    * banding), and at 100 TB the state store is RocksDB, keyed by the same
    * (band, bh) the batch join shuffles on.
    */
  def minhashCandidateFlatMap(
      key: (Int, Int),
      rows: Iterator[BandedDoc],
      state: GroupState[BucketDocs]
  ): Iterator[CandPair] = {
    var seen = state.getOption.map(_.docIds).getOrElse(Nil)
    val out = scala.collection.mutable.ListBuffer.empty[CandPair]
    rows.toSeq.sortBy(_.doc_id).foreach { d =>
      if (!seen.contains(d.doc_id)) { // re-delivery safe
        seen.foreach { s =>
          out += CandPair(math.min(s, d.doc_id), math.max(s, d.doc_id))
        }
        seen = d.doc_id :: seen
      }
    }
    state.update(BucketDocs(seen))
    out.iterator
  }

  /** Streaming twin of the MinHash candidate generation: documents arriving
    * on a stream are signed IN-ROW (the same WordShingleHashes / MinHashSig
    * natives as the batch op — identical buckets, hence identical candidate
    * set), banded, and checked against the bucket's resident docs in the
    * state store. Emits each candidate pair once per shared band; the
    * consumer dedups (i, j) and verifies exact Jaccard in a periodic batch
    * pass — the standard incremental-dedup split: candidate generation must
    * see every arriving doc immediately, verification is embarrassingly
    * batch. Input: streaming (doc_id, text).
    */
  def minhashCandidatesStream(docs: DataFrame): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    import graft.ops.DedupOps
    val banded = DedupOps.bandedDocIds(
      docs
        .select(col("doc_id"), DedupOps.shingleHashSet(col("text")).as("xs"))
        .filter(size(col("xs")) > 0)
        .withColumn("sig", DedupOps.minhashSigCol(col("xs"))))
      .as[BandedDoc]
    banded
      .groupByKey(b => (b.band, b.bh))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(minhashCandidateFlatMap)
  }

  /** Streaming exact dedup: first-arrival survivor per normalized-text
    * digest via `dropDuplicates` on the state store — the streaming form of
    * TextOps.dedupExact (which keeps min doc_id; a stream has arrival order
    * instead). State is one 128-bit digest per distinct document, uniformly
    * keyed — no skew.
    */
  def dedupExactStream(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(graft.ops.TextOps.normText(col("text"))).as("fingerprint"))
      .dropDuplicates("fingerprint")

  /** Streaming benchmark decontamination: flag each arriving doc against a
    * STATIC eval-set gram table — the online form of
    * CurationOps.decontaminate, run as admission control in front of a
    * training-data store.
    *
    * The eval side is a static DataFrame in a stream-static join —
    * re-evaluated per trigger, which is an MB-scale read against a
    * benchmark-sized gram set (page-cached after the first trigger). The
    * production shape reads the VERSIONED eval-gram artifact
    * [[graft.pipeline.CurationJob]] publishes ([[decontaminateStreamFromArtifact]]):
    * the gram set is computed once per corpus refresh, pinned to a
    * committed version, and NEVER extracted per stream start — the
    * previous form collected the grams to the driver at every stream
    * build, which re-paid the extraction on each restart and put a
    * corpus-derived frame on the driver heap. Per-doc gram extraction on
    * the streaming side is the in-row native expression.
    *
    * Aggregation is flatMapGroupsWithState in APPEND mode — the mode every
    * other job in this pipeline runs (a plain streaming groupBy cannot run
    * in append without an event-time watermark, and doc_id is not event
    * time). A doc's grams all arrive in its own micro-batch, so the group
    * completes immediately; the state is one boolean per flagged doc,
    * which makes source redelivery idempotent (emit once per doc).
    *
    * CONTRACT (shared by [[contamCoverageStream]] and the incremental-dedup
    * stream): **first arrival wins.** A doc_id re-delivered later — even
    * with different text — is dropped, not re-scored: admission control
    * decides once per document, and the upstream ingest contract is that
    * doc_id identifies immutable content (a revised document is a NEW
    * doc_id). The emitted-flag state therefore grows with the number of
    * DISTINCT documents ever admitted: ~1 byte of value per doc in the
    * RocksDB state store ([[graft.GraftSession]] wires it), i.e. ~1 GB
    * per billion docs spread across the shuffle partitions — deliberate
    * bookkeeping for an admission ledger, not a leak. A deployment that
    * prefers bounded state over exactly-once-forever can add a
    * processing-time timeout here; the cost is that a doc_id redelivered
    * after the TTL re-emits, so the downstream sink must dedup on doc_id.
    */
  def decontaminateStream(docs: DataFrame, evalDocs: DataFrame): DataFrame =
    decontaminateStreamOnGrams(docs,
      evalDocs.select(
        explode(graft.ops.DedupOps.ngramHashSet(
          graft.ops.TextOps.normText(col("text")))).as("gram"),
        col("doc_id").as("eval_doc")))

  /** The production arm: eval grams from the latest committed
    * [[graft.pipeline.CurationJob]] publish (`evalgrams` stage) — a
    * stream-static join against at-rest parquet, no driver collect, no
    * per-start extraction. */
  def decontaminateStreamFromArtifact(docs: DataFrame, artDir: String): DataFrame =
    decontaminateStreamOnGrams(docs,
      graft.pipeline.VersionedStore.readStage(docs.sparkSession, artDir, "evalgrams"))

  private def decontaminateStreamOnGrams(docs: DataFrame, evalGrams: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"),
        explode(graft.ops.DedupOps.ngramHashSet(
          graft.ops.TextOps.normText(col("text")))).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .select(col("doc_id"), col("gram"), col("eval_doc"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val grams = scala.collection.mutable.HashSet.empty[Long]
            val evals = scala.collection.mutable.HashSet.empty[Long]
            rows.foreach { r => grams += r._2; evals += r._3 }
            Iterator((id, grams.size.toLong, evals.size.toLong))
          }
      }
      .toDF("doc_id", "n_shared_grams", "n_eval_docs")
  }

  /** Streaming twin of DedupOps.dedupIncremental: documents ARRIVING from
    * an ingest stream probe a STATIC base index (the already-ingested
    * training corpus) and emit their single best base match — admission
    * dedup in front of a training store. The base side is the persisted
    * signature/band index artifact; here it pins as checkpointed frames
    * (size-gated broadcast per batch), at 100 TB it is the parquet-backed
    * index table and the band join is a plain stream-static equi-join on
    * the same (band, bh) keys. The probe's bands carry (source, xs)
    * through the explode (a stream cannot self-join its signature table
    * back), verification is the batch operator's exact arithmetic, and
    * the best match resolves in flatMapGroupsWithState keyed on the
    * probe doc_id: a doc's candidates all arrive in its own micro-batch
    * (its bands are generated there), the state is one emitted-flag per
    * matched doc, so source redelivery is emit-once idempotent — the
    * [[decontaminateStream]] contract.
    */
  def dedupIncrementalStream(docs: DataFrame, baseDocs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.ops.DedupOps
    // the index pins as CHECKPOINTED frames, not driver collects: a base
    // training corpus is not MB-by-construction like the eval-set pins
    // (decontaminateStream's justified collect), so it must never ride
    // through the driver. Checkpointing computes the signatures exactly
    // once; each trigger then runs a plain stream-static equi-join, with
    // the broadcast hint size-gated so a fixture-scale index broadcasts
    // and a corpus-scale index falls back to the planner's shuffle join.
    val baseSig = baseDocs
      .select(col("doc_id"), DedupOps.shingleHashSet(col("text")).as("xs"))
      .filter(size(col("xs")) > 0)
      .withColumn("sig", DedupOps.minhashSigCol(col("xs")))
      .localCheckpoint(eager = true)
    val baseBands = DedupOps.bandedDocIds(baseSig)
      .select(col("band"), col("bh"), col("doc_id").as("base_id"))
      .localCheckpoint(eager = true)
    val baseXs = baseSig.select(col("doc_id").as("base_id"), col("xs").as("xs_b"))
    val probe = docs
      .select(col("doc_id"), col("source"), DedupOps.shingleHashSet(col("text")).as("xs"))
      .filter(size(col("xs")) > 0)
      .withColumn("sig", DedupOps.minhashSigCol(col("xs")))
    DedupOps.bandedDocIds(probe, Seq("source", "xs"))
      .join(graft.Tables.broadcastIfSmall(baseBands), Seq("band", "bh"))
      .join(graft.Tables.broadcastIfSmall(baseXs), "base_id")
      .select(col("doc_id"), col("source"), col("xs"), col("base_id"), col("xs_b"))
      .as[(Long, String, Seq[Long], Long, Seq[Long])]
      .groupByKey(_._1)
      // the batch twin's cand.distinct() + verification, moved INSIDE the
      // per-doc fold: a pair agreeing in several bands must verify ONCE,
      // and a streaming dropDuplicates(doc_id, base_id) upstream would
      // pin every candidate pair on the state store FOREVER (no watermark
      // to expire it) even though dedup is only needed within a doc's own
      // micro-batch. Here the only state is the existing one-boolean
      // emit-once flag per doc; band-duplicate rows carry identical
      // payloads (xs/xs_b are functions of the ids) and collapse in the
      // per-base-id map below before the exact-Jaccard verification.
      .flatMapGroupsWithState[Boolean, (Long, String, Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: Long, rows: Iterator[(Long, String, Seq[Long], Long, Seq[Long])],
            state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val seen = scala.collection.mutable.LinkedHashMap
              .empty[Long, (String, Seq[Long], Seq[Long])]
            rows.foreach { case (_, src, xs, baseId, xsB) =>
              if (!seen.contains(baseId)) seen(baseId) = (src, xs, xsB)
            }
            // batch arithmetic verbatim: exact Jaccard over the shingle
            // sets, threshold, then tie-break jaccard DESC, base_id ASC
            val verified = seen.iterator.map { case (baseId, (src, xs, xsB)) =>
              val a = xs.toSet
              val inter = xsB.count(a.contains).toLong
              val jac = inter.toDouble / (xs.size.toLong + xsB.size - inter)
              (src, baseId, inter, jac)
            }.filter(_._4 >= DedupOps.JaccardThreshold).toSeq
            if (verified.isEmpty) Iterator.empty
            else {
              val best = verified.minBy(r => (-r._4, r._2))
              Iterator((id, best._1, best._2, best._3,
                math.floor(best._4 * 10000 + 0.5) / 10000))
            }
          }
      }
      .toDF("doc_id", "src", "base_id", "inter", "jaccard")
  }

  /** Streaming URL dedup: first-arrival survivor per canonical URL — the
    * admission-control form of CurationOps.urlDedup (batch keeps the
    * smallest doc_id; a stream has arrival order instead, the
    * [[dedupExactStream]] convention). Canonicalization is the same
    * in-row projection; state is one canonical URL per distinct page on
    * the state store, which also makes source redelivery idempotent.
    */
  def urlDedupStream(docs: DataFrame): DataFrame = {
    import graft.ops.CurationOps
    CurationOps.withCanonicalParts(docs.select(col("doc_id")))
      .select(col("doc_id"),
        concat(lit("https://"), col("host"), col("restc")).as("url"))
      .dropDuplicates("url")
  }

  /** Streaming twin of MultimodalOps.multimodalDedup: perceptual-key
    * admission control over arriving media — the first arrival per key
    * survives (the [[urlDedupStream]] convention; batch keeps min doc_id,
    * a stream has arrival order). The decode/key stage is the SAME in-row
    * [[graft.ops.MultimodalOps.withPerceptualKey]] projection the batch
    * operator composes (a codegen'd expression — expensive decode once
    * per payload, fused with the source stage), and state is one 8-byte
    * key per distinct perceptual group on the state store
    * (dropDuplicates), which also makes source redelivery idempotent.
    * Input: the media frame shape (doc_id, format, n_bytes, payload).
    */
  def multimodalDedupStream(media: DataFrame): DataFrame =
    graft.ops.MultimodalOps.withPerceptualKey(media)
      .dropDuplicates("pkey")
      .select(col("doc_id"), col("pkey"))

  /** Streaming twin of DedupOps.dedupSubstring in the asymmetric
    * admission shape ([[dedupIncrementalStream]]'s contract): ARRIVING
    * documents' rolling window fingerprints probe a STATIC base corpus
    * index, and every span of an arriving doc that appears verbatim in
    * the base is emitted as a cut (doc_id, span_start, span_len) — the
    * base owns every window it contains, so there is no keep-first rank
    * among probes. The base index pins as a checkpointed DISTINCT
    * fingerprint table (at 100 TB: the persisted artifact of the batch
    * pass); the probe side joins it per batch (size-gated broadcast),
    * and the island merge runs per-doc in flatMapGroupsWithState — a
    * doc's matched windows all arrive in its own micro-batch, positions
    * are bounded by the doc's own length, and the one-boolean state
    * makes redelivery emit-once. (The batch operator's windows can't
    * run on a stream; the per-group sorted merge is the same gaps-and-
    * islands arithmetic in-memory.)
    */
  def dedupSubstringStream(docs: DataFrame, baseDocs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.ops.DedupOps
    val w = DedupOps.SubstrWindow
    val baseIdx = baseDocs
      .select(explode(DedupOps.windowHashes(col("text"))).as("h"))
      .distinct()
      .localCheckpoint(eager = true)
    docs
      .select(col("doc_id"), posexplode(DedupOps.windowHashes(col("text"))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"), col("col").as("h"))
      .join(graft.Tables.broadcastIfSmall(baseIdx), "h")
      .select(col("doc_id"), col("p")).as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: Long, rows: Iterator[(Long, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val ps = rows.map(_._2).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
            var s0 = ps(0)
            var last = ps(0)
            ps.iterator.drop(1).foreach { p =>
              if (p - last > w) { out += ((id, s0, last + w - s0)); s0 = p }
              last = p
            }
            out += ((id, s0, last + w - s0))
            out.iterator
          }
      }
      .toDF("doc_id", "span_start", "span_len")
  }

  /** Streaming cleanse: quality-gate each arriving document and chunk the
    * survivors — the online form of q_quality_filter → q_chunk_docs, run
    * as admission control in front of a training-data store. Both stages
    * are stateless projections/generates, so the streaming plan IS the
    * batch plan (no state store, no watermark, append mode trivially) and
    * stream ≡ batch under any micro-batch split by construction —
    * StreamingSpec asserts it anyway.
    */
  def cleanseStream(docs: DataFrame): DataFrame =
    graft.ops.CleanOps.chunkDocsOn(
      graft.ops.CleanOps.withFilterColumns(docs)
        .filter(col("keep"))
        .select(col("doc_id"), col("text")))

  /** Streaming PII scrub: the stateless redaction projection applied to an
    * event stream — the wire-tap form of q_pii_redact.
    */
  def scrubStream(events: DataFrame): DataFrame =
    graft.ops.CleanOps.piiRedactOn(events)

  /** Streaming twin of CurationOps.contamCoverage: score each ARRIVING
    * document's eval-gram coverage and verdict at admission time, before
    * it ever lands in the training store. The eval side is a static gram
    * frame in a stream-static broadcast join — the SAME shape as
    * [[decontaminateStream]], never a driver collect: the previous form
    * collected the gram set into a broadcast variable at every stream
    * build, re-paying the extraction per restart and holding an
    * eval-derived Set on the driver heap; now the grams stay a DataFrame
    * (page-cached parquet in the artifact arm below) and the planner owns
    * the broadcast. Per-doc gram extraction is the in-row native
    * expression; `explode_outer` keeps gramless docs (their verdict is
    * `clean` by the batch operator's max(n,1) guard). The per-doc
    * fold runs in flatMapGroupsWithState in APPEND mode — a doc's grams
    * all arrive in its own micro-batch so the group completes
    * immediately, and the one-boolean-per-doc state makes source
    * redelivery emit-once idempotent — the [[decontaminateStream]]
    * contract, including its first-arrival-wins semantics and
    * distinct-docs-ever state growth (see that contract paragraph for
    * the size arithmetic and the TTL trade-off). Stream ≡ batch —
    * StreamingSpec asserts it against contamCoverageOn under
    * multi-batch splits.
    */
  def contamCoverageStream(docs: DataFrame, evalDocs: DataFrame): DataFrame =
    contamCoverageStreamOnGrams(docs, evalDocs
      .select(explode(graft.ops.DedupOps.ngramHashSet(
        graft.ops.TextOps.normText(col("text")))).as("gram"))
      .distinct())

  /** The production arm: eval grams from the latest committed
    * [[graft.pipeline.CurationJob]] publish (`evalgrams` stage) — the
    * coverage sibling of [[decontaminateStreamFromArtifact]]. The gram
    * set is computed once per corpus refresh and pinned to a committed
    * version; stream starts read at-rest parquet, nothing is extracted
    * per start. */
  def contamCoverageStreamFromArtifact(docs: DataFrame, artDir: String): DataFrame =
    contamCoverageStreamOnGrams(docs,
      graft.pipeline.VersionedStore.readStage(docs.sparkSession, artDir, "evalgrams")
        .select(col("gram")).distinct())

  private def contamCoverageStreamOnGrams(docs: DataFrame, evalGrams: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), graft.ops.DedupOps.ngramHashSet(
        graft.ops.TextOps.normText(col("text"))).as("grams"))
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode_outer(col("grams")).as("gram"))
      .join(broadcast(evalGrams.withColumn("hit", lit(1L))), Seq("gram"), "left")
      .select(col("doc_id"), col("n_grams"), coalesce(col("hit"), lit(0L)).as("hit"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Long, Double, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            var nGrams = 0L
            var shared = 0L
            rows.foreach { r => nGrams = r._2; shared += r._3 }
            // the batch operator's exact rounding formula (Model.roundN, 4dp)
            val cov = math.floor(
              shared.toDouble / math.max(nGrams, 1L).toDouble * 10000.0 + 0.5) / 10000.0
            val verdict =
              if (cov == 0.0) "clean" else if (cov < 0.1) "trace" else "contaminated"
            Iterator((id, nGrams, shared, cov, verdict))
          }
      }
      .toDF("doc_id", "n_grams", "n_shared", "coverage", "verdict")
  }

  case class HistBounds(cminCents: Long, cmaxCents: Long)

  /** Streaming twin of RelationalOps.histogram, run the way a production
    * histogram actually runs (the [[spcAlarms]] argument): bin EDGES are
    * FIXED from a baseline period — the per-metric cent min/max the batch
    * operator derives — and the stream folds into a running (metric, bin)
    * count. Bin assignment is a stateless projection with the IDENTICAL
    * integer arithmetic to the batch operator (`(c - cmin)·bins div
    * (cmax - cmin)`), clamped into [0, bins-1] for out-of-baseline
    * arrivals (the batch form never clamps low because its bounds ARE the
    * corpus extremes); state is one count per (metric, bin) —
    * bins-bounded, not corpus-bounded. With bounds taken from the same
    * corpus, the running counts equal the batch histogram's exactly
    * (StreamingSpec asserts it).
    */
  def histogramStream(events: DataFrame, bounds: Map[String, HistBounds]): DataFrame = {
    val s = events.sparkSession
    val bins = graft.ops.RelationalOps.HistBins
    val b = s.createDataFrame(
        bounds.toSeq.map { case (m, hb) => (m, hb.cminCents, hb.cmaxCents) })
      .toDF("metric", "cmin", "cmax")
    events.filter(col("value").isNotNull)
      .select(col("event_type").as("metric"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .join(broadcast(b), "metric")
      .withColumn("bin",
        when(col("cmax") === col("cmin"), lit(0L))
          .otherwise(greatest(lit(0L), least(lit(bins - 1L),
            expr(s"((c - cmin) * $bins) div (cmax - cmin)"))))
          .cast("long"))
      .groupBy(col("metric"), col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Streaming twin of TextOps.topTerms: a RUNNING vocabulary count —
    * per-doc term frequencies extracted in-row by the same native
    * `term_counts` expression (identical tokenization, hence identical
    * counts), folded into an update-mode streaming aggregation keyed by
    * term. State is one (cnt, doc_freq) pair per distinct term —
    * vocabulary-bounded, not corpus-bounded — and the in-row extraction
    * means each micro-batch ships at most |vocabulary| updated rows to the
    * state store, exactly the map-side-partial property the batch plan
    * has. Exactly-once across redelivery is the engine's checkpointed
    * source-offset contract (the same basis as mvStream), not per-row
    * dedup. The consumer ranks top-k per trigger (batch's trailing
    * orderBy+limit — presentation, not state).
    */
  def topTermsStream(docs: DataFrame): DataFrame =
    docs
      .select(explode(graft.ops.TextOps.termCounts(col("text"))).as("tc"))
      .select(col("tc.term").as("term"), col("tc.c").as("c"))
      .groupBy(col("term"))
      .agg(sum(col("c")).as("cnt"), count(lit(1)).as("doc_freq"))

  /** Ingest dataflow (§3.1): JSON envelope → flatten → type dispatch →
    * broadcast enrichment. `contextDf` is the (tiny) slowly-changing
    * dimension looked up at stream time (hydration_agent/main.py:73-74).
    */
  def ingest(payloads: DataFrame, contextDf: DataFrame): DataFrame = {
    // `value` parses as VARIANT — the one schema type that PRESERVES the
    // JSON type of the payload (see graft.model.Envelope). The reference
    // dispatches on exactly that type (isinstance(val, (int, float)) and
    // not bool). The string CONTENT comes from the parallel string parse:
    // the variant's own string channel mangles non-ASCII (see
    // Envelope.variantSchema), and both parses are the same Jackson
    // grammar, so they cannot disagree on structure.
    payloads
      .select(from_json(col("payload"), graft.model.Envelope.variantSchema).as("m"),
        from_json(col("payload"), graft.model.Envelope.stringSchema).as("ms"))
      .withColumn("raw", col("ms.value"))
      .withColumn("value_is_str", expr("schema_of_variant(m.value)") === lit("STRING"))
      .select(
        col("m.event_id").as("event_id"),
        timestamp_micros(col("m.ts_us")).as("time"),
        col("m.node_id").as("metric"),
        // the shared dispatch rule — same column logic as the
        // oracle-checked batch q_type_dispatch
        graft.ops.DataflowOps.dispatchNum("raw", col("value_is_str")).as("value_num"),
        graft.ops.DataflowOps.dispatchStr("raw", col("value_is_str")).as("value_str"),
        col("m.user_id").as("user_id")
      )
      .join(broadcast(contextDf), Seq("user_id"), "left")
  }
}
