package graft.ops

import graft.Tables
import graft.Tables.ResultOrdering
import graft.model.Model
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2B relational / SQL operators — the 17 Grafana dashboard query shapes +
  * the two continuous aggregates, re-expressed as declarative DataFrame plans
  * so Catalyst handles pushdown/pruning and Tungsten does the execution.
  *
  * Scale notes (100 TB):
  *  - every query filters on `event_type` (metric) and/or a `ts` range →
  *    parquet predicate pushdown + (with a date-partitioned layout) partition
  *    pruning; nothing reads columns it doesn't project.
  *  - top-1 / top-N queries use orderBy+limit which Spark plans as
  *    `TakeOrderedAndProject` (per-partition heap, no global sort).
  *  - latest-per-group uses `max_by` (partial aggregation map-side) instead of
  *    a ranking window, avoiding a full per-partition sort.
  */
object RelationalOps {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** Scan + equality filter; Grafana panel shape `WHERE metric = 'X'`
    * (reference machine_dashboard.json:109 et al., index init.sql:14).
    */
  def scanFilter(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .resultOrder(col("event_id"))

  /** Top-1 by time ("last value") — 10 of the 19 panels
    * (machine_dashboard.json:177). Plans as TakeOrderedAndProject: O(1) per
    * partition, no global sort — the Spark analog of the (metric, time DESC)
    * index lookup.
    */
  def lastValue(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .filter(col("event_type") === "click")
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(1)
      .select(col("ts").as("time"), col("value"))

  /** Latest-row-per-group (Postgres DISTINCT ON, machine_dashboard.json:283).
    * `max_by(struct(payload), struct(ts, event_id))` gives partial (map-side)
    * aggregation — at 100 TB this is one shuffle of pre-aggregated rows,
    * strictly cheaper than a ranking window's partition-wide sort.
    */
  def latestPerGroup(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("value_str", Model.valueStr)
      .groupBy(col("event_type"))
      .agg(
        max_by(
          struct(col("ts"), col("value"), col("value_str")),
          struct(col("ts"), col("event_id"))
        ).as("r")
      )
      .select(
        col("event_type").as("metric"),
        col("r.ts").as("time"),
        coalesce(col("r.value_str"), col("r.value").cast("string")).as("value")
      )
      .resultOrder(col("metric"))

  /** IN-list predicate (machine_dashboard.json:283). */
  def inList(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .filter(col("event_type").isin("click", "purchase", "signup"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Model.exactSum(col("value"), 2).as("total"))
      .resultOrder(col("event_type"))

  /** COALESCE(value_str, CAST(value_num AS TEXT)) projection
    * (machine_dashboard.json:283).
    */
  def coalesceCast(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("value_str", Model.valueStr)
      .select(
        col("event_id"),
        coalesce(col("value_str"), col("value").cast("string")).as("value")
      )
      .resultOrder(col("event_id"))

  /** Time-range predicate (Grafana $__timeFilter, machine_dashboard.json:659).
    * At scale this is the partition-pruning driver.
    */
  def timeRange(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .filter(
        col("ts").between(
          lit("2024-01-10 00:00:00").cast("timestamp"),
          lit("2024-01-20 00:00:00").cast("timestamp")
        )
      )
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .resultOrder(col("event_id"))

  /** Ordered time-series projection (machine_dashboard.json:659). */
  def rawTimeseries(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .filter(
        col("event_type") === "purchase" &&
          col("ts").between(
            lit("2024-01-05 00:00:00").cast("timestamp"),
            lit("2024-01-25 00:00:00").cast("timestamp")
          )
      )
      .select(col("ts").as("time"), col("value"), col("event_id"))
      .resultOrder(col("time"), col("event_id"))

  /** The minute-grain MV content (no ordering) — the shape
    * MaterializedViews persists day-partitioned for the mvRead scan path.
    */
  private[graft] def minuteMv(s: SparkSession, dir: String): DataFrame =
    bucketAggBase(s, dir, "1 minute")

  private def bucketAggBase(s: SparkSession, dir: String, grain: String): DataFrame =
    bucketAggOn(ev(s, dir), grain)

  /** The shared continuous-aggregate body (init.sql:20-29,37-48): one
    * definition of the MV column set for minute, hourly and dashboard
    * grains — a column change edits exactly one place.
    */
  private def bucketAggOn(events: DataFrame, grain: String): DataFrame =
    events
      .filter(col("value").isNotNull)
      .groupBy(window(col("ts"), grain), col("event_type"))
      .agg(
        Model.exactAvg4("value").as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(col("value")).as("sample_count")
      )
      .select(
        col("window.start").as("bucket"),
        col("event_type").as("metric"),
        col("avg_value"),
        col("min_value"),
        col("max_value"),
        col("sample_count")
      )

  /** time_bucket hash aggregate (init.sql:20-29). `window().start` ==
    * `time_bucket`'s bucket start; Catalyst plans partial+final HashAggregate
    * (map-side combine), so the shuffle carries one row per (bucket, metric)
    * per task — the only layout that survives 100 TB.
    */
  def bucketAgg(s: SparkSession, dir: String): DataFrame =
    bucketAggBase(s, dir, "1 hour").resultOrder(col("bucket"), col("metric"))

  /** IS NOT NULL pre-aggregation filter (init.sql:28,47) over a genuinely
    * nullable value_num (error rows are string-typed → null value_num).
    */
  def notnullFilter(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn(
        "value_num",
        when(col("event_type") === "error", lit(null).cast("double")).otherwise(col("value"))
      )
      .filter(col("value_num").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Model.exactAvg4("value_num").as("avg_value"))
      .resultOrder(col("event_type"))

  /** Minute-grain continuous aggregate, batch recompute of
    * `machine_stats_minute` (init.sql:37-48). The streaming twin (watermarked
    * windowed agg) lives in graft.streaming.
    */
  def mvMinute(s: SparkSession, dir: String): DataFrame =
    bucketAggBase(s, dir, "1 minute").resultOrder(col("bucket"), col("metric"))

  /** Hourly continuous aggregate over its refresh window — BOTH offsets of
    * the policy (init.sql:31-34): start_offset 3 days AND end_offset
    * 1 hour. The end offset matters: TimescaleDB only materializes buckets
    * that close at or before now - end_offset, so the most recent hour of
    * events is NOT yet visible in `machine_stats_hourly` (fixture "now" =
    * 2024-01-31 00:00).
    */
  def mvHourly(s: SparkSession, dir: String): DataFrame =
    bucketAggOn(
      ev(s, dir)
        .filter(col("ts") >= lit("2024-01-28 00:00:00").cast("timestamp"))
        .filter(col("ts") < lit("2024-01-30 23:00:00").cast("timestamp")),
      "1 hour")
      .resultOrder(col("bucket"), col("metric"))

  /** MV scan + metric filter + bucket range + sort (machine_dashboard.json:1120).
    *
    * Reads the MATERIALIZED day-partitioned MV (the reference dashboard
    * reads the persisted `machine_stats_minute`, never a recompute): the
    * bucket range is mirrored onto the `day` partition column so the scan
    * prunes whole day directories (PartitionFilters — PlanSpec asserts it),
    * and the metric equality pushes into parquet row-group stats, which the
    * writer's (metric, bucket) sort-within-partitions makes selective.
    * At 100 TB this is the difference between touching 14 day directories
    * and scanning the full MV history. The DuckDB oracle keeps the
    * recompute definition — materialize-then-read must equal it exactly.
    */
  def mvRead(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.MaterializedViews.minuteMvDf(s, dir)
      .filter(
        col("day").between("2024-01-08", "2024-01-22") &&
          col("metric") === "click" &&
          col("bucket").between(
            lit("2024-01-08 00:00:00").cast("timestamp"),
            lit("2024-01-22 00:00:00").cast("timestamp")
          )
      )
      .select(col("bucket").as("time"), col("avg_value"), col("min_value"), col("max_value"))
      .resultOrder(col("time"))

  /** The alarm feed — hardest query in the reference
    * (machine_dashboard.json:948): CTE scalar aggregate + theta cross-join +
    * tri-branch LIKE + ORDER BY DESC LIMIT 50.
    *
    * Truth table (SURVEY §7.3.1): "Info" rows always shown; "Error" rows and
    * other rows only when newer than the machine's last Running timestamp.
    * Here: clear_time := max(ts) of 'view' events with value > 300 (the
    * "Status = Running" surrogate); Info/Error markers := props containing
    * '1' / '2'. The 1-row CTE side is broadcast (BroadcastNestedLoopJoin) —
    * never a shuffle join at any scale.
    */
  def alarmFeed(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val lastRunning = e
      .filter(col("event_type") === "view" && col("value") > 300)
      .agg(
        coalesce(max(col("ts")), lit("1970-01-01 00:00:00").cast("timestamp")).as("clear_time")
      )
    e.filter(col("event_type") === "error" && col("props") =!= "" && col("props") =!= "[]")
      .crossJoin(broadcast(lastRunning))
      .filter(
        col("props").like("%1%") ||
          (col("props").like("%2%") && col("ts") > col("clear_time")) ||
          (!col("props").like("%1%") && !col("props").like("%2%") && col("ts") > col("clear_time"))
      )
      .select(
        col("ts").as("time"),
        translate(col("props"), "{}\": ", "").as("message"),
        col("user_id").as("operator_id"),
        col("event_id")
      )
      .orderBy(col("time").desc, col("event_id").desc)
      .limit(50)
  }

  /** Implicit union of typed streams — numeric and string metrics coexist in
    * one dual-typed schema (init.sql:5-6; kafka_db_agent/main.py:83-89).
    */
  def unionTypes(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val numeric = e.select(
      col("event_id"),
      col("ts").as("time"),
      col("event_type").as("metric"),
      col("value").as("value_num"),
      lit(null).cast("string").as("value_str")
    )
    val strings = e.select(
      col("event_id"),
      col("ts").as("time"),
      concat(col("event_type"), lit("_str")).as("metric"),
      lit(null).cast("double").as("value_num"),
      col("props").as("value_str")
    )
    numeric.unionAll(strings).resultOrder(col("event_id"), col("metric"))
  }

  /** As-of join: attach to every 'error' event the most recent prior (or
    * same-instant) 'click' of the same user — the nearest-prior-event
    * lookup behind "state at the time of the alarm" questions, which the
    * reference answers only in scalar form (the alarm feed's
    * last-Running CTE, machine_dashboard.json:948).
    *
    * Spark has no ASOF JOIN operator; the scalable form is NOT a range
    * join (quadratic per key, and Spark would plan the inequality as a
    * nested-loop) but the tagged-union window carry: union both sides
    * with a side marker, sort each user's timeline once, and carry the
    * last click forward with `last(..., ignoreNulls)`. One shuffle on
    * user_id, zero join nodes, linear in the timeline — the same plan
    * shape at any scale, with none of the per-key buffering a
    * partitioned range join needs. At equal timestamps the click sorts
    * before the error (side 0 < 1), giving the inclusive `>=` DuckDB's
    * native ASOF JOIN (the oracle) defines.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame =
    asofJoinOn(ev(s, dir))

  /** [[asofJoin]] over any (event_id, user_id, ts, event_type, value)
    * frame — the form the streaming twin's spec recomputes batch-side.
    */
  def asofJoinOn(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // `tie` carries each row's ORIGINAL event_id (clicks null out the
    // output event_id column, so it can't serve): (ts, side) alone is not
    // a total order, and two same-user clicks at the same timestamp would
    // make the carried value partitioning-dependent. With the tiebreak the
    // highest-event_id click among equal-ts ties wins, deterministically.
    // (DuckDB's ASOF JOIN leaves the same tie unspecified; the fixtures
    // are tie-free, so the oracle still matches.)
    // the matched click travels as ONE struct through ONE ignoreNulls
    // window: two independent windows over (r_ts, r_value) would stitch
    // the pair from two DIFFERENT click rows whenever a click's value is
    // null (ts from the latest click, value from the latest NON-NULL-
    // valued click) and drop errors whose true match has a null value —
    // ASOF semantics return the matched row's value, null included. The
    // struct is non-null for every click row, so ignoreNulls skips
    // exactly the error rows.
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        lit(1).as("side"),
        lit(null).cast("struct<ts:timestamp,value:double>").as("r_click"),
        col("event_id").as("tie"))
    val clicks = e.filter(col("event_type") === "click")
      .select(lit(null).cast("long").as("event_id"), col("user_id"), col("ts"),
        lit(null).cast("double").as("value"),
        lit(0).as("side"),
        struct(col("ts").as("ts"), col("value").as("value")).as("r_click"),
        col("event_id").as("tie"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(errors)
      .withColumn("click", last(col("r_click"), ignoreNulls = true).over(w))
      // inner as-of semantics: errors with no prior click drop, matching
      // the oracle's (inner) ASOF JOIN
      .filter(col("side") === 1 && col("click").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("click.ts").as("click_ts"), col("click.value").as("click_value"))
      .resultOrder(col("event_id"))
  }

  /** Gap-fill + last-observation-carried-forward over the minute-bucketed
    * series — TimescaleDB's `time_bucket_gapfill` + `locf` shape
    * (the canonical dashboard treatment of sparse series in the
    * reference's data model; init.sql's aggregates leave gap minutes
    * absent, and a plotting client needs the dense spine).
    *
    * Built on [[gapfillExpanded]]: gap minutes are generated FROM their
    * enclosing segment, so each one is born already knowing its left
    * observation — the carried-forward value is a projection, not a
    * spine-wide ignoreNulls window. The first bucket of each metric is an
    * observed one by construction (segments start at the first
    * observation), so locf_value is never null — deterministic without a
    * lookback horizon.
    */
  /** Single-phase bound for the gap-fill pair's lead window — the SPC
    * class: the observed-bucket lead partitions on bare `metric`, and
    * the fixture's VALUE-BEARING metric count is 5, so past this bound
    * the whole observed-minute table (8M rows at factor 100) sorts and
    * gap-expands through five tasks — the factor-100 sweep measured the
    * superlinear wall (63 s at sf10 vs 10.5 s at sf3 for 3.3× data).
    */
  // literal, not `= SpcSinglePhaseMaxBytes`: that val is declared LATER
  // in this object, and a forward val reference silently initializes to
  // 0 — which made the gate pick two-phase at every scale (caught by the
  // existing join-free PlanSpec pin). Same 4 MB class as the SPC bound.
  val GapfillSinglePhaseMaxBytes: Long = 4L << 20

  def gapfillLocf(s: SparkSession, dir: String): DataFrame = {
    val rows = ev(s, dir).select(
      col("event_type").as("metric"), col("ts"), col("value"))
    gapfillLocfOn(rows, twoPhase =
      Tables.planningSize(rows) > singlePhaseBound(s, GapfillSinglePhaseMaxBytes))
  }

  /** [[gapfillLocf]] over any (metric, ts, value) frame — the form the
    * streaming twin's spec recomputes batch-side.
    */
  def gapfillLocfOn(events: DataFrame, twoPhase: Boolean = false): DataFrame =
    gapfillLocfPlan(events, twoPhase)
      // explicit range sort, NOT resultOrder: the single-reducer gate
      // keys on the planning-size estimate, and Generate propagates its
      // CHILD's (post-aggregate, tiny) estimate — the dense spine is
      // gap-expansion times larger than the plan thinks (sf10: 21.6M
      // rows through one sort task, 63 s; the whole suite's one
      // superlinear row). A gap-filled export is spine-sized by
      // construction, so the parallel range sort is always right here.
      // localCheckpoint first: RangePartitioning runs a SAMPLING pass
      // over its child before the shuffle, so an un-materialized spine
      // pays the aggregate + window + Generate chain TWICE (guide §2.4 —
      // the sampling re-execution is an accidental second full pass);
      // the checkpoint bounds both passes to one spine materialization
      // (measured sf0.1 min-of-4: 0.96 → 0.71 s, in a window whose
      // control key ran 1.4× slower than the 0.96 baseline's).
      .localCheckpoint(eager = false)
      .orderBy(col("metric"), col("bucket"))

  /** The unsorted locf projection — exposed unmaterialized so PlanSpec can
    * assert the segment-expansion shape the pre-sort checkpoint hides
    * behind an RDD scan (the minhashDocsPlan convention). */
  private[graft] def gapfillLocfPlan(events: DataFrame, twoPhase: Boolean): DataFrame =
    gapfillExpandedOn(events, twoPhase)
      .select(col("metric"), col("g.b").as("bucket"),
        when(!col("g.gap"), col("avg_value")).as("avg_value"),
        col("avg_value").as("locf_value"),
        col("g.gap").as("is_gap"),
        when(col("g.gap"), lit(0L)).otherwise(col("sample_count")).as("sample_count"))

  /** The segment-expanded dense series shared by the locf and interpolate
    * fill policies: per-minute observed aggregates, each row extended with
    * its successor observation (`lead` over the OBSERVED buckets — a
    * window over bucket-cardinality rows, bounded by time-range/grain,
    * never by corpus size), then one Generate per segment emitting the
    * observed bucket itself plus every gap minute strictly between it and
    * the next observation.
    *
    * This replaces the earlier bounds→dense-spine→left-join→two-
    * ignoreNulls-carries formulation: the spine join and both spine-wide
    * window sorts are gone — every gap row is created adjacent to the two
    * observations that define it, so both fill policies become pure
    * projections of the Generate output. Shuffles: the (metric, bucket)
    * aggregation exchange and one (metric) exchange for the lead window
    * over observed buckets. The [min, max] observed bounds per metric are
    * implicit (segments exist only between observations), so the output
    * rows are exactly the old spine's.
    */
  private def gapfillExpanded(s: SparkSession, dir: String): DataFrame =
    gapfillExpandedOn(ev(s, dir).select(
      col("event_type").as("metric"), col("ts"), col("value")))

  /** Two-phase arm (the counter-rate/uptime template): the successor
    * observation is computed with a (metric, DAY)-partitioned lead —
    * bounded keys × unbounded history becomes days × metrics tasks —
    * and the day-boundary gap is repaired by a carry: each (metric,
    * day)'s FIRST observation, lead() over the tiny day-level table to
    * give "next PRESENT day's first", joined back size-gate-broadcast.
    * The in-day window output is eagerly checkpointed because BOTH the
    * main stream and the firsts branch consume it (the spcRulesOn
    * materialization rule); it is observed-bucket cardinality — bounded
    * by metrics × minutes of history, never by corpus rows. The Generate
    * expansion then inherits the (metric, day) partitioning, so gap
    * rows materialize across days instead of through ≤|metrics| tasks.
    */
  private def gapfillExpandedOn(events: DataFrame, twoPhase: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val obs = events.filter(col("value").isNotNull)
      .groupBy(col("metric"),
        date_trunc("minute", col("ts")).as("bucket"))
      .agg(Model.exactAvg4("value").as("avg_value"),
        count(col("value")).as("sample_count"))
    val withNext =
      if (!twoPhase) {
        val wobs = Window.partitionBy(col("metric")).orderBy(col("bucket"))
        obs
          .withColumn("next_b", lead(col("bucket"), 1).over(wobs))
          .withColumn("next_v", lead(col("avg_value"), 1).over(wobs))
      } else {
        val wDay = Window.partitionBy(col("metric"), col("day")).orderBy(col("bucket"))
        val inDay = obs
          .withColumn("day", date_trunc("day", col("bucket")))
          .withColumn("next_b", lead(col("bucket"), 1).over(wDay))
          .withColumn("next_v", lead(col("avg_value"), 1).over(wDay))
          .withColumn("rn", row_number().over(wDay))
          .localCheckpoint(eager = true)
        val wMetric = Window.partitionBy(col("metric")).orderBy(col("day"))
        val carry = inDay.filter(col("rn") === 1)
          .select(col("metric"), col("day"),
            col("bucket").as("fb"), col("avg_value").as("fv"))
          .withColumn("nfb", lead(col("fb"), 1).over(wMetric))
          .withColumn("nfv", lead(col("fv"), 1).over(wMetric))
          .select(col("metric"), col("day"), col("nfb"), col("nfv"))
        inDay.join(Tables.broadcastIfSmall(carry), Seq("metric", "day"))
          .withColumn("next_b", coalesce(col("next_b"), col("nfb")))
          .withColumn("next_v", coalesce(col("next_v"), col("nfv")))
          .drop("day", "rn", "nfb", "nfv")
      }
    withNext
      .select(col("metric"), col("bucket"), col("avg_value"),
        col("sample_count"), col("next_b"), col("next_v"),
        explode(expr(
          """concat(
            |  array(named_struct('b', bucket, 'gap', false)),
            |  transform(
            |    CASE WHEN next_b > bucket + INTERVAL 1 MINUTE
            |         THEN sequence(bucket + INTERVAL 1 MINUTE,
            |                       next_b - INTERVAL 1 MINUTE,
            |                       INTERVAL 1 MINUTE)
            |         ELSE cast(array() AS array<timestamp>) END,
            |    x -> named_struct('b', x, 'gap', true)))""".stripMargin)).as("g"))
  }

  /** Gap-fill with LINEAR INTERPOLATION — TimescaleDB's `interpolate`
    * sibling of [[gapfillLocf]]: each gap minute takes the value on the
    * straight line between its nearest observed neighbors, observed
    * buckets pass through.
    *
    * Each generated gap row carries its segment's two endpoints
    * directly ([[gapfillExpanded]]), so the interpolation is a pure
    * projection — no spine-wide carries in either direction. The
    * arithmetic — integer second deltas divided as doubles, then one
    * fused multiply-add on 4-decimal-exact endpoint values — is the
    * identical operation sequence in the oracle, so results are
    * bit-equal cross-engine.
    */
  def gapfillInterp(s: SparkSession, dir: String): DataFrame = {
    val rows = ev(s, dir).select(
      col("event_type").as("metric"), col("ts"), col("value"))
    gapfillInterpOn(rows, twoPhase =
      Tables.planningSize(rows) > singlePhaseBound(s, GapfillSinglePhaseMaxBytes))
  }

  /** [[gapfillInterp]] over any (metric, ts, value) frame — the form the
    * streaming twin's spec recomputes batch-side.
    */
  def gapfillInterpOn(events: DataFrame, twoPhase: Boolean = false): DataFrame =
    gapfillInterpPlan(events, twoPhase)
      // explicit range sort + pre-sort checkpoint — same Generate-
      // underestimate and sampling-re-execution reasoning as the locf
      // twin above
      .localCheckpoint(eager = false)
      .orderBy(col("metric"), col("bucket"))

  /** The unsorted interpolation projection — the PlanSpec surface (see
    * [[gapfillLocfPlan]]). */
  private[graft] def gapfillInterpPlan(events: DataFrame, twoPhase: Boolean): DataFrame = {
    val ratio =
      (unix_timestamp(col("g.b")) - unix_timestamp(col("bucket"))).cast("double") /
        (unix_timestamp(col("next_b")) - unix_timestamp(col("bucket"))).cast("double")
    gapfillExpandedOn(events, twoPhase)
      .select(col("metric"), col("g.b").as("bucket"),
        when(!col("g.gap"), col("avg_value")).as("avg_value"),
        Model.roundN(
          when(!col("g.gap"), col("avg_value"))
            .when(col("next_v").isNotNull,
              col("avg_value") + (col("next_v") - col("avg_value")) * ratio),
          4).as("interp_value"),
        col("g.gap").as("is_gap"))
  }

  /** Counter increase per hour with reset detection — TimescaleDB
    * `counter_agg`/PromQL `increase()` semantics over the reference's
    * monotonic counters (ComponentsPlacedGood, TotalComponentsFailed…,
    * UInt64 at opcua_server/main.py:188-193): per metric, each sample's
    * contribution is its delta from the previous sample, except across a
    * reset (value dropped), where the counter restarted from zero and the
    * contribution is the value itself. First sample contributes nothing
    * (no baseline).
    *
    * Determinism: the fixture values are 2-decimal, so deltas are summed
    * as exact integer cents (floor(v*100 + 0.5) — the values are positive
    * and never land on .5, so the half-adjust is engine-safe) with one
    * double division at the end. The lag ordering is total
    * ((ts, event_id)).
    *
    * Scale: the lag runs as a TWO-PHASE window. The reference metric key
    * space is ~46 values (opcua_server/main.py:152-203), so a
    * per-metric window would sort each metric's ENTIRE history on one
    * task — a hard parallelism ceiling at 100×. Instead the lag
    * partitions on the composite (metric, day): thousands of
    * bounded-size partitions, each sorted locally. Only the FIRST
    * sample of each day is missing its predecessor; those boundaries
    * are repaired with a per-day carry table (last sample of each
    * (metric, day), shifted one present-day forward by a window over
    * the day-cardinality aggregate) broadcast back onto the stream.
    * Then the standard partial+final bucket aggregate.
    */
  /** Gates between the single-phase (per-metric window) and two-phase
    * (composite (metric, day) window + boundary repair) forms of the
    * counter/SPC family. The two-phase machinery exists for ONE reason:
    * a per-metric window sorts each metric's entire history on a single
    * task, a hard parallelism ceiling when one metric's history is huge.
    * Below a planning-size bound that ceiling is irrelevant and the
    * two-phase form's extra branch + join + exchanges are pure per-stage
    * scheduler floor. Same degrade-correctly family as `resultOrder`/
    * `fanOut`/`broadcastIfSmall`/the percentile fusion: the gate keys on
    * the data's size statistic, never on the caller.
    *
    * The bounds are PER OPERATOR and empirical (same-window A/B): counter's
    * single-phase plan has ONE window sort, and it won every scale up to
    * factor 30 (0.33 vs 0.58 s at sf0.1; 0.90 vs 1.16 s at sf1; 2.59 vs
    * 2.81 s at sf3) — but the round-11 factor-100 A/B found the cross:
    * at sf10 (planning size 119 MB) two-phase wins 8.8 s vs 23.1 s
    * (min-of-2 each, same window). The crossover sits between sf3's
    * 37 MB and sf10's 119 MB planning estimates; the bound is 64 MB —
    * biased LOW because the mis-pick costs are asymmetric (two-phase at
    * sf3 loses 8%, single-phase at sf10 loses 2.6×). SPC's single-phase plan re-sorts
    * the corpus THREE times (grp ranks + run ranks), and the forms cross
    * between the two fixtures (0.68 vs 0.66 s at sf0.1 — parity;
    * 3.11 vs 1.28 s at sf1 — two-phase wins 2.4×), so its bound sits
    * BETWEEN the two fixtures' gate inputs. Those inputs are the PRUNED
    * projection estimate Tables.planningSize actually sees — measured
    * sf0.1 ≈ 1.1 MB, sf1 ≈ 11 MB (the raw file sizes, 2/20 MB, are what
    * an earlier bound was mistakenly sized against: 16 MB sat ABOVE
    * sf1's 11 MB estimate, silently selecting the 2.4×-slower
    * single-phase form at exactly the scale two-phase was built for —
    * caught by an isolated sf1 re-measure, 3.45 s vs the A/B's 1.28 s).
    */
  val CounterSinglePhaseMaxBytes: Long = 64L << 20
  val SpcSinglePhaseMaxBytes: Long = 4L << 20

  /** The effective gate bound — `spark.graft.singlePhaseMaxBytes`
    * overrides both defaults (0 forces two-phase everywhere; used by the
    * A/B probes that sized the defaults).
    */
  private[graft] def singlePhaseBound(s: SparkSession, default: Long): Long =
    s.conf.getOption("spark.graft.singlePhaseMaxBytes")
      .map(_.toLong).getOrElse(default)

  def counterRate(s: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val rows = ev(s, dir).filter(col("value").isNotNull)
      .select(col("event_type").as("metric"), col("ts"), col("event_id"),
        cents.as("cents"))
    counterRateOn(rows,
      twoPhase = Tables.planningSize(rows) >
        singlePhaseBound(s, CounterSinglePhaseMaxBytes))
  }

  /** [[counterRate]] over a prepared (metric, ts, event_id, cents) frame
    * with the phase choice explicit — PlanSpec pins BOTH shapes.
    */
  private[graft] def counterRateOn(rows0: DataFrame, twoPhase: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (!twoPhase) {
      // single-phase: one per-metric lag window; the hour aggregate and
      // the lag share the single hash(metric) exchange (subset-key
      // clustering), so the whole query is scan → 1 exchange → sort →
      // window → agg (+ the tiny presentation sort)
      val w = Window.partitionBy(col("metric")).orderBy(col("ts"), col("event_id"))
      return rows0
        .withColumn("prev", lag(col("cents"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("inc",
          when(col("cents") >= col("prev"), col("cents") - col("prev"))
            .otherwise(col("cents")))
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg((sum(col("inc")).cast("double") / 100.0).as("increase"),
          count(lit(1)).as("n_samples"))
        .resultOrder(col("metric"), col("bucket"))
    }
    val rows = rows0.withColumn("day", date_trunc("day", col("ts")))
    // in-partition lag: composite (metric, day) key — bounded partitions
    val wDay = Window.partitionBy(col("metric"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    // boundary repair: last sample of each present (metric, day), carried
    // to the NEXT present day — a lag over the tiny day-level aggregate.
    // Deliberately a SEPARATE scan branch, not a derivation of the
    // windowed stream: a shared-exchange form (offsets from the ranked
    // rows) only deduplicates when the branches' subtrees stay
    // sameResult()-identical, which per-branch column pruning and
    // constraint propagation both break — and when reuse misses, that
    // form re-exchanges and re-sorts the corpus for the carry side. This
    // branch instead scans 4 pruned columns and map-side-combines to
    // day-cardinality rows before its (tiny) exchange — the cheap,
    // conf-independent distributed plan.
    val carries = rows.groupBy(col("metric"), col("day"))
      // flat-buffer argmax, not max_by over a (ts, event_id) struct: the
      // struct buffer forced this corpus-input aggregate into a
      // SortAggregate pair (see graft.functions.ArgMaxKey)
      .agg(graft.functions.ArgMaxKey.scalar(col("ts"), col("event_id"),
        col("cents")).as("day_last"))
      .withColumn("carry",
        lag(col("day_last"), 1).over(Window.partitionBy(col("metric")).orderBy(col("day"))))
      .select(col("metric"), col("day"), col("carry"))
    rows
      .withColumn("prev_in", lag(col("cents"), 1).over(wDay))
      .join(Tables.broadcastIfSmall(carries), Seq("metric", "day"))
      .withColumn("prev", coalesce(col("prev_in"), col("carry")))
      .filter(col("prev").isNotNull)
      .withColumn("inc",
        when(col("cents") >= col("prev"), col("cents") - col("prev"))
          .otherwise(col("cents")))
      // `day` rides along in the grouping: hour buckets nest inside days,
      // so the extra key never splits a group, and the lag window's
      // existing HashPartitioning(metric, day) satisfies the
      // (metric, day, bucket) clustering (subset key) — the final
      // aggregate runs in the window's stage with NO second corpus
      // exchange. Grouping on (metric, bucket) alone re-shuffled the
      // whole stream to co-locate keys the window had already co-located.
      .groupBy(col("metric"), col("day"), date_trunc("hour", col("ts")).as("bucket"))
      .agg((sum(col("inc")).cast("double") / 100.0).as("increase"),
        count(lit(1)).as("n_samples"))
      .select(col("metric"), col("bucket"), col("increase"), col("n_samples"))
      .resultOrder(col("metric"), col("bucket"))
  }

  /** Time-weighted average per hour bucket — TimescaleDB's `time_weight`
    * for irregular samples. The reference publishes on CHANGE (only
    * mutated nodes emit, opcua_mqtt_agent/main.py:129 + BASELINE.md
    * envelope), so samples are irregular and a plain avg over-weights
    * bursts; each sample should count for the time it was the live value.
    *
    * Semantics (self-contained per bucket — no cross-bucket state): a
    * sample's weight is the microseconds until the next sample in the
    * same bucket, the last sample extending to the bucket end; twa =
    * Σ vᵢ·dtᵢ / Σ dtᵢ.
    *
    * Determinism: weights are exact integer microseconds and values exact
    * integer cents, so the weighted sum is exact BIGINT arithmetic
    * (bounded ≪ 2^63: cents < 2^16, bucket ≤ 3.6e9 µs); the single
    * BIGINT→DOUBLE cast and division are correctly rounded identically in
    * both engines.
    *
    * Scale: one (metric, bucket)-window sort feeding the same-keyed
    * partial+final aggregate — the window partitioning IS the group key,
    * so Catalyst reuses one exchange.
    */
  def timeWeight(s: SparkSession, dir: String): DataFrame =
    timeWeightOn(ev(s, dir).select(
      col("event_type").as("metric"), col("ts"), col("event_id"), col("value")))

  /** [[timeWeight]] over any (metric, ts, event_id, value) frame — the
    * form the streaming twin's spec recomputes batch-side.
    */
  def timeWeightOn(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("metric"), col("bucket"))
      .orderBy(col("ts"), col("event_id"))
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val withDt = events.filter(col("value").isNotNull)
      .select(col("metric"), col("ts"), col("event_id"),
        cents.as("cents"))
      .withColumn("bucket", date_trunc("hour", col("ts")))
      .withColumn("until",
        coalesce(lead(col("ts"), 1).over(w), col("bucket") + expr("INTERVAL 1 HOUR")))
      .withColumn("dt_us", unix_micros(col("until")) - unix_micros(col("ts")))
    withDt
      .groupBy(col("metric"), col("bucket"))
      .agg(
        Model.roundN(
          sum(col("cents") * col("dt_us")).cast("double") /
            sum(col("dt_us")).cast("double") / 100.0,
          4).as("twa"),
        count(lit(1)).as("n_samples"))
      .resultOrder(col("metric"), col("bucket"))
  }

  /** Number of equal-width histogram bins. */
  val HistBins = 20

  /** Per-metric equal-width value histogram — the Grafana histogram panel
    * over the value domain. All bin arithmetic is exact integers: values
    * as cents, bin = ((c − cmin)·B) / (cmax − cmin) with integer
    * division, top edge clamped into the last bin; the reported bin_lo
    * edge is one identical double expression in both engines.
    *
    * Computed by VALUE COUNTING (the [[percentiles]] shape, adopted in
    * round 14): the corpus collapses ONCE to per-(metric, cent) counts
    * through a map-side-combined aggregate, and both the per-metric
    * bounds and the binning then run over that distinct-value table —
    * the two consumers share the exchange subtree verbatim, so physical
    * planning reuses it (ReuseExchange) and the corpus is scanned and
    * shuffled exactly once, at distinct-value wire volume. The previous
    * shape (bounds aggregate broadcast back onto the raw stream) scanned
    * the corpus twice; worse, the bounds broadcast sat behind a
    * planning-size gate that closed exactly when the corpus grew,
    * planning a corpus-wide sort-merge join on a 5-value key (measured
    * sf30: 12.6 s gated SMJ → 3.9 s forced broadcast, still two scans →
    * 1.4 s this shape, vs DuckDB's 0.6 s — the remainder is the one
    * parquet decode pass of the corpus).
    *
    * Scale: state is O(distinct values) — the reference's 2-decimal
    * bounded sensor domains (opcua_server/main.py:152-203) keep that in
    * the thousands per metric regardless of corpus size (the same
    * contract [[percentiles]] documents); a genuinely continuous domain
    * would re-quantize the counting key, not change the plan.
    */
  def histogram(s: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    // LAZY localCheckpoint on the distinct-value table: the bounds branch
    // and the binning branch would otherwise each re-derive it from its
    // own corpus scan (the optimizer collapses the bounds branch's inner
    // aggregate — min/max don't need cnt — so the two subtrees differ and
    // ReuseExchange cannot fire). Checkpointed, the corpus is scanned and
    // combined exactly once and both consumers read the value-cardinality
    // blocks (measured sf30: 2.0 s two-scan → 1.4 s).
    val vcnt = ev(s, dir).filter(col("value").isNotNull)
      .select(col("event_type").as("metric"), cents.as("c"))
      .groupBy(col("metric"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val bounds = vcnt.groupBy(col("metric"))
      .agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"))
    // bounds is one row per metric (a data-contract constant): broadcast
    // UNCONDITIONALLY — its planning-size estimate carries the corpus-
    // scale child, so any size gate here closes exactly at scale
    vcnt.join(broadcast(bounds), "metric")
      .withColumn("bin",
        // integer `div`, matching the oracle's '//' by construction —
        // Column./ is double division and would only agree via an exactness
        // argument on the cent magnitudes (percentiles already uses div)
        when(col("cmax") === col("cmin"), lit(0L))
          .otherwise(least(lit(HistBins - 1L),
            expr(s"((c - cmin) * $HistBins) div (cmax - cmin)")))
          .cast("long"))
      .groupBy(col("metric"), col("bin"))
      .agg(sum(col("cnt")).as("n"),
        // one shared double expression for the edge: identical op order
        // in the oracle keeps it bit-equal
        first(col("cmin").cast("double") / 100.0 +
          (col("cmax") - col("cmin")).cast("double") / 100.0 * col("bin") / HistBins)
          .as("bin_lo"))
      .resultOrder(col("metric"), col("bin"))
  }

  /** Discrete percentile targets in per-mille (p50/p90/p95/p99). */
  val PercentilesPerMille: Seq[Int] = Seq(500, 900, 950, 990)

  /** Per-metric discrete percentiles: the value whose ascending
    * (value, event_id) rank is ceil(p·n) — no interpolation, so the
    * result is an actual sample and the index arithmetic is exact
    * integers (per-mille p avoids 0.95·n landing ε away from an
    * integer and ceiling differently than intended).
    *
    * Computed by VALUE COUNTING, not row ranking: the value at rank r
    * depends only on the value (the (value, event_id) tie-break never
    * changes which VALUE sits at a rank), so one partial+final
    * `count(*) GROUP BY (metric, value)` collapses the corpus to its
    * distinct values, a running sum over that tiny table assigns each
    * value its rank interval (cum−cnt, cum], and the percentile is the
    * unique row whose interval covers ceil(p·n) — n is a whole-partition
    * sum over the SAME window partitioning, so no second branch and no
    * join exists anywhere in the plan: one corpus scan, one corpus
    * exchange (map-side-combined), one value-cardinality window.
    *
    * Scale: state is O(distinct values), not O(rows) — the reference's
    * 2-decimal bounded sensor domains (opcua_server/main.py:152-203)
    * keep per-metric distinct values in the thousands regardless of
    * corpus size, and value counting is immune to the distribution skew
    * that equal-width binning inherits (a single-value metric is ONE
    * row here, the bin approach's worst case). For genuinely unbounded/
    * continuous domains whose distinct-value table would rival the
    * corpus, [[percentilesApprox]] is the constant-memory path.
    */
  def percentiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vcnt = ev(s, dir).filter(col("value").isNotNull)
      .select(col("event_type").as("metric"), col("value"))
      .groupBy(col("metric"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    // Stage fusion, size-gated: when the value-cardinality table's
    // estimate is small, exchange it to ONE hash(metric) partition —
    // HashPartitioning(metric, 1) still satisfies the windows' clustering,
    // so the rank windows, the target explode/filter, AND the final
    // presentation sort all run inside that single post-exchange stage
    // (2 exchanges total; the generic resultOrder would add a third).
    // Past the gate the default shuffle width stays and the plan scales
    // out per metric.
    val fuseSmall = Tables.planningSize(vcnt) <= (64L << 20)
    val ranked = if (fuseSmall) vcnt.repartition(1, col("metric")) else vcnt
    val wCum = Window.partitionBy(col("metric")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("metric"))
    // `div`, not `/`, in the target arithmetic: Column./ is double
    // division and the rank-interval containment would never match
    val out = ranked
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .select(col("metric"), col("value"), col("cnt"), col("cum"),
        explode(expr(
          s"transform(array(${PercentilesPerMille.mkString(", ")}), " +
            "pm -> struct(pm AS p_permille, greatest(1L, (n * pm + 999) div 1000) AS target))"))
          .as("t"))
      .filter(col("t.target") > col("cum") - col("cnt") &&
        col("t.target") <= col("cum"))
      .select(col("metric"), col("t.p_permille").as("p_permille"),
        col("value").as("p_value"))
    if (fuseSmall) out.sortWithinPartitions(col("metric"), col("p_permille"))
    else out.resultOrder(col("metric"), col("p_permille"))
  }

  /** Relative rank-error denominator for [[percentilesApprox]]: the
    * returned value's rank is within n/`PctApproxAccuracy` of the target
    * rank (Greenwald-Khanna bound). 2^17 keeps the sketch a few MB and
    * the error ≤ 8 ranks per million rows.
    */
  val PctApproxAccuracy: Int = 1 << 17

  /** Approximate sibling of [[percentiles]] — the constant-memory path
    * for unbounded time ranges at corpus scale: one partial+final
    * aggregation of a per-metric Greenwald-Khanna sketch
    * (`percentile_approx`), no window, no sort, no second scan. Rank
    * error is bounded by n/[[PctApproxAccuracy]]; the exact operator is
    * the dashboard-range form when ranks must be exact. Sketch merge
    * order varies with partitioning, so cross-engine hash equality is
    * not a meaningful contract here — the driver's rows-only check (no
    * oracle SQL) is the right gate, and PropertySpec asserts the
    * rank-error bound against the exact operator.
    */
  def percentilesApprox(s: SparkSession, dir: String): DataFrame = {
    val pcts = array(PercentilesPerMille.map(pm => lit(pm / 1000.0)): _*)
    ev(s, dir).filter(col("value").isNotNull)
      .groupBy(col("event_type").as("metric"))
      .agg(percentile_approx(col("value"), pcts, lit(PctApproxAccuracy)).as("ps"))
      .select(col("metric"),
        posexplode(col("ps")).as(Seq("i", "p_value")))
      .select(col("metric"),
        element_at(
          array(PercentilesPerMille.map(pm => lit(pm)): _*), col("i") + 1
        ).as("p_permille"),
        col("p_value"))
      .resultOrder(col("metric"), col("p_permille"))
  }

  /** Minimum same-side run length for the SPC run rule. */
  val SpcRunLen = 8

  /** Statistical process control over the metric streams — the analytics
    * behind the reference's own `SPCPlacementOffsetTrend` variable
    * (opcua_server/main.py:199-203): Western Electric rule 1 (a point
    * beyond mean ± 3σ) and rule 4 (`SpcRunLen` consecutive points on the
    * same side of the mean — a process drift the deviation alarms can't
    * see because no single point is extreme).
    *
    * Determinism: mean and σ derive from exact BIGINT sums of cents and
    * squared cents ((nΣc² − (Σc)²)/(n(n−1)), then one sqrt — every step
    * correctly rounded identically in both engines). Fixture bounds keep
    * the integer sums well under 2^63; a production run at corpus scale
    * would sum DECIMAL(38) instead. Run detection is the gaps-and-islands
    * trick (global rank minus per-side rank), all integer.
    *
    * Scale: the per-metric stats are a tiny aggregate broadcast back.
    * The gaps-and-islands ranks run as TWO-PHASE windows (same argument
    * as [[counterRate]]: ~46 metrics ⇒ a per-metric window is one task
    * per metric): both row_numbers partition on a composite
    * (metric[, above], day) key and are lifted to global ranks by adding
    * per-day running offsets. BOTH offsets come from ONE
    * (metric, above, day) count branch (pruned scan, map-side combine to
    * day-cardinality rows, tiny exchange): the same-side offset is the
    * running same-side total minus the row's own count, and the all-rows
    * offset is the running total minus the current day's total — all as
    * RANGE-frame sums over one (metric)-partitioned day ordering, so the
    * branch costs one tiny exchange and one sort, and the main stream
    * joins ONE broadcast table instead of two. (A derivation from the
    * ranked stream itself was tried and reverted: exchange reuse only
    * holds while branch subtrees stay sameResult()-identical, which
    * column pruning and constraint propagation both break.) The
    * run-position window keys on (metric, above, island) — island
    * cardinality grows with the data, so that one is already
    * fine-grained.
    */
  def spcRules(s: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val v = ev(s, dir).filter(col("value").isNotNull)
      .select(col("event_type").as("metric"), col("ts"), col("event_id"),
        col("value"), cents.as("c"))
    spcRulesOn(v,
      twoPhase = Tables.planningSize(v) > singlePhaseBound(s, SpcSinglePhaseMaxBytes))
  }

  /** [[spcRules]] over a prepared (metric, ts, event_id, value, c) frame
    * with the phase choice explicit — PlanSpec pins BOTH shapes.
    */
  private[graft] def spcRulesOn(v: DataFrame, twoPhase: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // In the TWO-PHASE form stats feeds BOTH the main stream and the
    // offset count branch (each needs `above`, hence the mean); without
    // materialization the whole stats subtree — a corpus scan +
    // aggregate — is duplicated into each branch of the DAG. Eager
    // localCheckpoint (the minhashPairsOn pattern: no CacheManager pin,
    // blocks reclaimed when the result is dropped) computes the
    // metric-cardinality table once; both joins then broadcast the
    // materialized rows. The single-phase form consumes stats exactly
    // once, so the checkpoint job would be a pure extra stage there.
    // Σc and Σc² accumulate in decimal(38,0) and the variance numerator
    // n·Σc² − (Σc)² multiplies in decimal: BIGINT versions were exact at
    // ≤ sf1 but the 30× scale run overflowed n·q (ANSI abort) — DuckDB's
    // sum() is HUGEINT, so its side was already 128-bit. The per-row
    // square widens EACH FACTOR first (decimal × decimal, never a BIGINT
    // intermediate): c*c in 64-bit overflows at |c| ≥ ~3.04e9, i.e.
    // |value| ≥ ~3.04e7 — the oracle mirrors with CAST(c AS HUGEINT)
    // per factor. Both engines compute the same exact integers (≤ 38
    // digits ≈ HUGEINT's range) and cast to double once, so the hash
    // still matches.
    val cDec = col("c").cast("decimal(38,0)")
    val statsBase = v.groupBy(col("metric"))
      .agg(count(lit(1)).as("n"),
        sum(cDec).as("s"),
        sum(cDec * cDec).as("q"))
      .select(col("metric"),
        (col("s").cast("double") / col("n").cast("double")).as("mean_c"),
        sqrt((col("n").cast("decimal(38,0)") * col("q") -
            col("s") * col("s")).cast("double") /
          (col("n").cast("decimal(38,0)") * (col("n") - 1)).cast("double")).as("sd_c"))
    val stats = if (twoPhase) statsBase.localCheckpoint(eager = true) else statsBase
    val sided0 = v.join(Tables.broadcastIfSmall(stats), "metric")
      .withColumn("above", col("c").cast("double") > col("mean_c"))
    if (!twoPhase) {
      // single-phase: the oracle's own gaps-and-islands shape — three
      // windows, all satisfied by ONE hash(metric) exchange (above and
      // grp only refine the subset-key clustering), each a re-sort in
      // the same stage; no count branch, no offsets join
      val wAll = Window.partitionBy(col("metric")).orderBy(col("ts"), col("event_id"))
      val wSide = Window.partitionBy(col("metric"), col("above"))
        .orderBy(col("ts"), col("event_id"))
      val wrun1 = Window.partitionBy(col("metric"), col("above"), col("grp"))
        .orderBy(col("ts"), col("event_id"))
      return sided0
        .withColumn("grp",
          row_number().over(wAll) - row_number().over(wSide))
        .withColumn("run_pos", row_number().over(wrun1))
        .withColumn("rule1_3sigma",
          abs(col("c").cast("double") - col("mean_c")) > lit(3.0) * col("sd_c"))
        .withColumn("rule4_run", col("run_pos") >= SpcRunLen)
        .filter(col("rule1_3sigma") || col("rule4_run"))
        .select(col("event_id"), col("metric"), col("ts"), col("value"),
          col("rule1_3sigma"), col("rule4_run"))
        .resultOrder(col("event_id"))
    }
    val sided = sided0.withColumn("day", date_trunc("day", col("ts")))
    val wDay = Window.partitionBy(col("metric"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val wSideDay = Window.partitionBy(col("metric"), col("above"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    // ONE day-level count branch serves both offsets. Rows are unique per
    // (metric, above, day); a RANGE frame ordered by day makes same-day
    // rows peers, so over a (metric) partitioning:
    //   cumAll   = rows in days <= d        (range unbounded..current)
    //   cumAbove = above-side rows <= d     (conditional sum, same frame)
    //   dayTotal = rows in day d exactly    (range current..current peers)
    //   soff     = strictly-earlier same-side count
    //            = (above ? cumAbove : cumAll − cumAbove) − own cnt
    //   off      = strictly-earlier all-rows count = cumAll − dayTotal
    // All exact integer sums; one tiny exchange + sort for all three.
    // (The previous form ran TWO count branches — each a full corpus
    // scan — because deriving one from the other as DataFrames would
    // duplicate the subtree in the DAG absent fragile exchange reuse;
    // computing both offsets as window columns of the SAME branch keeps
    // the plan a tree with no reuse needed.)
    val wCum = Window.partitionBy(col("metric")).orderBy(col("day"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wPeer = Window.partitionBy(col("metric")).orderBy(col("day"))
      .rangeBetween(Window.currentRow, Window.currentRow)
    val offs = sided
      .groupBy(col("metric"), col("above"), col("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum_all", sum(col("cnt")).over(wCum))
      .withColumn("cum_above",
        sum(when(col("above"), col("cnt")).otherwise(lit(0L))).over(wCum))
      .withColumn("day_total", sum(col("cnt")).over(wPeer))
      .select(col("metric"), col("above"), col("day"),
        (when(col("above"), col("cum_above"))
          .otherwise(col("cum_all") - col("cum_above")) - col("cnt")).as("soff"),
        (col("cum_all") - col("day_total")).as("off"))
    // both rank windows run off one (metric, day) exchange —
    // HashPartitioning(metric, day) satisfies the (metric, above, day)
    // clustering (subset key), so the second window only re-sorts.
    val grped = sided
      .withColumn("rn_in", row_number().over(wDay))
      .withColumn("rs_in", row_number().over(wSideDay))
      .join(Tables.broadcastIfSmall(offs), Seq("metric", "above", "day"))
      .withColumn("grp", (col("off") + col("rn_in")) - (col("soff") + col("rs_in")))
    val wrun = Window.partitionBy(col("metric"), col("above"), col("grp"))
      .orderBy(col("ts"), col("event_id"))
    grped
      .withColumn("run_pos", row_number().over(wrun))
      .withColumn("rule1_3sigma",
        abs(col("c").cast("double") - col("mean_c")) > lit(3.0) * col("sd_c"))
      .withColumn("rule4_run", col("run_pos") >= SpcRunLen)
      .filter(col("rule1_3sigma") || col("rule4_run"))
      .select(col("event_id"), col("metric"), col("ts"), col("value"),
        col("rule1_3sigma"), col("rule4_run"))
      .resultOrder(col("event_id"))
  }

  val oracles: Map[String, String] = Map(
    "q_spc_rules" ->
      s"""WITH v AS (
         |  SELECT event_type AS metric, ts, event_id, value,
         |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
         |  FROM events WHERE value IS NOT NULL),
         |st AS (
         |  SELECT metric,
         |    CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_c,
         |    sqrt(CAST(count(*) * sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) - sum(c) * sum(c) AS DOUBLE)
         |         / CAST(count(*) * (count(*) - 1) AS DOUBLE)) AS sd_c
         |  FROM v GROUP BY 1),
         |sided AS (
         |  SELECT v.*, st.mean_c, st.sd_c,
         |    CAST(v.c AS DOUBLE) > st.mean_c AS above
         |  FROM v JOIN st USING (metric)),
         |grped AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY metric ORDER BY ts, event_id)
         |      - row_number() OVER (PARTITION BY metric, above ORDER BY ts, event_id) AS grp
         |  FROM sided),
         |runs AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY metric, above, grp ORDER BY ts, event_id) AS run_pos
         |  FROM grped)
         |SELECT event_id, metric, ts, value,
         |  abs(CAST(c AS DOUBLE) - mean_c) > 3.0 * sd_c AS rule1_3sigma,
         |  run_pos >= $SpcRunLen AS rule4_run
         |FROM runs
         |WHERE abs(CAST(c AS DOUBLE) - mean_c) > 3.0 * sd_c OR run_pos >= $SpcRunLen
         |ORDER BY event_id""".stripMargin,
    "q_histogram" ->
      s"""WITH c AS (
         |  SELECT event_type AS metric, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
         |  FROM events WHERE value IS NOT NULL),
         |b AS (SELECT metric, min(c) AS cmin, max(c) AS cmax FROM c GROUP BY 1),
         |binned AS (
         |  SELECT c.metric,
         |    CAST(CASE WHEN cmax = cmin THEN 0
         |         ELSE least($HistBins - 1, ((c.c - cmin) * $HistBins) // (cmax - cmin))
         |    END AS BIGINT) AS bin,
         |    cmin, cmax
         |  FROM c JOIN b USING (metric))
         |SELECT metric, bin, count(*) AS n,
         |  any_value(CAST(cmin AS DOUBLE) / 100.0
         |    + CAST(cmax - cmin AS DOUBLE) / 100.0 * bin / $HistBins) AS bin_lo
         |FROM binned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_percentiles" ->
      s"""WITH r AS (
         |  SELECT event_type AS metric, value, event_id,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM events WHERE value IS NOT NULL),
         |p AS (SELECT unnest(ARRAY[${PercentilesPerMille.mkString(", ")}]) AS p_permille)
         |SELECT metric, p_permille, value AS p_value
         |FROM r JOIN p ON r.rn = greatest(1, (n * p_permille + 999) // 1000)
         |ORDER BY metric, p_permille""".stripMargin,
    "q_time_weight" ->
      s"""WITH c AS (
         |  SELECT event_type AS metric, ts, event_id,
         |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         |         date_trunc('hour', ts) AS bucket
         |  FROM events WHERE value IS NOT NULL),
         |d AS (
         |  SELECT metric, bucket, cents,
         |    date_diff('microsecond', ts,
         |      coalesce(lead(ts) OVER (PARTITION BY metric, bucket ORDER BY ts, event_id),
         |               bucket + INTERVAL 1 HOUR)) AS dt_us
         |  FROM c)
         |SELECT metric, bucket,
         |  ${Model.roundNSql(
            "CAST(sum(cents * dt_us) AS DOUBLE) / CAST(sum(dt_us) AS DOUBLE) / 100.0", 4)} AS twa,
         |  count(*) AS n_samples
         |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_counter_rate" ->
      """WITH c AS (
        |  SELECT event_type AS metric, ts, event_id,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT metric, ts, cents,
        |         lag(cents) OVER (PARTITION BY metric ORDER BY ts, event_id) AS prev
        |  FROM c)
        |SELECT metric, date_trunc('hour', ts) AS bucket,
        |  CAST(sum(CASE WHEN cents >= prev THEN cents - prev ELSE cents END) AS DOUBLE) / 100.0
        |    AS increase,
        |  count(*) AS n_samples
        |FROM d WHERE prev IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_gapfill_interp" ->
      s"""WITH agg AS (
         |  SELECT event_type AS metric, date_trunc('minute', ts) AS bucket,
         |         ${Model.exactAvg4Sql("value")} AS avg_value
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |bounds AS (SELECT metric, min(bucket) AS lo, max(bucket) AS hi FROM agg GROUP BY 1),
         |spine AS (
         |  SELECT metric, unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS bucket
         |  FROM bounds),
         |j AS (
         |  SELECT s.metric, s.bucket, a.avg_value
         |  FROM spine s LEFT JOIN agg a USING (metric, bucket)),
         |w AS (
         |  SELECT metric, bucket, avg_value,
         |    last_value(avg_value IGNORE NULLS) OVER wb AS prev_v,
         |    last_value(CASE WHEN avg_value IS NOT NULL THEN bucket END IGNORE NULLS) OVER wb AS prev_b,
         |    first_value(avg_value IGNORE NULLS) OVER wf AS next_v,
         |    first_value(CASE WHEN avg_value IS NOT NULL THEN bucket END IGNORE NULLS) OVER wf AS next_b
         |  FROM j
         |  WINDOW
         |    wb AS (PARTITION BY metric ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wf AS (PARTITION BY metric ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT metric, bucket, avg_value,
         |  ${Model.roundNSql(
              "CASE WHEN avg_value IS NOT NULL THEN avg_value " +
                "WHEN next_v IS NOT NULL THEN prev_v + (next_v - prev_v) * " +
                "(CAST(date_diff('second', prev_b, bucket) AS DOUBLE) / " +
                "CAST(date_diff('second', prev_b, next_b) AS DOUBLE)) END", 4)} AS interp_value,
         |  avg_value IS NULL AS is_gap
         |FROM w ORDER BY metric, bucket""".stripMargin,
    "q_gapfill_locf" ->
      s"""WITH agg AS (
         |  SELECT event_type AS metric, date_trunc('minute', ts) AS bucket,
         |         ${Model.exactAvg4Sql("value")} AS avg_value,
         |         count(value) AS sample_count
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |bounds AS (SELECT metric, min(bucket) AS lo, max(bucket) AS hi FROM agg GROUP BY 1),
         |spine AS (
         |  SELECT metric, unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS bucket
         |  FROM bounds)
         |SELECT s.metric, s.bucket, a.avg_value,
         |  last_value(a.avg_value IGNORE NULLS) OVER (
         |    PARTITION BY s.metric ORDER BY s.bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value,
         |  a.avg_value IS NULL AS is_gap,
         |  coalesce(a.sample_count, 0) AS sample_count
         |FROM spine s LEFT JOIN agg a USING (metric, bucket)
         |ORDER BY s.metric, s.bucket""".stripMargin,
    "q_asof_join" ->
      """SELECT e.event_id, e.user_id, e.ts, e.value,
        |       c.ts AS click_ts, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY e.event_id""".stripMargin,
    "q_scan_filter" ->
      """SELECT event_id, ts, user_id, value FROM events
        |WHERE event_type = 'click' ORDER BY event_id""".stripMargin,
    "q_last_value" ->
      """SELECT ts AS time, value FROM events WHERE event_type = 'click'
        |ORDER BY ts DESC, event_id DESC LIMIT 1""".stripMargin,
    "q_latest_per_group" ->
      s"""SELECT event_type AS metric, ts AS time,
         |  coalesce(${Model.valueStrSql}, CAST(value AS VARCHAR)) AS value
         |FROM events
         |QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) = 1
         |ORDER BY metric""".stripMargin,
    "q_in_list" ->
      """SELECT event_type, count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS total
        |FROM events WHERE event_type IN ('click', 'purchase', 'signup')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_coalesce_cast" ->
      s"""SELECT event_id, coalesce(${Model.valueStrSql}, CAST(value AS VARCHAR)) AS value
         |FROM events ORDER BY event_id""".stripMargin,
    "q_time_range" ->
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "q_raw_timeseries" ->
      """SELECT ts AS time, value, event_id FROM events
        |WHERE event_type = 'purchase'
        |  AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-25 00:00:00'
        |ORDER BY time, event_id""".stripMargin,
    "q_bucket_agg" ->
      s"""SELECT date_trunc('hour', ts) AS bucket, event_type AS metric,
        |  ${Model.exactAvg4Sql("value")} AS avg_value, min(value) AS min_value,
        |  max(value) AS max_value, count(value) AS sample_count
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_notnull_filter" ->
      s"""WITH t AS (
        |  SELECT event_type,
        |         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_num
        |  FROM events)
        |SELECT event_type, count(*) AS n, ${Model.exactAvg4Sql("value_num")} AS avg_value
        |FROM t WHERE value_num IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_mv_minute" ->
      s"""SELECT date_trunc('minute', ts) AS bucket, event_type AS metric,
        |  ${Model.exactAvg4Sql("value")} AS avg_value, min(value) AS min_value,
        |  max(value) AS max_value, count(value) AS sample_count
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_mv_hourly" ->
      s"""SELECT date_trunc('hour', ts) AS bucket, event_type AS metric,
        |  ${Model.exactAvg4Sql("value")} AS avg_value, min(value) AS min_value,
        |  max(value) AS max_value, count(value) AS sample_count
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-28 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-30 23:00:00' AND value IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_mv_read" ->
      s"""WITH mv AS (
        |  SELECT date_trunc('minute', ts) AS bucket, event_type AS metric,
        |    ${Model.exactAvg4Sql("value")} AS avg_value, min(value) AS min_value,
        |    max(value) AS max_value
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2)
        |SELECT bucket AS time, avg_value, min_value, max_value FROM mv
        |WHERE metric = 'click'
        |  AND bucket BETWEEN TIMESTAMP '2024-01-08 00:00:00' AND TIMESTAMP '2024-01-22 00:00:00'
        |ORDER BY time""".stripMargin,
    "q_alarm_feed" ->
      """WITH last_running AS (
        |  SELECT coalesce(max(ts), TIMESTAMP '1970-01-01 00:00:00') AS clear_time
        |  FROM events WHERE event_type = 'view' AND value > 300)
        |SELECT e.ts AS time, translate(e.props, '{}": ', '') AS message,
        |       e.user_id AS operator_id, e.event_id
        |FROM events e, last_running lr
        |WHERE e.event_type = 'error' AND e.props <> '' AND e.props <> '[]'
        |  AND (e.props LIKE '%1%'
        |    OR (e.props LIKE '%2%' AND e.ts > lr.clear_time)
        |    OR (e.props NOT LIKE '%1%' AND e.props NOT LIKE '%2%' AND e.ts > lr.clear_time))
        |ORDER BY time DESC, event_id DESC LIMIT 50""".stripMargin,
    "q_union_types" ->
      """SELECT event_id, ts AS time, event_type AS metric, value AS value_num,
        |       CAST(NULL AS VARCHAR) AS value_str
        |FROM events
        |UNION ALL
        |SELECT event_id, ts AS time, event_type || '_str' AS metric,
        |       CAST(NULL AS DOUBLE) AS value_num, props AS value_str
        |FROM events
        |ORDER BY event_id, metric""".stripMargin
  )
}
