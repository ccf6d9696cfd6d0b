package graft.ops

import graft.Tables
import graft.Tables.ResultOrdering
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2E sessionization + cardinality estimation over `events`. */
object SessionOps {

  /** Gap-based session windows (30 min inactivity) per user.
    * `session_window` is Spark's native gap-session operator: one shuffle on
    * user_id, sessions merged inside the aggregation — the 100 TB-safe
    * equivalent of the gaps-and-islands SQL the oracle runs.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionizeOn(Tables.events(s, dir))

  def sessionizeOn(events: DataFrame): DataFrame =
    events
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
      .resultOrder(col("user_id"), col("session_start"))

  /** Distinct-user cardinality per metric. The oracle-checked column is the
    * exact count; `approx_n_users` (HyperLogLog++, the operator that matters
    * at 100 TB — mergeable sketches, no distinct shuffle of raw values) is
    * asserted within 5% of exact in ScalaTest, and kept out of the hashed
    * columns here because sketch estimates are not oracle-reproducible.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .resultOrder(col("event_type"))

  /** Ordered funnel stages (strictly increasing timestamps required). */
  val FunnelStages: Seq[String] = Seq("click", "signup", "purchase")

  /** Ordered-sequence funnel — the conversion analysis every event
    * pipeline runs: users who performed the stages IN ORDER (each stage
    * strictly after their first qualifying time for the previous one),
    * with per-stage populations and per-mille conversion against stage 1.
    *
    * Shape: ONE corpus scan (a pushed `event_type IN (stages)` filter),
    * one user_id exchange, and a per-user ordered fold. The K-branch
    * join form (stage k joined back onto stage k's events) reads the
    * corpus once per stage unless row-groups happen to be type-clustered
    * — on an interleaved 100 TB log that is K full passes. Here each
    * user's stage events collect once (`collect_list`, per-user
    * bucket-scale), sort in-row, and fold left-to-right through
    * `aggregate`: the accumulator is the K-vector of first qualifying
    * µs-timestamps, and an event advances its stage iff that slot is
    * still null and the previous slot is strictly earlier. The
    * sequential fold computes exactly the join chain's fixpoint — stage
    * k's first qualifying time is the earliest stage-k event strictly
    * after stage k−1's — because events arrive in ascending (x, stage)
    * order and the strict `>` makes same-instant events unable to
    * advance under ANY tie order. Stage counts are then one global
    * aggregate over the K slots; no driver-side action anywhere.
    *
    * Skew: the collect_list fold concentrates a user's whole stage
    * history in ONE aggregation buffer — fine for human-scale keys, an
    * OOM exposure for a bot/service account with millions of funnel
    * events. Past a planning-size gate the operator switches to a
    * bounded-state arm: the SAME one hash(user_id) exchange, but Spark's
    * EXTERNAL sort orders each group (spilling, never buffering a key in
    * memory) and `flatMapSortedGroups` streams the events through an
    * O(K) left-to-right fold — the identical advance rule, so both arms
    * are pointwise equal (PropertySpec). Below the gate the in-row
    * codegen fold wins on per-stage floor.
    */
  val FunnelFoldMaxBytes: Long = RelationalOps.SpcSinglePhaseMaxBytes

  def funnel(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    funnelOn(events, FunnelStages,
      skewSafe = Tables.planningSize(
          events.select(col("user_id"), col("ts"), col("event_type"))) >
        RelationalOps.singlePhaseBound(s, FunnelFoldMaxBytes))
  }

  def funnelOn(events: DataFrame, stages: Seq[String],
      skewSafe: Boolean = false): DataFrame = {
    require(stages.nonEmpty)
    val k = stages.size
    val pts = events.filter(col("event_type").isin(stages: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("x"),
        array_position(typedLit(stages), col("event_type")).cast("int").as("stg"))
    val nulls = Seq.fill(k)("CAST(NULL AS BIGINT)").mkString(", ")
    val folded =
      if (skewSafe) {
        import events.sparkSession.implicits._
        // key on the RAW user_id rendered as a string — a long cast here
        // threw under ANSI for non-numeric ids and collided "1"/"01",
        // silently diverging from the in-row arm's raw-column grouping
        // whenever the size gate flipped. String rendering is injective
        // per distinct value, so both arms group identically (nulls
        // group together in both, as groupBy and groupByKey both do).
        pts.select(col("user_id").cast("string"), col("x"), col("stg"))
          .as[(String, Long, Int)]
          .groupByKey(_._1)
          .flatMapSortedGroups(col("x"), col("stg")) {
            (_: String, it: Iterator[(String, Long, Int)]) =>
              // the CASE fold, one event at a time: slot i advances iff
              // still null and the previous slot is strictly earlier
              val acc = Array.fill[Option[Long]](k)(None)
              it.foreach { case (_, x, stg) =>
                val i = stg - 1
                if (acc(i).isEmpty &&
                    (i == 0 || acc(i - 1).exists(_ < x))) acc(i) = Some(x)
              }
              Iterator.single(acc.toSeq)
          }
          .toDF("firsts")
      } else pts
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("x"), col("stg")))).as("evs"))
        // branch ORDER is load-bearing: `acc[e.stg - 2]` is acc[-1] for a
        // stage-1 event, and ANSI mode throws on negative indices — the
        // `e.stg = 1` WHEN must win first (CASE branches evaluate lazily,
        // unlike OR operands)
        .select(expr(
          s"""aggregate(evs, array($nulls), (acc, e) ->
             |  transform(acc, (v, i) -> CASE
             |    WHEN i != e.stg - 1 OR v IS NOT NULL THEN v
             |    WHEN e.stg = 1 THEN e.x
             |    WHEN acc[e.stg - 2] IS NOT NULL AND e.x > acc[e.stg - 2] THEN e.x
             |    ELSE v END))""".stripMargin).as("firsts"))
    val totals = folded.agg(
      count(col("firsts")(0)).as("n0"),
      (1 until k).map(i => count(col("firsts")(i)).as(s"n$i")): _*)
    totals
      .select(col("n0").as("n1"),
        explode(array((0 until k).map(i =>
          struct(lit(i + 1).as("stage"), lit(stages(i)).as("event_type"),
            col(s"n$i").as("n"))): _*)).as("s"))
      .select(col("s.stage"), col("s.event_type"), col("s.n").as("n_users"),
        when(col("n1") === 0, 0L)
          .otherwise(expr("(s.n * 1000) div n1")).as("conv_permille"))
      .resultOrder(col("stage"))
  }

  /** Weekly cohort retention — the companion report to [[funnel]]: users
    * grouped by first-seen week (the cohort), each later week of activity
    * marked, and the matrix reported as (cohort_week, weeks_since,
    * n_active, retained_permille vs the cohort's size). Exact integer
    * week arithmetic: weeks are floor(epoch-day / 7) (no calendar-week
    * locale/engine drift), per-mille retention is integer division.
    *
    * Scale: ONE corpus exchange — each user's distinct activity weeks
    * collect into one bounded set (`collect_set` partially aggregates,
    * so duplicate (user, week) rows combine map-side and the exchange
    * carries distinct pairs; per-user state is capped by the calendar
    * span — thousands of weeks over decades — never the event count).
    * Cohort = array_min of that set, so the first-seen frame NEVER joins
    * back onto the corpus: the previous shape broadcast the
    * user-cardinality first-seen table onto the raw activity stream
    * behind a planning-size gate, which closed exactly between the sf30
    * and sf100 fixtures and re-planned a corpus-wide sort-merge join —
    * the 4.82× sweep slope of the r14 factor-999 record. Both downstream
    * frames (the activity matrix and the cohort sizes) are tiny
    * aggregates over the lazily-checkpointed per-user table, and the
    * final join broadcasts the calendar-bounded sizes frame
    * UNCONDITIONALLY (no gate left to mis-size anywhere in the plan).
    */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame =
    retentionCohortsOn(Tables.events(s, dir))

  def retentionCohortsOn(events: DataFrame): DataFrame = {
    // FLOOR division, not `div` (truncate-toward-zero): DuckDB's `//` in
    // the oracle floors, and a pre-1970 activity day (negative day count)
    // would otherwise bucket one week HIGHER here than there — the same
    // truncate-vs-floor trap the LTTB bucketing fixed with pmod
    val acts = events.select(col("user_id"),
      expr("""(datediff(CAST(ts AS DATE), DATE '1970-01-01')
              | - pmod(datediff(CAST(ts AS DATE), DATE '1970-01-01'), 7)) div 7"""
        .stripMargin.replace("\n", "")).as("week"))
    // LAZY localCheckpoint: sizes and the matrix both consume the per-user
    // frame; un-checkpointed each would re-derive it from its own corpus
    // scan (the same two-consumer argument as q_histogram's vcnt table)
    val perUser = acts.groupBy(col("user_id"))
      .agg(collect_set(col("week")).as("weeks"))
      .localCheckpoint(eager = false)
    // a NULL user_id groups in perUser (and therefore counts in sizes,
    // exactly like the oracle's fs/sz CTEs) but joins into NO activity row
    // (the oracle's `a JOIN fs USING (user_id)` drops it) — filter it from
    // the matrix side only, preserving the join-based null semantics
    val matrix = perUser.filter(col("user_id").isNotNull)
      .select(array_min(col("weeks")).as("cohort_week"),
        explode(col("weeks")).as("week"))
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
      .groupBy(col("cohort_week"), col("weeks_since"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = perUser
      .select(array_min(col("weeks")).as("cohort_week"))
      .groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_size"))
    matrix.join(broadcast(sizes), "cohort_week")
      .withColumn("retained_permille", expr("(n_active * 1000) div cohort_size"))
      .select(col("cohort_week"), col("weeks_since"), col("n_active"),
        col("retained_permille"))
      .resultOrder(col("cohort_week"), col("weeks_since"))
  }

  /** Liveness gap threshold: a heartbeat covers the next [[UptimeTimeoutMin]]
    * minutes; a longer silence is an interruption. */
  val UptimeTimeoutMin = 5

  /** Single-phase bound for [[uptime]]'s gate, overridable through the
    * same `spark.graft.singlePhaseMaxBytes` conf the A/B probes use.
    * Originally the counter-rate family's generous 256 MB; re-sized to
    * the SPC bound after a measured same-window A/B showed the
    * two-phase arm winning from factor-10 up (sf1: 0.99 s vs 1.04 s;
    * sf3: 1.52 s vs 2.11 s — the ≤46-way per-metric sort loses to
    * (metric, day) parallelism well before 256 MB), while fixture scale
    * (sf0.1 and below, estimates < 4 MB) keeps the cheaper single
    * window. Counter-rate itself stays at its 256 MB default: its A/B
    * still favors single-phase at sf3 (2.59 s vs 2.81 s — its window
    * work is one lag, lighter than uptime's gap/interruption math).
    */
  val UptimeSinglePhaseMaxBytes: Long = RelationalOps.SpcSinglePhaseMaxBytes

  /** Heartbeat liveness — the TimescaleDB heartbeat_agg shape over the
    * reference's periodic publishers: each sample covers min(gap to next,
    * timeout) of uptime (the last sample covers a full timeout window),
    * and a gap beyond the timeout counts as one interruption. All exact
    * integer microseconds.
    *
    * Scale: `metric` is `event_type` — ≤46 values in the reference model
    * (opcua_server/main.py:152-203) — so a bare per-metric window funnels
    * a 100 TB feed into ≤46 sort tasks. Past a planning-size gate the
    * operator therefore switches to the counter-rate family's two-phase
    * shape ([[RelationalOps.counterRateOn]] is the template): in-partition
    * lead over bounded (metric, day) keys, plus one day-boundary repair
    * carry — the next PRESENT day's first timestamp, a lag/lead over the
    * tiny day-level aggregate — joined back size-gated. The per-day
    * partial aggregate runs in the window's own stage (subset-key
    * clustering), so the corpus is exchanged exactly once either way.
    * Below the gate the single window's one exchange + sort wins on
    * per-stage scheduler floor; the gate keys on the data's planning
    * size, never the caller.
    */
  def uptime(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables.events(s, dir)
    uptimeOn(rows, twoPhase = Tables.planningSize(
        rows.select(col("event_type"), col("ts"), col("event_id"))) >
      RelationalOps.singlePhaseBound(s, UptimeSinglePhaseMaxBytes))
  }

  def uptimeOn(events: DataFrame, twoPhase: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val timeoutUs = UptimeTimeoutMin * 60L * 1000000L
    val pts = events.select(col("event_type").as("metric"), col("ts"), col("event_id"))
    def rollup(withGap: DataFrame, extraKey: Seq[String]): DataFrame = {
      val partial = withGap
        .groupBy((Seq("metric") ++ extraKey).map(col): _*)
        .agg(
          sum(least(coalesce(col("gap_us"), lit(timeoutUs)), lit(timeoutUs)))
            .as("up_us"),
          sum(when(col("gap_us") > timeoutUs, 1L).otherwise(0L)).as("interruptions"),
          count(lit(1)).as("n_heartbeats"))
      val total =
        if (extraKey.isEmpty) partial
        else partial.groupBy(col("metric")).agg(
          sum(col("up_us")).as("up_us"),
          sum(col("interruptions")).as("interruptions"),
          sum(col("n_heartbeats")).as("n_heartbeats"))
      total.resultOrder(col("metric"))
    }
    if (!twoPhase) {
      val w = Window.partitionBy(col("metric")).orderBy(col("ts"), col("event_id"))
      return rollup(pts.withColumn("gap_us",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))), Nil)
    }
    val rows = pts.withColumn("day", date_trunc("day", col("ts")))
    val wDay = Window.partitionBy(col("metric"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    // boundary repair: the next PRESENT day's first timestamp per
    // (metric, day) — a lead over the day-cardinality aggregate, the
    // same separate-scan-branch decision as counterRateOn's carry (a
    // shared-exchange derivation only deduplicates while the subtrees
    // stay sameResult()-identical, which pruning breaks)
    val carries = rows.groupBy(col("metric"), col("day"))
      .agg(min(unix_micros(col("ts"))).as("day_first"))
      .withColumn("next_first",
        lead(col("day_first"), 1)
          .over(Window.partitionBy(col("metric")).orderBy(col("day"))))
      .select(col("metric"), col("day"), col("next_first"))
    val withGap = rows
      .withColumn("gap_in",
        unix_micros(lead(col("ts"), 1).over(wDay)) - unix_micros(col("ts")))
      .join(Tables.broadcastIfSmall(carries), Seq("metric", "day"))
      // last sample of a present day: gap runs to the next present day's
      // first sample (null on the metric's final day → the coalesce in
      // rollup gives it the full timeout window, as in single-phase)
      .withColumn("gap_us",
        coalesce(col("gap_in"), col("next_first") - unix_micros(col("ts"))))
    rollup(withGap, Seq("day"))
  }

  /** Time-in-state durations — the TimescaleDB state_agg shape: each
    * user's event stream is a state machine (the event_type is the
    * state), a state lasts until the user's next event, and the final
    * open state contributes zero (no range end to bound it — documented,
    * and identical in the oracle). Output per state: total dwell time,
    * number of entries, and mean dwell as exact integer µs.
    *
    * Scale: one user_id window partition + one small (state) aggregate.
    */
  def stateAgg(s: SparkSession, dir: String): DataFrame =
    stateAggOn(Tables.events(s, dir))

  def stateAggOn(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type").as("state"), col("ts"), col("event_id"))
      .withColumn("dwell_us",
        coalesce(unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")), lit(0L)))
      .groupBy(col("state"))
      .agg(
        sum(col("dwell_us")).as("total_us"),
        count(lit(1)).as("n_entries"),
        expr("sum(dwell_us) div count(*)").as("mean_us"))
      .resultOrder(col("state"))
  }

  val oracles: Map[String, String] = Map(
    "q_retention_cohorts" ->
      """WITH a AS (
        |  SELECT user_id, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS week
        |  FROM events),
        |fs AS (SELECT user_id, min(week) AS cohort_week FROM a GROUP BY 1),
        |sz AS (SELECT cohort_week, count(*) AS cohort_size FROM fs GROUP BY 1),
        |act AS (
        |  SELECT fs.cohort_week, a.week - fs.cohort_week AS weeks_since, a.user_id
        |  FROM a JOIN fs USING (user_id) GROUP BY 1, 2, 3),
        |m AS (
        |  SELECT cohort_week, weeks_since, count(*) AS n_active
        |  FROM act GROUP BY 1, 2)
        |SELECT m.cohort_week, m.weeks_since, m.n_active,
        |  CAST((m.n_active * 1000) // sz.cohort_size AS BIGINT) AS retained_permille
        |FROM m JOIN sz USING (cohort_week)
        |ORDER BY 1, 2""".stripMargin,
    "q_funnel" -> {
      val Seq(a, b, c) = FunnelStages
      s"""WITH s1 AS (
         |  SELECT user_id, min(ts) AS t FROM events WHERE event_type = '$a' GROUP BY 1),
         |s2 AS (
         |  SELECT e.user_id, min(e.ts) AS t
         |  FROM events e JOIN s1 USING (user_id)
         |  WHERE e.event_type = '$b' AND e.ts > s1.t GROUP BY 1),
         |s3 AS (
         |  SELECT e.user_id, min(e.ts) AS t
         |  FROM events e JOIN s2 USING (user_id)
         |  WHERE e.event_type = '$c' AND e.ts > s2.t GROUP BY 1),
         |cnt AS (
         |  SELECT 1 AS stage, '$a' AS event_type, count(*) AS n FROM s1
         |  UNION ALL SELECT 2, '$b', count(*) FROM s2
         |  UNION ALL SELECT 3, '$c', count(*) FROM s3)
         |SELECT stage, event_type, CAST(n AS BIGINT) AS n_users,
         |  CAST(CASE WHEN (SELECT n FROM cnt WHERE stage = 1) = 0 THEN 0
         |       ELSE (n * 1000) // (SELECT n FROM cnt WHERE stage = 1) END AS BIGINT)
         |    AS conv_permille
         |FROM cnt ORDER BY stage""".stripMargin
    },
    "q_uptime" ->
      s"""WITH g AS (
         |  SELECT event_type AS metric, ts, event_id,
         |    date_diff('microsecond', ts,
         |      lead(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us
         |  FROM events)
         |SELECT metric,
         |  CAST(sum(least(coalesce(gap_us, ${UptimeTimeoutMin * 60L * 1000000L}),
         |                 ${UptimeTimeoutMin * 60L * 1000000L})) AS BIGINT) AS up_us,
         |  CAST(sum(CASE WHEN gap_us > ${UptimeTimeoutMin * 60L * 1000000L} THEN 1 ELSE 0 END) AS BIGINT)
         |    AS interruptions,
         |  count(*) AS n_heartbeats
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_state_agg" ->
      """WITH d AS (
        |  SELECT event_type AS state,
        |    coalesce(date_diff('microsecond', ts,
        |      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)), 0) AS dwell_us
        |  FROM events)
        |SELECT state,
        |  CAST(sum(dwell_us) AS BIGINT) AS total_us,
        |  count(*) AS n_entries,
        |  CAST(sum(dwell_us) // count(*) AS BIGINT) AS mean_us
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |       CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
