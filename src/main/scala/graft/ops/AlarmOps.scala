package graft.ops

import graft.Tables
import graft.Tables.ResultOrdering
import graft.model.Model
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2C stateful alarm analytics — the OPC-UA simulator's 1 Hz alarm engine
  * (opcua_server/main.py:262-434) re-expressed as window-function batch ops.
  * Streaming twins via flatMapGroupsWithState live in graft.streaming.
  *
  * Scale notes: every window partitions by (user_id, event_type) — at 100 TB
  * that key is high-cardinality (entities × metrics), so the sort-within-
  * partition window never concentrates on a few keys; no collect(), no
  * driver-side state.
  */
object AlarmOps {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  private def withPct(df: DataFrame): DataFrame =
    df.withColumn("target", Model.targetCol)
      .withColumn("pct", Model.deviationPct(col("value"), col("target")))

  private val pctSql: String =
    Model.deviationPctSql.replace("__T__", "t")

  private def perEntity = Window.partitionBy(col("user_id"), col("event_type"))

  /** Immediate deviation alarm (opcua_server/main.py:26-36): |pct| > 10,
    * with the target == 0 guard at :28-29 (the 'error' metric has target 0
    * and must never fire, even though its pct is ±Infinity).
    */
  def deviationImmediate(s: SparkSession, dir: String): DataFrame =
    deviationImmediateOn(ev(s, dir))

  def deviationImmediateOn(events: DataFrame): DataFrame =
    withPct(events)
      .filter(col("target") =!= 0.0 && abs(col("pct")) > Model.ImmediateDeviationPct)
      .select(
        col("event_id"),
        col("event_type").as("metric"),
        Model.roundN(col("pct"), 4).as("deviation_pct")
      )
      .resultOrder(col("event_id"))

  /** Trend alarm — 3 consecutive deviations beyond 2%
    * (opcua_server/main.py:14-40, ring buffer of 3 at :31-34, all-3 rule at
    * :37-39). The count == 3 guard keeps a 2-row prefix from firing.
    *
    * Immediate-alarm precedence (:35-36): `record` RETURNS on the >10%
    * check before reaching the trend rule, so a cycle whose own |pct|
    * exceeds 10 fires only the immediate alarm — it still enters the ring
    * buffer (the append at :32 precedes the check) and can complete a
    * LATER cycle's trend window, but never emits a trend row itself.
    */
  def deviationTrend(s: SparkSession, dir: String): DataFrame =
    deviationTrendOn(ev(s, dir))

  def deviationTrendOn(events: DataFrame): DataFrame = {
    val w = perEntity.orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
    withPct(events)
      // null-valued (string-payload) events never enter the ring buffer
      // (the reference appends numeric readings only) — without this
      // filter a null row occupies a window slot that count() tallies
      // while min(abs(pct)) ignores it, so 2 real deviations + 1 null
      // would fire a 3-consecutive alarm
      .filter(col("value").isNotNull)
      .filter(col("target") =!= 0.0)
      .withColumn("n_in_window", count(lit(1)).over(w))
      .withColumn("min_abs_pct", min(abs(col("pct"))).over(w))
      .filter(col("n_in_window") === Model.TrendWindow && col("min_abs_pct") > Model.TrendDeviationPct
        // immediate precedence: a row that fires the >10% alarm never also
        // fires the trend alarm (reference returns before the trend check)
        && abs(col("pct")) <= Model.ImmediateDeviationPct)
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type").as("metric"),
        Model.roundN(col("min_abs_pct"), 4).as("min_abs_pct")
      )
      .resultOrder(col("event_id"))
  }

  def edgeAlarmOn(events: DataFrame, threshold: Double): DataFrame = {
    val w = perEntity.orderBy(col("ts"), col("event_id"))
    events
      .filter(col("event_type") === "click")
      // drop null-valued events BEFORE the lag: a null prev mid-excursion
      // would look like "no previous row" and re-fire a duplicate alarm
      // inside the same below-threshold excursion (the streaming twin's
      // latched state has no such confusion)
      .filter(col("value").isNotNull)
      .withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("value") < threshold && (col("prev").isNull || col("prev") >= threshold))
      .select(col("event_id"), col("user_id"), col("value"), col("prev"))
      .resultOrder(col("event_id"))
  }

  /** Edge-triggered low-level alarm (opcua_server/main.py:319-332): fire once
    * on the downward crossing of 200, re-arm when back at/above 200. Alarms
    * are transitions, not levels — dedup against lag, not "ever alarmed".
    * The initial state is un-alarmed (:130), so a first observation below
    * threshold fires (prev IS NULL).
    */
  def feederLowEdge(s: SparkSession, dir: String): DataFrame =
    edgeAlarmOn(ev(s, dir), Model.FeederLowThreshold)

  /** Edge-triggered empty alarm (opcua_server/main.py:389-395), critical
    * severity: crossing below the empty threshold.
    */
  def feederEmptyEdge(s: SparkSession, dir: String): DataFrame =
    edgeAlarmOn(ev(s, dir), Model.FeederEmptyThreshold)
      .withColumn("severity", lit("critical"))

  /** Stateless threshold alarms (opcua_server/main.py:381-386): accuracy
    * beyond ±band, vision pass-rate too low, vacuum pressure too high —
    * plain predicates, one alarm row per violation.
    */
  def thresholdAlarms(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn(
        "alarm_type",
        // thresholds from Model (shared with the oracle SQL below), the
        // accuracy band centered on the purchase setpoint — same
        // single-source rule as every other alarm threshold in this file
        when(col("event_type") === "purchase" &&
          abs(col("value") - Model.targetFor("purchase")) > Model.AccuracyBand, "ACCURACY")
          .when(col("event_type") === "view" &&
            col("value") < Model.VisionMinRate, "VISION")
          .when(col("event_type") === "signup" &&
            col("value") > Model.VacuumMaxKpa, "VACUUM")
      )
      .filter(col("alarm_type").isNotNull)
      .select(col("event_id"), col("alarm_type"), col("event_type").as("metric"), col("value"))
      .resultOrder(col("event_id"))

  /** Auto-recovery rule (opcua_server/main.py:411-431): an entity in Error
    * state (latest 'error' value > 100) recovers iff all three feed metrics'
    * latest values are healthy (> 5). Cross-metric condition: latest-per-
    * (entity, metric) via max_by (partial agg), then a conditional-aggregation
    * pivot — two narrow shuffles, no window sort.
    */
  def autoRecovery(s: SparkSession, dir: String): DataFrame =
    autoRecoveryOn(ev(s, dir))

  def autoRecoveryOn(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isin("click", "view", "purchase", "error"))
      .groupBy(col("user_id"), col("event_type"))
      // flat-buffer argmax, not max_by over a (ts, event_id) struct: the
      // struct buffer forced this corpus-input aggregate into a
      // SortAggregate pair (see graft.functions.ArgMaxKey)
      .agg(graft.functions.ArgMaxKey.scalar(col("ts"), col("event_id"),
        col("value")).as("last_value"))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "error", col("last_value"))).as("last_error"),
        max(when(col("event_type") === "click", col("last_value"))).as("last_click"),
        max(when(col("event_type") === "view", col("last_value"))).as("last_view"),
        max(when(col("event_type") === "purchase", col("last_value"))).as("last_purchase")
      )
      .filter(
        col("last_error") > 100 &&
          col("last_click") > 5 && col("last_view") > 5 && col("last_purchase") > 5
      )
      .select(col("user_id"), col("last_error"), col("last_click"), col("last_view"), col("last_purchase"))
      .resultOrder(col("user_id"))

  /** Derived order-progress metric (opcua_server/main.py:335-364):
    * progress = min(100, completed/total*100) per entity over time.
    */
  def orderProgress(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("completed", count(lit(1)).over(w))
      .select(
        col("event_id"),
        col("user_id"),
        col("completed"),
        Model.roundN(least(lit(100.0), col("completed") / 30 * 100), 4).as("progress_pct")
      )
      .resultOrder(col("event_id"))
  }

  /** Bounded alarm log — keep the most recent 20 per metric
    * (opcua_server/main.py:326-327,363-364: alarms = alarms[-20:]).
    */
  def alarmRetention(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts").desc, col("event_id").desc)
    ev(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select(col("event_id"), col("event_type").as("metric"), col("ts").as("time"), col("value"))
      .resultOrder(col("metric"), col("event_id"))
  }

  val oracles: Map[String, String] = {
    val base =
      s"""SELECT event_id, user_id, ts, event_type, value, ${Model.targetSql} AS t
         |FROM events""".stripMargin
    Map(
      "q_deviation_immediate" ->
        s"""WITH t AS ($base)
           |SELECT event_id, event_type AS metric, ${Model.roundNSql(pctSql, 4)} AS deviation_pct
           |FROM t WHERE t <> 0 AND abs($pctSql) > 10
           |ORDER BY event_id""".stripMargin,
      "q_deviation_trend" ->
        s"""WITH b AS ($base),
           |w AS (
           |  SELECT event_id, user_id, event_type,
           |    abs($pctSql) AS abs_pct,
           |    count(*) OVER win AS n_in_window,
           |    min(abs($pctSql)) OVER win AS min_abs_pct
           |  FROM b WHERE t <> 0 AND value IS NOT NULL
           |  WINDOW win AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
           |                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
           |SELECT event_id, user_id, event_type AS metric, ${Model.roundNSql("min_abs_pct", 4)} AS min_abs_pct
           |FROM w WHERE n_in_window = 3 AND min_abs_pct > 2 AND abs_pct <= 10
           |ORDER BY event_id""".stripMargin,
      "q_feeder_low_edge" ->
        """WITH w AS (
          |  SELECT event_id, user_id, value,
          |    lag(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev
          |  FROM events WHERE event_type = 'click' AND value IS NOT NULL)
          |SELECT event_id, user_id, value, prev FROM w
          |WHERE value < 200 AND (prev IS NULL OR prev >= 200)
          |ORDER BY event_id""".stripMargin,
      "q_feeder_empty_edge" ->
        """WITH w AS (
          |  SELECT event_id, user_id, value,
          |    lag(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev
          |  FROM events WHERE event_type = 'click' AND value IS NOT NULL)
          |SELECT event_id, user_id, value, prev, 'critical' AS severity FROM w
          |WHERE value < 1 AND (prev IS NULL OR prev >= 1)
          |ORDER BY event_id""".stripMargin,
      "q_threshold_alarms" ->
        s"""WITH t AS (
           |  SELECT event_id, event_type, value,
           |    CASE WHEN event_type = 'purchase' AND abs(value - ${Model.targetFor("purchase")}) > ${Model.AccuracyBand} THEN 'ACCURACY'
           |         WHEN event_type = 'view' AND value < ${Model.VisionMinRate} THEN 'VISION'
           |         WHEN event_type = 'signup' AND value > ${Model.VacuumMaxKpa} THEN 'VACUUM' END AS alarm_type
           |  FROM events)
           |SELECT event_id, alarm_type, event_type AS metric, value FROM t
           |WHERE alarm_type IS NOT NULL ORDER BY event_id""".stripMargin,
      "q_auto_recovery" ->
        """WITH latest AS (
          |  SELECT user_id, event_type, value AS last_value FROM events
          |  WHERE event_type IN ('click', 'view', 'purchase', 'error')
          |  QUALIFY row_number() OVER (PARTITION BY user_id, event_type
          |                             ORDER BY ts DESC, event_id DESC) = 1),
          |p AS (
          |  SELECT user_id,
          |    max(CASE WHEN event_type = 'error' THEN last_value END) AS last_error,
          |    max(CASE WHEN event_type = 'click' THEN last_value END) AS last_click,
          |    max(CASE WHEN event_type = 'view' THEN last_value END) AS last_view,
          |    max(CASE WHEN event_type = 'purchase' THEN last_value END) AS last_purchase
          |  FROM latest GROUP BY user_id)
          |SELECT user_id, last_error, last_click, last_view, last_purchase FROM p
          |WHERE last_error > 100 AND last_click > 5 AND last_view > 5 AND last_purchase > 5
          |ORDER BY user_id""".stripMargin,
      "q_order_progress" ->
        s"""WITH w AS (
          |  SELECT event_id, user_id,
          |    count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS completed
          |  FROM events WHERE event_type = 'purchase')
          |SELECT event_id, user_id, completed,
          |       ${Model.roundNSql("least(CAST(100.0 AS DOUBLE), completed / 30 * 100)", 4)} AS progress_pct
          |FROM w ORDER BY event_id""".stripMargin,
      "q_alarm_retention" ->
        """WITH w AS (
          |  SELECT event_id, event_type, ts, value,
          |    row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
          |  FROM events)
          |SELECT event_id, event_type AS metric, ts AS time, value FROM w
          |WHERE rn <= 20 ORDER BY metric, event_id""".stripMargin
    )
  }
}
