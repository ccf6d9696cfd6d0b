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

  val oracles: Map[String, String] = Map(
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
