package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared schema surrogates and alarm constants.
  *
  * The reference stores one narrow EAV table `opcua_data(time, metric,
  * value_num, value_str, operator)` (/root/reference/database/init.sql:2-8).
  * We map it onto the driver's `events` table:
  *
  *   time      := ts
  *   metric    := event_type
  *   value_num := value
  *   value_str := props, but only for 'error' rows (the "string metrics")
  *   operator  := customer.c_name via user_id (enrichment join, §2A)
  *
  * Alarm thresholds mirror the reference's DeviationTracker and feeder logic
  * (/root/reference/opcua_server/main.py:14-40,319-332,381-395) re-scaled to
  * the events value domain [0.01, ~500].
  */
object Model {

  /** value_str surrogate: string-typed metrics carry their payload here. */
  def valueStr: Column = when(col("event_type") === "error", col("props"))

  /** Per-metric setpoint ("TargetX" vs "ActualX" in the reference,
    * /root/reference/opcua_server/main.py:167-182). 'error' deliberately has
    * target 0 to exercise the divide-by-zero guard at :28-29. This Seq is
    * the single source: the batch Column, the oracle SQL, and the streaming
    * twins' per-key lookup are all derived from it, so a threshold change
    * cannot split the batch ops from their streaming twins.
    */
  val MetricTargets: Seq[(String, Double)] = Seq(
    "click" -> 250.0, "view" -> 170.0, "purchase" -> 185.0, "signup" -> 175.0)

  private val metricTargetMap = MetricTargets.toMap

  /** Setpoint for one metric; 0.0 (the guard value) when unknown. */
  def targetFor(metric: String): Double = metricTargetMap.getOrElse(metric, 0.0)

  def targetCol: Column =
    MetricTargets.foldLeft(null: Column) { case (acc, (m, t)) =>
      if (acc == null) when(col("event_type") === m, t)
      else acc.when(col("event_type") === m, t)
    }.otherwise(0.0)

  /** Same expression in DuckDB SQL for the oracles. */
  val targetSql: String =
    "CAST(CASE event_type " +
      MetricTargets.map { case (m, t) =>
        val lit = if (t == t.toLong.toDouble) t.toLong.toString else t.toString
        s"WHEN '$m' THEN $lit"
      }.mkString(" ") +
      " ELSE 0 END AS DOUBLE)"

  val valueStrSql: String = "CASE WHEN event_type = 'error' THEN props END"

  /** Deviation % — reference formula ((actual-target)/target)*100,
    * /root/reference/opcua_server/main.py:30. Kept structurally identical in
    * Spark and DuckDB so IEEE double results are bit-identical.
    */
  def deviationPct(value: Column, target: Column): Column = value.minus(target).divide(target).multiply(lit(100))
  val deviationPctSql: String = "((value - __T__) / __T__) * 100"

  /** Order-independent float aggregation: doubles summed in parallel give
    * partition-order-dependent results (FP addition is not associative),
    * which flips the last rounded digit vs the oracle's sequential sum on
    * boundary rows. The fixture values are exact 2-decimal numbers, so
    * summing as DECIMAL(28,6) is lossless AND exact — any summation order
    * gives the identical result in both engines; one double division /
    * round at the end stays IEEE-identical.
    */
  def exactSum(c: Column, digits: Int): Column =
    // round the DECIMAL, then cast: decimal rounding is exact half-away-
    // from-zero in both engines, and the one double conversion of an
    // identical decimal is bit-equal. (round-after-cast would round a
    // double — Spark rounds its shortest decimal string, DuckDB its binary
    // value, which diverge on shortest-strings carrying a 5 at digit d+1.)
    round(sum(c.cast("decimal(28,6)")), digits).cast("double")

  /** 4-digit-rounded mean computed entirely in integer arithmetic. The
    * decimal sum avoids order dependence; the bigger trap is the round
    * itself: sums of 2-decimal values divided by counts like 24 land
    * exactly on .xxxx5 boundaries, where Spark's round (shortest-string
    * BigDecimal, HALF_UP) and DuckDB's (binary-double) disagree. Integer
    * half-up — floor((2·cents·100 + n) / 2n) with cents = 100·sum —
    * is exact and identical in both engines; the final /10000.0 is one
    * shared IEEE division.
    */
  def exactAvg4(colName: String): Column =
    expr(exactAvg4Sql(colName).replace(" // ", " div "))

  def exactAvg4Sql(colName: String): String =
    // the half-adjust term carries the sum's sign: integer division
    // truncates toward zero in both engines, so an unconditional +count
    // would round negative sums toward zero instead of half-away
    s"CAST((CAST(sum(CAST($colName AS DECIMAL(28,2))) * 100 AS BIGINT) * 200 " +
      s"+ (CASE WHEN sum(CAST($colName AS DECIMAL(28,2))) < 0 " +
      s"THEN -count($colName) ELSE count($colName) END)) " +
      s"// (2 * count($colName)) AS DOUBLE) / 10000.0"

  def exactSumSql(col: String, digits: Int): String =
    s"CAST(round(sum(CAST($col AS DECIMAL(28,6))), $digits) AS DOUBLE)"

  /** Portable fixed-digit rounding of a computed double:
    * floor(x·10^d + 0.5) / 10^d. floor and double multiply/divide are
    * IEEE-identical in Spark and DuckDB, so the result is bit-equal
    * cross-engine for EVERY input — unlike round(double, d), where Spark
    * rounds the value's shortest decimal string (BigDecimal HALF_UP) and
    * DuckDB rounds the binary value; the two disagree whenever the
    * shortest string carries a 5 at digit d+1 but the binary value sits
    * just below the half. Halves round toward +infinity (an exact binary
    * half of x·10^d essentially cannot occur for measured ratios).
    */
  def roundN(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    floor(c * f + 0.5) / f
  }

  def roundNSql(e: String, digits: Int): String = {
    val f = BigDecimal(10).pow(digits).toLong
    s"floor(($e) * $f.0 + 0.5) / $f.0"
  }

  val ImmediateDeviationPct = 10.0 // opcua_server/main.py:21
  val TrendDeviationPct = 2.0      // opcua_server/main.py:22
  val TrendWindow = 3              // opcua_server/main.py:23
  val FeederLowThreshold = 200.0   // opcua_server/main.py:322
  val FeederEmptyThreshold = 1.0   // scaled stand-in for count<=0 at :389
  // stateless threshold-alarm rules (opcua_server/main.py:381-386),
  // re-scaled to the events value domain; the accuracy band is centered
  // on the purchase setpoint (MetricTargets)
  val AccuracyBand = 120.0
  val VisionMinRate = 5.0
  val VacuumMaxKpa = 330.0
}
