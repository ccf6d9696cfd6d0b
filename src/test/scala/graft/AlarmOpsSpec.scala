package graft

import graft.ops.AlarmOps
import org.apache.spark.sql.Row

/** Edge-semantics tests for §2C — the known-hard list from SURVEY §7.3:
  * target==0 guard, exactly-3 trend window, edge re-arm.
  */
class AlarmOpsSpec extends SparkSuite {

  // 'click' target is 250 (Model.targetCol); pct = (v-250)/250*100.
  // v=300 → +20%, v=280 → +12%, v=260 → +4%, v=255 → +2%, v=251 → 0.4%

  test("deviation immediate: fires beyond ±10% STRICTLY, target==0 guard holds") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:01", 1L, "click", 300.0, "{}"), // +20% → fires
      (2L, "2024-01-01 00:00:02", 1L, "click", 260.0, "{}"), // +4%  → no
      (3L, "2024-01-01 00:00:03", 1L, "error", 999.0, "{}"), // target 0 → guarded
      (4L, "2024-01-01 00:00:04", 1L, "click", 200.0, "{}"), // -20% → fires
      // boundary: EXACTLY ±10% must NOT fire (reference: abs(pct) > t10,
      // strict — opcua_server/main.py:35)
      (5L, "2024-01-01 00:00:05", 1L, "click", 275.0, "{}"), // +10.0% → no
      (6L, "2024-01-01 00:00:06", 1L, "click", 225.0, "{}")  // -10.0% → no
    ))
    val got = AlarmOps.deviationImmediateOn(df).select("event_id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 4L))
  }

  test("deviation trend: fires only when ALL of exactly 3 consecutive exceed 2%") {
    val df = eventsDf(Seq(
      // user 1: 3 consecutive > 2% → 3rd row fires
      (1L, "2024-01-01 00:00:01", 1L, "click", 280.0, "{}"), // 12%
      (2L, "2024-01-01 00:00:02", 1L, "click", 240.0, "{}"), // -4%
      (3L, "2024-01-01 00:00:03", 1L, "click", 265.0, "{}"), // 6%
      // user 2: only 2 rows, both > 2% → must NOT fire (count==3 guard)
      (4L, "2024-01-01 00:00:01", 2L, "click", 280.0, "{}"),
      (5L, "2024-01-01 00:00:02", 2L, "click", 290.0, "{}"),
      // user 3: middle row within band breaks the run
      (6L, "2024-01-01 00:00:01", 3L, "click", 280.0, "{}"),
      (7L, "2024-01-01 00:00:02", 3L, "click", 251.0, "{}"), // 0.4% — breaks
      (8L, "2024-01-01 00:00:03", 3L, "click", 280.0, "{}"),
      // user 4: run completes on a >10% row → IMMEDIATE precedence: that
      // row fires only the immediate alarm (main.py:35-36 returns before
      // the trend check), but it FEEDS the buffer, so the next <=10% row
      // with all-3 >2% fires the trend alarm
      (9L,  "2024-01-01 00:00:01", 4L, "click", 280.0, "{}"), // 12%>10 — but window incomplete anyway
      (10L, "2024-01-01 00:00:02", 4L, "click", 265.0, "{}"), // 6%
      (11L, "2024-01-01 00:00:03", 4L, "click", 300.0, "{}"), // +20% — all 3 >2% BUT >10%: NO trend row
      (12L, "2024-01-01 00:00:04", 4L, "click", 265.0, "{}"), // 6% — (6,20,6) all >2% → fires
      // boundary: EXACTLY 2% does not exceed the band (strict >)
      (13L, "2024-01-01 00:00:01", 5L, "click", 255.0, "{}"), // +2.0%
      (14L, "2024-01-01 00:00:02", 5L, "click", 265.0, "{}"),
      (15L, "2024-01-01 00:00:03", 5L, "click", 265.0, "{}")  // window has a 2.0% → no fire
    ))
    val got = AlarmOps.deviationTrendOn(df).select("event_id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(3L, 12L))
  }

  test("deviation trend: a null-value (string-payload) row never occupies a window slot") {
    val df = eventsDfOpt(Seq(
      (1L, "2024-01-01 00:00:01", 1L, "click", Some(251.0), "{}"), // 0.4% — breaks runs
      (2L, "2024-01-01 00:00:02", 1L, "click", Some(260.0), "{}"), // 4%
      (3L, "2024-01-01 00:00:03", 1L, "click", None, "{}"),        // string payload
      (4L, "2024-01-01 00:00:04", 1L, "click", Some(265.0), "{}"), // 6%
      (5L, "2024-01-01 00:00:05", 1L, "click", Some(270.0), "{}")  // 8% → (4,6,8) fires
    ))
    // without the null filter, the (2,null,4) window would count 3 rows
    // and fire spuriously at row 4 (min ignores the null, count does not)
    val got = AlarmOps.deviationTrendOn(df).select("event_id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(5L), s"got ${got.toSeq}")
  }

  test("edge alarm: a null-value row inside an excursion must not re-fire") {
    val df = eventsDfOpt(Seq(
      (1L, "2024-01-01 00:00:01", 1L, "click", Some(250.0), "{}"),
      (2L, "2024-01-01 00:00:02", 1L, "click", Some(150.0), "{}"), // fire
      (3L, "2024-01-01 00:00:03", 1L, "click", None, "{}"),        // string payload
      (4L, "2024-01-01 00:00:04", 1L, "click", Some(120.0), "{}")  // still low — must NOT fire
    ))
    // without the null filter, row 4's lag is NULL and the prev-IS-NULL
    // branch re-fires inside the same excursion
    val got = AlarmOps.edgeAlarmOn(df, 200.0).select("event_id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(2L), s"got ${got.toSeq}")
  }

  test("edge alarm: fires on crossing, re-arms after recovery, initial-low fires") {
    val df = eventsDf(Seq(
      // user 1: above → below (fire) → still below (no) → above (re-arm) → below (fire)
      (1L, "2024-01-01 00:00:01", 1L, "click", 250.0, "{}"),
      (2L, "2024-01-01 00:00:02", 1L, "click", 150.0, "{}"), // fire
      (3L, "2024-01-01 00:00:03", 1L, "click", 100.0, "{}"), // level, not edge
      (4L, "2024-01-01 00:00:04", 1L, "click", 240.0, "{}"), // re-arm
      (5L, "2024-01-01 00:00:05", 1L, "click", 190.0, "{}"), // fire again
      // user 2: starts below threshold → first observation fires (state init False)
      (6L, "2024-01-01 00:00:01", 2L, "click", 50.0, "{}"),
      // boundary: exactly at threshold is NOT low (value < 200 strict)
      (7L, "2024-01-01 00:00:01", 3L, "click", 200.0, "{}")
    ))
    val got = AlarmOps.edgeAlarmOn(df, 200.0).select("event_id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(2L, 5L, 6L))
  }

  test("auto recovery: requires Error state AND all feeders healthy") {
    val df = eventsDf(Seq(
      // user 1: latest error 150 (>100), feeders all > 5 → recovers
      (1L, "2024-01-01 00:00:01", 1L, "error", 400.0, "{}"),
      (2L, "2024-01-01 00:00:02", 1L, "error", 150.0, "{}"), // latest error
      (3L, "2024-01-01 00:00:03", 1L, "click", 10.0, "{}"),
      (4L, "2024-01-01 00:00:04", 1L, "view", 10.0, "{}"),
      (5L, "2024-01-01 00:00:05", 1L, "purchase", 10.0, "{}"),
      // user 2: in Error but one feeder empty → no recovery
      (6L, "2024-01-01 00:00:01", 2L, "error", 150.0, "{}"),
      (7L, "2024-01-01 00:00:02", 2L, "click", 1.0, "{}"),
      (8L, "2024-01-01 00:00:03", 2L, "view", 10.0, "{}"),
      (9L, "2024-01-01 00:00:04", 2L, "purchase", 10.0, "{}"),
      // user 3: healthy feeders but not in Error (latest error value low)
      (10L, "2024-01-01 00:00:01", 3L, "error", 50.0, "{}"),
      (11L, "2024-01-01 00:00:02", 3L, "click", 10.0, "{}"),
      (12L, "2024-01-01 00:00:03", 3L, "view", 10.0, "{}"),
      (13L, "2024-01-01 00:00:04", 3L, "purchase", 10.0, "{}")
    ))
    val got = AlarmOps.autoRecoveryOn(df).select("user_id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L))
  }

  test("latest-value semantics: max_by picks the row with greatest (ts, event_id)") {
    val df2 = eventsDf(Seq(
      (1L, "2024-01-01 00:00:01", 1L, "error", 500.0, "{}"),
      (2L, "2024-01-01 00:00:02", 1L, "error", 150.0, "{}"),
      (3L, "2024-01-01 00:00:02", 1L, "error", 120.0, "{}"),
      (4L, "2024-01-01 00:00:01", 1L, "click", 10.0, "{}"),
      (5L, "2024-01-01 00:00:01", 1L, "view", 10.0, "{}"),
      (6L, "2024-01-01 00:00:01", 1L, "purchase", 10.0, "{}")
    ))
    val r = AlarmOps.autoRecoveryOn(df2).select("last_error").head()
    assert(r.getDouble(0) == 120.0)
  }
}
