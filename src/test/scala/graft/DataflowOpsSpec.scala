package graft

import graft.ops.DataflowOps

/** Type-dispatch semantics (kafka_db_agent/main.py:83-89) — SURVEY §7.3.4:
  * booleans must become the strings 'True'/'False', never 1.0.
  */
class DataflowOpsSpec extends SparkSuite {

  test("type dispatch: numeric → value_num, bool → capitalized value_str, text → value_str") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:01", 1L, "click", 6.55, "{}"),        // numeric
      (2L, "2024-01-01 00:00:02", 1L, "signup", 200.0, "{}"),      // raw 'true'
      (3L, "2024-01-01 00:00:03", 1L, "signup", 100.0, "{}"),      // raw 'false'
      (4L, "2024-01-01 00:00:04", 1L, "error", 1.0, """{"k": 7}"""), // JSON text
      // a STRING payload that merely looks numeric: the reference
      // dispatches on isinstance (the variant type), so this stays
      // value_str — a parseability-only dispatch would emit 123.0
      (5L, "2024-01-01 00:00:05", 1L, "error", 1.0, "123")
    ))
    val rows = DataflowOps.typeDispatchOn(df)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .toSeq
    assert(rows == Seq(
      (1L, Some(6.55), None),
      (2L, None, Some("True")),   // NOT 1.0 — Python str() capitalization
      (3L, None, Some("False")),
      (4L, None, Some("""{"k": 7}""")),
      (5L, None, Some("123"))
    ))
  }

  test("json envelope round-trip is lossless incl. microsecond timestamps") {
    import org.apache.spark.sql.functions._
    val back = DataflowOps.srcMqtt(spark, SfDir).filter(col("event_id") < 500)
    val raw = Tables.events(spark, SfDir).filter(col("event_id") < 500)
      .select(col("event_id"), col("event_type").as("node_id"), col("value"), col("ts"))
    assert(back.exceptAll(raw).count() == 0 && raw.exceptAll(back).count() == 0)
  }
}
