package graft

import graft.pipeline.{IdempotentSink, MvRefreshJob, PartitionedWriter, RetentionRefreshJob}
import graft.streaming.KafkaBridge
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** End-to-end streaming pipeline: DSv2 replay source offsets + admission
  * control, checkpointed MV refresh with kill/restart recovery matching the
  * batch recompute, batchId-idempotent sink, Kafka wire decode.
  */
class PipelineSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val eventsPath = s"$SfDir/events.parquet"

  test("replay source: AvailableNow drains the fixture in rowsPerBatch micro-batches") {
    val out = tmp("replay_out")
    val ckpt = tmp("replay_ckpt")
    val total = Tables.events(spark, SfDir).count()
    val q = spark.readStream
      .format("opcua-replay")
      .option("path", eventsPath)
      .option("rowsPerBatch", "3000")
      .load()
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "q did not drain within 120 s")
    val got = spark.read.parquet(out)
    assert(got.count() == total, "every fixture row replayed exactly once")
    assert(got.select("event_id").distinct().count() == total)
    // admission control: rowsPerBatch bounded each micro-batch
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batches.nonEmpty && batches.forall(_ <= 3000))
    assert(batches.length >= (total / 3000).toInt)
  }

  test("mv refresh job: kill/restart from checkpoint equals batch recompute, no duplicates") {
    val out = tmp("mv_out")
    val ckpt = tmp("mv_ckpt")
    val total = Tables.events(spark, SfDir).count().toInt
    MvRefreshJob.configureStateStore(spark)
    try {
      // phase 1: "crash" after roughly half the stream
      val q1 = MvRefreshJob.start(spark, MvRefreshJob.Config(
        eventsPath, out, ckpt, trigger = Trigger.AvailableNow(),
        rowsPerBatch = 2000, maxRows = Some(total / 2)))
      assert(q1.awaitTermination(120000), "q1 did not drain within 120 s")
      // phase 2: restart the same query from the checkpoint, full stream
      val q2 = MvRefreshJob.start(spark, MvRefreshJob.Config(
        eventsPath, out, ckpt, trigger = Trigger.AvailableNow(),
        rowsPerBatch = 2000, maxRows = None))
      assert(q2.awaitTermination(120000), "q2 did not drain within 120 s")

      val got = spark.read.parquet(out)
        .select("bucket", "metric", "avg_value", "min_value", "max_value", "sample_count")
      // exactly-once across the restart: one row per (bucket, metric)
      assert(got.groupBy("bucket", "metric").count().filter(col("count") > 1).count() == 0)

      // batch recompute with the same aggregate exprs, restricted to buckets
      // the final watermark (maxTs - 1min) has closed
      val ev = Tables.events(spark, SfDir).filter(col("value").isNotNull)
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val expected = ev
        .groupBy(window(col("ts"), "1 minute"), col("event_type").as("metric"))
        .agg(
          graft.model.Model.exactAvg4("value").as("avg_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          count(col("value")).as("sample_count"))
        .filter(unix_micros(col("window.end")) <= unix_micros(lit(maxTs)) - 60L * 1000000L)
        .select(col("window.start").as("bucket"), col("metric"),
          col("avg_value"), col("min_value"), col("max_value"), col("sample_count"))
      assert(got.exceptAll(expected).count() == 0, "no spurious buckets")
      assert(expected.exceptAll(got).count() == 0, "no missing closed buckets")
    } finally {
      spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    }
  }

  test("mv refresh job at hourly grain: kill/restart equals hourly batch recompute") {
    val out = tmp("mvh_out")
    val ckpt = tmp("mvh_ckpt")
    val total = Tables.events(spark, SfDir).count().toInt
    MvRefreshJob.configureStateStore(spark)
    try {
      // the hourly policy (init.sql:31-34): 1 h grain, 1 h end offset —
      // killed halfway and resumed, like the minute-grain test
      val q1 = MvRefreshJob.start(spark, MvRefreshJob.Config.hourly(
        eventsPath, out, ckpt, trigger = Trigger.AvailableNow(),
        rowsPerBatch = 2000, maxRows = Some(total / 2)))
      assert(q1.awaitTermination(120000), "q1 did not drain within 120 s")
      val q2 = MvRefreshJob.start(spark, MvRefreshJob.Config.hourly(
        eventsPath, out, ckpt, trigger = Trigger.AvailableNow(), rowsPerBatch = 2000))
      assert(q2.awaitTermination(120000), "q2 did not drain within 120 s")

      val got = spark.read.parquet(out)
        .select("bucket", "metric", "avg_value", "min_value", "max_value", "sample_count")
      assert(got.groupBy("bucket", "metric").count().filter(col("count") > 1).count() == 0)

      val ev = Tables.events(spark, SfDir).filter(col("value").isNotNull)
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val expected = ev
        .groupBy(window(col("ts"), "1 hour"), col("event_type").as("metric"))
        .agg(
          graft.model.Model.exactAvg4("value").as("avg_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          count(col("value")).as("sample_count"))
        // buckets closed by the final 1-hour watermark
        .filter(unix_micros(col("window.end")) <= unix_micros(lit(maxTs)) - 3600L * 1000000L)
        .select(col("window.start").as("bucket"), col("metric"),
          col("avg_value"), col("min_value"), col("max_value"), col("sample_count"))
      assert(got.exceptAll(expected).count() == 0, "no spurious hourly buckets")
      assert(expected.exceptAll(got).count() == 0, "no missing closed hourly buckets")
    } finally {
      spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    }
  }

  test("retention refresh job: kill/restart recompute snapshots equal the batch matrix") {
    val atRest = tmp("ret_rest")
    val out = tmp("ret_out")
    val ckpt = tmp("ret_ckpt")
    val total = Tables.events(spark, SfDir).count().toInt
    // phase 1: "crash" after roughly half the stream
    val q1 = RetentionRefreshJob.start(spark, RetentionRefreshJob.Config(
      eventsPath, atRest, out, ckpt, trigger = Trigger.AvailableNow(),
      rowsPerBatch = 2000, maxRows = Some(total / 2)))
    assert(q1.awaitTermination(120000), "q1 did not drain within 120 s")
    val mid = RetentionRefreshJob.read(spark, out)
    assert(mid.count() > 0, "no committed snapshot after phase 1")
    // phase 2: restart from the checkpoint, full stream
    val q2 = RetentionRefreshJob.start(spark, RetentionRefreshJob.Config(
      eventsPath, atRest, out, ckpt, trigger = Trigger.AvailableNow(),
      rowsPerBatch = 2000, maxRows = None))
    assert(q2.awaitTermination(120000), "q2 did not drain within 120 s")
    // at-rest events: exactly-once across the restart
    val rest = spark.read.parquet(atRest)
    assert(rest.count() == total && rest.select("event_id").distinct().count() == total,
      "at-rest table duplicated or dropped events across the restart")
    // latest snapshot == the batch operator over the full fixture
    val cols = Seq("cohort_week", "weeks_since", "n_active", "retained_permille")
    val got = RetentionRefreshJob.read(spark, out).select(cols.map(col): _*)
    val expected = graft.ops.SessionOps.retentionCohortsOn(
      Tables.events(spark, SfDir).select(col("user_id"), col("ts")))
      .select(cols.map(col): _*)
    assert(got.exceptAll(expected).count() == 0, "snapshot has spurious matrix rows")
    assert(expected.exceptAll(got).count() == 0, "snapshot is missing matrix rows")
  }

  test("ingest job with retention: at-rest fact table keeps exactly the last N days") {
    import graft.pipeline.IngestJob
    val out = tmp("ingest_ret_out"); val ckpt = tmp("ingest_ret_ckpt")
    val retain = 5
    val q = IngestJob.start(spark, IngestJob.Config(
      eventsPath, SfDir, out, ckpt, trigger = Trigger.AvailableNow(),
      rowsPerBatch = 4000, retentionDays = Some(retain)))
    assert(q.awaitTermination(120000), "q did not drain within 120 s")

    val allDays = Tables.events(spark, SfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct().collect().map(_.getString(0)).sorted
    assert(allDays.length > retain, "fixture spans more days than the retention window")
    val expectedDays = allDays.takeRight(retain).toSet

    val got = spark.read.parquet(out)
    val gotDays = got.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(gotDays == expectedDays,
      s"retention kept $gotDays, expected the newest $retain days $expectedDays")

    // retained rows are complete and untouched: equal to the batch
    // recompute restricted to the retained window
    val expected = Tables.events(spark, SfDir)
      .filter(date_format(col("ts"), "yyyy-MM-dd").isin(expectedDays.toSeq: _*))
      .count()
    assert(got.count() == expected, "retained days complete after drops")

    // a day-pruned read of a dropped day touches nothing
    assert(got.filter(col("day").cast("string") === allDays.head).count() == 0)
  }

  test("alarm job: restart from checkpoint restores ring-buffer state exactly") {
    import graft.pipeline.AlarmJob
    val total = Tables.events(spark, SfDir).count().toInt
    // reference run: uninterrupted drain
    val outA = tmp("alarm_a"); val ckptA = tmp("alarm_ckpt_a")
    val qa = AlarmJob.start(spark, AlarmJob.Config(
      eventsPath, outA, ckptA, trigger = Trigger.AvailableNow(), rowsPerBatch = 1500))
    assert(qa.awaitTermination(120000), "qa did not drain within 120 s")
    // crashed-and-resumed run: same stream, killed halfway, restarted
    val outB = tmp("alarm_b"); val ckptB = tmp("alarm_ckpt_b")
    val q1 = AlarmJob.start(spark, AlarmJob.Config(
      eventsPath, outB, ckptB, trigger = Trigger.AvailableNow(), rowsPerBatch = 1500,
      maxRows = Some(total / 2)))
    assert(q1.awaitTermination(120000), "q1 did not drain within 120 s")
    val q2 = AlarmJob.start(spark, AlarmJob.Config(
      eventsPath, outB, ckptB, trigger = Trigger.AvailableNow(), rowsPerBatch = 1500))
    assert(q2.awaitTermination(120000), "q2 did not drain within 120 s")

    val a = spark.read.parquet(outA).select("user_id", "metric", "event_id")
    val b = spark.read.parquet(outB).select("user_id", "metric", "event_id")
    assert(a.count() > 0, "fixture fires trend alarms")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "resumed run fires exactly the uninterrupted run's alarms")
  }

  test("ingest job: full path (wire round-trip + enrichment) equals batch recompute") {
    import graft.pipeline.IngestJob
    val out = tmp("ingest_out"); val ckpt = tmp("ingest_ckpt")
    val q = IngestJob.start(spark, IngestJob.Config(
      eventsPath, SfDir, out, ckpt, trigger = Trigger.AvailableNow(), rowsPerBatch = 4000))
    assert(q.awaitTermination(120000), "q did not drain within 120 s")
    val cols = Seq("event_id", "ts", "metric", "value_num", "user_id", "operator", "segment")
    val got = spark.read.parquet(out).select(cols.map(col): _*)
    val context = Tables.customer(spark, SfDir)
      .select(col("c_custkey").as("user_id"), col("c_name").as("operator"),
        col("c_mktsegment").as("segment"))
    val expected = Tables.events(spark, SfDir)
      .join(broadcast(context), Seq("user_id"), "left")
      .select(col("event_id"), col("ts"), col("event_type").as("metric"),
        col("value").as("value_num"), col("user_id"), col("operator"), col("segment"))
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).count() == 0 && expected.exceptAll(got).count() == 0,
      "wire round-trip + enrichment lossless vs batch")
  }

  test("idempotent sink: re-delivered batchId replaces, never duplicates") {
    import spark.implicits._
    val out = tmp("idem_out")
    val sink = IdempotentSink.parquetAppend(out)
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    sink(batch, 7L)
    sink(batch, 7L) // re-delivery of the same micro-batch (post-crash replay)
    sink(Seq((3L, "c")).toDF("id", "v"), 8L)
    val got = spark.read.parquet(out)
    assert(got.count() == 3, "batch 7 written once despite re-delivery")
    assert(got.select("batch_id").distinct().count() == 2)
  }

  test("idempotent JDBC sink: real embedded DB, per-batch commit, re-delivery replaces") {
    import spark.implicits._
    // embedded Derby: a real java.sql engine (DriverManager + dialect +
    // df.write.jdbc all live), standing in for the reference's Postgres
    // (kafka_db_agent/main.py:92-103) in the zero-egress sandbox
    val url = s"jdbc:derby:${tmp("derby")}/db;create=true"
    val sink = IdempotentSink.jdbcAppend(url, "machine_events")
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    sink(batch, 7L)
    sink(batch, 7L) // post-crash re-delivery of the same micro-batch
    sink(Seq((3L, "c")).toDF("id", "v"), 8L)
    val got = spark.read.jdbc(url, "machine_events", new java.util.Properties)
    assert(got.count() == 3, "batch 7 written once despite re-delivery")
    assert(got.filter(col("batch_id") === 7L).count() == 2)
    assert(got.filter(col("batch_id") === 8L).select("v").head().getString(0) == "c")
  }

  test("kafka bridge: wire decode matches the envelope; encode round-trips") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val payload =
      """{"event_id":42,"node_id":"click","value":"6.55","ts_us":1704067200000000,"user_id":7}"""
    val wire = Seq(
      ("click".getBytes, payload.getBytes, "machine_events", 0, 5L,
        new java.sql.Timestamp(0L), 0)
    ).toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val decoded = KafkaBridge.decode(wire)
    val r = decoded.head()
    assert(r.getAs[Long]("event_id") == 42L)
    assert(r.getAs[String]("metric") == "click")
    assert(r.getAs[String]("value") == "6.55")
    assert(r.getAs[Long]("user_id") == 7L)
    assert(r.getAs[Long]("msg_offset") == 5L)
    // encode(decode(x)) reproduces the wire payload fields
    val enc = KafkaBridge.encode(decoded).head()
    val back = new String(enc.getAs[Array[Byte]]("value"))
    assert(back.contains("\"event_id\":42") && back.contains("\"node_id\":\"click\""))
    assert(new String(enc.getAs[Array[Byte]]("key")) == "click")
    // and the streaming read path compiles against a real stream handle
    val mem = MemoryStream[String]
    assert(KafkaBridge.decode(
      mem.toDF().select(
        lit(null).cast("binary").as("key"),
        col("value").cast("binary").as("value"),
        lit("machine_events").as("topic"), lit(0).as("partition"),
        lit(0L).as("offset"), lit(new java.sql.Timestamp(0L)).as("timestamp"),
        lit(0).as("timestampType"))).isStreaming)
  }

  test("kafka bridge: the JSON type channel survives decode→encode (number stays a number)") {
    import spark.implicits._
    // typed wire, as OpcuaMqttAgent produces it: value is a JSON NUMBER
    // in one envelope and a JSON STRING in the other — exactly what the
    // reference's consumer dispatches on (kafka_db_agent/main.py:86-89)
    val payloads = Seq(
      """{"event_id":1,"node_id":"Rate","value":-78.5,"ts_us":1704067200000000,"user_id":7}""",
      """{"event_id":2,"node_id":"Status","value":"paused","ts_us":1704067201000000,"user_id":7}""")
    val wire = payloads.map(p =>
      ("k".getBytes, p.getBytes, "machine_events", 0, 0L,
        new java.sql.Timestamp(0L), 0))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val decoded = KafkaBridge.decode(wire)
    // the string view is usable either way...
    val vals = decoded.select("event_id", "value").as[(Long, String)].collect().toMap
    assert(vals(1L) == "-78.5" && vals(2L) == "paused")
    // ...and the re-encoded wire keeps the ORIGINAL JSON types: the
    // number is NOT re-quoted into a string (which would make the
    // variant dispatch classify every reading as a string metric)
    val back = KafkaBridge.encode(decoded).collect()
      .map(r => new String(r.getAs[Array[Byte]]("value"))).sorted
    assert(back.exists(_.contains("\"value\":-78.5")), back.mkString("; "))
    assert(back.exists(_.contains("\"value\":\"paused\"")), back.mkString("; "))
    // and a second decode of the re-encoded wire dispatches identically
    val again = KafkaBridge.decode(
      KafkaBridge.encode(decoded).select(
        col("key"), col("value"), lit("machine_events").as("topic"),
        lit(0).as("partition"), lit(0L).as("offset"),
        lit(new java.sql.Timestamp(0L)).as("timestamp"), lit(0).as("timestampType")))
      .select(col("event_id"), expr("schema_of_variant(value_v)").as("t"))
      .as[(Long, String)].collect().toMap
    assert(again(1L).startsWith("DECIMAL") || again(1L) == "DOUBLE", again.toString)
    assert(again(2L) == "STRING", again.toString)
  }

  test("retention survives a dateless partition: a null timestamp cannot crash-loop the ingest job") {
    import spark.implicits._
    val out = tmp("retain_nullday")
    // a null ts (the envelope allows "ts_us":null) lands in
    // day=__HIVE_DEFAULT_PARTITION__; retention must neither crash on it
    // (it sorts above every real date) nor time-drop it
    val sink = IdempotentSink.parquetAppendByDay(out, "ts", Some(1))
    val batch = Seq(
      (1L, Option(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), 1.0),
      (2L, Option(java.sql.Timestamp.valueOf("2024-01-03 00:00:00")), 2.0),
      (3L, Option.empty[java.sql.Timestamp], 3.0)
    ).toDF("event_id", "ts", "value")
    sink(batch, 0L) // retention runs inside foreachBatch: must not throw
    val left = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // newest day kept, the day older than the 1-day window dropped, the
    // dateless row kept (outside time-based retention by definition)
    assert(left == Seq(2L, 3L), left.toString)
  }

  test("partitioned writer: day layout written, day predicate prunes partitions") {
    val out = tmp("events_by_day")
    val nDays = PartitionedWriter.writeEvents(spark, SfDir, out)
    assert(nDays > 1, "fixture spans multiple days")
    // partition discovery may infer day=yyyy-MM-dd values as DATE
    val oneDay = spark.read.parquet(out).select(col("day").cast("string"))
      .distinct().orderBy("day").head().getString(0)
    val pruned = PartitionedWriter.readDay(spark, out, oneDay)
    val plan = pruned.queryExecution.executedPlan.toString
    // partition pruning happened at planning: the day predicate appears as a
    // PartitionFilter on the scan, not a post-scan Filter
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"no partition filters in:\n$plan")
    val expected = Tables.events(spark, SfDir)
      .filter(date_format(col("ts"), "yyyy-MM-dd") === oneDay).count()
    assert(pruned.count() == expected)

    // retention = chunk drop: deleting partitions needs no scan/rewrite
    val days = spark.read.parquet(out).select(col("day").cast("string"))
      .distinct().orderBy("day").collect().map(_.getString(0)).toSeq
    val cutoff = days(days.length / 2)
    val dropped = graft.pipeline.PartitionedWriter.dropDaysBefore(spark, out, cutoff)
    assert(dropped == days.filter(_ < cutoff))
    val remaining = spark.read.parquet(out).select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(remaining == days.filter(_ >= cutoff).toSet)
    val expectedRemaining = Tables.events(spark, SfDir)
      .filter(date_format(col("ts"), "yyyy-MM-dd") >= cutoff).count()
    assert(spark.read.parquet(out).count() == expectedRemaining)
  }

  test("dedup refresh job: apply-from-artifacts equals the recompute; torn publishes stay invisible") {
    import graft.pipeline.DedupRefreshJob
    val out = tmp("dedup_art")
    def applied(): Set[(Long, String, Option[Long], Long, Long)] =
      DedupRefreshJob.applyFromArtifacts(spark, SfDir, out).collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("stage"),
          Option(r.getAs[java.lang.Long]("keeper")).map(_.longValue),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("tokens_kept"))).toSet
    val want = graft.ops.DedupOps.dedupApply(spark, SfDir).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("stage"),
        Option(r.getAs[java.lang.Long]("keeper")).map(_.longValue),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("tokens_kept"))).toSet
    // no committed version yet: readers must refuse, not read partials
    assert(DedupRefreshJob.latestVersion(spark, out).isEmpty)
    intercept[IllegalStateException](DedupRefreshJob.readArtifacts(spark, out))

    DedupRefreshJob.refresh(spark, SfDir, out, 0)
    assert(DedupRefreshJob.latestVersion(spark, out) === Some(0L))
    assert(applied() === want, "artifact arm diverged from the recompute capstone")

    // torn publish: a killed refresh leaves stage dirs but no _COMMITTED —
    // readers must keep pinning version 0. Simulate with a version-1
    // stage directory and GARBAGE content (an empty frame): if any reader
    // were to peek at the torn version, the equality below would break.
    spark.read.parquet(s"$out/version=0/stage=exact").limit(0)
      .write.mode("overwrite").parquet(s"$out/version=1/stage=exact")
    assert(DedupRefreshJob.latestVersion(spark, out) === Some(0L),
      "reader saw a version that never committed")
    assert(applied() === want)

    // the restarted refresh overwrites the partials and commits version 1
    DedupRefreshJob.refresh(spark, SfDir, out, 1)
    assert(DedupRefreshJob.latestVersion(spark, out) === Some(1L))
    assert(applied() === want)

    // committed versions are immutable: re-publishing version 1 must refuse
    // (a reader that just pinned it may be mid-scan on its parquet)
    intercept[IllegalArgumentException](DedupRefreshJob.refresh(spark, SfDir, out, 1))
    assert(DedupRefreshJob.latestVersion(spark, out) === Some(1L))

    // non-numeric version dirs (tooling scratch) are not versions, not errors
    new java.io.File(s"$out/version=tmp").mkdirs()
    new java.io.File(s"$out/version=tmp/_COMMITTED").createNewFile()
    assert(DedupRefreshJob.latestVersion(spark, out) === Some(1L))
  }

  test("ann index job: every artifact-served arm equals its recompute twin; torn publishes stay invisible") {
    import graft.pipeline.AnnIndexJob
    import graft.ops.{PqOps, SimilarityOps}
    val out = tmp("ann_art")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq)

    // no committed version: readers refuse rather than serve nothing
    assert(AnnIndexJob.latestVersion(spark, out).isEmpty)
    intercept[IllegalStateException](AnnIndexJob.simTopKPq(spark, SfDir, out))

    AnnIndexJob.refresh(spark, SfDir, out, 0)
    assert(AnnIndexJob.latestVersion(spark, out) === Some(0L))
    // the round-trip property the store exists for: models reconstructed
    // from at-rest rows serve IDENTICAL results to the in-query training
    val pairs = Seq[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)](
      AnnIndexJob.simTopKIvfTrained(spark, SfDir, out) ->
        SimilarityOps.simTopKIvfTrained(spark, SfDir),
      AnnIndexJob.simTopKPq(spark, SfDir, out) -> PqOps.simTopKPq(spark, SfDir),
      AnnIndexJob.simTopKIvfPq(spark, SfDir, out) -> PqOps.simTopKIvfPq(spark, SfDir),
      AnnIndexJob.simTopKPqRr(spark, SfDir, out) -> PqOps.simTopKPqRr(spark, SfDir),
      AnnIndexJob.simTopKIvfPqRr(spark, SfDir, out) -> PqOps.simTopKIvfPqRr(spark, SfDir))
    pairs.foreach { case (art, rec) =>
      assert(rows(art) === rows(rec), "artifact-served arm diverged from the recompute")
    }

    // torn publish: stage dirs without the marker never become visible
    spark.read.parquet(s"$out/version=0/stage=pq").limit(0)
      .write.mode("overwrite").parquet(s"$out/version=1/stage=pq")
    assert(AnnIndexJob.latestVersion(spark, out) === Some(0L))
    assert(rows(AnnIndexJob.simTopKPq(spark, SfDir, out)) ===
      rows(PqOps.simTopKPq(spark, SfDir)))

    // restart commits version 1; committed versions are immutable
    AnnIndexJob.refresh(spark, SfDir, out, 1)
    assert(AnnIndexJob.latestVersion(spark, out) === Some(1L))
    assert(rows(AnnIndexJob.simTopKIvfPqRr(spark, SfDir, out)) ===
      rows(PqOps.simTopKIvfPqRr(spark, SfDir)))
    intercept[IllegalArgumentException](AnnIndexJob.refresh(spark, SfDir, out, 1))
  }

  test("curation job: published ledger equals the recompute; attrition arithmetic is conserved; torn publishes stay invisible") {
    import graft.pipeline.{CurationJob, DedupRefreshJob, VersionedStore}
    val dedupOut = tmp("cur_dedup_art")
    val out = tmp("cur_art")
    DedupRefreshJob.refresh(spark, SfDir, dedupOut, 0)
    def ledgerRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("stage_id"), r.getAs[String]("stage"),
        r.getAs[Long]("docs_removed"), r.getAs[Long]("tokens_removed"),
        r.getAs[Long]("docs_remaining"), r.getAs[Long]("tokens_remaining"))).toSeq

    // no committed version yet: readers refuse
    assert(CurationJob.latestVersion(spark, out).isEmpty)
    intercept[IllegalStateException](CurationJob.ledgerFromArtifacts(spark, out))

    CurationJob.refresh(spark, SfDir, dedupOut, out, 0)
    assert(CurationJob.latestVersion(spark, out) === Some(0L))
    val art = ledgerRows(CurationJob.ledgerFromArtifacts(spark, out))
    val rec = ledgerRows(CurationJob.ledgerRecompute(spark, SfDir, dedupOut))
    assert(art === rec, "published ledger diverged from the recompute")

    // conservation: stage order is the declared pipeline order, running
    // remainders are total minus the running removals, and the published
    // kept corpus holds exactly the docs the ledger says remain
    assert(art.map(_._2) === CurationJob.Stages)
    val (nd, nt) = (art.head._5 + art.head._3, art.head._6 + art.head._4)
    art.foldLeft((nd, nt)) { case ((d, t), row) =>
      assert(row._5 === d - row._3, s"docs_remaining broken at ${row._2}")
      assert(row._6 === t - row._4, s"tokens_remaining broken at ${row._2}")
      (row._5, row._6)
    }
    val corpus = VersionedStore.readStage(spark, out, "corpus")
    assert(corpus.count() === art.last._5, "kept corpus != final docs_remaining")
    // the packed layout is gap-free: total packed mass = sum of tokens_kept
    assert(corpus.agg(sum(col("tokens_kept"))).collect()(0).getLong(0) ===
      corpus.agg(max(col("start_tok") + col("tokens_kept"))).collect()(0).getLong(0))

    // the streaming decontamination arm reads the published eval grams:
    // same flag set as the batch operator's contaminated frame
    val eg = VersionedStore.readStage(spark, out, "evalgrams")
    assert(eg.columns.toSet === Set("gram", "eval_doc"))
    assert(eg.count() > 0)

    // torn publish: a version-1 stage dir without the marker stays invisible
    spark.read.parquet(s"$out/version=0/stage=ledger").limit(0)
      .write.mode("overwrite").parquet(s"$out/version=1/stage=ledger")
    assert(CurationJob.latestVersion(spark, out) === Some(0L))
    assert(ledgerRows(CurationJob.ledgerFromArtifacts(spark, out)) === art)

    // restart commits version 1; committed versions are immutable
    CurationJob.refresh(spark, SfDir, dedupOut, out, 1)
    assert(CurationJob.latestVersion(spark, out) === Some(1L))
    assert(ledgerRows(CurationJob.ledgerFromArtifacts(spark, out)) === art)
    intercept[IllegalArgumentException](CurationJob.refresh(spark, SfDir, dedupOut, out, 1))
  }

  test("production day: ingest→mv→dedup→ann→curation chain killed mid-day resumes and equals the batch recomputes") {
    import graft.pipeline.{AnnIndexJob, CurationJob, DedupRefreshJob, ProductionDay, VersionedStore}
    val root = tmp("prod_day")
    val V = 7L
    val cfg = ProductionDay.Config(SfDir, root, V)
    val total = Tables.events(spark, SfDir).count().toInt
    MvRefreshJob.configureStateStore(spark)
    try {
      // ---- phase 1: the day dies mid-chain. The streams drain only half
      // the arrivals (the scheduler host goes down), the dedup leg has
      // already committed its version, and the curation leg was caught
      // mid-publish (stage dir on disk, no _COMMITTED marker).
      ProductionDay.streamingLegs(spark,
        cfg.copy(maxRows = Some(total / 2)))
      DedupRefreshJob.refresh(spark, SfDir, cfg.dedupDir, V)
      spark.range(1).write.mode("overwrite")
        .parquet(s"${cfg.curationDir}/version=$V/stage=ledger")
      assert(CurationJob.latestVersion(spark, cfg.curationDir).isEmpty,
        "torn curation publish must stay invisible")

      // ---- phase 2: the scheduler re-invokes the SAME day. Streams
      // resume from their checkpoints and drain the rest; the committed
      // dedup version is skipped (a re-publish would throw — committed
      // versions are immutable, so mere success proves the skip); the
      // torn curation version is overwritten wholesale and committed.
      val s = ProductionDay.run(spark, cfg)
      assert(s.dedupVersion === V && s.annVersion === V && s.curationVersion === V)

      // leg 1: fact table ≡ batch wire-round-trip + enrichment, exactly once
      val cols = Seq("event_id", "ts", "metric", "value_num", "user_id", "operator", "segment")
      val got = spark.read.parquet(cfg.factsDir).select(cols.map(col): _*)
      val context = Tables.customer(spark, SfDir)
        .select(col("c_custkey").as("user_id"), col("c_name").as("operator"),
          col("c_mktsegment").as("segment"))
      val wantFacts = Tables.events(spark, SfDir)
        .join(broadcast(context), Seq("user_id"), "left")
        .select(col("event_id"), col("ts"), col("event_type").as("metric"),
          col("value").as("value_num"), col("user_id"), col("operator"), col("segment"))
      assert(s.factRows === total.toLong)
      assert(got.exceptAll(wantFacts).count() == 0 && wantFacts.exceptAll(got).count() == 0,
        "fact table diverged from the batch recompute across the restart")

      // leg 2: MV ≡ batch recompute over watermark-closed buckets, no dupes
      val mv = spark.read.parquet(cfg.mvDir)
        .select("bucket", "metric", "avg_value", "min_value", "max_value", "sample_count")
      assert(mv.groupBy("bucket", "metric").count().filter(col("count") > 1).count() == 0)
      val ev = Tables.events(spark, SfDir).filter(col("value").isNotNull)
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val wantMv = ev
        .groupBy(window(col("ts"), "1 minute"), col("event_type").as("metric"))
        .agg(graft.model.Model.exactAvg4("value").as("avg_value"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value"),
          count(col("value")).as("sample_count"))
        .filter(unix_micros(col("window.end")) <= unix_micros(lit(maxTs)) - 60L * 1000000L)
        .select(col("window.start").as("bucket"), col("metric"),
          col("avg_value"), col("min_value"), col("max_value"), col("sample_count"))
      assert(mv.exceptAll(wantMv).count() == 0 && wantMv.exceptAll(mv).count() == 0,
        "MV diverged from the batch recompute across the restart")

      // leg 3: the phase-1 artifacts serve the recompute capstone exactly
      val applied = DedupRefreshJob.applyFromArtifacts(spark, SfDir, cfg.dedupDir)
      val wantApply = graft.ops.DedupOps.dedupApply(spark, SfDir)
      assert(applied.exceptAll(wantApply).count() == 0 &&
        wantApply.exceptAll(applied).count() == 0)

      // leg 4: an artifact-served ANN arm ≡ its recompute twin
      assert(AnnIndexJob.simTopKIvfPqRr(spark, SfDir, cfg.annDir).collect().toSeq ===
        graft.ops.PqOps.simTopKIvfPqRr(spark, SfDir).collect().toSeq)

      // leg 5: the re-published curation ledger ≡ the recompute, and the
      // torn phase-1 garbage is gone (the stage now holds the real ledger)
      val ledger = CurationJob.ledgerFromArtifacts(spark, cfg.curationDir)
      val wantLedger = CurationJob.ledgerRecompute(spark, SfDir, cfg.dedupDir)
      assert(ledger.collect().toSeq === wantLedger.collect().toSeq)
      assert(VersionedStore.readStage(spark, cfg.curationDir, "ledger")
        .columns.contains("stage_id"), "torn stage content survived the re-publish")
    } finally {
      spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    }
  }
}
