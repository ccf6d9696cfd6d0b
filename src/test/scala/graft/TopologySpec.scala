package graft

import graft.net.{MqttBroker, MqttClient, RespServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's COMPLETE topology end-to-end over real transports —
  * every boundary that docker-compose wires with a service is exercised
  * with the engine's own implementation of that service's protocol:
  *
  *   OPC-UA subscription (fixture replay)            [opcua_server]
  *     → JSON envelope over MQTT 3.1.1 TCP           [mosquitto]
  *     → Structured Streaming subscribe + decode     [hydration_agent]
  *     → live RESP KV context lookups per partition  [redis]
  *     → type dispatch + idempotent parquet append   [kafka_db_agent→DB]
  *
  * (The Kafka hop between hydration and the DB agent is covered by
  * KafkaBridge/IngestJob; the JDBC sink arm by PipelineSpec's Derby
  * test.) What this adds over the per-component specs: the envelope
  * BYTES cross a real socket between two independent protocol stacks,
  * and the context values are read live per row, mid-stream.
  */
class TopologySpec extends AnyFunSuite {

  test("replay → MQTT wire → stream decode → live KV enrich → dispatch → sink") {
    val spark = SparkSuite.session
    import spark.implicits._
    val broker = new MqttBroker()
    val kv = new RespServer()
    val outDir = java.nio.file.Files.createTempDirectory("topo-out").toString
    try {
      kv.put("context:operator", "Alice")
      kv.put("context:last_maintenance", "2025-10-01")

      // the subscription side: 120 fixture events as reference envelopes
      // (opcua_mqtt_agent/main.py:54-57 + user_id, value as string — the
      // all-string wire the type dispatch exists for)
      val src = Tables.events(spark, "/root/testdata/sf0.001")
        .orderBy(col("ts"), col("event_id")).limit(120)
        .select(col("event_id"), col("event_type"), col("ts"), col("user_id"),
          when(col("event_type") === "error", col("props"))
            .otherwise(col("value").cast("string")).as("value"))
      val payloads = src.select(to_json(struct(
        col("event_id"), col("event_type").as("node_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"), col("user_id"))).as("payload"))

      // the consumer side: live MQTT subscription → envelope decode →
      // per-partition RESP lookups → type dispatch → idempotent append
      val decoded = graft.streaming.MqttBridge
        .decode(graft.streaming.MqttBridge.source(spark, "127.0.0.1", broker.port))
      val enriched = graft.ops.DataflowOps.enrichViaKv(decoded, "127.0.0.1", kv.port)
        .withColumn("value_num",
          when(col("metric") === "error" || col("value").isin("true", "false"),
            lit(null).cast("double"))
            .otherwise(expr("try_cast(value AS DOUBLE)")))
      val q = enriched.writeStream
        .foreachBatch(graft.pipeline.IdempotentSink.parquetAppend(outDir))
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("topo-ck").toString)
        .start()
      try {
        // publish AFTER the stream's SUBSCRIBE (QoS 0 has no replay) —
        // processAllAvailable forces the lazy source construction
        q.processAllAvailable()
        val pub = new MqttClient("127.0.0.1", broker.port, "topo-pub")
        try payloads.collect().foreach(r =>
          pub.publish(graft.streaming.MqttBridge.Topic, r.getString(0).getBytes("UTF-8")))
        finally pub.close()
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        var n = 0L
        while (n < 120 && System.nanoTime() < deadline) {
          q.processAllAvailable()
          // guard the read: before the sink's first batch commits the
          // directory is empty and the parquet read throws (same guard
          // as MqttSpec's landed())
          n = try spark.read.parquet(outDir).count()
          catch { case _: Throwable => 0L }
          if (n < 120) Thread.sleep(50)
        }
      } finally q.stop()

      val out = spark.read.parquet(outDir)
      assert(out.count() == 120)
      // context arrived live on every row
      assert(out.filter(col("operator") === "Alice" &&
        col("last_maintenance") === "2025-10-01").count() == 120)
      // the envelope round-tripped the wire byte-exactly: ids and values
      // match the source, and dispatch nulls exactly the non-numeric rows
      val expect = src.select(col("event_id"), col("value")).as[(Long, String)]
        .collect().toMap
      val got = out.select(col("event_id"), col("value"), col("value_num"))
        .as[(Long, String, Option[Double])].collect()
      assert(got.length == 120)
      got.foreach { case (id, v, num) =>
        assert(expect(id) == v, s"value mismatch for event $id")
        val expectedNum =
          if (v == "true" || v == "false") None
          else scala.util.Try(v.toDouble).toOption
        assert(num == expectedNum, s"dispatch mismatch for event $id: $v")
      }
    } finally { broker.close(); kv.close() }
  }

  test("LIVE head: opc.tcp server → OpcuaMqttAgent → MQTT wire → stream decode") {
    val spark = SparkSuite.session
    import spark.implicits._
    val machine = new graft.net.OpcuaServer()
    val broker = new MqttBroker()
    try {
      // the PickAndPlace model's variables exist BEFORE the agent browses
      // (opcua_server/main.py:150-203 builds the address space at init)
      machine.put("Status", "Running")
      machine.put("ActualPlacementRateCPH", 41847.0)
      machine.put("VacuumPressureKPa", -78.5)

      // consumer side first: live MQTT subscription + envelope decode
      val q = graft.streaming.MqttBridge
        .decode(graft.streaming.MqttBridge.source(spark, "127.0.0.1", broker.port))
        .writeStream.format("memory").queryName("live_head")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("live-head-ck").toString)
        .start()
      try {
        q.processAllAvailable() // subscribe before the agent publishes
        // the reference's first hop, both protocols real: browse the
        // namespace, subscribe all variables, publish per data change
        val agent = graft.streaming.OpcuaMqttAgent.run(
          "127.0.0.1", machine.port, machine.endpointUrl,
          "urn:example:pick-and-place", "127.0.0.1", broker.port)
        try {
          assert(agent.variables.toSet ==
            Set("Status", "ActualPlacementRateCPH", "VacuumPressureKPa"))
          // live machine-state changes (the server loop's writes)
          machine.put("Status", "Error")
          machine.put("VacuumPressureKPa", -60.25)
          // 3 initial + 2 live envelopes
          val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
          var n = 0L
          while (n < 5 && System.nanoTime() < deadline) {
            q.processAllAvailable()
            n = spark.table("live_head").count()
            if (n < 5) Thread.sleep(50)
          }
          val rows = spark.table("live_head")
            .select("metric", "value").as[(String, String)].collect().toSeq
          assert(rows.count(_ == ("Status", "Running")) == 1, rows.toString)
          assert(rows.count(_ == ("Status", "Error")) == 1)
          // the string view comes from the string-schema parse, so the
          // number's raw wire text survives exactly
          assert(rows.count(_ == ("ActualPlacementRateCPH", "41847.0")) == 1)
          assert(rows.count(_ == ("VacuumPressureKPa", "-78.5")) == 1)
          assert(rows.count(_ == ("VacuumPressureKPa", "-60.25")) == 1)
          // the JSON type channel survived both wires: numbers are
          // numeric variants, Status is a string variant (the downstream
          // dispatch rule reads exactly this — kafka_db_agent:86-89)
          val types = spark.table("live_head")
            .select($"metric", expr("schema_of_variant(value_v)").as("t"))
            .as[(String, String)].collect().toSeq
          assert(types.filter(_._1 == "Status").forall(_._2 == "STRING"), types.toString)
          assert(types.filter(_._1 == "VacuumPressureKPa").forall(t =>
            t._2.startsWith("DECIMAL") || t._2 == "DOUBLE" || t._2 == "BIGINT"), types.toString)
          // source timestamps crossed both wires into the ts column
          assert(spark.table("live_head").filter($"ts".isNotNull).count() == n)
        } finally agent.close()
      } finally q.stop()
    } finally { machine.close(); broker.close() }
  }

  test("Kafka hop LIVE: MQTT decode → kafka-graft sink → broker log → Spark source + db-writer-group twin") {
    val spark = SparkSuite.session
    import spark.implicits._
    val mqtt = new MqttBroker()
    val kafka = new graft.net.KafkaBroker(defaultPartitions = 3)
    try {
      // hydration leg: live MQTT subscribe → envelope decode → encode →
      // produce onto machine_events (hydration_agent/main.py:64-86, both
      // transports real)
      val hydrate = graft.streaming.KafkaBridge.sinkLive(
        graft.streaming.MqttBridge.decode(
          graft.streaming.MqttBridge.source(spark, "127.0.0.1", mqtt.port)),
        "127.0.0.1", kafka.port, "machine_events",
        java.nio.file.Files.createTempDirectory("topo-kafka-ck").toString)
        .start()
      try {
        hydrate.processAllAvailable() // subscribe before publishing (QoS 0)
        val pub = new MqttClient("127.0.0.1", mqtt.port, "topo-kafka-pub")
        // fractional doubles only: the variant round-trip CANONICALIZES
        // number text ("12.0" -> 12, same JSON number), so byte-identity
        // below is only a fair assertion for values with a canonical form
        val envelopes = (0 until 60).map { i =>
          val v = if (i % 5 == 0) "\"Error\"" else (i + 0.5).toString
          s"""{"event_id":$i,"node_id":"m${i % 4}","value":$v,"ts_us":${1700000000000000L + i},"user_id":${i % 3}}"""
        }
        try envelopes.foreach(e =>
          pub.publish(graft.streaming.MqttBridge.Topic, e.getBytes("UTF-8")))
        finally pub.close()
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        def landed(): Long = (0 until 3).map(p =>
          math.max(0L, kafka.logEndOffset("machine_events", p))).sum
        while (landed() < 60 && System.nanoTime() < deadline) {
          hydrate.processAllAvailable()
          Thread.sleep(50)
        }
        assert(landed() == 60, "hydration leg lost envelopes before the log")
        // keyed by metric: each node's rows live on ONE partition (the
        // per-node ordering the reference gets from its keyed producer)
        assert((0 until 3).map(p =>
          kafka.logEndOffset("machine_events", p)).count(_ > 0) > 1,
          "keyed envelopes all landed on one partition")

        // consumer leg A — the engine: replayable kafka-graft source,
        // decode, type dispatch (the db agent's numeric/string split)
        val q = graft.streaming.KafkaBridge
          .sourceLive(spark, "127.0.0.1", kafka.port)
          .withColumn("value_num", expr("try_cast(value AS DOUBLE)"))
          .writeStream.format("memory").queryName("topo_kafka")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("topo-kafka-src-ck").toString)
          .start()
        try {
          var n = 0L
          while (n < 60 && System.nanoTime() < deadline) {
            q.processAllAvailable()
            n = spark.table("topo_kafka").count()
            if (n < 60) Thread.sleep(50)
          }
          val rows = spark.table("topo_kafka")
          assert(rows.count() == 60)
          assert(rows.filter($"value" === "Error" && $"value_num".isNull).count() == 12)
          assert(rows.filter($"value_num".isNotNull).count() == 48)
          // the decoded metric matches the producing key on every row
          assert(rows.filter($"metric" =!= decode($"key", "UTF-8")).count() == 0)
        } finally q.stop()

        // consumer leg B — the reference's own client shape: group
        // consumer, earliest reset, auto-commit (kafka_db_agent:50-57)
        val dbTwin = new graft.net.KafkaGroupConsumer(
          "127.0.0.1", kafka.port, "db-writer-group")
        try {
          dbTwin.subscribe(Seq("machine_events"))
          var got = Vector.empty[String]
          val dbDeadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
          while (got.size < 60 && System.nanoTime() < dbDeadline)
            got ++= dbTwin.poll(200).map(r => new String(r.value, "UTF-8"))
          assert(got.size == 60 && got.distinct.size == 60)
          assert(dbTwin.rejoins == 0, "single-member group should never rebalance")
          // every envelope survived both wires byte-identically
          assert(got.toSet == envelopes.toSet)
          dbTwin.commitSync()
          // committed == logEnd for every partition that HAS data; the
          // 4 metric keys hash onto only some of the 3 partitions, and
          // an empty partition legitimately has no committed offset (-1)
          (0 until 3).foreach { p =>
            val end = kafka.logEndOffset("machine_events", p)
            val committed = kafka.committedOffset("db-writer-group", "machine_events", p)
            assert(committed == (if (end > 0) end else -1L), s"partition $p")
          }
        } finally dbTwin.close()
      } finally hydrate.stop()
    } finally { mqtt.close(); kafka.close() }
  }
}
