package graft

import graft.net._
import graft.net.KafkaWire._
import graft.streaming.KafkaBridge
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8

/** The engine's own Kafka stack: wire codec (message-set v1 + murmur2 +
  * consumer protocol), loopback broker (logs, long-poll fetch, classic
  * group coordinator), clients, and the DSv2 source/sink — the broker hop
  * the reference runs through redpanda (hydration_agent/main.py:54-57 →
  * kafka_db_agent/main.py:50-57, topic `machine_events`, group
  * `db-writer-group`, earliest reset, auto-commit).
  */
class KafkaSpec extends SparkSuite {

  private def s(x: String): Array[Byte] = if (x == null) null else x.getBytes(UTF_8)

  // ---------- wire ----------

  test("message-set v1 roundtrips, CRC-checks, and drops a truncated tail") {
    val recs = Seq(
      Record(5L, 1000L, s("k1"), s("v1")),
      Record(6L, 1001L, null, s("v-µ-ü")),       // null key, non-ASCII value
      Record(7L, 1002L, s("k3"), null))           // null value (tombstone)
    val bytes = encodeMessageSet(recs)
    val back = decodeMessageSet(bytes)
    assert(back.map(_.offset) == Seq(5L, 6L, 7L))
    assert(back(0).timestamp == 1000L)
    assert(new String(back(1).value, UTF_8) == "v-µ-ü")
    assert(back(1).key == null && back(2).value == null)

    // flip a payload byte -> CRC must catch it
    val corrupt = bytes.clone()
    corrupt(bytes.length - 1) = (corrupt(bytes.length - 1) ^ 0x01).toByte
    intercept[IllegalArgumentException](decodeMessageSet(corrupt))

    // a broker may truncate the set at its byte limit: partial tail drops
    val truncated = java.util.Arrays.copyOf(bytes, bytes.length - 3)
    assert(decodeMessageSet(truncated).map(_.offset) == Seq(5L, 6L))
  }

  test("murmur2 matches Apache Kafka's published test vectors") {
    // org.apache.kafka.common.utils.UtilsTest#testMurmur2 — byte-for-byte
    // compatibility means keyed envelopes from this producer interleave
    // onto the same partitions a stock client would pick
    assert(murmur2("21".getBytes(UTF_8)) == -973932308)
    assert(murmur2("foobar".getBytes(UTF_8)) == -790332482)
    assert(murmur2("a-little-bit-long-string".getBytes(UTF_8)) == -985981536)
    assert(murmur2("a-little-bit-longer-string".getBytes(UTF_8)) == -1486304829)
    assert(murmur2("lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8".getBytes(UTF_8)) == -58897971)
    assert((0 until 100).forall { i =>
      val p = partitionForKey(s(s"key-$i"), 3); p >= 0 && p < 3
    })
  }

  test("consumer protocol: subscription/assignment roundtrip, range assignor") {
    assert(decodeSubscription(encodeSubscription(Seq("a", "b"))) == Seq("a", "b"))
    val asn = Seq(("t", Seq(0, 2)), ("u", Seq(1)))
    assert(decodeAssignment(encodeAssignment(asn)) == asn)

    // 3 partitions over 2 members: first (sorted) member takes the extra
    val a = rangeAssign(
      Seq(("m2", Seq("machine_events")), ("m1", Seq("machine_events"))),
      _ => 3)
    assert(a("m1") == Seq(("machine_events", Seq(0, 1))))
    assert(a("m2") == Seq(("machine_events", Seq(2))))
    // 4 over 2: even split
    val b = rangeAssign(Seq(("m1", Seq("t")), ("m2", Seq("t"))), _ => 4)
    assert(b("m1") == Seq(("t", Seq(0, 1))) && b("m2") == Seq(("t", Seq(2, 3))))
  }

  // ---------- broker + clients ----------

  test("produce/fetch end-to-end: keyed partitioning, dense offsets, long-poll") {
    val broker = new KafkaBroker(defaultPartitions = 3)
    try {
      val producer = new KafkaProducer(broker.host, broker.port)
      val cursor = new KafkaCursor(broker.host, broker.port)
      try {
        val offs = producer.sendBatch("machine_events",
          (0 until 30).map(i => (s(s"node-${i % 5}"), s(s"""{"v":$i}"""))))
        assert(offs.length == 30)
        // same key -> same partition, every time (murmur2 partitioner)
        val expected = (0 until 30).groupBy(i => partitionForKey(s(s"node-${i % 5}"), 3))
        val seen = (0 until 3).flatMap { p =>
          cursor.fetch("machine_events", p, 0L).map(r => p -> new String(r.value, UTF_8))
        }
        assert(seen.size == 30)
        expected.foreach { case (p, is) =>
          val vals = seen.filter(_._1 == p).map(_._2).toSet
          assert(is.forall(i => vals.contains(s"""{"v":$i}""")), s"partition $p")
        }
        // offsets are dense per partition starting at 0
        (0 until 3).foreach { p =>
          val rs = cursor.fetch("machine_events", p, 0L)
          assert(rs.map(_.offset) == rs.indices.map(_.toLong))
          assert(broker.logEndOffset("machine_events", p) == rs.size.toLong)
        }
        // seek past the end -> OFFSET_OUT_OF_RANGE, at the end -> empty
        val end = broker.logEndOffset("machine_events", 0)
        assert(cursor.fetch("machine_events", 0, end).isEmpty)
        intercept[KafkaOffsetOutOfRange](cursor.fetch("machine_events", 0, end + 1))

        // long-poll: a fetch blocks until data arrives
        val t0 = System.nanoTime()
        val waiter = new Thread(() => {
          val rs = cursor.fetch("machine_events", 0, end, maxWaitMs = 5000)
          assert(rs.nonEmpty)
        })
        waiter.start()
        Thread.sleep(150)
        producer.sendBatch("machine_events",
          Seq((null, s("a")), (null, s("b")), (null, s("c")))) // round-robin hits p0
        waiter.join(5000)
        assert(!waiter.isAlive, "long-poll fetch never woke")
        assert(System.nanoTime() - t0 >= 100L * 1000000L)
      } finally { producer.close(); cursor.close() }
    } finally broker.close()
  }

  test("group consumer resumes from committed offsets (db-writer-group contract)") {
    val broker = new KafkaBroker(defaultPartitions = 3, rebalanceTimeoutMs = 800L)
    try {
      val producer = new KafkaProducer(broker.host, broker.port)
      producer.sendBatch("machine_events",
        (0 until 40).map(i => (s(s"k$i"), s(s"m$i"))))

      // consumer 1: reads everything from earliest, commits, goes away
      val c1 = new KafkaGroupConsumer(broker.host, broker.port, "db-writer-group")
      c1.subscribe(Seq("machine_events"))
      var got = Vector.empty[String]
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (got.size < 40 && System.nanoTime() < deadline)
        got ++= c1.poll(200).map(r => new String(r.value, UTF_8))
      assert(got.sorted == (0 until 40).map(i => s"m$i").sorted.toVector)
      c1.commitSync()
      c1.close()
      (0 until 3).foreach { p =>
        assert(broker.committedOffset("db-writer-group", "machine_events", p) ==
          broker.logEndOffset("machine_events", p))
      }

      // consumer 2, same group: resumes AFTER the commit — only new rows
      producer.sendBatch("machine_events", (40 until 50).map(i => (s(s"k$i"), s(s"m$i"))))
      val c2 = new KafkaGroupConsumer(broker.host, broker.port, "db-writer-group")
      c2.subscribe(Seq("machine_events"))
      var got2 = Vector.empty[String]
      val d2 = System.nanoTime() + 10L * 1000000000L
      while (got2.size < 10 && System.nanoTime() < d2)
        got2 ++= c2.poll(200).map(r => new String(r.value, UTF_8))
      assert(got2.sorted == (40 until 50).map(i => s"m$i").sorted.toVector,
        "redelivered already-committed rows or lost new ones")
      c2.close()
      producer.close()

      // a FRESH group starts from earliest (auto_offset_reset='earliest')
      val c3 = new KafkaGroupConsumer(broker.host, broker.port, "other-group")
      c3.subscribe(Seq("machine_events"))
      var got3 = 0
      val d3 = System.nanoTime() + 10L * 1000000000L
      while (got3 < 50 && System.nanoTime() < d3) got3 += c3.poll(200).size
      assert(got3 == 50)
      c3.close()
    } finally broker.close()
  }

  test("crash before commit redelivers from the last commit (at-least-once)") {
    val broker = new KafkaBroker(defaultPartitions = 1, rebalanceTimeoutMs = 500L)
    try {
      val producer = new KafkaProducer(broker.host, broker.port)
      producer.sendBatch("t", (0 until 20).map(i => (null, s(s"m$i"))))

      // crash twin: short session timeout, auto-commit effectively off
      val c1 = new KafkaGroupConsumer(broker.host, broker.port, "g",
        sessionTimeoutMs = 1500, autoCommitIntervalMs = Long.MaxValue / 2000000L)
      c1.subscribe(Seq("t"))
      var n1 = 0
      val d1 = System.nanoTime() + 10L * 1000000000L
      while (n1 < 10 && System.nanoTime() < d1) n1 += c1.poll(200).size
      assert(n1 >= 10)
      // … c1 "crashes" here: no commit, no clean leave — just silence.
      // (we cannot stop its heartbeat thread without close(), so sever the
      // membership broker-side by letting the session expire after we
      // suppress it: closing the broker-side view means waiting out the
      // session; instead simulate the crash faithfully by never closing
      // and letting the NEW member's join window drop the silent one)
      c1.suspendForTest()

      producer.sendBatch("t", (20 until 25).map(i => (null, s(s"m$i"))))
      val c2 = new KafkaGroupConsumer(broker.host, broker.port, "g",
        sessionTimeoutMs = 1500)
      c2.subscribe(Seq("t"))
      var got2 = Vector.empty[String]
      val d2 = System.nanoTime() + 15L * 1000000000L
      while (got2.size < 25 && System.nanoTime() < d2)
        got2 ++= c2.poll(200).map(r => new String(r.value, UTF_8))
      // nothing was committed -> EVERYTHING redelivers: at-least-once
      assert(got2.sorted == (0 until 25).map(i => s"m$i").sorted.toVector)
      c2.close()
      producer.close()
    } finally broker.close()
  }

  test("two members split partitions; leave rebalances back to one") {
    val broker = new KafkaBroker(defaultPartitions = 3, rebalanceTimeoutMs = 800L)
    try {
      val producer = new KafkaProducer(broker.host, broker.port)
      broker.createTopic("t", 3)

      val c1 = new KafkaGroupConsumer(broker.host, broker.port, "g", sessionTimeoutMs = 2000)
      c1.subscribe(Seq("t"))
      assert(c1.assignedPartitions.flatMap(_._2).sorted == Seq(0, 1, 2))

      // second member joins -> c1's next poll rejoins (heartbeat sees the
      // rebalance) and the range assignment splits 3 partitions 2/1
      val c2 = new KafkaGroupConsumer(broker.host, broker.port, "g", sessionTimeoutMs = 2000)
      val joiner = new Thread(() => c2.subscribe(Seq("t")))
      joiner.start()
      val d1 = System.nanoTime() + 10L * 1000000000L
      while (joiner.isAlive && System.nanoTime() < d1) c1.poll(100)
      joiner.join(2000)
      assert(!joiner.isAlive, "second member never completed its join")
      c1.poll(100) // settle: adopt the new generation's assignment
      val parts1 = c1.assignedPartitions.flatMap(_._2)
      val parts2 = c2.assignedPartitions.flatMap(_._2)
      assert((parts1 ++ parts2).sorted == Seq(0, 1, 2), s"$parts1 / $parts2")
      assert(parts1.nonEmpty && parts2.nonEmpty && parts1.intersect(parts2).isEmpty)

      // both see a disjoint union of everything produced
      producer.sendBatch("t", (0 until 30).map(i => (s(s"k$i"), s(s"m$i"))))
      var seen = Vector.empty[String]
      val d2 = System.nanoTime() + 10L * 1000000000L
      while (seen.size < 30 && System.nanoTime() < d2)
        seen ++= (c1.poll(100) ++ c2.poll(100)).map(r => new String(r.value, UTF_8))
      assert(seen.size == 30 && seen.distinct.size == 30)

      // clean leave -> remaining member reabsorbs all partitions
      c2.close()
      val d3 = System.nanoTime() + 10L * 1000000000L
      while (c1.assignedPartitions.flatMap(_._2).size < 3 && System.nanoTime() < d3)
        c1.poll(100)
      assert(c1.assignedPartitions.flatMap(_._2).sorted == Seq(0, 1, 2))
      c1.close()
      producer.close()
    } finally broker.close()
  }

  test("zombie fencing: a stale-generation commit is rejected, a simple commit is not") {
    val broker = new KafkaBroker(defaultPartitions = 1, rebalanceTimeoutMs = 400L)
    try {
      val producer = new KafkaProducer(broker.host, broker.port)
      producer.sendBatch("t", (0 until 8).map(i => (null, s(s"m$i"))))

      // member A reads but never commits; a long auto-commit interval
      // keeps its processed offsets pending
      val a = new KafkaGroupConsumer(broker.host, broker.port, "g",
        sessionTimeoutMs = 5000, autoCommitIntervalMs = Long.MaxValue / 2000000L)
      a.subscribe(Seq("t"))
      var n = 0
      val d = System.nanoTime() + 10L * 1000000000L
      while (n < 8 && System.nanoTime() < d) n += a.poll(200).size
      assert(n == 8)

      // member B joins; A stays silent through the join window, so the
      // coordinator drops A and bumps the generation — A is now a zombie
      val b = new KafkaGroupConsumer(broker.host, broker.port, "g",
        sessionTimeoutMs = 5000)
      b.subscribe(Seq("t"))

      // the zombie's commit must be FENCED (unknown member / stale
      // generation): nothing lands, so B's redelivery covers the gap —
      // the at-least-once guarantee depends on exactly this rejection
      a.commitSync()
      assert(broker.committedOffset("g", "t", 0) == -1L,
        "stale-generation commit landed — fencing broken")

      // B (the live generation) redelivers everything from earliest
      var got = 0
      val d2 = System.nanoTime() + 10L * 1000000000L
      while (got < 8 && System.nanoTime() < d2) got += b.poll(200).size
      assert(got == 8, "fenced commit should leave redelivery intact")
      b.commitSync()
      assert(broker.committedOffset("g", "t", 0) == 8L)

      a.suspendForTest()
      b.close()
      producer.close()
    } finally broker.close()
  }

  // ---------- DSv2 source/sink ----------

  test("kafka-graft streaming source: decode = batch parse, admission control") {
    val broker = new KafkaBroker(defaultPartitions = 3)
    try {
      val producer = new KafkaProducer(broker.host, broker.port)
      val payloads = (0 until 24).map { i =>
        s"""{"event_id":$i,"node_id":"n${i % 4}","value":${i * 1.5},"ts_us":${1700000000000000L + i},"user_id":${i % 3}}"""
      }
      producer.sendBatch("machine_events",
        payloads.zipWithIndex.map { case (p, i) => (s(s"n${i % 4}"), s(p)) })

      val q = KafkaBridge.decode(
        spark.readStream.format("kafka-graft")
          .option("host", broker.host).option("port", broker.port.toString)
          .option("topic", "machine_events")
          .option("maxOffsetsPerTrigger", "7") // forces multiple batches
          .load())
        .writeStream.format("memory").queryName("kafka_e2e").start()
      try {
        val d = System.nanoTime() + 30L * 1000000000L
        while (spark.table("kafka_e2e").count() < 24 && System.nanoTime() < d) {
          q.processAllAvailable()
          Thread.sleep(50)
        }
        val rows = spark.table("kafka_e2e")
        assert(rows.count() == 24)
        // decoded envelope columns match the batch-side parse semantics
        assert(rows.select("event_id").as[Long](spark.implicits.newLongEncoder)
          .collect().sorted.toSeq == (0L until 24L))
        // partition metadata is real: all 3 partitions contributed
        assert(rows.select("partition").distinct().count() == 3)
        // keyed rows stayed on murmur2's partition
        rows.select("key", "partition").collect().foreach { r =>
          assert(r.getInt(1) == partitionForKey(s(r.getString(0)), 3))
        }
      } finally q.stop()
      producer.close()
    } finally broker.close()
  }

  test("kafka-graft source restart resumes from the checkpoint, no duplicates") {
    val broker = new KafkaBroker(defaultPartitions = 2)
    try {
      val producer = new KafkaProducer(broker.host, broker.port)
      producer.sendBatch("t", (0 until 10).map(i => (s(s"k$i"), s(s"m$i"))))
      val ckpt = java.nio.file.Files.createTempDirectory("kafka-graft-ckpt").toString
      val outDir = java.nio.file.Files.createTempDirectory("kafka-graft-out").toString

      // replayable source + transactional file sink = the exactly-once
      // composition the scaladoc claims; run twice over one checkpoint
      def run(): Unit = {
        val q = spark.readStream.format("kafka-graft")
          .option("host", broker.host).option("port", broker.port.toString)
          .option("topic", "t").load()
          .selectExpr("cast(value as string) as v", "partition", "offset")
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt).start()
        try q.processAllAvailable() finally q.stop()
      }

      run()
      assert(spark.read.parquet(outDir).count() == 10L)
      producer.sendBatch("t", (10 until 16).map(i => (s(s"k$i"), s(s"m$i"))))
      run()
      val vals = spark.read.parquet(outDir).collect().map(_.getString(0)).toSeq
      assert(vals.sorted == (0 until 16).map(i => s"m$i").sorted,
        "restart replayed committed offsets (duplicates) or lost new rows")
      producer.close()
    } finally broker.close()
  }

  test("kafka-graft sink: encode->produce->consume roundtrips the envelope") {
    import spark.implicits._
    val broker = new KafkaBroker(defaultPartitions = 3)
    try {
      val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)](spark)
      val events = mem.toDF()
        .toDF("event_id", "ts", "metric", "value")
        .withColumn("user_id", lit(7L))
      val ckpt = java.nio.file.Files.createTempDirectory("kafka-graft-snk").toString
      val q = KafkaBridge.encode(events)
        .writeStream.format("kafka-graft")
        .option("host", broker.host).option("port", broker.port.toString)
        .option("topic", "out").option("checkpointLocation", ckpt)
        .start()
      try {
        mem.addData(
          (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "temp", 21.5),
          (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), "rpm", 900.0))
        q.processAllAvailable()
        val cursor = new KafkaCursor(broker.host, broker.port)
        val rows = (0 until broker.partitionCount("out")).flatMap(p =>
          cursor.fetch("out", p, 0L))
        cursor.close()
        assert(rows.size == 2)
        val byKey = rows.map(r => new String(r.key, UTF_8) ->
          new String(r.value, UTF_8)).toMap
        assert(byKey.keySet == Set("temp", "rpm"))
        assert(byKey("temp").contains(""""value":21.5"""))
        assert(byKey("rpm").contains(""""node_id":"rpm""""))
        // keyed exactly like a stock producer: murmur2 partition
        rows.foreach { r =>
          assert(r.partition == partitionForKey(r.key, 3))
        }
      } finally q.stop()
    } finally broker.close()
  }
}
