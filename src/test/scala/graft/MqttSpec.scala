package graft

import graft.net.{MqttBroker, MqttClient, MqttWire}
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, DataInputStream}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import scala.jdk.CollectionConverters._

/** The engine's own MQTT 3.1.1 stack: wire codec, loopback broker
  * routing, and the live streaming source/sink pair — the transport the
  * reference runs through eclipse-mosquitto
  * (opcua_mqtt_agent/main.py:54-59 → hydration_agent/main.py:64-71).
  */
class MqttSpec extends AnyFunSuite {

  private def roundtrip(p: MqttWire.Packet): MqttWire.Packet =
    MqttWire.decode(new DataInputStream(new ByteArrayInputStream(MqttWire.encode(p))))

  test("wire codec roundtrips every packet type") {
    assert(roundtrip(MqttWire.Connect("abc")) == MqttWire.Connect("abc"))
    assert(roundtrip(MqttWire.Connack(0)) == MqttWire.Connack(0))
    val pub = roundtrip(MqttWire.Publish("machine/data", "payload-µ".getBytes("UTF-8")))
      .asInstanceOf[MqttWire.Publish]
    assert(pub.topic == "machine/data")
    assert(new String(pub.payload, "UTF-8") == "payload-µ")
    assert(roundtrip(MqttWire.Subscribe(7, Seq("a/+", "b/#"))) ==
      MqttWire.Subscribe(7, Seq("a/+", "b/#")))
    assert(roundtrip(MqttWire.Suback(7, Seq(0, 0))) == MqttWire.Suback(7, Seq(0, 0)))
    assert(roundtrip(MqttWire.Pingreq) == MqttWire.Pingreq)
    assert(roundtrip(MqttWire.Pingresp) == MqttWire.Pingresp)
    assert(roundtrip(MqttWire.Disconnect) == MqttWire.Disconnect)
  }

  test("remaining-length varint covers the multi-byte range") {
    // 200-byte payload forces a 2-byte remaining length
    val big = MqttWire.Publish("t", Array.fill[Byte](200)(42))
    val back = roundtrip(big).asInstanceOf[MqttWire.Publish]
    assert(back.payload.length == 200 && back.payload.forall(_ == 42))
  }

  test("wire codec rejects what it cannot represent") {
    // >64 KiB topic cannot be length-prefixed
    intercept[IllegalArgumentException](
      MqttWire.encode(MqttWire.Publish("x" * 70000, Array.emptyByteArray)))
    // QoS>0 PUBLISH flag bits must be refused, not silently degraded
    val qos1 = MqttWire.encode(MqttWire.Publish("t", Array.emptyByteArray))
    qos1(0) = (qos1(0) | 0x02).toByte // set QoS-1 bit
    intercept[IllegalArgumentException](
      MqttWire.decode(new DataInputStream(new ByteArrayInputStream(qos1))))
    // a 5-byte remaining length is malformed per spec
    val bad = Array[Byte](0x30, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x01)
    intercept[IllegalArgumentException](
      MqttWire.decode(new DataInputStream(new ByteArrayInputStream(bad))))
  }

  test("topic filter matching follows spec 4.7 (+ one level, # tail)") {
    import MqttWire.topicMatches
    assert(topicMatches("machine/data", "machine/data"))
    assert(!topicMatches("machine/data", "machine/other"))
    assert(topicMatches("machine/+", "machine/data"))
    assert(!topicMatches("machine/+", "machine/data/x"))
    assert(topicMatches("machine/#", "machine/data/x"))
    assert(topicMatches("#", "a/b/c"))
    assert(!topicMatches("a/#", "b/a"))
    assert(!topicMatches("+", "a/b"))
  }

  test("broker routes QoS-0 publishes to matching subscribers only") {
    val broker = new MqttBroker()
    try {
      val got = new ConcurrentLinkedQueue[String]()
      val other = new ConcurrentLinkedQueue[String]()
      val latch = new CountDownLatch(3)
      val sub = new MqttClient("127.0.0.1", broker.port, "sub")
      val non = new MqttClient("127.0.0.1", broker.port, "non")
      val pub = new MqttClient("127.0.0.1", broker.port, "pub")
      try {
        sub.subscribe("machine/#") { (_, p) =>
          got.add(new String(p, "UTF-8")); latch.countDown()
        }
        non.subscribe("elsewhere/+") { (_, p) => other.add(new String(p, "UTF-8")) }
        Seq("a", "b", "c").foreach(m => pub.publish("machine/data", m.getBytes("UTF-8")))
        assert(latch.await(10, TimeUnit.SECONDS), "subscriber did not get 3 messages")
        assert(got.asScala.toSeq.sorted == Seq("a", "b", "c"))
        assert(other.isEmpty, "non-matching filter received traffic")
      } finally { sub.close(); non.close(); pub.close() }
    } finally broker.close()
  }

  test("live end-to-end: publish JSON envelopes, stream them through mqtt-sub, decode = batch parse") {
    val spark = SparkSuite.session
    import spark.implicits._
    val broker = new MqttBroker()
    try {
      // the reference envelope (opcua_mqtt_agent/main.py:54-57), three rows
      val envelopes = Seq(
        """{"event_id":1,"node_id":"Status","value":"3.5","ts_us":1700000000000000,"user_id":10}""",
        """{"event_id":2,"node_id":"CycleTime","value":"1.25","ts_us":1700000001000000,"user_id":11}""",
        """{"event_id":3,"node_id":"Feeder01","value":"99.0","ts_us":1700000002000000,"user_id":12}""")
      val q = graft.streaming.MqttBridge
        .decode(graft.streaming.MqttBridge.source(spark, "127.0.0.1", broker.port))
        .writeStream.format("memory").queryName("mqtt_e2e")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("mqtt-ck").toString)
        .start()
      try {
        // wait for the source's subscription before publishing (QoS 0
        // has no replay: a publish before SUBSCRIBE is simply lost) —
        // processAllAvailable forces the lazy source construction
        q.processAllAvailable()
        val pub = new MqttClient("127.0.0.1", broker.port, "test-pub")
        try envelopes.foreach(e =>
          pub.publish(graft.streaming.MqttBridge.Topic, e.getBytes("UTF-8")))
        finally pub.close()
        // messages land on the driver asynchronously; poll until the
        // stream has admitted and processed all three
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var n = 0L
        while (n < 3 && System.nanoTime() < deadline) {
          q.processAllAvailable()
          n = spark.table("mqtt_e2e").count()
          if (n < 3) Thread.sleep(50)
        }
        val out = spark.table("mqtt_e2e")
          .select("event_id", "metric", "value", "user_id").as[(Long, String, String, Long)]
          .collect().sortBy(_._1)
        assert(out.toSeq == Seq(
          (1L, "Status", "3.5", 10L),
          (2L, "CycleTime", "1.25", 11L),
          (3L, "Feeder01", "99.0", 12L)))
      } finally q.stop()
    } finally broker.close()
  }

  test("restart semantics: QoS-0 is at-most-once — no duplicates, downtime messages lost, stream stays healthy") {
    val spark = SparkSuite.session
    val broker = new MqttBroker()
    try {
      val ck = java.nio.file.Files.createTempDirectory("mqtt-restart-ck").toString
      val outDir = java.nio.file.Files.createTempDirectory("mqtt-restart-out").toString
      def start() = graft.streaming.MqttBridge
        .decode(graft.streaming.MqttBridge.source(spark, "127.0.0.1", broker.port))
        .writeStream
        .foreachBatch(graft.pipeline.IdempotentSink.parquetAppend(outDir))
        .option("checkpointLocation", ck)
        .start()
      def publish(msgs: Seq[String]): Unit = {
        val pub = new MqttClient("127.0.0.1", broker.port, "restart-pub")
        try msgs.foreach(m =>
          pub.publish(graft.streaming.MqttBridge.Topic, m.getBytes("UTF-8")))
        finally pub.close()
      }
      def env(i: Int) =
        s"""{"event_id":$i,"node_id":"Status","value":"1.0","ts_us":${1700000000000000L + i},"user_id":1}"""
      def landed(): Seq[Long] =
        try spark.read.parquet(outDir).select("event_id")
          .collect().map(_.getLong(0)).sorted.toSeq
        catch { case _: Throwable => Seq.empty } // dir empty before batch 0
      def await(n: Int, q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (landed().length < n && System.nanoTime() < deadline) {
          q.processAllAvailable(); Thread.sleep(50)
        }
      }
      val q1 = start()
      try {
        q1.processAllAvailable() // force source init: SUBSCRIBE precedes publish
        publish(Seq(env(1), env(2))); await(2, q1); assert(landed() == Seq(1L, 2L))
      } finally q1.stop()
      publish(Seq(env(3))) // during downtime: no subscriber — lost by contract
      val q2 = start()
      try {
        q2.processAllAvailable()
        publish(Seq(env(4)))
        await(3, q2)
        // 1,2 exactly once across the restart (committed offsets + no
        // QoS-0 replay — the recovered source rebases to the checkpoint
        // instead of failing offsets-went-backwards), 3 lost by contract
        // (published with no live subscription), 4 delivered
        assert(landed() == Seq(1L, 2L, 4L), s"got ${landed()}")
        assert(q2.exception.isEmpty, s"stream unhealthy: ${q2.exception}")
      } finally q2.stop()
    } finally broker.close()
  }

  test("bounded buffer: past maxBufferedRows the source sheds (QoS-0), never grows unbounded") {
    val spark = SparkSuite.session
    val broker = new MqttBroker()
    try {
      val q = graft.streaming.MqttBridge
        .decode(spark.readStream.format("mqtt-sub")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("topic", graft.streaming.MqttBridge.Topic)
          .option("maxBufferedRows", "5")
          .load())
        .writeStream.format("memory").queryName("mqtt_cap")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("mqtt-cap-ck").toString)
        .start()
      try {
        q.processAllAvailable() // SUBSCRIBE before publish
        val pub = new MqttClient("127.0.0.1", broker.port, "cap-pub")
        // burst 50 messages with the stream idle: at most 5 can buffer
        try (1 to 50).foreach(i => pub.publish(graft.streaming.MqttBridge.Topic,
          s"""{"event_id":$i,"node_id":"S","value":"1","ts_us":$i,"user_id":1}"""
            .getBytes("UTF-8")))
        finally pub.close()
        Thread.sleep(500) // let the burst drain into (or bounce off) the buffer
        q.processAllAvailable()
        val n = spark.table("mqtt_cap").count()
        assert(n >= 1 && n <= 10,
          s"expected a capped admission (1..10 rows for cap 5), got $n")
      } finally q.stop()
    } finally broker.close()
  }

  test("publishBatch sink: every batch row arrives at a live subscriber") {
    val spark = SparkSuite.session
    val broker = new MqttBroker()
    try {
      val got = new ConcurrentLinkedQueue[String]()
      val latch = new CountDownLatch(4)
      val sub = new MqttClient("127.0.0.1", broker.port, "sink-sub")
      try {
        sub.subscribe(graft.streaming.MqttBridge.Topic) { (_, p) =>
          got.add(new String(p, "UTF-8")); latch.countDown()
        }
        import org.apache.spark.sql.functions._
        val batch = spark.range(4).select(
          concat(lit("""{"event_id":"""), col("id"), lit("}")).as("payload"))
        val n = graft.streaming.MqttBridge.publishBatch(batch, "127.0.0.1", broker.port)
        assert(n == 4)
        assert(latch.await(10, TimeUnit.SECONDS), "sink messages not delivered")
        assert(got.asScala.toSeq.sorted ==
          (0 until 4).map(i => s"""{"event_id":$i}""").sorted)
      } finally sub.close()
    } finally broker.close()
  }

  test("publishBatchFromExecutors: multi-partition batch publishes from tasks, nothing via the driver") {
    val spark = SparkSuite.session
    val broker = new MqttBroker()
    try {
      val total = 40
      val got = new ConcurrentLinkedQueue[String]()
      val latch = new CountDownLatch(total)
      val sub = new MqttClient("127.0.0.1", broker.port, "exec-sub")
      try {
        sub.subscribe(graft.streaming.MqttBridge.Topic) { (_, p) =>
          got.add(new String(p, "UTF-8")); latch.countDown()
        }
        import org.apache.spark.sql.functions._
        // 8 partitions — each task opens its own connection; payload
        // prepared in the stream exactly like the driver arm
        val batch = spark.range(total).repartition(8).select(
          concat(lit("""{"event_id":"""), col("id"), lit("}")).as("payload"))
        val n = graft.streaming.MqttBridge
          .publishBatchFromExecutors(batch, "127.0.0.1", broker.port)
        assert(n == total)
        assert(latch.await(15, TimeUnit.SECONDS),
          s"executor-published messages not delivered (${got.size}/$total)")
        assert(got.asScala.toSeq.sorted ==
          (0 until total).map(i => s"""{"event_id":$i}""").sorted)
      } finally sub.close()
    } finally broker.close()
  }

  test("a refused CONNECT surfaces as an error, not a half-connected client") {
    // minimal refusing broker: read the CONNECT, answer CONNACK rc=5
    // (not authorized), as a spec-compliant broker may (MQTT 3.2.2.3)
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val refuser = new Thread(() => {
      try {
        val s = server.accept()
        val in = new DataInputStream(s.getInputStream)
        MqttWire.decode(in) // the CONNECT
        s.getOutputStream.write(MqttWire.encode(MqttWire.Connack(5)))
        s.getOutputStream.flush()
      } catch { case _: Throwable => () }
    })
    refuser.setDaemon(true); refuser.start()
    try {
      val e = intercept[java.io.IOException](
        new MqttClient("127.0.0.1", server.getLocalPort, "refused"))
      assert(e.getMessage.contains("return code 5"))
    } finally server.close()
  }

  test("a throwing subscription callback does not kill the reader: later messages still deliver") {
    val broker = new MqttBroker()
    try {
      val delivered = new ConcurrentLinkedQueue[String]()
      val latch = new CountDownLatch(1)
      val sub = new MqttClient("127.0.0.1", broker.port, "throwing-sub")
      try {
        sub.subscribe("t/poison") { (_, p) =>
          val m = new String(p, "UTF-8")
          if (m == "boom") throw new IllegalStateException("user callback fault")
          delivered.add(m); latch.countDown()
        }
        val pub = new MqttClient("127.0.0.1", broker.port, "throwing-pub")
        try {
          pub.publish("t/poison", "boom".getBytes("UTF-8"))
          pub.publish("t/poison", "after".getBytes("UTF-8"))
        } finally pub.close()
        assert(latch.await(10, TimeUnit.SECONDS),
          "message after a throwing callback was never delivered — reader died")
        assert(delivered.asScala.toSeq == Seq("after"))
      } finally sub.close()
    } finally broker.close()
  }

  test("malformed payloads are dropped at decode; the stream survives them") {
    val spark = SparkSuite.session
    import spark.implicits._
    val broker = new MqttBroker()
    try {
      val q = graft.streaming.MqttBridge
        .decode(graft.streaming.MqttBridge.source(spark, "127.0.0.1", broker.port))
        .writeStream.format("memory").queryName("mqtt_malformed")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("mqtt-mal-ck").toString)
        .start()
      try {
        q.processAllAvailable()
        val pub = new MqttClient("127.0.0.1", broker.port, "mal-pub")
        try {
          // the topic is open: garbage, valid JSON missing node_id, and a
          // real envelope all arrive; only the envelope may survive decode
          pub.publish(graft.streaming.MqttBridge.Topic, "not json at all {{".getBytes("UTF-8"))
          pub.publish(graft.streaming.MqttBridge.Topic, """{"unrelated":true}""".getBytes("UTF-8"))
          pub.publish(graft.streaming.MqttBridge.Topic,
            """{"event_id":9,"node_id":"Status","value":"ok","ts_us":1700000000000000,"user_id":1}"""
              .getBytes("UTF-8"))
        } finally pub.close()
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var n = 0L
        while (n < 1 && System.nanoTime() < deadline) {
          q.processAllAvailable()
          n = spark.table("mqtt_malformed").count()
          if (n < 1) Thread.sleep(50)
        }
        // one more pass so the garbled rows (same micro-batch or earlier)
        // have definitely been through the decode filter
        q.processAllAvailable()
        assert(q.isActive, "a garbled publish killed the streaming query")
        val rows = spark.table("mqtt_malformed")
          .select("event_id", "metric", "value").as[(Long, String, String)].collect().toSeq
        assert(rows == Seq((9L, "Status", "ok")), rows.toString)
      } finally q.stop()
    } finally broker.close()
  }
}
