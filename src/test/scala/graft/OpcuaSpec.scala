package graft

import graft.net.{OpcuaClient, OpcuaServer, OpcuaWire}
import graft.net.OpcuaWire._
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import scala.jdk.CollectionConverters._

/** The engine's own opc.tcp stack (SecurityPolicy#None, anonymous):
  * binary primitive roundtrips, then the reference agent's exact
  * sequence — connect, namespace lookup, browse Objects → PickAndPlace →
  * variables, attribute reads, 500 ms subscription, data-change
  * notifications on writes (opcua_mqtt_agent/main.py:88-130 against
  * opcua_server/main.py:140-268).
  */
class OpcuaSpec extends AnyFunSuite {

  test("binary primitives roundtrip (NodeId shapes, Variant types, DataValue, headers)") {
    val w = new W()
    w.nodeId(NumericId(0, 85))          // two-byte
    w.nodeId(NumericId(0, 2255))        // four-byte
    w.nodeId(NumericId(3, 1000000))     // numeric
    w.nodeId(StringId(1, "PickAndPlace"))
    w.variant(Variant.of(true))
    w.variant(Variant.of(42000.5))
    w.variant(Variant.of("Running"))
    w.variant(Variant(Variant.TUInt16, 4L))
    w.variant(Variant.of(123456789L))
    w.dataValue(DataValue(Some(Variant.of(99.7)), StatusGood, Some(nowTicks())))
    w.dataValue(DataValue(None, StatusBadNodeIdUnknown, None))
    w.str(null); w.str("µ-unicode")
    val r = new R(w.result)
    assert(r.nodeId() == NumericId(0, 85))
    assert(r.nodeId() == NumericId(0, 2255))
    assert(r.nodeId() == NumericId(3, 1000000))
    assert(r.nodeId() == StringId(1, "PickAndPlace"))
    assert(r.variant() == Variant(Variant.TBoolean, true))
    assert(r.variant() == Variant(Variant.TDouble, 42000.5))
    assert(r.variant() == Variant(Variant.TString, "Running"))
    assert(r.variant() == Variant(Variant.TUInt16, 4L))
    assert(r.variant() == Variant(Variant.TUInt64, 123456789L))
    val dv = r.dataValue()
    assert(dv.value.contains(Variant(Variant.TDouble, 99.7)) && dv.sourceTs.isDefined)
    val bad = r.dataValue()
    assert(bad.value.isEmpty && bad.status == StatusBadNodeIdUnknown)
    assert(r.str() == null)
    assert(r.str() == "µ-unicode")
    assert(r.remaining == 0)
  }

  test("DateTime ticks convert to micros on the Unix epoch") {
    val nowMs = System.currentTimeMillis()
    val ticks = nowMs * 10000L + EpochTicks
    assert(ticksToMicros(ticks) == nowMs * 1000L)
  }

  test("agent sequence: namespace lookup, browse to variables, read values") {
    val server = new OpcuaServer()
    try {
      // the PickAndPlace model's mixed-type variables
      // (opcua_server/main.py:159-203)
      server.put("Status", "Running")
      server.put("ActualPlacementRateCPH", 41847.0)
      server.put("QuantityPCBs", 8000)
      server.put("ComponentsPlacedGood", 123456789L)
      val client = new OpcuaClient("127.0.0.1", server.port, server.endpointUrl)
      try {
        val idx = client.namespaceIndex("urn:example:pick-and-place")
        assert(idx == 1, s"namespace index $idx")
        // browse Objects: Server + the model root, exactly like
        // opcua_mqtt_agent/main.py:99-110
        val top = client.browse(NumericId(0, NodeObjectsFolder))
        val root = top.collectFirst {
          case (name, id @ StringId(ns, _), cls)
            if name == "PickAndPlace" && ns == idx && cls == NodeClassObject => id
        }
        assert(root.isDefined, s"PickAndPlace not found in $top")
        val children = client.browse(root.get)
        val varNames = children.collect { case (n, _, OpcuaWire.NodeClassVariable) => n }
        assert(varNames.toSet ==
          Set("Status", "ActualPlacementRateCPH", "QuantityPCBs", "ComponentsPlacedGood"))
        val dv = client.readValue(StringId(idx, "ActualPlacementRateCPH"))
        assert(dv.value.contains(Variant(Variant.TDouble, 41847.0)))
        assert(dv.sourceTs.isDefined)
        val missing = client.readValue(StringId(idx, "NoSuchVariable"))
        assert(missing.status == StatusBadNodeIdUnknown)
      } finally client.close()
    } finally server.close()
  }

  test("subscription: initial values + data changes arrive with source timestamps") {
    val server = new OpcuaServer()
    try {
      server.put("Status", "Running")
      server.put("VacuumPressureKPa", -78.5)
      val client = new OpcuaClient("127.0.0.1", server.port, server.endpointUrl)
      try {
        val got = new ConcurrentLinkedQueue[(String, Any, Option[Long])]()
        val initial = new CountDownLatch(2)
        val changed = new CountDownLatch(3 + 2)
        val subId = client.createSubscription(500.0)
        client.subscribeDataChange(subId, 1, Seq("Status", "VacuumPressureKPa")) {
          (name, v, tsMicros) =>
            got.add((name, v.v, tsMicros))
            initial.countDown(); changed.countDown()
        }
        // asyncua-style initial notification per item
        assert(initial.await(10, TimeUnit.SECONDS), "initial values not delivered")
        // live writes (the server loop's write_value side)
        server.put("Status", "Error")
        server.put("VacuumPressureKPa", -60.25)
        server.put("Status", "Running")
        assert(changed.await(10, TimeUnit.SECONDS),
          s"data changes not delivered: ${got.asScala.toSeq}")
        val seq = got.asScala.toSeq
        val status = seq.collect { case ("Status", v, _) => v }
        assert(status == Seq("Running", "Error", "Running"), s"status order: $status")
        val vac = seq.collect { case ("VacuumPressureKPa", v, _) => v }
        assert(vac == Seq(-78.5, -60.25))
        assert(seq.forall(_._3.exists(_ > 0L)), "source timestamps missing")
      } finally client.close()
    } finally server.close()
  }

  test("opcua-sub DSv2 source: live data changes stream into a DataFrame") {
    val spark = SparkSuite.session
    import spark.implicits._
    val server = new OpcuaServer()
    try {
      server.put("Status", "Running")
      server.put("ActualCycleTimeS", 0.73)
      val q = spark.readStream.format("opcua-sub")
        .option("host", "127.0.0.1").option("port", server.port.toString)
        .option("endpointUrl", server.endpointUrl)
        .option("namespaceUri", "urn:example:pick-and-place")
        .load()
        .writeStream.format("memory").queryName("opcua_live")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("opcua-ck").toString)
        .start()
      try {
        q.processAllAvailable() // forces source construction + subscribe
        server.put("Status", "Error")
        server.put("ActualCycleTimeS", 0.91)
        // 2 initial + 2 live notifications
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var n = 0L
        while (n < 4 && System.nanoTime() < deadline) {
          q.processAllAvailable()
          n = spark.table("opcua_live").count()
          if (n < 4) Thread.sleep(50)
        }
        val rows = spark.table("opcua_live")
          .select("node_id", "value").as[(String, String)].collect().toSeq
        assert(rows.count(_ == ("Status", "Running")) == 1)
        assert(rows.count(_ == ("Status", "Error")) == 1)
        assert(rows.count(_ == ("ActualCycleTimeS", "0.73")) == 1)
        assert(rows.count(_ == ("ActualCycleTimeS", "0.91")) == 1)
        // source timestamps survived the trip as real timestamps
        assert(spark.table("opcua_live").filter($"source_ts".isNotNull).count() == n)
      } finally q.stop()
    } finally server.close()
  }

  test("default timeouts keep the no-loss contract: client abandon > server stale flush") {
    // the quiet-interval no-loss property below holds only while the
    // client's publish timeout exceeds the server's stale threshold —
    // pin the DEFAULTS so a drift in either constant fails here instead
    // of silently reintroducing post-quiet batch loss
    assert(graft.net.OpcuaClient.DefaultPublishTimeoutMs >
      graft.net.OpcuaServer.DefaultStalePublishMs,
      "client publish timeout must exceed the server's stale-publish flush threshold")
  }

  test("quiet interval then data: no notification batch is lost to abandoned publish requests") {
    // the client abandons its outstanding PublishRequest after
    // publishTimeoutMs and re-arms; the server must flush the abandoned
    // ones (stale > stalePublishMs) with keep-alives, or the first data
    // batch after a quiet interval is spent answering a request id nobody
    // awaits — silently dropping every sample in it. Short timeouts make
    // several abandon/re-arm cycles happen in under a second.
    val server = new OpcuaServer(stalePublishMs = 150L)
    try {
      server.put("Counter", 0L)
      val client = new OpcuaClient("127.0.0.1", server.port, server.endpointUrl,
        publishTimeoutMs = 300L)
      try {
        val got = new ConcurrentLinkedQueue[Any]()
        val initial = new CountDownLatch(1)
        val subId = client.createSubscription(500.0)
        client.subscribeDataChange(subId, 1, Seq("Counter")) { (_, v, _) =>
          got.add(v.v); initial.countDown()
        }
        assert(initial.await(10, TimeUnit.SECONDS), "initial value not delivered")
        // quiet: at least 3 abandon/re-arm cycles accumulate server-side
        Thread.sleep(1100)
        server.put("Counter", 1L)
        val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
        while (!got.asScala.toSeq.contains(1L) && System.nanoTime() < deadline)
          Thread.sleep(20)
        assert(got.asScala.toSeq.contains(1L),
          s"post-quiet notification lost to a stale publish request: ${got.asScala.toSeq}")
        // and a second write still flows (the queue was not poisoned)
        server.put("Counter", 2L)
        val deadline2 = System.nanoTime() + 5L * 1000 * 1000 * 1000
        while (!got.asScala.toSeq.contains(2L) && System.nanoTime() < deadline2)
          Thread.sleep(20)
        assert(got.asScala.toSeq.contains(2L), s"follow-up lost: ${got.asScala.toSeq}")
      } finally client.close()
    } finally server.close()
  }

  test("server death marks the client dead and terminates the publish loop") {
    val server = new OpcuaServer()
    val client =
      try {
        server.put("Status", "Running")
        val c = new OpcuaClient("127.0.0.1", server.port, server.endpointUrl)
        val subId = c.createSubscription(500.0)
        c.subscribeDataChange(subId, 1, Seq("Status")) { (_, _, _) => () }
        c
      } catch { case e: Throwable => server.close(); throw e }
    try {
      assert(!client.isDead)
      // kill the server WITHOUT client.close() — the plausible failure for
      // a long-running streaming query holding this client: the reader
      // sees EOF, the publish loop must terminate, not busy-spin retries
      server.close()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!client.isDead && System.nanoTime() < deadline) Thread.sleep(20)
      assert(client.isDead, "client did not notice the dead transport")
      def publishThreads = Thread.getAllStackTraces.keySet.asScala
        .filter(t => t.getName == "opcua-client-publish" && t.isAlive)
      // fresh deadline: the isDead wait above may have consumed most of
      // its own, leaving this loop no budget to watch the thread unwind
      val deadline2 = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (publishThreads.nonEmpty && System.nanoTime() < deadline2) Thread.sleep(20)
      assert(publishThreads.isEmpty, "publish loop still running against a dead socket")
    } finally client.close()
  }

  test("two clients: each sees its own subscription's notifications") {
    val server = new OpcuaServer()
    try {
      server.put("Counter", 0)
      val c1 = new OpcuaClient("127.0.0.1", server.port, server.endpointUrl)
      val c2 = new OpcuaClient("127.0.0.1", server.port, server.endpointUrl)
      try {
        val got1 = new ConcurrentLinkedQueue[Long]()
        val got2 = new ConcurrentLinkedQueue[Long]()
        val l1 = new CountDownLatch(4); val l2 = new CountDownLatch(4)
        val s1 = c1.createSubscription()
        c1.subscribeDataChange(s1, 1, Seq("Counter")) { (_, v, _) =>
          got1.add(v.v.asInstanceOf[Long]); l1.countDown()
        }
        val s2 = c2.createSubscription()
        c2.subscribeDataChange(s2, 1, Seq("Counter")) { (_, v, _) =>
          got2.add(v.v.asInstanceOf[Long]); l2.countDown()
        }
        (1 to 3).foreach(i => server.put("Counter", i))
        assert(l1.await(10, TimeUnit.SECONDS), s"c1 incomplete: ${got1.asScala}")
        assert(l2.await(10, TimeUnit.SECONDS), s"c2 incomplete: ${got2.asScala}")
        assert(got1.asScala.toSeq == Seq(0L, 1L, 2L, 3L))
        assert(got2.asScala.toSeq == Seq(0L, 1L, 2L, 3L))
      } finally { c1.close(); c2.close() }
    } finally server.close()
  }

  test("write service: wire write updates the value, notifies subscribers, rejects unknowns") {
    val server = new OpcuaServer()
    try {
      server.put("Feeder01Count", 150)
      val client = new OpcuaClient("127.0.0.1", server.port, server.endpointUrl)
      try {
        val got = new ConcurrentLinkedQueue[Long]()
        val seen = new CountDownLatch(2) // initial + the write
        val subId = client.createSubscription()
        client.subscribeDataChange(subId, 1, Seq("Feeder01Count")) { (_, v, _) =>
          got.add(v.v.asInstanceOf[Long]); seen.countDown()
        }
        // the manual refill of README Test Scenario 2, over the socket
        val st = client.writeValue(StringId(1, "Feeder01Count"), 1000)
        assert(st == StatusGood, f"write rejected 0x$st%08x")
        val dv = client.readValue(StringId(1, "Feeder01Count"))
        assert(dv.value.contains(Variant(Variant.TUInt32, 1000L)), dv)
        assert(seen.await(10, TimeUnit.SECONDS), s"write not notified: ${got.asScala}")
        assert(got.asScala.toSeq == Seq(150L, 1000L))
        // writes cannot create nodes, and only Value is writable
        assert(client.writeValue(StringId(1, "NoSuchVariable"), 1) == StatusBadNodeIdUnknown)
      } finally client.close()
    } finally server.close()
  }

  test("call service: registered methods browse as Method nodes and dispatch with args") {
    val server = new OpcuaServer()
    try {
      server.put("Status", "Stopped")
      val calls = new ConcurrentLinkedQueue[Seq[Any]]()
      server.method("StartMachine") { args =>
        calls.add(args.map(_.v)); server.put("Status", "Running"); Nil
      }
      server.method("Echo") { args => args } // output arguments roundtrip
      val client = new OpcuaClient("127.0.0.1", server.port, server.endpointUrl)
      try {
        val root = StringId(1, "PickAndPlace")
        val kids = client.browse(root)
        val methodNames = kids.collect { case (n, _, OpcuaWire.NodeClassMethod) => n }
        assert(methodNames.toSet == Set("StartMachine", "Echo"), kids.toString)
        val (st, outs) = client.call(root, StringId(1, "StartMachine"))
        assert(st == StatusGood && outs.isEmpty)
        assert(calls.asScala.toSeq == Seq(Seq()))
        assert(client.readValue(StringId(1, "Status")).value
          .contains(Variant(Variant.TString, "Running")))
        val (st2, outs2) = client.call(root, StringId(1, "Echo"), Seq(7, "x"))
        assert(st2 == StatusGood)
        assert(outs2.map(_.v) == Seq(7L, "x"), outs2.toString)
        // unknown method / unknown object
        assert(client.call(root, StringId(1, "NoSuchMethod"))._1 == StatusBadMethodInvalid)
        assert(client.call(StringId(1, "NotAnObject"), StringId(1, "Echo"))._1 ==
          StatusBadNodeIdUnknown)
      } finally client.close()
    } finally server.close()
  }
}
