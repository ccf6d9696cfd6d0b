package graft

import graft.net.{RespClient, RespServer}
import org.scalatest.funsuite.AnyFunSuite

/** The engine's RESP (Redis-protocol) stack and the live-KV enrichment
  * variant — the reference's per-message context lookups
  * (hydration_agent/main.py:73-74) against a real server.
  */
class RespSpec extends AnyFunSuite {

  test("RESP client/server: ping, set/get, missing key, overwrite") {
    val server = new RespServer()
    try {
      val c = new RespClient("127.0.0.1", server.port)
      try {
        assert(c.ping())
        assert(c.get("absent").isEmpty)
        c.set("context:operator", "Alice")
        assert(c.get("context:operator").contains("Alice"))
        c.set("context:operator", "Bob")
        assert(c.get("context:operator").contains("Bob"))
        server.put("context:last_maintenance", "2025-10-01")
        assert(c.get("context:last_maintenance").contains("2025-10-01"))
      } finally c.close()
    } finally server.close()
  }

  test("concurrent clients: 8 connections interleaving set/get stay isolated and lossless") {
    val server = new RespServer()
    try {
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          try {
            val c = new RespClient("127.0.0.1", server.port)
            try (0 until 50).foreach { i =>
              c.set(s"k-$t-$i", s"v-$t-$i")
              assert(c.get(s"k-$t-$i").contains(s"v-$t-$i"))
            } finally c.close()
          } catch { case e: Throwable => errs.add(e) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(30000))
      // an expired join leaves the thread running: that is a hang, not a
      // pass — without this check a wedged client would fall through with
      // errs empty and keep mutating state under later tests
      assert(threads.forall(!_.isAlive), "a client thread hung past the join timeout")
      assert(errs.isEmpty, s"concurrent client failures: ${errs.peek()}")
      // every key visible afterwards through a fresh connection
      val check = new RespClient("127.0.0.1", server.port)
      try (0 until 8).foreach(t =>
        assert(check.get(s"k-$t-49").contains(s"v-$t-49")))
      finally check.close()
    } finally server.close()
  }

  test("mapPartitions enrichment: every row sees the live context, one connection per partition") {
    val spark = SparkSuite.session
    import org.apache.spark.sql.functions._
    val server = new RespServer()
    try {
      server.put("context:operator", "Alice")
      server.put("context:last_maintenance", "2025-10-01")
      val events = Tables.events(spark, "/root/testdata/sf0.001")
        .select(col("event_id"), col("event_type")).repartition(4)
      val enriched = graft.ops.DataflowOps.enrichViaKv(events, "127.0.0.1", server.port)
      val n = events.count()
      // every row carries the CURRENT context values
      assert(enriched.filter(col("operator") === "Alice" &&
        col("last_maintenance") === "2025-10-01").count() == n)
      // mutate the KV, re-run: rows see the NEW value — the property the
      // broadcast-join path cannot provide mid-stream
      server.put("context:operator", "Bob")
      assert(graft.ops.DataflowOps.enrichViaKv(events, "127.0.0.1", server.port)
        .filter(col("operator") === "Bob").count() == n)
    } finally server.close()
  }
}
