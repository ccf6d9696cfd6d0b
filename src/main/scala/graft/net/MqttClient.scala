package graft.net

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, Socket}
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** Minimal MQTT 3.1.1 client (QoS 0) for [[MqttBroker]] — the engine-side
  * twin of the reference's paho usage: `publish` mirrors
  * opcua_mqtt_agent/main.py:54-59 (fire-and-forget JSON envelopes),
  * `subscribe` mirrors hydration_agent/main.py:64-71 (callback per
  * message). Blocking CONNECT→CONNACK handshake; one daemon reader thread
  * dispatches inbound PUBLISH packets to the subscription callback.
  */
final class MqttClient(host: String, port: Int, clientId: String) extends AutoCloseable {
  private val socket = new Socket(InetAddress.getByName(host), port)
  socket.setTcpNoDelay(true)
  private val out = new DataOutputStream(socket.getOutputStream)
  private val in = new DataInputStream(socket.getInputStream)

  // per-filter callback map, not a single slot: the broker honors every
  // filter this client ever subscribed, so a second subscribe() must not
  // silently reroute the first filter's messages to the new callback —
  // each inbound PUBLISH dispatches to every filter that matches its topic
  private val callbacks =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Array[Byte]) => Unit]()
  private val connacked = new CountDownLatch(1)
  private val subacked = new java.util.concurrent.ConcurrentHashMap[Integer, CountDownLatch]()
  private val pids = new java.util.concurrent.atomic.AtomicInteger(1)

  @volatile private var connackRc = -1

  private val reader = new Thread(() => {
    try while (true) MqttWire.decode(in) match {
      case MqttWire.Connack(rc) =>
        connackRc = rc
        connacked.countDown()
      case MqttWire.Suback(pid, _) =>
        Option(subacked.remove(Integer.valueOf(pid))).foreach(_.countDown())
      case MqttWire.Publish(topic, payload) =>
        callbacks.forEach { (filter, f) =>
          // a throwing user callback must not kill the reader thread —
          // that would silently stop ALL future deliveries while the
          // client still looks alive (publish() keeps succeeding)
          if (MqttWire.topicMatches(filter, topic))
            try f(topic, payload)
            catch {
              case e: Throwable =>
                System.err.println(
                  s"[mqtt-client-$clientId] subscription callback for '$filter' threw: $e")
            }
        }
      case _ => ()
    } catch { case _: Throwable => () }
  }, s"mqtt-client-$clientId")
  reader.setDaemon(true)
  reader.start()

  send(MqttWire.Connect(clientId))
  require(connacked.await(10, TimeUnit.SECONDS), "CONNACK timeout")
  if (connackRc != 0) {
    close()
    throw new java.io.IOException(s"CONNECT refused: return code $connackRc")
  }

  private def send(p: MqttWire.Packet): Unit =
    out.synchronized { MqttWire.write(out, p) }

  /** QoS-0 publish — returns after the bytes are flushed (at-most-once). */
  def publish(topic: String, payload: Array[Byte]): Unit =
    send(MqttWire.Publish(topic, payload))

  /** Subscribe; `f` runs on the reader thread per inbound message whose
    * topic matches `filter` (a message matching several of this client's
    * filters runs each filter's callback). Blocks until SUBACK so a
    * publish issued after return is routable. Re-subscribing the same
    * filter replaces its callback.
    */
  def subscribe(filter: String)(f: (String, Array[Byte]) => Unit): Unit = {
    callbacks.put(filter, f)
    // packet id 0 is forbidden (MQTT-2.3.1-1): skip it on 16-bit wraparound
    var pid = pids.getAndIncrement() & 0xffff
    while (pid == 0) pid = pids.getAndIncrement() & 0xffff
    val latch = new CountDownLatch(1)
    subacked.put(pid, latch)
    send(MqttWire.Subscribe(pid, Seq(filter)))
    require(latch.await(10, TimeUnit.SECONDS), "SUBACK timeout")
  }

  override def close(): Unit = {
    try send(MqttWire.Disconnect) catch { case _: Throwable => () }
    try socket.close() catch { case _: Throwable => () }
  }
}
