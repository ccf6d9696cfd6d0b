package graft.net

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Minimal loopback MQTT 3.1.1 broker (QoS 0) — the missing transport leg
  * of the reference topology (docker-compose runs eclipse-mosquitto between
  * opcua_mqtt_agent and hydration_agent; this sandbox has no broker and no
  * client libs, so the engine ships its own). One accept loop, one thread
  * per connection, topic-filter routing with '+'/'#' wildcards, QoS-0
  * at-most-once delivery — precisely the semantics the reference relies on
  * (paho publish + subscribe with default QoS 0).
  *
  * Scale role: the broker is an INGESTION-EDGE component, not a data-plane
  * one — a production deployment bridges MQTT into Kafka (the repo's
  * KafkaBridge models that hop) and Spark consumes the partitioned log.
  * The broker therefore stays deliberately simple: no persistence, no
  * retained messages, no QoS 1/2 resend state.
  */
final class MqttBroker(port0: Int = 0) extends AutoCloseable {
  private val server = new ServerSocket(port0, 64, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort

  private final class Conn(val socket: Socket) {
    val out = new DataOutputStream(socket.getOutputStream)
    @volatile var filters: Set[String] = Set.empty
    def send(p: MqttWire.Packet): Unit =
      out.synchronized { MqttWire.write(out, p) } // serialize concurrent routes
  }

  private val conns = ConcurrentHashMap.newKeySet[Conn]()
  @volatile private var closed = false

  private val acceptor = new Thread(() => {
    try while (!closed) handle(server.accept())
    catch { case _: Throwable if closed => () }
  }, "mqtt-broker-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(socket: Socket): Unit = {
    val conn = new Conn(socket)
    conns.add(conn)
    val t = new Thread(() => {
      val in = new DataInputStream(socket.getInputStream)
      try {
        while (!closed) MqttWire.decode(in) match {
          case MqttWire.Connect(_) => conn.send(MqttWire.Connack(0))
          case MqttWire.Subscribe(pid, fs) =>
            conn.filters ++= fs
            conn.send(MqttWire.Suback(pid, fs.map(_ => 0)))
          case MqttWire.Publish(topic, payload) =>
            // QoS-0 fan-out to every matching subscription; a dead
            // subscriber is dropped, never retried (at-most-once)
            conns.iterator().asScala.foreach { c =>
              if (c.filters.exists(MqttWire.topicMatches(_, topic)))
                try c.send(MqttWire.Publish(topic, payload))
                catch { case _: Throwable => drop(c) }
            }
          case MqttWire.Pingreq => conn.send(MqttWire.Pingresp)
          case MqttWire.Disconnect => throw new EOFException("client disconnect")
          case _ => () // client-bound packet types are ignored server-side
        }
      } catch { case _: Throwable => () }
      finally drop(conn)
    }, s"mqtt-broker-conn-${socket.getPort}")
    t.setDaemon(true)
    t.start()
  }

  private def drop(c: Conn): Unit = {
    conns.remove(c)
    try c.socket.close() catch { case _: Throwable => () }
  }

  override def close(): Unit = {
    closed = true
    try server.close() catch { case _: Throwable => () }
    conns.iterator().asScala.foreach(drop)
  }
}
