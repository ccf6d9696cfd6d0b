package graft.net

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets

/** MQTT 3.1.1 wire codec — the QoS-0 subset the reference's transport
  * actually uses (opcua_mqtt_agent/main.py:54-59 publishes JSON envelopes
  * fire-and-forget; hydration_agent/main.py:64-71 subscribes). Implemented
  * from the public OASIS MQTT 3.1.1 spec (packet type in the high nibble
  * of the first byte, 7-bit-varint remaining length, big-endian
  * length-prefixed UTF-8 strings). Enough protocol for a real loopback
  * broker + client pair: CONNECT/CONNACK, SUBSCRIBE/SUBACK, PUBLISH QoS 0,
  * PINGREQ/PINGRESP, DISCONNECT.
  */
object MqttWire {

  sealed trait Packet
  final case class Connect(clientId: String) extends Packet
  /** rc 0 = accepted; nonzero = the spec's refusal codes (3.2.2.3) — the
    * client must surface a refusal instead of proceeding half-connected.
    */
  final case class Connack(returnCode: Int) extends Packet
  final case class Publish(topic: String, payload: Array[Byte]) extends Packet
  final case class Subscribe(packetId: Int, filters: Seq[String]) extends Packet
  final case class Suback(packetId: Int, granted: Seq[Int]) extends Packet
  case object Pingreq extends Packet
  case object Pingresp extends Packet
  case object Disconnect extends Packet

  /** MQTT topic-filter match: '+' one level, '#' any tail (spec 4.7). */
  def topicMatches(filter: String, topic: String): Boolean = {
    def go(f: List[String], t: List[String]): Boolean = (f, t) match {
      case (List("#"), _)            => true
      case (Nil, Nil)                => true
      case ("+" :: fr, _ :: tr)      => go(fr, tr)
      case (fh :: fr, th :: tr)      => fh == th && go(fr, tr)
      case _                         => false
    }
    go(filter.split("/", -1).toList, topic.split("/", -1).toList)
  }

  private def utf(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    require(b.length < 65536, "MQTT string too long")
    Array[Byte]((b.length >> 8).toByte, (b.length & 0xff).toByte) ++ b
  }

  private def varint(n: Int): Array[Byte] = {
    require(n >= 0 && n <= 268435455, s"remaining length out of range: $n")
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var x = n
    while ({
      val d = x % 128; x /= 128
      out += (if (x > 0) (d | 0x80).toByte else d.toByte)
      x > 0
    }) ()
    out.toArray
  }

  def encode(p: Packet): Array[Byte] = {
    def frame(typeAndFlags: Int, body: Array[Byte]): Array[Byte] =
      Array(typeAndFlags.toByte) ++ varint(body.length) ++ body
    p match {
      case Connect(id) =>
        // protocol name "MQTT", level 4, clean-session flag, keepalive 0
        frame(0x10, utf("MQTT") ++ Array[Byte](4, 0x02, 0, 0) ++ utf(id))
      case Connack(rc) => frame(0x20, Array[Byte](0, rc.toByte))
      case Publish(topic, payload) => frame(0x30, utf(topic) ++ payload)
      case Subscribe(pid, filters) =>
        frame(0x82, Array[Byte]((pid >> 8).toByte, (pid & 0xff).toByte) ++
          filters.flatMap(f => utf(f) :+ 0.toByte))
      case Suback(pid, granted) =>
        frame(0x90, Array[Byte]((pid >> 8).toByte, (pid & 0xff).toByte) ++
          granted.map(_.toByte))
      case Pingreq => frame(0xc0, Array.emptyByteArray)
      case Pingresp => frame(0xd0, Array.emptyByteArray)
      case Disconnect => frame(0xe0, Array.emptyByteArray)
    }
  }

  /** Blocking read of one packet; throws EOFException on clean stream end. */
  def decode(in: DataInputStream): Packet = {
    val first = in.read()
    if (first < 0) throw new EOFException("connection closed")
    var len = 0; var mult = 1; var i = 0
    var more = true
    while (more) {
      val d = in.readUnsignedByte()
      len += (d & 0x7f) * mult
      mult *= 128; i += 1
      require(i <= 4, "malformed remaining length")
      more = (d & 0x80) != 0
    }
    val body = new Array[Byte](len)
    in.readFully(body)
    def str(off: Int): (String, Int) = {
      val n = ((body(off) & 0xff) << 8) | (body(off + 1) & 0xff)
      (new String(body, off + 2, n, StandardCharsets.UTF_8), off + 2 + n)
    }
    (first >> 4) & 0x0f match {
      case 1 =>
        val (_, afterProto) = str(0) // protocol name
        // level byte, flags byte, 2 keepalive bytes precede the client id
        val (cid, _) = str(afterProto + 4)
        Connect(cid)
      case 2 => Connack(body(1) & 0xff)
      case 3 =>
        require((first & 0x06) == 0, "only QoS 0 PUBLISH is supported")
        val (topic, off) = str(0)
        (Publish(topic, java.util.Arrays.copyOfRange(body, off, body.length)))
      case 8 =>
        val pid = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
        var off = 2
        val fs = scala.collection.mutable.ArrayBuffer.empty[String]
        while (off < body.length) {
          val (f, next) = str(off)
          fs += f
          off = next + 1 // skip requested-QoS byte
        }
        Subscribe(pid, fs.toSeq)
      case 9 =>
        val pid = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
        Suback(pid, body.drop(2).map(_.toInt).toSeq)
      case 12 => Pingreq
      case 13 => Pingresp
      case 14 => Disconnect
      case t => throw new IllegalArgumentException(s"unsupported MQTT packet type $t")
    }
  }

  def write(out: DataOutputStream, p: Packet): Unit = {
    out.write(encode(p)); out.flush()
  }
}
