package graft.net

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

/** Kafka wire protocol primitives — the broker hop the reference rides
  * (hydration_agent/main.py:54-57 produces JSON envelopes to topic
  * `machine_events`; kafka_db_agent/main.py:50-57 consumes them in group
  * `db-writer-group` with earliest reset + auto-commit). Written from the
  * public Apache Kafka protocol guide the way [[MqttWire]]/[[OpcuaWire]]
  * were written from their specs: big-endian primitives, int16-length
  * strings (-1 null), int32-length bytes (-1 null), int32-count arrays,
  * int32-size-prefixed request/response frames.
  *
  * Scope (deliberate, one version per API so both ends agree by
  * construction): Produce v2 / Fetch v2 over message-set format v1
  * (magic 1: CRC over magic..value, create-time timestamps — predates the
  * v2 record-batch format, still accepted by real brokers), ListOffsets
  * v1, Metadata v0, ApiVersions v0, and the complete classic group
  * coordinator suite — FindCoordinator v0, JoinGroup v0, SyncGroup v0,
  * Heartbeat v0, LeaveGroup v0, OffsetCommit v2, OffsetFetch v1 — plus
  * the "consumer" embedded protocol (subscription metadata + assignment,
  * range assignor) and the default partitioner's murmur2 so keyed
  * envelopes land on the same partition a stock client would pick.
  */
object KafkaWire {

  // ---- api keys (protocol guide) ----
  val ApiProduce = 0
  val ApiFetch = 1
  val ApiListOffsets = 2
  val ApiMetadata = 3
  val ApiOffsetCommit = 8
  val ApiOffsetFetch = 9
  val ApiFindCoordinator = 10
  val ApiJoinGroup = 11
  val ApiHeartbeat = 12
  val ApiLeaveGroup = 13
  val ApiSyncGroup = 14
  val ApiVersionsKey = 18

  /** (apiKey, the single version this subset speaks). */
  val SupportedApis: Seq[(Int, Int)] = Seq(
    ApiProduce -> 2, ApiFetch -> 2, ApiListOffsets -> 1, ApiMetadata -> 0,
    ApiOffsetCommit -> 2, ApiOffsetFetch -> 1, ApiFindCoordinator -> 0,
    ApiJoinGroup -> 0, ApiHeartbeat -> 0, ApiLeaveGroup -> 0,
    ApiSyncGroup -> 0, ApiVersionsKey -> 0)

  // ---- error codes (protocol guide) ----
  val ErrNone = 0
  val ErrOffsetOutOfRange = 1
  val ErrUnknownTopicOrPartition = 3
  val ErrCoordinatorNotAvailable = 15
  val ErrNotCoordinator = 16
  val ErrIllegalGeneration = 22
  val ErrInconsistentGroupProtocol = 23
  val ErrUnknownMemberId = 25
  val ErrInvalidSessionTimeout = 26
  val ErrRebalanceInProgress = 27
  val ErrUnsupportedVersion = 35

  /** ListOffsets sentinel timestamps. */
  val TsLatest = -1L
  val TsEarliest = -2L

  /** One stored record: what message-set v1 carries per message. */
  final case class Record(offset: Long, timestamp: Long,
      key: Array[Byte], value: Array[Byte])

  // ======== big-endian primitive writer over a growable buffer ========

  final class W {
    private var buf = new Array[Byte](256)
    private var n = 0
    private def ensure(k: Int): Unit =
      if (n + k > buf.length) {
        val b2 = new Array[Byte](math.max(buf.length * 2, n + k))
        System.arraycopy(buf, 0, b2, 0, n); buf = b2
      }
    def i8(v: Int): W = { ensure(1); buf(n) = v.toByte; n += 1; this }
    def i16(v: Int): W = { i8((v >>> 8) & 0xff); i8(v & 0xff) }
    def i32(v: Int): W = { i16((v >>> 16) & 0xffff); i16(v & 0xffff) }
    def i64(v: Long): W = { i32((v >>> 32).toInt); i32(v.toInt) }
    def bool(v: Boolean): W = i8(if (v) 1 else 0)
    def str(s: String): W =
      if (s == null) i16(-1)
      else {
        val b = s.getBytes(StandardCharsets.UTF_8)
        require(b.length < Short.MaxValue, "kafka string too long")
        i16(b.length); raw(b)
      }
    def bytes(b: Array[Byte]): W =
      if (b == null) i32(-1) else { i32(b.length); raw(b) }
    def raw(b: Array[Byte]): W = { ensure(b.length); System.arraycopy(b, 0, buf, n, b.length); n += b.length; this }
    def size: Int = n
    /** Patch a previously-written int32 at absolute position `at`. */
    def patchI32(at: Int, v: Int): W = {
      buf(at) = ((v >>> 24) & 0xff).toByte; buf(at + 1) = ((v >>> 16) & 0xff).toByte
      buf(at + 2) = ((v >>> 8) & 0xff).toByte; buf(at + 3) = (v & 0xff).toByte
      this
    }
    def result: Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  // ======== big-endian reader ========

  final class R(buf: Array[Byte], private var p: Int = 0) {
    def i8(): Int = { val v = buf(p); p += 1; v.toInt }
    def u8(): Int = i8() & 0xff
    def i16(): Int = { val v = (u8() << 8) | u8(); (v << 16) >> 16 }
    def i32(): Int = (u8() << 24) | (u8() << 16) | (u8() << 8) | u8()
    def i64(): Long = (i32().toLong << 32) | (i32().toLong & 0xffffffffL)
    def str(): String = {
      val len = i16()
      if (len < 0) null
      else { val s = new String(buf, p, len, StandardCharsets.UTF_8); p += len; s }
    }
    def bytes(): Array[Byte] = {
      val len = i32()
      if (len < 0) null
      else { val b = java.util.Arrays.copyOfRange(buf, p, p + len); p += len; b }
    }
    def raw(len: Int): Array[Byte] = {
      val b = java.util.Arrays.copyOfRange(buf, p, p + len); p += len; b
    }
    def remaining: Int = buf.length - p
    def pos: Int = p
  }

  // ======== framing: int32 size prefix on every request/response ========

  def writeFrame(out: DataOutputStream, body: Array[Byte]): Unit = out.synchronized {
    out.writeInt(body.length)
    out.write(body)
    out.flush()
  }

  /** Blocks for one size-prefixed frame; EOFException on clean close. */
  def readFrame(in: DataInputStream, maxBytes: Int = 1 << 26): Array[Byte] = {
    val size = in.readInt()
    require(size >= 0 && size <= maxBytes, s"kafka frame size $size out of range")
    val body = new Array[Byte](size)
    in.readFully(body)
    body
  }

  // ======== message-set format v1 (magic 1) ========

  /** Message-set bytes for records at consecutive offsets. Per message:
    * offset i64, size i32, crc u32 (IEEE CRC-32 over magic..value), magic
    * i8 = 1, attributes i8 = 0 (no compression), timestamp i64 (create
    * time), key bytes, value bytes.
    */
  def encodeMessageSet(records: Seq[Record]): Array[Byte] = {
    val w = new W
    records.foreach { r =>
      val m = new W
      m.i8(1).i8(0).i64(r.timestamp).bytes(r.key).bytes(r.value)
      val mb = m.result
      val crc = new CRC32
      crc.update(mb)
      w.i64(r.offset).i32(4 + mb.length).i32(crc.getValue.toInt).raw(mb)
    }
    w.result
  }

  /** Decode a message-set, verifying each CRC; a trailing partial message
    * (the protocol allows a broker to truncate at the byte limit) is
    * dropped, matching stock-client behavior.
    */
  def decodeMessageSet(bytes: Array[Byte]): Seq[Record] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    val r = new R(bytes)
    while (r.remaining >= 12) {
      val offset = r.i64()
      val size = r.i32()
      if (size < 0 || size > r.remaining) return out.toSeq // truncated tail
      val body = r.raw(size)
      val br = new R(body)
      val crc = br.i32()
      val check = new CRC32
      check.update(body, 4, body.length - 4)
      require(check.getValue.toInt == crc, s"kafka message CRC mismatch at offset $offset")
      val magic = br.i8()
      require(magic == 1, s"unsupported message magic $magic (subset speaks v1)")
      br.i8() // attributes: no compression in subset
      val ts = br.i64()
      out += Record(offset, ts, br.bytes(), br.bytes())
    }
    out.toSeq
  }

  // ======== embedded "consumer" protocol (range assignor) ========

  /** Subscription metadata a member sends in JoinGroup: version 0,
    * topic list, user data.
    */
  def encodeSubscription(topics: Seq[String]): Array[Byte] = {
    val w = new W
    w.i16(0).i32(topics.length)
    topics.foreach(w.str)
    w.bytes(null)
    w.result
  }

  def decodeSubscription(b: Array[Byte]): Seq[String] = {
    val r = new R(b)
    r.i16() // version
    val n = r.i32()
    (0 until n).map(_ => r.str())
  }

  /** Assignment the leader hands back through SyncGroup: version 0,
    * (topic, partitions) list, user data.
    */
  def encodeAssignment(tps: Seq[(String, Seq[Int])]): Array[Byte] = {
    val w = new W
    w.i16(0).i32(tps.length)
    tps.foreach { case (t, ps) =>
      w.str(t).i32(ps.length)
      ps.foreach(w.i32)
    }
    w.bytes(null)
    w.result
  }

  def decodeAssignment(b: Array[Byte]): Seq[(String, Seq[Int])] = {
    val r = new R(b)
    r.i16() // version
    val n = r.i32()
    (0 until n).map { _ =>
      val t = r.str()
      val k = r.i32()
      (t, (0 until k).map(_ => r.i32()))
    }
  }

  /** Range assignment (the stock default): per topic, sorted partitions
    * chunked over sorted member ids, first members take the remainder —
    * so `db-writer-group` members split `machine_events` exactly the way
    * the reference's kafka-python consumer would.
    */
  def rangeAssign(members: Seq[(String, Seq[String])],
      partitionsOf: String => Int): Map[String, Seq[(String, Seq[Int])]] = {
    val assignment = scala.collection.mutable.Map.empty[String, Vector[(String, Seq[Int])]]
      .withDefaultValue(Vector.empty)
    val byTopic = members.flatMap { case (m, ts) => ts.map(_ -> m) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    byTopic.toSeq.sortBy(_._1).foreach { case (topic, ms) =>
      val nParts = partitionsOf(topic)
      if (nParts > 0 && ms.nonEmpty) {
        val per = nParts / ms.size
        val extra = nParts % ms.size
        var next = 0
        ms.zipWithIndex.foreach { case (m, i) =>
          val take = per + (if (i < extra) 1 else 0)
          if (take > 0) {
            assignment(m) = assignment(m) :+ (topic, (next until next + take): Seq[Int])
            next += take
          }
        }
      }
    }
    members.map { case (m, _) => m -> (assignment(m): Seq[(String, Seq[Int])]) }.toMap
  }

  /** The default partitioner's murmur2 (positive-masked hash mod
    * partition count), so keyed producers here and a stock client
    * interleave onto the same partitions.
    */
  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ data.length
    val n4 = data.length / 4
    var i = 0
    while (i < n4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    (data.length % 4) match {
      case 3 =>
        h ^= (data(4 * n4 + 2) & 0xff) << 16
        h ^= (data(4 * n4 + 1) & 0xff) << 8
        h ^= data(4 * n4) & 0xff
        h *= m
      case 2 =>
        h ^= (data(4 * n4 + 1) & 0xff) << 8
        h ^= data(4 * n4) & 0xff
        h *= m
      case 1 =>
        h ^= data(4 * n4) & 0xff
        h *= m
      case _ => ()
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  def partitionForKey(key: Array[Byte], numPartitions: Int): Int =
    (murmur2(key) & 0x7fffffff) % numPartitions
}
