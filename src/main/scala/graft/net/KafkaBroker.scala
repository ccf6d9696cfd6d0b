package graft.net

import KafkaWire._

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Minimal loopback Kafka broker — the partitioned-log hop of the
  * reference topology (docker-compose runs redpanda between
  * hydration_agent and kafka_db_agent; this sandbox has no broker and no
  * client jars, so the engine ships the protocol subset the reference
  * exercises, speaking the real wire format in [[KafkaWire]]). One accept
  * loop, one thread per connection, requests served in order per
  * connection (clients that need concurrency open a second connection,
  * exactly what [[KafkaClient]]'s consumer does for its heartbeat).
  *
  * What it implements faithfully:
  *  - partitioned append-only logs with dense offsets, auto-created
  *    topics (auto.create.topics.enable=true is what the reference's
  *    compose relies on — neither agent creates `machine_events`),
  *  - Produce/Fetch over CRC-checked message-set v1, long-poll fetch
  *    (max_wait/min_bytes), OFFSET_OUT_OF_RANGE on a seek past the end,
  *  - the classic group coordinator: JoinGroup barrier with member-id
  *    assignment and generation bump, leader-computed assignment via
  *    SyncGroup, heartbeat-driven rebalance discovery
  *    (REBALANCE_IN_PROGRESS), session-timeout eviction, LeaveGroup,
  *    per-group committed offsets (OffsetCommit/OffsetFetch) — the
  *    at-least-once resume contract kafka_db_agent/main.py:50-57 rides
  *    (`group_id='db-writer-group'`, `auto_offset_reset='earliest'`,
  *    `enable_auto_commit=True`).
  *
  * Scale role: single node, no replication, in-memory logs — the BROKER
  * is test scaffolding; the protocol semantics (partition parallelism,
  * committed-offset resume, rebalance) are what the engine's streaming
  * paths are written against, and a production deployment swaps in a real
  * cluster behind the same wire contract.
  */
final class KafkaBroker(port0: Int = 0, defaultPartitions: Int = 3,
    rebalanceTimeoutMs: Long = 3000L) extends AutoCloseable {

  private val server = new ServerSocket(port0, 64, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  def host: String = "127.0.0.1"

  // ---- partition logs ----

  private final class PartitionLog {
    private val records = mutable.ArrayBuffer.empty[Record]
    def append(rs: Seq[Record]): Long = {
      val base = synchronized {
        val b = records.size.toLong
        rs.zipWithIndex.foreach { case (r, i) =>
          records += Record(b + i, r.timestamp, r.key, r.value)
        }
        records.size // return value unused; keep the lock scope tight
        b
      }
      dataArrived.synchronized(dataArrived.notifyAll())
      base
    }
    def logEnd: Long = synchronized(records.size.toLong)
    /** Records from `offset`, up to `maxBytes` of encoded payload. */
    def read(offset: Long, maxBytes: Int): Seq[Record] = synchronized {
      var size = 0
      val out = mutable.ArrayBuffer.empty[Record]
      var i = offset.toInt
      while (i < records.size && size < maxBytes) {
        val r = records(i)
        size += 30 + (if (r.key == null) 0 else r.key.length) +
          (if (r.value == null) 0 else r.value.length)
        out += r
        i += 1
      }
      out.toSeq
    }
  }
  /** Global monitor for long-poll fetches: appends to ANY partition wake
    * all waiting fetchers, which re-check their own partitions — simpler
    * than per-partition wait sets and correct (spurious wakeups re-loop).
    */
  private val dataArrived = new Object

  private val topics = new ConcurrentHashMap[String, Array[PartitionLog]]()

  private def topicOrCreate(name: String): Array[PartitionLog] =
    topics.computeIfAbsent(name, _ => Array.fill(defaultPartitions)(new PartitionLog))

  def partitionCount(topic: String): Int =
    Option(topics.get(topic)).map(_.length).getOrElse(0)

  /** Test/bootstrap hook: create a topic with an explicit partition count
    * (compose files do this with redpanda's admin API; the wire subset
    * only auto-creates at `defaultPartitions`).
    */
  def createTopic(name: String, partitions: Int): Unit =
    topics.computeIfAbsent(name, _ => Array.fill(partitions)(new PartitionLog))

  // ---- group coordinator ----

  private final class Member(
      var protocols: Seq[(String, Array[Byte])],
      var sessionTimeoutMs: Long) {
    @volatile var lastSeenNanos: Long = System.nanoTime()
  }

  private final class Group(val id: String) {
    // all monitor-guarded by `this`
    val members = mutable.LinkedHashMap.empty[String, Member]
    var generation = 0
    var leader: String = null
    var protocolName: String = null
    // Empty / PreparingRebalance / CompletingRebalance / Stable
    var state: String = "Empty"
    var joinedThisRound = mutable.Set.empty[String]
    var rebalanceDeadlineNanos = 0L
    val assignments = mutable.Map.empty[String, Array[Byte]]
    val offsets = mutable.Map.empty[(String, Int), Long]
    var memberSeq = 0
  }

  private val groups = new ConcurrentHashMap[String, Group]()
  private def group(id: String): Group = groups.computeIfAbsent(id, new Group(_))

  private def triggerRebalance(g: Group): Unit = {
    // caller holds g's monitor
    if (g.state != "PreparingRebalance") {
      g.state = "PreparingRebalance"
      g.joinedThisRound = mutable.Set.empty
      g.rebalanceDeadlineNanos = System.nanoTime() + rebalanceTimeoutMs * 1000000L
      g.assignments.clear()
      g.notifyAll()
    }
  }

  private def maybeCompleteJoin(g: Group): Unit = {
    // caller holds g's monitor
    if (g.state == "PreparingRebalance" && g.joinedThisRound.nonEmpty &&
        (g.members.keySet.forall(g.joinedThisRound.contains) ||
          System.nanoTime() >= g.rebalanceDeadlineNanos)) {
      // drop members that never rejoined inside the window
      g.members.filterInPlace { case (m, _) => g.joinedThisRound.contains(m) }
      g.generation += 1
      g.leader = g.members.head._1
      // first protocol every member supports (all ours say "range")
      g.protocolName = g.members.head._2.protocols.map(_._1)
        .find(p => g.members.values.forall(_.protocols.exists(_._1 == p)))
        .getOrElse("range")
      g.state = "CompletingRebalance"
      g.notifyAll()
    }
  }

  // session-timeout sweeper: evict silent members, rebalance the rest
  private val sweeper = new Thread(() => {
    try while (!closed) {
      Thread.sleep(200)
      groups.values().asScala.foreach { g =>
        g.synchronized {
          val now = System.nanoTime()
          val dead = g.members.collect {
            case (m, info) if now - info.lastSeenNanos > info.sessionTimeoutMs * 1000000L => m
          }
          if (dead.nonEmpty) {
            dead.foreach(g.members.remove)
            if (g.members.isEmpty) { g.state = "Empty"; g.notifyAll() }
            else triggerRebalance(g)
            maybeCompleteJoin(g)
          } else if (g.state == "PreparingRebalance") maybeCompleteJoin(g)
        }
      }
    } catch { case _: InterruptedException => () }
  }, "kafka-broker-sweeper")
  sweeper.setDaemon(true)
  sweeper.start()

  @volatile private var closed = false
  private val conns = ConcurrentHashMap.newKeySet[Socket]()

  private val acceptor = new Thread(() => {
    try while (!closed) serve(server.accept())
    catch { case _: Throwable if closed => () }
  }, "kafka-broker-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(socket: Socket): Unit = {
    conns.add(socket)
    socket.setTcpNoDelay(true)
    val t = new Thread(() => {
      val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
      try while (!closed) {
        val req = new R(readFrame(in))
        val apiKey = req.i16()
        val apiVersion = req.i16()
        val corr = req.i32()
        req.str() // client id
        val body = handle(apiKey, apiVersion, req)
        val w = new W
        w.i32(corr).raw(body)
        writeFrame(out, w.result)
      } catch { case _: Throwable => () }
      finally {
        conns.remove(socket)
        try socket.close() catch { case _: Throwable => () }
      }
    }, s"kafka-broker-conn-${socket.getPort}")
    t.setDaemon(true)
    t.start()
  }

  private def requireVersion(apiKey: Int, got: Int): Unit = {
    val want = SupportedApis.toMap.apply(apiKey)
    require(got == want, s"api $apiKey version $got unsupported (subset speaks $want)")
  }

  private def handle(apiKey: Int, apiVersion: Int, r: R): Array[Byte] = {
    requireVersion(apiKey, apiVersion)
    apiKey match {
      case ApiVersionsKey => handleApiVersions()
      case ApiMetadata => handleMetadata(r)
      case ApiProduce => handleProduce(r)
      case ApiFetch => handleFetch(r)
      case ApiListOffsets => handleListOffsets(r)
      case ApiFindCoordinator => handleFindCoordinator(r)
      case ApiJoinGroup => handleJoinGroup(r)
      case ApiSyncGroup => handleSyncGroup(r)
      case ApiHeartbeat => handleHeartbeat(r)
      case ApiLeaveGroup => handleLeaveGroup(r)
      case ApiOffsetCommit => handleOffsetCommit(r)
      case ApiOffsetFetch => handleOffsetFetch(r)
      case other => throw new IllegalStateException(s"api $other not in subset")
    }
  }

  private def handleApiVersions(): Array[Byte] = {
    val w = new W
    w.i16(ErrNone).i32(SupportedApis.length)
    SupportedApis.foreach { case (k, v) => w.i16(k).i16(v).i16(v) }
    w.result
  }

  private def handleMetadata(r: R): Array[Byte] = {
    val n = r.i32()
    val requested = (0 until n).map(_ => r.str())
    requested.foreach(topicOrCreate) // auto.create.topics.enable=true
    val names =
      if (requested.nonEmpty) requested else topics.keySet().asScala.toSeq.sorted
    val w = new W
    w.i32(1).i32(0).str(host).i32(port) // one broker: node 0
    w.i32(names.length)
    names.foreach { t =>
      val parts = topics.get(t)
      if (parts == null) w.i16(ErrUnknownTopicOrPartition).str(t).i32(0)
      else {
        w.i16(ErrNone).str(t).i32(parts.length)
        parts.indices.foreach { p =>
          w.i16(ErrNone).i32(p).i32(0) // leader node 0
          w.i32(1).i32(0)              // replicas [0]
          w.i32(1).i32(0)              // isr [0]
        }
      }
    }
    w.result
  }

  private def handleProduce(r: R): Array[Byte] = {
    r.i16() // acks: single node, always answered after the append
    r.i32() // timeout
    val nTopics = r.i32()
    val results = (0 until nTopics).map { _ =>
      val topic = r.str()
      val nParts = r.i32()
      val parts = (0 until nParts).map { _ =>
        val p = r.i32()
        val set = r.bytes()
        val logs = topicOrCreate(topic)
        if (p < 0 || p >= logs.length) (p, ErrUnknownTopicOrPartition, -1L)
        else {
          val base = logs(p).append(decodeMessageSet(set))
          (p, ErrNone, base)
        }
      }
      (topic, parts)
    }
    val w = new W
    w.i32(results.length)
    results.foreach { case (topic, parts) =>
      w.str(topic).i32(parts.length)
      parts.foreach { case (p, err, base) =>
        w.i32(p).i16(err).i64(base).i64(-1L) // log_append_time: create-time
      }
    }
    w.i32(0) // throttle
    w.result
  }

  private def handleFetch(r: R): Array[Byte] = {
    r.i32() // replica id (-1: consumer)
    val maxWaitMs = r.i32()
    val minBytes = r.i32()
    val nTopics = r.i32()
    val wants = (0 until nTopics).map { _ =>
      val topic = r.str()
      val nParts = r.i32()
      (topic, (0 until nParts).map(_ => (r.i32(), r.i64(), r.i32())))
    }
    // long-poll: gather until min_bytes of payload or the wait expires
    val deadline = System.nanoTime() + maxWaitMs.toLong * 1000000L
    def gather(): (Int, Seq[(String, Seq[(Int, Int, Long, Seq[Record])])]) = {
      var bytes = 0
      val res = wants.map { case (topic, parts) =>
        val logs = topics.get(topic)
        (topic, parts.map { case (p, off, maxBytes) =>
          if (logs == null || p < 0 || p >= logs.length)
            (p, ErrUnknownTopicOrPartition, -1L, Seq.empty[Record])
          else {
            val end = logs(p).logEnd
            if (off < 0 || off > end) (p, ErrOffsetOutOfRange, end, Seq.empty[Record])
            else {
              val rs = logs(p).read(off, maxBytes)
              bytes += rs.iterator.map(x =>
                26 + (if (x.key == null) 0 else x.key.length) +
                  (if (x.value == null) 0 else x.value.length)).sum
              (p, ErrNone, end, rs)
            }
          }
        })
      }
      (bytes, res)
    }
    var (bytes, result) = gather()
    while (bytes < minBytes && System.nanoTime() < deadline && !closed) {
      dataArrived.synchronized {
        if (System.nanoTime() < deadline)
          dataArrived.wait(math.max(1L, (deadline - System.nanoTime()) / 1000000L))
      }
      val g = gather(); bytes = g._1; result = g._2
    }
    val w = new W
    w.i32(0) // throttle
    w.i32(result.length)
    result.foreach { case (topic, parts) =>
      w.str(topic).i32(parts.length)
      parts.foreach { case (p, err, hw, rs) =>
        w.i32(p).i16(err).i64(hw).bytes(encodeMessageSet(rs))
      }
    }
    w.result
  }

  private def handleListOffsets(r: R): Array[Byte] = {
    r.i32() // replica id
    val nTopics = r.i32()
    val wants = (0 until nTopics).map { _ =>
      val topic = r.str()
      val nParts = r.i32()
      (topic, (0 until nParts).map(_ => (r.i32(), r.i64())))
    }
    val w = new W
    w.i32(wants.length)
    wants.foreach { case (topic, parts) =>
      w.str(topic).i32(parts.length)
      val logs = topics.get(topic)
      parts.foreach { case (p, ts) =>
        if (logs == null || p < 0 || p >= logs.length)
          w.i32(p).i16(ErrUnknownTopicOrPartition).i64(-1L).i64(-1L)
        else {
          val off = if (ts == TsEarliest) 0L else logs(p).logEnd
          w.i32(p).i16(ErrNone).i64(-1L).i64(off)
        }
      }
    }
    w.result
  }

  private def handleFindCoordinator(r: R): Array[Byte] = {
    r.str() // group id — single node coordinates every group
    val w = new W
    w.i16(ErrNone).i32(0).str(host).i32(port)
    w.result
  }

  private def handleJoinGroup(r: R): Array[Byte] = {
    val groupId = r.str()
    val sessionTimeoutMs = r.i32()
    val memberIdIn = r.str()
    val protocolType = r.str()
    val nProtocols = r.i32()
    val protocols = (0 until nProtocols).map(_ => (r.str(), r.bytes()))

    def errResp(err: Int): Array[Byte] = {
      val w = new W
      w.i16(err).i32(-1).str("").str("").str(memberIdIn).i32(0)
      w.result
    }
    if (protocolType != "consumer") return errResp(ErrInconsistentGroupProtocol)
    if (sessionTimeoutMs < 100) return errResp(ErrInvalidSessionTimeout)

    val g = group(groupId)
    val (memberId, generation, leader, protoName, memberList) = g.synchronized {
      val mid =
        if (memberIdIn == null || memberIdIn.isEmpty) {
          g.memberSeq += 1
          s"graft-$groupId-${g.memberSeq}"
        } else if (!g.members.contains(memberIdIn) && g.state != "Empty" &&
            g.state != "PreparingRebalance") {
          return errResp(ErrUnknownMemberId)
        } else memberIdIn
      val m = g.members.getOrElseUpdate(mid, new Member(protocols, sessionTimeoutMs))
      m.protocols = protocols
      m.sessionTimeoutMs = sessionTimeoutMs
      m.lastSeenNanos = System.nanoTime()
      triggerRebalance(g)
      g.joinedThisRound += mid
      maybeCompleteJoin(g)
      val joinedGen = g.generation
      while (g.state == "PreparingRebalance" && !closed) {
        maybeCompleteJoin(g)
        if (g.state == "PreparingRebalance") g.wait(50)
      }
      m.lastSeenNanos = System.nanoTime()
      if (!g.members.contains(mid)) return errResp(ErrUnknownMemberId)
      require(g.generation > joinedGen || g.state != "Empty",
        s"join completed without a generation bump in $groupId")
      val members: Seq[(String, Array[Byte])] =
        if (g.leader == mid)
          g.members.toSeq.map { case (id, info) =>
            (id, info.protocols.collectFirst {
              case (n, meta) if n == g.protocolName => meta
            }.getOrElse(Array.emptyByteArray))
          }
        else Seq.empty
      (mid, g.generation, g.leader, g.protocolName, members)
    }
    val w = new W
    w.i16(ErrNone).i32(generation).str(protoName).str(leader).str(memberId)
    w.i32(memberList.length)
    memberList.foreach { case (id, meta) => w.str(id).bytes(meta) }
    w.result
  }

  private def handleSyncGroup(r: R): Array[Byte] = {
    val groupId = r.str()
    val generation = r.i32()
    val memberId = r.str()
    val n = r.i32()
    val assignments = (0 until n).map(_ => (r.str(), r.bytes()))

    def resp(err: Int, assignment: Array[Byte]): Array[Byte] = {
      val w = new W
      w.i16(err).bytes(if (assignment == null) Array.emptyByteArray else assignment)
      w.result
    }
    val g = groups.get(groupId)
    if (g == null) return resp(ErrUnknownMemberId, null)
    g.synchronized {
      if (!g.members.contains(memberId)) return resp(ErrUnknownMemberId, null)
      if (generation != g.generation) return resp(ErrIllegalGeneration, null)
      if (g.state == "PreparingRebalance") return resp(ErrRebalanceInProgress, null)
      if (memberId == g.leader && g.state == "CompletingRebalance") {
        assignments.foreach { case (m, a) => g.assignments(m) = a }
        g.state = "Stable"
        g.notifyAll()
      }
      while (g.state == "CompletingRebalance" && generation == g.generation && !closed)
        g.wait(50)
      if (generation != g.generation || g.state == "PreparingRebalance")
        return resp(ErrRebalanceInProgress, null)
      g.members.get(memberId).foreach(_.lastSeenNanos = System.nanoTime())
      resp(ErrNone, g.assignments.getOrElse(memberId, Array.emptyByteArray))
    }
  }

  private def handleHeartbeat(r: R): Array[Byte] = {
    val groupId = r.str()
    val generation = r.i32()
    val memberId = r.str()
    val err = {
      val g = groups.get(groupId)
      if (g == null) ErrUnknownMemberId
      else g.synchronized {
        if (!g.members.contains(memberId)) ErrUnknownMemberId
        else if (generation != g.generation) ErrIllegalGeneration
        else if (g.state == "PreparingRebalance") ErrRebalanceInProgress
        else {
          g.members(memberId).lastSeenNanos = System.nanoTime()
          ErrNone
        }
      }
    }
    new W().i16(err).result
  }

  private def handleLeaveGroup(r: R): Array[Byte] = {
    val groupId = r.str()
    val memberId = r.str()
    val err = {
      val g = groups.get(groupId)
      if (g == null) ErrUnknownMemberId
      else g.synchronized {
        if (!g.members.contains(memberId)) ErrUnknownMemberId
        else {
          g.members.remove(memberId)
          g.joinedThisRound -= memberId
          if (g.members.isEmpty) { g.state = "Empty"; g.notifyAll() }
          else { triggerRebalance(g); maybeCompleteJoin(g) }
          ErrNone
        }
      }
    }
    new W().i16(err).result
  }

  private def handleOffsetCommit(r: R): Array[Byte] = {
    val groupId = r.str()
    val generation = r.i32()
    val memberId = r.str()
    r.i64() // retention time
    val nTopics = r.i32()
    val wants = (0 until nTopics).map { _ =>
      val topic = r.str()
      val nParts = r.i32()
      (topic, (0 until nParts).map { _ =>
        val p = r.i32(); val off = r.i64(); r.str(); (p, off)
      })
    }
    val g = group(groupId)
    // fencing check AND offsets write under ONE monitor hold: with the
    // check in its own block, a rebalance fencing the member between the
    // two blocks would still let the stale commit land — the exact
    // zombie-commit-after-rebalance the check exists to reject
    val err = g.synchronized {
      // generation -1 is the simple-consumer path (no group membership);
      // a generational commit must come from a live member of the current
      // generation — a zombie's commit after a rebalance is REJECTED, the
      // exact fencing that keeps redelivery at-least-once instead of lost
      val e =
        if (generation == -1) ErrNone
        else if (!g.members.contains(memberId)) ErrUnknownMemberId
        else if (generation != g.generation) ErrIllegalGeneration
        else if (g.state == "PreparingRebalance") ErrRebalanceInProgress
        else ErrNone
      if (e == ErrNone) wants.foreach { case (topic, parts) =>
        parts.foreach { case (p, off) => g.offsets((topic, p)) = off }
      }
      e
    }
    val w = new W
    w.i32(wants.length)
    wants.foreach { case (topic, parts) =>
      w.str(topic).i32(parts.length)
      parts.foreach { case (p, _) => w.i32(p).i16(err) }
    }
    w.result
  }

  private def handleOffsetFetch(r: R): Array[Byte] = {
    val groupId = r.str()
    val nTopics = r.i32()
    val wants = (0 until nTopics).map { _ =>
      val topic = r.str()
      val nParts = r.i32()
      (topic, (0 until nParts).map(_ => r.i32()))
    }
    val g = groups.get(groupId)
    val w = new W
    w.i32(wants.length)
    wants.foreach { case (topic, parts) =>
      w.str(topic).i32(parts.length)
      parts.foreach { p =>
        val off =
          if (g == null) -1L
          else g.synchronized(g.offsets.getOrElse((topic, p), -1L))
        w.i32(p).i64(off).str("").i16(ErrNone)
      }
    }
    w.result
  }

  /** Test observability: committed offset for (group, topic, partition),
    * -1 when none.
    */
  def committedOffset(groupId: String, topic: String, partition: Int): Long = {
    val g = groups.get(groupId)
    if (g == null) -1L else g.synchronized(g.offsets.getOrElse((topic, partition), -1L))
  }

  def logEndOffset(topic: String, partition: Int): Long = {
    val logs = topics.get(topic)
    if (logs == null || partition >= logs.length) -1L else logs(partition).logEnd
  }

  override def close(): Unit = {
    closed = true
    groups.values().asScala.foreach(g => g.synchronized(g.notifyAll()))
    dataArrived.synchronized(dataArrived.notifyAll())
    try server.close() catch { case _: Throwable => () }
    conns.asScala.foreach(s => try s.close() catch { case _: Throwable => () })
    sweeper.interrupt()
  }
}
