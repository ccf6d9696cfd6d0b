package graft.net

import KafkaWire._

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, Socket}
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable

/** Kafka clients over [[KafkaWire]] — the engine-side twins of the
  * reference's kafka-python usage: [[KafkaProducer]] mirrors
  * hydration_agent/main.py:54-57 (keyed JSON envelopes onto
  * `machine_events`, default murmur2 partitioner), [[KafkaGroupConsumer]]
  * mirrors kafka_db_agent/main.py:50-57 (`group_id='db-writer-group'`,
  * `auto_offset_reset='earliest'`, `enable_auto_commit=True`): join the
  * group, receive a range assignment, resume each partition from its
  * committed offset, heartbeat in the background, rejoin on rebalance,
  * commit processed offsets periodically — at-least-once by construction.
  *
  * [[KafkaCursor]] is the groupless fetch path (metadata + list-offsets +
  * fetch by absolute offset): exactly the contract Spark's own Kafka
  * connector uses, where the ENGINE owns offset tracking in its
  * checkpoint and the broker is a seekable log — that is what makes the
  * source replayable and the pipeline exactly-once with an idempotent
  * sink. [[graft.sources.KafkaSubSource]] rides this one.
  */
private final class KafkaConn(host: String, port: Int, clientId: String)
    extends AutoCloseable {
  private val socket = new Socket(InetAddress.getByName(host), port)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
  private val corr = new AtomicInteger(1)

  /** One blocking request/response round trip (requests on one
    * connection are serial; concurrent users open their own conn).
    */
  def call(apiKey: Int, fill: W => Unit): R = synchronized {
    val id = corr.getAndIncrement()
    val w = new W
    w.i16(apiKey).i16(SupportedApis.toMap.apply(apiKey)).i32(id).str(clientId)
    fill(w)
    writeFrame(out, w.result)
    val r = new R(readFrame(in))
    val got = r.i32()
    require(got == id, s"correlation mismatch: sent $id got $got")
    r
  }

  override def close(): Unit = {
    try socket.close() catch { case _: Throwable => () }
  }
}

private object KafkaConn {
  /** Shared metadata decode: topic -> partition count (errors skipped). */
  def readMetadata(r: R): Map[String, Int] = {
    val nBrokers = r.i32()
    (0 until nBrokers).foreach { _ => r.i32(); r.str(); r.i32() }
    val nTopics = r.i32()
    (0 until nTopics).flatMap { _ =>
      val err = r.i16()
      val name = r.str()
      val nParts = r.i32()
      (0 until nParts).foreach { _ =>
        r.i16(); r.i32(); r.i32()
        val nr = r.i32(); (0 until nr).foreach(_ => r.i32())
        val ni = r.i32(); (0 until ni).foreach(_ => r.i32())
      }
      if (err == ErrNone) Some(name -> nParts) else None
    }.toMap
  }
}

/** Producer: murmur2 key partitioning (round-robin when keyless), one
  * Produce v2 per send batch, acks checked.
  */
final class KafkaProducer(host: String, port: Int,
    clientId: String = "graft-producer") extends AutoCloseable {
  private val conn = new KafkaConn(host, port, clientId)
  private val rr = new AtomicInteger(0)
  private val partitionCounts = mutable.Map.empty[String, Int]

  private def partitionsOf(topic: String): Int =
    synchronized(partitionCounts.getOrElseUpdate(topic, {
      val r = conn.call(ApiMetadata, w => { w.i32(1); w.str(topic) })
      KafkaConn.readMetadata(r).getOrElse(topic,
        throw new IllegalStateException(s"topic $topic has no metadata"))
    }))

  def send(topic: String, key: Array[Byte], value: Array[Byte]): Long =
    sendBatch(topic, Seq((key, value))).head

  /** Batch append; returns the absolute offset of each record. Records
    * are grouped per partition (key hash) and sent in one request.
    */
  def sendBatch(topic: String, kvs: Seq[(Array[Byte], Array[Byte])]): Seq[Long] = {
    val nParts = partitionsOf(topic)
    val now = System.currentTimeMillis()
    val withPart = kvs.map { case (k, v) =>
      val p =
        if (k == null) (rr.getAndIncrement() & 0x7fffffff) % nParts
        else partitionForKey(k, nParts)
      (p, k, v)
    }
    val byPart = withPart.zipWithIndex.groupBy(_._1._1)
    val resultOffsets = new Array[Long](kvs.length)
    val r = conn.call(ApiProduce, w => {
      w.i16(1) // acks: leader
      w.i32(30000)
      w.i32(1).str(topic).i32(byPart.size)
      byPart.toSeq.sortBy(_._1).foreach { case (p, rows) =>
        val set = encodeMessageSet(rows.zipWithIndex.map { case (((_, k, v), _), i) =>
          Record(i.toLong, now, k, v)
        })
        w.i32(p).bytes(set)
      }
    })
    val nTopics = r.i32()
    require(nTopics == 1, s"produce response for $nTopics topics")
    r.str()
    val nP = r.i32()
    val bases = (0 until nP).map { _ =>
      val p = r.i32(); val err = r.i16(); val base = r.i64(); r.i64()
      require(err == ErrNone, s"produce to $topic/$p failed: error $err")
      p -> base
    }.toMap
    byPart.toSeq.sortBy(_._1).foreach { case (p, rows) =>
      rows.zipWithIndex.foreach { case ((_, originalIdx), i) =>
        resultOffsets(originalIdx) = bases(p) + i
      }
    }
    resultOffsets.toSeq
  }

  override def close(): Unit = conn.close()
}

/** One consumed record, offsets absolute per partition. */
final case class ConsumerRecord(topic: String, partition: Int, offset: Long,
    timestamp: Long, key: Array[Byte], value: Array[Byte])

/** Groupless seekable reader — metadata, earliest/latest offsets, fetch
  * from an absolute offset. The engine's DSv2 source uses exactly this
  * (it owns offsets in the streaming checkpoint, like Spark's own
  * connector); also the building block under [[KafkaGroupConsumer]].
  */
final class KafkaCursor(host: String, port: Int,
    clientId: String = "graft-cursor") extends AutoCloseable {
  private val conn = new KafkaConn(host, port, clientId)

  def partitionCount(topic: String): Int = {
    val r = conn.call(ApiMetadata, w => { w.i32(1); w.str(topic) })
    KafkaConn.readMetadata(r).getOrElse(topic, 0)
  }

  /** (earliest, latest) for one partition. */
  def offsets(topic: String, partition: Int): (Long, Long) = {
    def one(ts: Long): Long = {
      val r = conn.call(ApiListOffsets, w => {
        w.i32(-1)
        w.i32(1).str(topic).i32(1).i32(partition).i64(ts)
      })
      val nT = r.i32(); require(nT == 1); r.str()
      val nP = r.i32(); require(nP == 1)
      r.i32()
      val err = r.i16()
      require(err == ErrNone, s"list offsets $topic/$partition: error $err")
      r.i64() // timestamp
      r.i64()
    }
    (one(TsEarliest), one(TsLatest))
  }

  /** Latest offsets for every partition of a topic. */
  def latestOffsets(topic: String): Map[Int, Long] =
    (0 until partitionCount(topic)).map(p => p -> offsets(topic, p)._2).toMap

  /** Fetch from `offset`; `maxWaitMs`>0 long-polls until `minBytes`. */
  def fetch(topic: String, partition: Int, offset: Long,
      maxBytes: Int = 1 << 20, maxWaitMs: Int = 0, minBytes: Int = 1): Seq[ConsumerRecord] = {
    val r = conn.call(ApiFetch, w => {
      w.i32(-1).i32(maxWaitMs).i32(minBytes)
      w.i32(1).str(topic).i32(1).i32(partition).i64(offset).i32(maxBytes)
    })
    r.i32() // throttle
    val nT = r.i32(); require(nT == 1); r.str()
    val nP = r.i32(); require(nP == 1)
    r.i32()
    val err = r.i16()
    r.i64() // high watermark
    val set = r.bytes()
    if (err == ErrOffsetOutOfRange)
      throw new KafkaOffsetOutOfRange(topic, partition, offset)
    require(err == ErrNone, s"fetch $topic/$partition@$offset: error $err")
    decodeMessageSet(set).map(rec =>
      ConsumerRecord(topic, partition, rec.offset, rec.timestamp, rec.key, rec.value))
  }

  override def close(): Unit = conn.close()
}

final class KafkaOffsetOutOfRange(topic: String, partition: Int, offset: Long)
  extends RuntimeException(s"offset $offset out of range for $topic/$partition")

/** Group consumer: the kafka_db_agent contract. `subscribe` joins the
  * group and blocks through the first assignment; `poll` fetches from the
  * assigned partitions, transparently rejoining when the background
  * heartbeat sees a rebalance; processed offsets auto-commit every
  * `autoCommitIntervalMs` (commit carries offset = last processed + 1,
  * the convention committed offsets use). Crash before commit →
  * redelivery from the last commit: at-least-once, exactly like
  * `enable_auto_commit=True` with default interval.
  */
final class KafkaGroupConsumer(host: String, port: Int, groupId: String,
    clientId: String = "graft-consumer",
    sessionTimeoutMs: Int = 10000,
    autoCommitIntervalMs: Long = 1000L) extends AutoCloseable {

  // group/admin traffic rides its own connection so a long-poll fetch on
  // the data connection can never delay a heartbeat past session timeout
  private val coord = new KafkaConn(host, port, clientId)
  private val cursor = new KafkaCursor(host, port, clientId)

  @volatile private var memberId = ""
  @volatile private var generation = -1
  // observability: how many times this consumer re-entered the group
  // after its first join (rebalance discovery, fencing, expiry)
  @volatile private[graft] var rejoins = -1
  @volatile private var assignment: Seq[(String, Seq[Int])] = Seq.empty
  @volatile private var rebalanceNeeded = false
  @volatile private var closed = false
  private var topics: Seq[String] = Seq.empty
  // next offset to fetch per assigned partition
  private val positions = mutable.Map.empty[(String, Int), Long]
  // highest processed+1 not yet committed
  private val pendingCommit = mutable.Map.empty[(String, Int), Long]
  private var lastCommitNanos = System.nanoTime()
  private var heartbeatThread: Thread = null

  def subscribe(ts: Seq[String]): Unit = synchronized {
    topics = ts
    // ensure the topics exist (metadata auto-creates, like the agents'
    // implicit reliance on auto-create in the compose file)
    ts.foreach(cursor.partitionCount)
    joinGroup()
    if (heartbeatThread == null) {
      heartbeatThread = new Thread(() => {
        try while (!closed) {
          Thread.sleep(math.max(200L, sessionTimeoutMs / 10L))
          val err = heartbeat()
          if (err == ErrRebalanceInProgress || err == ErrIllegalGeneration ||
              err == ErrUnknownMemberId) rebalanceNeeded = true
        } catch { case _: InterruptedException => () }
      }, s"kafka-consumer-heartbeat-$groupId")
      heartbeatThread.setDaemon(true)
      heartbeatThread.start()
    }
  }

  def assignedPartitions: Seq[(String, Seq[Int])] = assignment

  private def heartbeat(): Int = {
    val r = coord.call(ApiHeartbeat, w => {
      w.str(groupId).i32(generation).str(memberId)
    })
    r.i16()
  }

  private def joinGroup(): Unit = {
    rejoins += 1
    // commit what we processed under the OLD generation before rejoining
    // (kafka-python does the same in its onPartitionsRevoked path): after
    // the rebalance another member may own our partitions, and an
    // uncommitted tail would be redelivered — correct but wasteful
    commitSync()
    var joined = false
    while (!joined && !closed) {
      val meta = encodeSubscription(topics)
      val r = coord.call(ApiJoinGroup, w => {
        w.str(groupId).i32(sessionTimeoutMs).str(memberId).str("consumer")
        w.i32(1).str("range").bytes(meta)
      })
      val err = r.i16()
      if (err == ErrUnknownMemberId) { memberId = ""; }
      else {
        require(err == ErrNone, s"join group $groupId failed: error $err")
        generation = r.i32()
        r.str() // protocol
        val leader = r.str()
        memberId = r.str()
        val nMembers = r.i32()
        val members = (0 until nMembers).map(_ => (r.str(), r.bytes()))
        val myAssignments: Seq[(String, Array[Byte])] =
          if (memberId == leader) {
            val subs = members.map { case (m, b) => (m, decodeSubscription(b)) }
            val assigned = rangeAssign(subs, cursor.partitionCount)
            members.map { case (m, _) =>
              (m, encodeAssignment(assigned.getOrElse(m, Seq.empty)))
            }
          } else Seq.empty
        val sr = coord.call(ApiSyncGroup, w => {
          w.str(groupId).i32(generation).str(memberId)
          w.i32(myAssignments.length)
          myAssignments.foreach { case (m, a) => w.str(m).bytes(a) }
        })
        val syncErr = sr.i16()
        if (syncErr == ErrRebalanceInProgress || syncErr == ErrIllegalGeneration) ()
        else {
          require(syncErr == ErrNone, s"sync group $groupId failed: error $syncErr")
          assignment = decodeAssignment(sr.bytes())
          seedPositions()
          rebalanceNeeded = false
          joined = true
        }
      }
    }
  }

  /** Resume each assigned partition from its committed offset; none →
    * earliest (the agent's `auto_offset_reset='earliest'`).
    */
  private def seedPositions(): Unit = {
    positions.clear()
    pendingCommit.clear()
    val wants = assignment
    if (wants.isEmpty) return
    val r = coord.call(ApiOffsetFetch, w => {
      w.str(groupId).i32(wants.length)
      wants.foreach { case (t, ps) =>
        w.str(t).i32(ps.length)
        ps.foreach(w.i32)
      }
    })
    val nT = r.i32()
    (0 until nT).foreach { _ =>
      val t = r.str()
      val nP = r.i32()
      (0 until nP).foreach { _ =>
        val p = r.i32(); val off = r.i64(); r.str(); r.i16()
        positions((t, p)) = if (off >= 0) off else cursor.offsets(t, p)._1
      }
    }
  }

  /** Fetch the next batch across assigned partitions. Empty result means
    * no data arrived inside `maxWaitMs`.
    */
  def poll(maxWaitMs: Int = 500, maxBytesPerPartition: Int = 1 << 20): Seq[ConsumerRecord] = {
    if (rebalanceNeeded) synchronized(joinGroup())
    maybeAutoCommit()
    val parts = positions.keys.toSeq.sorted
    if (parts.isEmpty) { Thread.sleep(math.min(maxWaitMs.toLong, 100L)); return Seq.empty }
    val out = mutable.ArrayBuffer.empty[ConsumerRecord]
    // first pass without waiting; if everything is drained, long-poll on
    // the first partition so an idle consumer blocks broker-side instead
    // of spinning
    parts.foreach { case (t, p) =>
      val rs =
        try cursor.fetch(t, p, positions((t, p)), maxBytesPerPartition)
        catch { case _: KafkaOffsetOutOfRange =>
          positions((t, p)) = cursor.offsets(t, p)._1
          Seq.empty
        }
      if (rs.nonEmpty) {
        positions((t, p)) = rs.last.offset + 1
        pendingCommit((t, p)) = rs.last.offset + 1
        out ++= rs
      }
    }
    if (out.isEmpty && maxWaitMs > 0) {
      val (t, p) = parts.head
      val rs =
        try cursor.fetch(t, p, positions((t, p)), maxBytesPerPartition, maxWaitMs)
        catch { case _: KafkaOffsetOutOfRange => Seq.empty }
      if (rs.nonEmpty) {
        positions((t, p)) = rs.last.offset + 1
        pendingCommit((t, p)) = rs.last.offset + 1
        out ++= rs
      }
    }
    out.toSeq
  }

  private def maybeAutoCommit(): Unit =
    if (System.nanoTime() - lastCommitNanos > autoCommitIntervalMs * 1000000L)
      commitSync()

  /** Commit every processed-but-uncommitted offset now. */
  def commitSync(): Unit = synchronized {
    lastCommitNanos = System.nanoTime()
    if (pendingCommit.isEmpty) return
    val byTopic = pendingCommit.toSeq.groupBy(_._1._1)
    val r = coord.call(ApiOffsetCommit, w => {
      w.str(groupId).i32(generation).str(memberId).i64(-1L)
      w.i32(byTopic.size)
      byTopic.foreach { case (t, ps) =>
        w.str(t).i32(ps.length)
        ps.foreach { case ((_, p), off) => w.i32(p).i64(off).str("") }
      }
    })
    var ok = true
    val nT = r.i32()
    (0 until nT).foreach { _ =>
      r.str()
      val nP = r.i32()
      (0 until nP).foreach { _ => r.i32(); if (r.i16() != ErrNone) ok = false }
    }
    // a fenced commit (rebalance raced us) keeps the pending map: the new
    // owner redelivers from the last good commit — at-least-once
    if (ok) pendingCommit.clear()
  }

  /** Test-only crash twin: sever everything — no commit, no LeaveGroup,
    * heartbeats stop. The broker sees exactly what it would see from a
    * killed process: silence, then session expiry (or the next join
    * window dropping the silent member).
    */
  private[graft] def suspendForTest(): Unit = {
    closed = true
    if (heartbeatThread != null) heartbeatThread.interrupt()
    coord.close()
    cursor.close()
  }

  override def close(): Unit = {
    if (closed) return
    closed = true
    try commitSync() catch { case _: Throwable => () }
    if (heartbeatThread != null) heartbeatThread.interrupt()
    try {
      if (memberId.nonEmpty) {
        val r = coord.call(ApiLeaveGroup, w => { w.str(groupId).str(memberId) })
        r.i16()
      }
    } catch { case _: Throwable => () }
    coord.close()
    cursor.close()
  }
}
