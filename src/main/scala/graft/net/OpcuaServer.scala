package graft.net

import OpcuaWire._

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Minimal loopback OPC UA server (opc.tcp, SecurityPolicy#None,
  * anonymous) — the engine-side stand-in for the reference's asyncua
  * PickAndPlace server (opcua_server/main.py:140-210): one object node
  * under Objects holding Variable children, a registered namespace URI,
  * and 500 ms-class subscriptions that emit data-change notifications
  * when a variable's value is written. Speaks the real binary protocol
  * via [[OpcuaWire]]; [[OpcuaClient]] (and any spec-subset-compatible
  * client) connects over an actual TCP socket.
  *
  * Service subset: OpenSecureChannel (None), CreateSession /
  * ActivateSession (loosely validated — this is a loopback fixture, not
  * an auth boundary), Browse (forward references of Objects and the
  * model root), Read (NamespaceArray, BrowseName, NodeClass, Value),
  * CreateSubscription, CreateMonitoredItems (Value attribute),
  * Publish (held until a notification is queued; a queued PublishRequest
  * older than `stalePublishMs` is answered with an EMPTY keep-alive
  * response the next time the publish queue is touched — see below),
  * CloseSession / CloseSecureChannel. Everything else answers
  * ServiceFault Bad_ServiceUnsupported.
  *
  * Why stale requests must be flushed: [[OpcuaClient]]'s publish loop
  * abandons its outstanding PublishRequest after a 15 s quiet interval
  * and re-arms with a fresh one. If the server kept the abandoned request
  * queued forever, the NEXT data batch would be spent answering that
  * dead request id — the client drops the frame (nothing awaits it) and
  * the entire notification batch is silently lost, one batch per
  * accumulated stale request. Flushing anything older than
  * `stalePublishMs` (< the client's 15 s) guarantees a data response only
  * ever goes to a request the client is still awaiting; the keep-alives
  * sent to abandoned ids are dropped harmlessly.
  */
final class OpcuaServer(
    namespaceUri: String = "urn:example:pick-and-place",
    rootName: String = "PickAndPlace",
    port0: Int = 0,
    stalePublishMs: Long = OpcuaServer.DefaultStalePublishMs) extends AutoCloseable {

  private val server = new ServerSocket(port0, 16, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  def endpointUrl: String = s"opc.tcp://127.0.0.1:$port/pnp/"

  /** Registered namespaces: 0 is the UA namespace, 1 the model's. */
  private val namespaces = Array("http://opcfoundation.org/UA/", namespaceUri)
  val modelNs = 1

  // address space: insertion-ordered variables of the root object
  private final class Var(val name: String, @volatile var value: Variant,
      @volatile var sourceTsTicks: Long)
  private val vars = new java.util.LinkedHashMap[String, Var]()
  private val varsLock = new Object

  @volatile private var closed = false
  private val conns = ConcurrentHashMap.newKeySet[Socket]()

  /** Add/update a variable; an update queues a data-change notification
    * on every monitored item watching it (the `write_value` side of the
    * reference's update loop, opcua_server/main.py:234-268).
    */
  def put(name: String, value: Any): Unit =
    putVariant(name, Variant.of(value), nowTicks())

  /** [[put]] with an explicit variant + source timestamp — the shared
    * update path for server-side writers AND the Write service (which
    * carries the client's DataValue, possibly with its own sourceTs).
    */
  def putVariant(name: String, v: Variant, ts: Long): Unit = {
    varsLock.synchronized {
      val existing = vars.get(name)
      if (existing == null) vars.put(name, new Var(name, v, ts))
      else { existing.value = v; existing.sourceTsTicks = ts }
    }
    subs.forEach((_, sub) => sub.onWrite(name, v, ts))
  }

  /** Current value of a variable (server-side read — the method handlers'
    * `read_value` twin; None when absent).
    */
  def get(name: String): Option[Variant] =
    varsLock.synchronized(Option(vars.get(name)).map(_.value))

  // registered methods of the root object — the server-side twin of the
  // reference's `add_method(ua.NodeId(name, idx), name, fn, [], [])`
  // surface (opcua_server/main.py:155,205-210). Handlers run on the
  // connection's request thread; they may call put()/get().
  private val methods = new java.util.LinkedHashMap[String, Seq[Variant] => Seq[Variant]]()
  private val methodsLock = new Object

  /** Register `name` as a callable method of the root object. */
  def method(name: String)(handler: Seq[Variant] => Seq[Variant]): Unit =
    methodsLock.synchronized { methods.put(name, handler); () }

  def methodNames: Seq[String] = methodsLock.synchronized {
    import scala.jdk.CollectionConverters._
    methods.keySet().asScala.toSeq
  }

  private def methodHandler(name: String): Option[Seq[Variant] => Seq[Variant]] =
    methodsLock.synchronized(Option(methods.get(name)))

  def names: Seq[String] = varsLock.synchronized {
    import scala.jdk.CollectionConverters._
    vars.keySet().asScala.toSeq
  }

  // ---- subscriptions (shared across the server; ids are global) ----
  private val subIds = new AtomicLong(1)
  private val itemIds = new AtomicLong(1)
  private final case class Item(itemId: Long, clientHandle: Long, varName: String)
  private final class Sub(val id: Long, val conn: Conn) {
    val items = new ConcurrentHashMap[Long, Item]()
    val queue = new java.util.ArrayDeque[(Long, Variant, Long)]() // (clientHandle, v, ts)
    var nextSeq = 1L
    def onWrite(name: String, v: Variant, ts: Long): Unit = {
      items.forEach { (_, it) =>
        if (it.varName == name) queue.synchronized { queue.add((it.clientHandle, v, ts)) }
      }
      conn.pumpPublish()
    }
  }
  private val subs = new ConcurrentHashMap[Long, Sub]()

  private val acceptor = new Thread(() => {
    try while (!closed) new Conn(server.accept()).start()
    catch { case _: Throwable if closed => () }
  }, "opcua-server-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = {
    closed = true
    try server.close() catch { case _: Throwable => () }
    conns.forEach(s => try s.close() catch { case _: Throwable => () })
    conns.clear()
  }

  /** One client connection: secure channel + session + publish queue. */
  private final class Conn(socket: Socket) {
    socket.setTcpNoDelay(true)
    private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
    private val channelId = 1L
    private val tokenId = 1L
    private val sessionToken = NumericId(1, 424242L)
    // publish backlog: requests we owe responses to
    // (handle, seqHdr reqId, enqueued-at millis — for the stale flush)
    private val pendingPublishes = new java.util.ArrayDeque[(Long, Long, Long)]()
    // secure-channel sequence counter. Guarded by writeLock: replies are
    // written from two thread families (the connection's handler thread
    // and writer threads via put() → onWrite → pumpPublish), and the spec
    // requires sequence numbers to be strictly increasing IN WIRE ORDER —
    // allocating the number and writing the frame must be one atomic
    // step, or a strict client drops the channel on a sequence error.
    private var seq = 1L
    private val writeLock = new Object

    def start(): Unit = {
      conns.add(socket)
      val t = new Thread(() => {
        try loop()
        catch { case _: Throwable => () }
        finally {
          conns.remove(socket)
          subs.forEach((id, s) => if (s.conn eq this) subs.remove(id))
          try socket.close() catch { case _: Throwable => () }
        }
      }, s"opcua-server-conn-${socket.getPort}")
      t.setDaemon(true)
      t.start()
    }

    private def loop(): Unit = {
      while (!closed) {
        val f = readFrame(in)
        f.tpe match {
          case "HEL" => writeFrame(out, "ACK", ackBody())
          case "OPN" => handleOpen(f.body)
          case "MSG" => handleMsg(f.body)
          case "CLO" => return
          case other => throw new IllegalStateException(s"unexpected $other")
        }
      }
    }

    private def handleOpen(body: Array[Byte]): Unit = {
      val r = new R(body)
      r.u32() // secureChannelId (0 on open)
      val policy = r.str()
      require(policy == SecurityPolicyNone, s"security policy $policy unsupported")
      r.bytes(); r.bytes() // sender cert, receiver thumbprint (null for None)
      r.u32(); val reqId = r.u32() // sequence header
      val tid = r.nodeId()
      require(tid == NumericId(0, IdOpenSecureChannelRequest), s"OPN carried $tid")
      val (_, handle) = r.requestHeader()
      // remainder (protocol version, request type, mode, nonce, lifetime)
      // is accepted as-is: one channel, one token, no renewal in subset
      writeLock.synchronized {
        val w = new W()
        w.u32(channelId).str(SecurityPolicyNone).bytes(null).bytes(null)
        w.u32(nextSeq()).u32(reqId)
        w.nodeId(NumericId(0, IdOpenSecureChannelResponse))
        w.responseHeader(handle, StatusGood)
        w.u32(0L) // server protocol version
        w.u32(channelId).u32(tokenId).i64(nowTicks()).u32(3600000L)
        w.bytes(Array[Byte](0)) // server nonce
        writeFrame(out, "OPN", w.result)
      }
    }

    // call only while holding writeLock
    private def nextSeq(): Long = { val s = seq; seq += 1; s }

    /** Symmetric header + sequence header; returns (reqId, typeId, reader). */
    private def openMsg(body: Array[Byte]): (Long, Long, R) = {
      val r = new R(body)
      r.u32(); r.u32() // channel id, token id
      r.u32(); val reqId = r.u32()
      val tid = r.nodeId() match {
        case NumericId(0, id) => id
        case other => throw new IllegalArgumentException(s"service $other")
      }
      (reqId, tid, r)
    }

    private def reply(reqId: Long, typeId: Int)(fill: W => Unit): Unit =
      writeLock.synchronized {
        val w = new W()
        w.u32(channelId).u32(tokenId)
        w.u32(nextSeq()).u32(reqId)
        w.nodeId(NumericId(0, typeId))
        fill(w)
        writeFrame(out, "MSG", w.result)
      }

    private def handleMsg(body: Array[Byte]): Unit = {
      val (reqId, tid, r) = openMsg(body)
      tid match {
        case IdCreateSessionRequest =>
          val (_, handle) = r.requestHeader()
          reply(reqId, IdCreateSessionResponse) { w =>
            w.responseHeader(handle, StatusGood)
            w.nodeId(NumericId(1, 424241L)) // session id
            w.nodeId(sessionToken)
            w.f64(3600000.0)
            w.bytes(Array[Byte](0)) // server nonce
            w.bytes(null)           // server certificate
            w.i32(0)                // serverEndpoints: empty
            w.i32(0)                // serverSoftwareCertificates: empty
            w.str(null); w.bytes(null) // serverSignature
            w.u32(1L << 24)
          }
        case IdActivateSessionRequest =>
          val (tok, handle) = r.requestHeader()
          require(tok == sessionToken, "unknown session token")
          reply(reqId, IdActivateSessionResponse) { w =>
            w.responseHeader(handle, StatusGood)
            w.bytes(Array[Byte](0)) // server nonce
            w.i32(0); w.i32(0)      // results, diagnostics
          }
        case IdCloseSessionRequest =>
          val (_, handle) = r.requestHeader()
          reply(reqId, IdCloseSessionResponse)(_.responseHeader(handle, StatusGood))
        case IdBrowseRequest => handleBrowse(reqId, r)
        case IdReadRequest => handleRead(reqId, r)
        case IdWriteRequest => handleWrite(reqId, r)
        case IdCallRequest => handleCall(reqId, r)
        case IdCreateSubscriptionRequest =>
          val (_, handle) = r.requestHeader()
          val interval = r.f64()
          val sub = new Sub(subIds.getAndIncrement(), this)
          subs.put(sub.id, sub)
          reply(reqId, IdCreateSubscriptionResponse) { w =>
            w.responseHeader(handle, StatusGood)
            w.u32(sub.id).f64(math.max(interval, 100.0)).u32(10000L).u32(3L)
          }
        case IdCreateMonitoredItemsRequest => handleCreateItems(reqId, r)
        case IdPublishRequest =>
          val (_, handle) = r.requestHeader()
          pendingPublishes.synchronized {
            pendingPublishes.add((handle, reqId, System.currentTimeMillis()))
          }
          pumpPublish()
        case other =>
          val (_, handle) = r.requestHeader()
          reply(reqId, IdServiceFault)(_.responseHeader(handle, StatusBadServiceUnsupported))
          System.err.println(s"[opcua-server] unsupported service $other")
      }
    }

    private def handleBrowse(reqId: Long, r: R): Unit = {
      val (_, handle) = r.requestHeader()
      r.nodeId(); r.i64(); r.u32() // view description
      r.u32() // requestedMaxReferencesPerNode
      val n = r.i32()
      val targets = (0 until n).map { _ =>
        val node = r.nodeId()
        r.u32() // browse direction
        r.nodeId() // reference type
        r.bool() // include subtypes
        r.u32(); r.u32() // node class mask, result mask
        node
      }
      reply(reqId, IdBrowseResponse) { w =>
        w.responseHeader(handle, StatusGood)
        w.i32(targets.length)
        targets.foreach { node =>
          val refs: Seq[(NodeId, String, Int, Long)] = node match {
            // Objects folder -> Server + the model root object
            case NumericId(0, NodeObjectsFolder) => Seq(
              (NumericId(0, NodeServer), "Server", 0, NodeClassObject),
              (StringId(modelNs, rootName), rootName, modelNs, NodeClassObject))
            // model root -> its variables (the agent's second browse,
            // opcua_mqtt_agent/main.py:113-121) + its registered methods
            // (the reference's interactive surface, main.py:155,205-210)
            case StringId(ns, `rootName`) if ns == modelNs =>
              names.map(nm => (StringId(modelNs, nm), nm, modelNs, NodeClassVariable)) ++
                methodNames.map(nm => (StringId(modelNs, nm), nm, modelNs, NodeClassMethod))
            case _ => Seq.empty
          }
          w.u32(StatusGood)
          w.bytes(null) // continuation point
          w.i32(refs.length)
          refs.foreach { case (id, name, ns, cls) =>
            w.nodeId(NumericId(0, 35L)) // Organizes reference
            w.bool(true)
            w.expanded(id)
            w.qualifiedName(ns, name)
            w.localized(name)
            w.u32(cls)
            // type definition: BaseObjectType / BaseDataVariableType;
            // methods have none (null NodeId)
            w.expanded(NumericId(0,
              if (cls == NodeClassObject) 58L
              else if (cls == NodeClassMethod) 0L
              else 62L))
          }
        }
        w.i32(0) // diagnostics
      }
    }

    private def handleRead(reqId: Long, r: R): Unit = {
      val (_, handle) = r.requestHeader()
      r.f64() // maxAge
      r.u32() // timestampsToReturn
      val n = r.i32()
      val reads = (0 until n).map { _ =>
        val node = r.nodeId()
        val attr = r.u32()
        r.str() // index range
        r.qualifiedName() // data encoding
        (node, attr)
      }
      reply(reqId, IdReadResponse) { w =>
        w.responseHeader(handle, StatusGood)
        w.i32(reads.length)
        reads.foreach { case (node, attr) => writeAttr(w, node, attr) }
        w.i32(0)
      }
    }

    /** Write service (spec Part 4 §5.10.4) — Value attribute of existing
      * model variables only: the reference's manual-intervention surface
      * (a feeder refill written from UaExpert, README.md Test Scenario 2).
      * A write lands through [[putVariant]], so it queues data-change
      * notifications exactly like a server-side update; the client's
      * sourceTs is honored when present. Writes cannot CREATE nodes
      * (BadNodeIdUnknown) and only the Value attribute is writable.
      */
    private def handleWrite(reqId: Long, r: R): Unit = {
      val (_, handle) = r.requestHeader()
      val n = r.i32()
      val writes = (0 until n).map { _ =>
        val node = r.nodeId()
        val attr = r.u32()
        r.str() // index range
        val dv = r.dataValue()
        (node, attr, dv)
      }
      val results = writes.map { case (node, attr, dv) =>
        if (attr != AttrValue) StatusBadAttributeIdInvalid
        else node match {
          case StringId(ns, nm) if ns == modelNs &&
              varsLock.synchronized(vars.containsKey(nm)) =>
            dv.value match {
              case Some(v) =>
                putVariant(nm, v, dv.sourceTs.getOrElse(nowTicks()))
                StatusGood
              case None => StatusBadTypeMismatch
            }
          case _ => StatusBadNodeIdUnknown
        }
      }
      reply(reqId, IdWriteResponse) { w =>
        w.responseHeader(handle, StatusGood)
        w.i32(results.length)
        results.foreach(w.u32)
        w.i32(0) // diagnostics
      }
    }

    /** Call service (spec Part 4 §5.11.2) — methods registered on the
      * root object ([[OpcuaServer.method]]), the wire twin of asyncua's
      * `call_method` driving the reference's SimulateError /
      * AcknowledgeAlarms / Start/Stop/maintenance loop
      * (opcua_server/main.py:155,205-210; README Test Scenarios 1-4).
      * A handler exception maps to BadMethodInvalid rather than killing
      * the connection; unknown object → BadNodeIdUnknown.
      */
    private def handleCall(reqId: Long, r: R): Unit = {
      val (_, handle) = r.requestHeader()
      val n = r.i32()
      val calls = (0 until math.max(n, 0)).map { _ =>
        val obj = r.nodeId()
        val mid = r.nodeId()
        val nArgs = r.i32()
        val args = (0 until math.max(nArgs, 0)).map(_ => r.variant())
        (obj, mid, args)
      }
      val results: Seq[(Long, Seq[Variant])] = calls.map { case (obj, mid, args) =>
        val objOk = obj == StringId(modelNs, rootName)
        val h = mid match {
          case StringId(ns, nm) if ns == modelNs => methodHandler(nm)
          case _ => None
        }
        if (!objOk) (StatusBadNodeIdUnknown, Seq.empty[Variant])
        else h match {
          case Some(fn) =>
            try (StatusGood, fn(args))
            // NonFatal only: a handler bug maps to BadMethodInvalid, but
            // InterruptedException / VM errors must propagate (swallowing
            // them would clear interrupt status on the connection thread)
            catch {
              case scala.util.control.NonFatal(_) =>
                (StatusBadMethodInvalid, Seq.empty[Variant])
            }
          case None => (StatusBadMethodInvalid, Seq.empty[Variant])
        }
      }
      reply(reqId, IdCallResponse) { w =>
        w.responseHeader(handle, StatusGood)
        w.i32(results.length)
        results.foreach { case (st, outs) =>
          w.u32(st)
          w.i32(0) // inputArgumentResults: empty
          w.i32(0) // inputArgumentDiagnosticInfos: empty
          w.i32(outs.length)
          outs.foreach(w.variant)
        }
        w.i32(0) // diagnostics
      }
    }

    private def writeAttr(w: W, node: NodeId, attr: Long): Unit = (node, attr) match {
      case (NumericId(0, NodeServerNamespaceArray), AttrValue) =>
        // String[] variant: type String with array bit
        val mask = 0x80 | Variant.TString
        w.u8(0x01) // DataValue: value only
        w.u8(mask).i32(namespaces.length)
        namespaces.foreach(w.str)
      case (StringId(ns, name), AttrValue) if ns == modelNs =>
        val v = varsLock.synchronized(vars.get(name))
        if (v == null) w.dataValue(DataValue(None, StatusBadNodeIdUnknown, None))
        else w.dataValue(DataValue(Some(v.value), StatusGood, Some(v.sourceTsTicks)))
      case (StringId(ns, name), AttrBrowseName) if ns == modelNs =>
        w.u8(0x01).u8(20 /* QualifiedName */).qualifiedName(modelNs, name)
      case (StringId(ns, name), AttrNodeClass) if ns == modelNs =>
        val cls = if (name == rootName) NodeClassObject
          else if (varsLock.synchronized(vars.containsKey(name))) NodeClassVariable
          else -1L
        if (cls < 0) w.dataValue(DataValue(None, StatusBadNodeIdUnknown, None))
        else { w.u8(0x01).u8(6 /* Int32 */).i32(cls.toInt) }
      case _ =>
        w.dataValue(DataValue(None, StatusBadAttributeIdInvalid, None))
    }

    private def handleCreateItems(reqId: Long, r: R): Unit = {
      val (_, handle) = r.requestHeader()
      val subId = r.u32()
      r.u32() // timestampsToReturn
      val n = r.i32()
      val sub = subs.get(subId)
      val created = (0 until n).map { _ =>
        val node = r.nodeId()
        val attr = r.u32()
        r.str(); r.qualifiedName() // index range, data encoding
        r.u32() // monitoring mode
        val clientHandle = r.u32()
        r.f64() // sampling interval
        r.ext() // filter
        r.u32(); r.bool() // queue size, discardOldest
        (node, attr, clientHandle)
      }
      reply(reqId, IdCreateMonitoredItemsResponse) { w =>
        w.responseHeader(handle, StatusGood)
        w.i32(created.length)
        created.foreach { case (node, attr, clientHandle) =>
          val ok = sub != null && attr == AttrValue && (node match {
            case StringId(ns, nm) if ns == modelNs =>
              varsLock.synchronized(vars.containsKey(nm))
            case _ => false
          })
          if (ok) {
            val StringId(_, nm) = node: @unchecked
            val it = Item(itemIds.getAndIncrement(), clientHandle, nm)
            sub.items.put(it.itemId, it)
            // initial value notification (asyncua delivers one on
            // subscribe; the agent relies on it for the first sample)
            val v = varsLock.synchronized(vars.get(nm))
            sub.queue.synchronized { sub.queue.add((clientHandle, v.value, v.sourceTsTicks)) }
            w.u32(StatusGood).u32(it.itemId).f64(500.0).u32(100L)
            w.extNull()
          } else {
            w.u32(StatusBadNodeIdUnknown).u32(0L).f64(0.0).u32(0L)
            w.extNull()
          }
        }
        w.i32(0)
      }
      pumpPublish()
    }

    /** Answer abandoned PublishRequests (older than `stalePublishMs`) with
      * empty keep-alive responses — the class doc explains why data must
      * never be spent on them.
      */
    private def flushStalePublishes(): Unit = {
      val cutoff = System.currentTimeMillis() - stalePublishMs
      var stale = List.empty[(Long, Long)]
      pendingPublishes.synchronized {
        while (!pendingPublishes.isEmpty && pendingPublishes.peek()._3 < cutoff) {
          val (h, rid, _) = pendingPublishes.poll()
          stale = (h, rid) :: stale
        }
      }
      stale.reverse.foreach { case (h, rid) => replyKeepAlive(h, rid) }
    }

    /** Empty PublishResponse: zero notifications, current sequence number
      * un-advanced — the subset's keep-alive shape ([[OpcuaClient]]'s
      * publish loop parses it as a no-op and re-arms).
      */
    private def replyKeepAlive(handle: Long, reqId: Long): Unit = {
      var sub: Sub = null
      subs.forEach((_, s) => if (sub == null && (s.conn eq this)) sub = s)
      val (sid, seqNo) = if (sub == null) (0L, 1L) else (sub.id, sub.nextSeq)
      reply(reqId, IdPublishResponse) { w =>
        w.responseHeader(handle, StatusGood)
        w.u32(sid)
        w.i32(0)       // availableSequenceNumbers: empty
        w.bool(false)  // moreNotifications
        w.u32(seqNo).i64(nowTicks())
        w.i32(0)       // zero notifications — keep-alive
        w.i32(0); w.i32(0) // results, diagnostics
      }
    }

    /** Answer one pending PublishRequest if any subscription of this
      * connection has queued notifications.
      */
    def pumpPublish(): Unit = this.synchronized {
      flushStalePublishes()
      val (handle, reqId, _) = pendingPublishes.synchronized {
        if (pendingPublishes.isEmpty) return
        pendingPublishes.peek()
      }
      // find a sub of this conn with data
      var target: Sub = null
      subs.forEach((_, s) => if (target == null && (s.conn eq this) &&
        s.queue.synchronized(!s.queue.isEmpty)) target = s)
      if (target == null) return
      pendingPublishes.synchronized(pendingPublishes.poll())
      val batch = target.queue.synchronized {
        val b = Vector.newBuilder[(Long, Variant, Long)]
        while (!target.queue.isEmpty) b += target.queue.poll()
        b.result()
      }
      val seqNo = target.nextSeq
      target.nextSeq += 1
      // DataChangeNotification body (ExtensionObject payload)
      val dcn = new W()
      dcn.i32(batch.length)
      batch.foreach { case (clientHandle, v, ts) =>
        dcn.u32(clientHandle)
        dcn.dataValue(DataValue(Some(v), StatusGood, Some(ts)))
      }
      dcn.i32(0) // diagnostics
      reply(reqId, IdPublishResponse) { w =>
        w.responseHeader(handle, StatusGood)
        w.u32(target.id)
        w.i32(0)       // availableSequenceNumbers: empty
        w.bool(false)  // moreNotifications
        w.u32(seqNo).i64(nowTicks())
        w.i32(1)       // one notification ExtensionObject
        w.ext(IdDataChangeNotification, dcn.result)
        w.i32(0); w.i32(0) // results, diagnostics
      }
    }
  }
}

object OpcuaServer {
  /** Default age past which a queued PublishRequest is flushed with a
    * keep-alive. Must stay SHORTER than the paired client's publish
    * timeout ([[OpcuaClient.DefaultPublishTimeoutMs]]) — OpcuaSpec pins
    * the relationship; see the class doc for why violating it loses
    * notification batches after quiet intervals.
    */
  val DefaultStalePublishMs: Long = 10000L
}
