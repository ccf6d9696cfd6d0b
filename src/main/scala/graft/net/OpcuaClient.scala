package graft.net

import OpcuaWire._

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, Socket}
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Minimal opc.tcp client (SecurityPolicy#None, anonymous) — the
  * engine-side twin of the reference agent's asyncua usage
  * (opcua_mqtt_agent/main.py:88-130): connect, read the namespace array
  * to find the model namespace, browse Objects for the root object,
  * browse its Variable children, then a 500 ms subscription whose
  * data-change notifications drive the downstream publish. One socket,
  * blocking request/response; a daemon publish-loop thread keeps a
  * PublishRequest outstanding and dispatches notifications to the
  * registered callback (the paho-style handler the reference wraps in
  * `SubscriptionHandler.datachange_notification`).
  *
  * `publishTimeoutMs` is how long the publish loop waits on its
  * outstanding PublishRequest before abandoning it and re-arming (the
  * quiet-interval path). It must stay LONGER than the server's stale
  * flush threshold ([[OpcuaServer]]'s `stalePublishMs`) so an abandoned
  * request is already flushed (keep-alive) before the server could spend
  * a data batch on it.
  */
final class OpcuaClient(host: String, port: Int,
    endpointUrl: String,
    publishTimeoutMs: Long = OpcuaClient.DefaultPublishTimeoutMs)
  extends AutoCloseable {

  private val socket = new Socket(InetAddress.getByName(host), port)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))

  private val reqIds = new AtomicLong(1)
  private val handles = new AtomicLong(1)
  private val clientHandles = new AtomicLong(1)
  // reqId -> response body latch
  private final class Pending { val latch = new CountDownLatch(1); @volatile var body: R = _ }
  private val pending = new ConcurrentHashMap[Long, Pending]()
  @volatile private var channelId = 0L
  @volatile private var tokenId = 0L
  @volatile private var authToken: NodeId = NumericId(0, 0)
  @volatile private var closed = false
  // set when the transport is known broken (reader thread exited, or a
  // send failed) — every in-flight and future await fails fast, and the
  // publish loop terminates instead of retrying against a dead socket
  @volatile private var deadFlag = false

  /** True once the transport failed or the reader thread exited; the
    * client cannot recover (no reconnect in the subset) — callers should
    * close() and rebuild.
    */
  def isDead: Boolean = deadFlag || closed

  /** clientHandle -> (variable name, callback). */
  private val watches =
    new ConcurrentHashMap[Long, (String, (String, Variant, Option[Long]) => Unit)]()

  // ---- reader thread: dispatches OPN/MSG responses by request id ----
  private val reader = new Thread(() => {
    try while (!closed) {
      val f = readFrame(in)
      f.tpe match {
        case "ACK" =>
          val p = pending.remove(0L)
          if (p != null) { p.body = new R(f.body); p.latch.countDown() }
        case "OPN" | "MSG" =>
          val r = new R(f.body)
          r.u32() // channel id
          if (f.tpe == "OPN") { r.str(); r.bytes(); r.bytes() } else r.u32()
          r.u32() // sequence number
          val reqId = r.u32()
          val p = pending.remove(reqId)
          if (p != null) { p.body = r; p.latch.countDown() }
        case "ERR" =>
          deadFlag = true
          pending.forEach((_, p) => p.latch.countDown())
        case _ => ()
      }
    } catch {
      case _: Throwable =>
        deadFlag = true
        pending.forEach((_, p) => p.latch.countDown())
    }
  }, "opcua-client-reader")
  reader.setDaemon(true)
  reader.start()

  // ---- handshake: HEL/ACK, OPN, CreateSession, ActivateSession ----
  // a failed handshake must not leak the socket + reader thread: close
  // before rethrowing (the caller never gets a reference to close)
  try {
    val ackWait = new Pending
    pending.put(0L, ackWait)
    writeFrame(out, "HEL", helloBody(endpointUrl))
    require(ackWait.latch.await(10, TimeUnit.SECONDS) && ackWait.body != null, "ACK timeout")

    val opnId = reqIds.getAndIncrement()
    val opn = new W()
    opn.u32(0L).str(SecurityPolicyNone).bytes(null).bytes(null)
    opn.u32(1L).u32(opnId)
    opn.nodeId(NumericId(0, IdOpenSecureChannelRequest))
    opn.requestHeader(NumericId(0, 0), handles.getAndIncrement())
    opn.u32(0L)      // client protocol version
    opn.u32(0L)      // request type: Issue
    opn.u32(1L)      // security mode: None
    opn.bytes(null)  // client nonce
    opn.u32(3600000L)
    val opnResp = await(opnId, () => writeFrame(out, "OPN", opn.result))
    require(opnResp.nodeId() == NumericId(0, IdOpenSecureChannelResponse),
      "OPN response carried the wrong service")
    val (_, opnStatus) = opnResp.responseHeader()
    require(opnStatus == StatusGood, f"OpenSecureChannel failed: 0x$opnStatus%08x")
    opnResp.u32() // server protocol version
    channelId = opnResp.u32()
    tokenId = opnResp.u32()

    val createResp = serviceChecked(IdCreateSessionRequest, IdCreateSessionResponse) { w =>
      // client ApplicationDescription
      w.str("urn:graft:client").str("urn:graft")
      w.localized("graft").u32(1L) // ApplicationType Client
      w.str(null).str(null).i32(0)
      w.str(null)             // serverUri
      w.str(endpointUrl)
      w.str("graft-session")
      w.bytes(Array[Byte](0)) // client nonce
      w.bytes(null)           // client certificate
      w.f64(3600000.0)
      w.u32(1L << 24)
    }
    createResp.nodeId() // session id
    authToken = createResp.nodeId()

    serviceChecked(IdActivateSessionRequest, IdActivateSessionResponse) { w =>
      w.str(null); w.bytes(null) // client signature
      w.i32(0)                   // software certificates
      w.i32(0)                   // locale ids
      // anonymous identity token (policy id from the None endpoint)
      val tok = new W().str("anonymous")
      w.ext(IdAnonymousIdentityToken, tok.result)
      w.str(null); w.bytes(null) // user token signature
    }
  } catch {
    case e: Throwable =>
      closed = true
      try socket.close() catch { case _: Throwable => () }
      throw e
  }

  private def await(reqId: Long, send: () => Unit,
      timeoutMs: Long = 15000L): R = {
    // fail fast on a known-dead transport: a fresh request would otherwise
    // block the full timeout (the reader only counts down entries present
    // when it died), and a half-closed socket can still accept the write
    if (isDead) throw new java.io.IOException("opc.tcp client is dead")
    val p = new Pending
    pending.put(reqId, p)
    // the entry is normally removed by the reader thread on the matching
    // response; remove it here too so a send failure or await timeout
    // cannot leak it into the map for the life of the client
    try {
      send()
      if (!p.latch.await(timeoutMs, TimeUnit.MILLISECONDS))
        throw new java.util.concurrent.TimeoutException(
          s"opc.tcp response timeout (reqId $reqId)")
      if (p.body == null) {
        // counted down without a body: the reader died or saw ERR
        if (isDead) throw new java.io.IOException("opc.tcp transport failed mid-request")
        else throw new java.util.concurrent.TimeoutException(
          s"opc.tcp response aborted (reqId $reqId)")
      }
      p.body
    } finally pending.remove(reqId)
  }

  /** Send one service request in a MSG frame; returns the body reader
    * positioned AFTER the response header (status checked, fault thrown).
    */
  private def service(typeId: Int, timeoutMs: Long = 15000L)(fill: W => Unit): R = {
    val reqId = reqIds.getAndIncrement()
    val w = new W()
    w.u32(channelId).u32(tokenId)
    w.u32(reqId).u32(reqId) // sequence number tracks reqId in the subset
    w.nodeId(NumericId(0, typeId))
    w.requestHeader(authToken, handles.getAndIncrement())
    fill(w)
    await(reqId, () => writeFrame(out, "MSG", w.result), timeoutMs)
  }

  /** The response's service NodeId + header, validated. */
  private def serviceChecked(typeId: Int, expectResponse: Int,
      timeoutMs: Long = 15000L)(fill: W => Unit): R = {
    val r = service(typeId, timeoutMs)(fill)
    val tid = r.nodeId() match {
      case NumericId(0, id) => id
      case other => throw new IllegalStateException(s"service response $other")
    }
    val (_, status) = r.responseHeader()
    if (tid == IdServiceFault || status != StatusGood)
      throw new IllegalStateException(f"service $typeId failed: 0x$status%08x (response $tid)")
    require(tid == expectResponse, s"expected $expectResponse got $tid")
    r
  }

  /** Namespace index of `uri` from Server_NamespaceArray — the agent's
    * `get_namespace_index` (opcua_mqtt_agent/main.py:96).
    */
  def namespaceIndex(uri: String): Int = {
    val r = serviceChecked(IdReadRequest, IdReadResponse) { w =>
      w.f64(0.0).u32(0L)
      w.i32(1)
      w.nodeId(NumericId(0, NodeServerNamespaceArray))
      w.u32(AttrValue)
      w.str(null)
      w.qualifiedName(0, null)
    }
    val n = r.i32()
    require(n == 1, s"expected 1 read result, got $n")
    val mask = r.u8()
    require((mask & 0x01) != 0, "NamespaceArray read returned no value")
    val enc = r.u8()
    require(enc == (0x80 | Variant.TString), s"NamespaceArray variant enc $enc")
    val len = r.i32()
    val arr = (0 until len).map(_ => r.str())
    arr.indexOf(uri)
  }

  /** Forward references of a node: (browseName, nodeId, nodeClass). */
  def browse(node: NodeId): Seq[(String, NodeId, Long)] = {
    val r = serviceChecked(IdBrowseRequest, IdBrowseResponse) { w =>
      w.nodeId(NumericId(0, 0)); w.i64(0L); w.u32(0L) // view
      w.u32(0L) // max refs per node
      w.i32(1)
      w.nodeId(node)
      w.u32(0L)               // BrowseDirection Forward
      w.nodeId(NumericId(0, 33L)) // HierarchicalReferences
      w.bool(true)
      w.u32(0L)               // all node classes
      w.u32(0x3fL)            // full result mask
    }
    val nResults = r.i32()
    require(nResults == 1, s"expected 1 browse result, got $nResults")
    val status = r.u32()
    require(status == StatusGood, f"browse failed 0x$status%08x")
    r.bytes() // continuation point
    val nRefs = r.i32()
    (0 until nRefs).map { _ =>
      r.nodeId() // reference type
      r.bool()   // isForward
      val target = r.expanded()
      val (_, name) = r.qualifiedName()
      r.localized()
      val cls = r.u32()
      r.expanded() // type definition
      (name, target, cls)
    }
  }

  /** Read the Value attribute of one node. */
  def readValue(node: NodeId): DataValue = {
    val r = serviceChecked(IdReadRequest, IdReadResponse) { w =>
      w.f64(0.0).u32(0L)
      w.i32(1)
      w.nodeId(node); w.u32(AttrValue); w.str(null); w.qualifiedName(0, null)
    }
    val n = r.i32()
    require(n == 1, s"expected 1 read result, got $n")
    r.dataValue()
  }

  /** Write the Value attribute of one node — the reference's manual
    * intervention path (a feeder refill from UaExpert, README.md Test
    * Scenario 2). Returns the per-node status code (StatusGood on
    * success); the overall service result is validated by
    * [[serviceChecked]].
    */
  def writeValue(node: NodeId, value: Any): Long = {
    val r = serviceChecked(IdWriteRequest, IdWriteResponse) { w =>
      w.i32(1)
      w.nodeId(node); w.u32(AttrValue); w.str(null)
      w.dataValue(DataValue(Some(Variant.of(value)), StatusGood, None))
    }
    val n = r.i32()
    require(n == 1, s"expected 1 write result, got $n")
    r.u32()
  }

  /** Call one method of an object node (asyncua's
    * `obj.call_method(method_id, *args)` — the reference's interactive
    * SimulateError / AcknowledgeAlarms / Start/Stop surface,
    * opcua_server/main.py:155,205-210). Returns (statusCode,
    * outputArguments); StatusGood means the handler ran.
    */
  def call(objectId: NodeId, methodId: NodeId, args: Seq[Any] = Nil): (Long, Seq[Variant]) = {
    val r = serviceChecked(IdCallRequest, IdCallResponse) { w =>
      w.i32(1)
      w.nodeId(objectId)
      w.nodeId(methodId)
      w.i32(args.length)
      args.foreach(a => w.variant(Variant.of(a)))
    }
    val n = r.i32()
    require(n == 1, s"expected 1 call result, got $n")
    val status = r.u32()
    val nIn = r.i32()
    (0 until math.max(nIn, 0)).foreach(_ => r.u32())
    val nDiag = r.i32()
    require(nDiag <= 0, "unexpected input-argument diagnostics")
    val nOut = r.i32()
    val outs = (0 until math.max(nOut, 0)).map(_ => r.variant())
    (status, outs)
  }

  /** Create a subscription; returns its id
    * (`client.create_subscription(500, handler)`,
    * opcua_mqtt_agent/main.py:127).
    */
  def createSubscription(publishingIntervalMs: Double = 500.0): Long = {
    val r = serviceChecked(IdCreateSubscriptionRequest, IdCreateSubscriptionResponse) { w =>
      w.f64(publishingIntervalMs)
      w.u32(10000L) // requested lifetime count
      w.u32(10L)    // max keep-alive count
      w.u32(0L)     // max notifications per publish (0 = unlimited)
      w.bool(true)  // publishing enabled
      w.u8(0)       // priority
    }
    val subId = r.u32()
    // keep a publish request outstanding from now on
    publishLoop()
    subId
  }

  /** Monitor the Value attribute of string-id variables; `f(name, value,
    * sourceTsMicros)` runs on the publish thread per data change
    * (`sub.subscribe_data_change(nodes)`, opcua_mqtt_agent/main.py:128).
    * `sourceTsMicros` is None when the DataValue carried no source
    * timestamp — callers decide their own null rendering (a 1970 epoch
    * default would silently fabricate a timestamp).
    */
  def subscribeDataChange(subId: Long, ns: Int, names: Seq[String])(
      f: (String, Variant, Option[Long]) => Unit): Unit = {
    val handleByName = names.map(n => n -> clientHandles.getAndIncrement()).toMap
    handleByName.foreach { case (n, h) => watches.put(h, (n, f)) }
    val r = serviceChecked(IdCreateMonitoredItemsRequest, IdCreateMonitoredItemsResponse) { w =>
      w.u32(subId)
      w.u32(0L) // timestamps: source
      w.i32(names.length)
      names.foreach { n =>
        w.nodeId(StringId(ns, n)); w.u32(AttrValue); w.str(null); w.qualifiedName(0, null)
        w.u32(2L) // monitoring mode: Reporting
        w.u32(handleByName(n))
        w.f64(500.0)
        w.extNull()
        w.u32(100L)
        w.bool(true)
      }
    }
    val n = r.i32()
    (0 until n).foreach { _ =>
      val st = r.u32()
      require(st == StatusGood, f"monitored item rejected 0x$st%08x")
      r.u32(); r.f64(); r.u32(); r.ext()
    }
  }

  /** One outstanding PublishRequest at a time, re-armed after each
    * response — the subset's publish pipeline (depth 1 is enough for a
    * loopback fixture; asyncua keeps several in flight).
    */
  private def publishLoop(): Unit = {
    val t = new Thread(() => {
      while (!closed && !deadFlag) try {
        val r = serviceChecked(IdPublishRequest, IdPublishResponse,
          publishTimeoutMs) { w =>
          w.i32(0) // no acknowledgements (subset: server never retransmits)
        }
        r.u32() // subscription id
        val nAvail = r.i32()
        (0 until math.max(nAvail, 0)).foreach(_ => r.u32())
        r.bool() // more notifications
        r.u32(); r.i64() // sequence number, publish time
        val nData = r.i32()
        (0 until math.max(nData, 0)).foreach { _ =>
          val (tid, body) = r.ext()
          if (tid == NumericId(0, IdDataChangeNotification) && body != null) {
            val nr = new R(body)
            val items = nr.i32()
            (0 until items).foreach { _ =>
              val handle = nr.u32()
              val dv = nr.dataValue()
              val w = watches.get(handle)
              if (w != null && dv.value.isDefined)
                w._2(w._1, dv.value.get, dv.sourceTs.map(ticksToMicros))
            }
          }
        }
        r.i32() // results
      } catch {
        case _: Throwable if closed || deadFlag => ()
        case _: java.io.IOException =>
          // the send itself failed: the socket is gone and the client
          // cannot recover (no reconnect in the subset) — terminate the
          // loop instead of busy-spinning writeFrame against a dead pipe
          deadFlag = true
        case _: java.util.concurrent.TimeoutException =>
          // await timeout on a quiet interval — that is the subset's
          // keep-alive (the server holds the publish until data): re-arm
          // immediately. Only await's own timeout carries this type: a
          // service fault, a wrong response type, or a throwing user
          // callback falls through to the backoff branch below, so a
          // persistently-misbehaving server cannot induce a full-speed
          // request/response hot loop.
          ()
        case _: Throwable =>
          // unexpected (e.g. a service fault on the publish): back off so
          // a persistent fault cannot become a 100%-CPU retry loop
          try Thread.sleep(200) catch { case _: InterruptedException => deadFlag = true }
      }
    }, "opcua-client-publish")
    t.setDaemon(true)
    t.start()
  }

  override def close(): Unit = {
    closed = true
    try {
      val w = new W()
      w.u32(channelId).u32(tokenId)
      val reqId = reqIds.getAndIncrement()
      w.u32(reqId).u32(reqId)
      w.nodeId(NumericId(0, IdCloseSecureChannelRequest))
      w.requestHeader(authToken, handles.getAndIncrement())
      writeFrame(out, "CLO", w.result)
    } catch { case _: Throwable => () }
    try socket.close() catch { case _: Throwable => () }
  }
}

object OpcuaClient {
  /** Default publish-loop abandon timeout. The load-bearing contract —
    * enforced by OpcuaSpec against [[OpcuaServer.DefaultStalePublishMs]] —
    * is that this stays LONGER than the paired server's stale flush
    * threshold: the server must have flushed an abandoned PublishRequest
    * (keep-alive) before it could ever spend a data batch on it. A client
    * configured with a shorter timeout than its server's threshold
    * reintroduces silent notification loss after quiet intervals.
    */
  val DefaultPublishTimeoutMs: Long = 15000L
}
