package graft.net

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets

/** OPC UA binary protocol primitives (opc.tcp, IEC 62541-6) — the wire
  * layer under [[OpcuaServer]]/[[OpcuaClient]], written from the public
  * spec the way [[MqttWire]] was written from the MQTT 3.1.1 spec. The
  * engine speaks the subset the reference's ingestion edge exercises
  * (opcua_mqtt_agent/main.py:88-130: connect, namespace lookup, browse,
  * attribute reads, a 500 ms subscription with data-change
  * notifications), over SecurityPolicy#None with anonymous auth —
  * matching the reference server's own policy
  * (opcua_server/main.py:146 `set_security_policy([NoSecurity])`).
  *
  * Scope (deliberate): single-chunk `F` messages only, one secure
  * channel per connection, numeric/string NodeIds, the Variant types the
  * PickAndPlace model uses (Boolean/UInt16/UInt32/UInt64/Float/Double/
  * String/DateTime). Everything here is little-endian per spec.
  */
object OpcuaWire {

  /** 100 ns ticks between 1601-01-01 (OPC UA DateTime epoch) and the Unix
    * epoch.
    */
  val EpochTicks: Long = 116444736000000000L

  def nowTicks(): Long = System.currentTimeMillis() * 10000L + EpochTicks

  def ticksToMicros(t: Long): Long = (t - EpochTicks) / 10L

  // ---- binary encoding ids of the services this subset speaks (spec
  // Part 6 Annex A: encoding NodeId = structure type id + 2) ----
  val IdOpenSecureChannelRequest = 446
  val IdOpenSecureChannelResponse = 449
  val IdCloseSecureChannelRequest = 452
  val IdCreateSessionRequest = 461
  val IdCreateSessionResponse = 464
  val IdActivateSessionRequest = 467
  val IdActivateSessionResponse = 470
  val IdCloseSessionRequest = 473
  val IdCloseSessionResponse = 476
  val IdBrowseRequest = 527
  val IdBrowseResponse = 530
  val IdReadRequest = 631
  val IdReadResponse = 634
  val IdWriteRequest = 673
  val IdWriteResponse = 676
  val IdCallRequest = 712
  val IdCallResponse = 715
  val IdCreateMonitoredItemsRequest = 751
  val IdCreateMonitoredItemsResponse = 754
  val IdCreateSubscriptionRequest = 787
  val IdCreateSubscriptionResponse = 790
  val IdPublishRequest = 826
  val IdPublishResponse = 829
  val IdServiceFault = 397
  val IdDataChangeNotification = 811
  val IdAnonymousIdentityToken = 321

  /** Well-known ns=0 nodes/attributes (spec Part 5/6). */
  val NodeObjectsFolder = 85L
  val NodeServer = 2253L
  val NodeServerNamespaceArray = 2255L
  val AttrNodeClass = 2L
  val AttrBrowseName = 3L
  val AttrDisplayName = 4L
  val AttrValue = 13L
  val NodeClassObject = 1L
  val NodeClassVariable = 2L
  val NodeClassMethod = 4L

  val SecurityPolicyNone = "http://opcfoundation.org/UA/SecurityPolicy#None"

  val StatusGood = 0L
  val StatusBadNodeIdUnknown = 0x80340000L
  val StatusBadAttributeIdInvalid = 0x80350000L
  val StatusBadServiceUnsupported = 0x800B0000L
  val StatusBadMethodInvalid = 0x80750000L
  val StatusBadTypeMismatch = 0x80740000L

  /** NodeId — the two shapes this subset needs: ns-0 numeric (services,
    * well-known nodes) and string-in-namespace (the PickAndPlace model's
    * `ua.NodeId("PickAndPlace", idx)` ids, opcua_server/main.py:150).
    */
  sealed trait NodeId
  final case class NumericId(ns: Int, id: Long) extends NodeId
  final case class StringId(ns: Int, id: String) extends NodeId

  /** The Variant payloads the PickAndPlace model carries. `tpe` is the
    * spec's built-in type id; `v` the JVM value.
    */
  final case class Variant(tpe: Int, v: Any)
  object Variant {
    val TBoolean = 1; val TUInt16 = 5; val TUInt32 = 7; val TUInt64 = 9
    val TFloat = 10; val TDouble = 11; val TString = 12; val TDateTime = 13
    def of(v: Any): Variant = v match {
      case b: Boolean => Variant(TBoolean, b)
      case i: Int => Variant(TUInt32, i.toLong)
      case l: Long => Variant(TUInt64, l)
      case f: Float => Variant(TFloat, f)
      case d: Double => Variant(TDouble, d)
      case s: String => Variant(TString, s)
      case other => throw new IllegalArgumentException(s"unsupported variant: $other")
    }
  }

  /** DataValue with the fields the agent consumes (value +
    * SourceTimestamp — opcua_mqtt_agent/main.py:38-40).
    */
  final case class DataValue(value: Option[Variant], status: Long, sourceTs: Option[Long])

  // ======== little-endian primitive writer/reader over growable buffers

  final class W {
    private var buf = new Array[Byte](256)
    private var n = 0
    private def ensure(k: Int): Unit =
      if (n + k > buf.length) {
        val b2 = new Array[Byte](math.max(buf.length * 2, n + k))
        System.arraycopy(buf, 0, b2, 0, n); buf = b2
      }
    def u8(v: Int): W = { ensure(1); buf(n) = v.toByte; n += 1; this }
    def u16(v: Int): W = { u8(v & 0xff); u8((v >>> 8) & 0xff) }
    def i32(v: Int): W = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    def u32(v: Long): W = i32(v.toInt)
    def i64(v: Long): W = { i32(v.toInt); i32((v >>> 32).toInt) }
    def f32(v: Float): W = i32(java.lang.Float.floatToIntBits(v))
    def f64(v: Double): W = i64(java.lang.Double.doubleToLongBits(v))
    def bool(v: Boolean): W = u8(if (v) 1 else 0)
    def raw(b: Array[Byte]): W = { ensure(b.length); System.arraycopy(b, 0, buf, n, b.length); n += b.length; this }
    /** UA String / ByteString: int32 length, -1 = null. */
    def str(s: String): W =
      if (s == null) i32(-1)
      else { val b = s.getBytes(StandardCharsets.UTF_8); i32(b.length); raw(b) }
    def bytes(b: Array[Byte]): W =
      if (b == null) i32(-1) else { i32(b.length); raw(b) }
    def nodeId(id: NodeId): W = id match {
      case NumericId(0, v) if v <= 0xff => u8(0x00).u8(v.toInt)
      case NumericId(ns, v) if ns <= 0xff && v <= 0xffff => u8(0x01).u8(ns).u16(v.toInt)
      case NumericId(ns, v) => u8(0x02).u16(ns).u32(v)
      case StringId(ns, s) => u8(0x03).u16(ns).str(s)
    }
    /** ExpandedNodeId without uri/server index = plain NodeId bytes. */
    def expanded(id: NodeId): W = nodeId(id)
    def qualifiedName(ns: Int, name: String): W = u16(ns).str(name)
    /** LocalizedText with text only (field mask bit 1). */
    def localized(text: String): W = u8(0x02).str(text)
    /** Null ExtensionObject: NodeId 0, no body. */
    def extNull(): W = u8(0x00).u8(0x00).u8(0x00)
    /** ExtensionObject with ByteString-encoded body. */
    def ext(encodingId: Int, body: Array[Byte]): W = {
      nodeId(NumericId(0, encodingId)); u8(0x01); bytes(body)
    }
    def variant(v: Variant): W = {
      u8(v.tpe)
      v.v match {
        case b: Boolean => bool(b)
        case l: Long if v.tpe == Variant.TUInt16 => u16(l.toInt)
        case l: Long if v.tpe == Variant.TUInt32 => u32(l)
        case l: Long => i64(l)
        case f: Float => f32(f)
        case d: Double => f64(d)
        case s: String => str(s)
        case other => throw new IllegalArgumentException(s"unencodable variant body: $other")
      }
      this
    }
    def dataValue(dv: DataValue): W = {
      var mask = 0
      if (dv.value.isDefined) mask |= 0x01
      if (dv.status != StatusGood) mask |= 0x02
      if (dv.sourceTs.isDefined) mask |= 0x04
      u8(mask)
      dv.value.foreach(variant)
      if (dv.status != StatusGood) u32(dv.status)
      dv.sourceTs.foreach(i64)
      this
    }
    /** Request header (authToken + timestamp + handle, rest defaulted). */
    def requestHeader(authToken: NodeId, handle: Long): W = {
      nodeId(authToken); i64(nowTicks()); u32(handle)
      u32(0L); str(null); u32(15000L); extNull()
    }
    /** Response header echoing the request handle. */
    def responseHeader(handle: Long, status: Long): W = {
      i64(nowTicks()); u32(handle); u32(status)
      u8(0x00) // DiagnosticInfo: empty mask
      i32(-1)  // stringTable: null array
      extNull()
    }
    def result: Array[Byte] = java.util.Arrays.copyOf(buf, n)
    def size: Int = n
  }

  final class R(b: Array[Byte]) {
    private var p = 0
    def remaining: Int = b.length - p
    def u8(): Int = { val v = b(p) & 0xff; p += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def i32(): Int = u16() | (u16() << 16)
    def u32(): Long = i32().toLong & 0xffffffffL
    def i64(): Long = (i32().toLong & 0xffffffffL) | (i32().toLong << 32)
    def f32(): Float = java.lang.Float.intBitsToFloat(i32())
    def f64(): Double = java.lang.Double.longBitsToDouble(i64())
    def bool(): Boolean = u8() != 0
    def str(): String = {
      val n = i32()
      if (n < 0) null
      else { val s = new String(b, p, n, StandardCharsets.UTF_8); p += n; s }
    }
    def bytes(): Array[Byte] = {
      val n = i32()
      if (n < 0) null else { val out = java.util.Arrays.copyOfRange(b, p, p + n); p += n; out }
    }
    def nodeId(): NodeId = {
      val enc = u8()
      (enc & 0x3f) match {
        case 0x00 => NumericId(0, u8().toLong)
        case 0x01 => NumericId(u8(), u16().toLong)
        case 0x02 => NumericId(u16(), u32())
        case 0x03 => StringId(u16(), str())
        case other => throw new IllegalArgumentException(s"NodeId encoding $other unsupported")
      }
    }
    def expanded(): NodeId = {
      val enc = b(p) & 0xff
      require((enc & 0xc0) == 0, "ExpandedNodeId uri/serverIndex unsupported")
      nodeId()
    }
    def qualifiedName(): (Int, String) = (u16(), str())
    def localized(): String = {
      val mask = u8()
      var locale: String = null; var text: String = null
      if ((mask & 0x01) != 0) locale = str()
      if ((mask & 0x02) != 0) text = str()
      text
    }
    def ext(): (NodeId, Array[Byte]) = {
      val id = nodeId()
      u8() match {
        case 0x00 => (id, null)
        case 0x01 => (id, bytes())
        case other => throw new IllegalArgumentException(s"ExtensionObject encoding $other unsupported")
      }
    }
    def variant(): Variant = {
      val enc = u8()
      require((enc & 0x80) == 0, "array Variant unsupported in this subset")
      enc match {
        case 0 => Variant(0, null)
        case Variant.TBoolean => Variant(enc, bool())
        case Variant.TUInt16 => Variant(enc, u16().toLong)
        case Variant.TUInt32 => Variant(enc, u32())
        case Variant.TUInt64 | Variant.TDateTime => Variant(enc, i64())
        case Variant.TFloat => Variant(enc, f32())
        case Variant.TDouble => Variant(enc, f64())
        case Variant.TString => Variant(enc, str())
        case other => throw new IllegalArgumentException(s"variant type $other unsupported")
      }
    }
    def dataValue(): DataValue = {
      val mask = u8()
      val v = if ((mask & 0x01) != 0) Some(variant()) else None
      val st = if ((mask & 0x02) != 0) u32() else StatusGood
      val ts = if ((mask & 0x04) != 0) Some(i64()) else None
      if ((mask & 0x08) != 0) i64() // serverTimestamp, ignored
      DataValue(v, st, ts)
    }
    /** Skip a request header, returning (authToken, requestHandle). */
    def requestHeader(): (NodeId, Long) = {
      val tok = nodeId(); i64(); val h = u32()
      u32(); str(); u32(); ext()
      (tok, h)
    }
    /** Skip a response header, returning (requestHandle, serviceResult). */
    def responseHeader(): (Long, Long) = {
      i64(); val h = u32(); val st = u32()
      val dmask = u8()
      require(dmask == 0, "non-empty DiagnosticInfo unsupported")
      val nStrs = i32()
      (0 until math.max(nStrs, 0)).foreach(_ => str())
      ext()
      (h, st)
    }
  }

  // ======== opc.tcp transport framing (Part 6 §7.1) ========

  final case class Frame(tpe: String, body: Array[Byte])

  def writeFrame(out: DataOutputStream, tpe: String, body: Array[Byte]): Unit = {
    require(tpe.length == 3)
    val head = new Array[Byte](8)
    head(0) = tpe.charAt(0).toByte; head(1) = tpe.charAt(1).toByte
    head(2) = tpe.charAt(2).toByte; head(3) = 'F'
    val size = 8 + body.length
    head(4) = (size & 0xff).toByte; head(5) = ((size >> 8) & 0xff).toByte
    head(6) = ((size >> 16) & 0xff).toByte; head(7) = ((size >> 24) & 0xff).toByte
    out.synchronized {
      out.write(head); out.write(body); out.flush()
    }
  }

  def readFrame(in: DataInputStream): Frame = {
    val head = new Array[Byte](8)
    in.readFully(head)
    val tpe = new String(head, 0, 3, StandardCharsets.US_ASCII)
    require(head(3) == 'F', s"chunked $tpe messages unsupported (single-chunk subset)")
    val size = (head(4) & 0xff) | ((head(5) & 0xff) << 8) |
      ((head(6) & 0xff) << 16) | ((head(7) & 0xff) << 24)
    if (size < 8 || size > (1 << 24)) throw new EOFException(s"bad frame size $size")
    val body = new Array[Byte](size - 8)
    in.readFully(body)
    Frame(tpe, body)
  }

  /** HEL body (after the version fields the four buffer limits + url). */
  def helloBody(endpointUrl: String): Array[Byte] =
    new W().u32(0L).u32(1L << 16).u32(1L << 16).u32(1L << 24).u32(1L).str(endpointUrl).result

  def ackBody(): Array[Byte] =
    new W().u32(0L).u32(1L << 16).u32(1L << 16).u32(1L << 24).u32(1L).result
}
