package graft.net

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

/** Minimal loopback Redis server (RESP2: GET/SET/PING/DEL) — the KV side
  * of the reference's enrichment hop (hydration_agent/main.py:33-47
  * connects, :73-74 reads `context:operator` / `context:last_maintenance`
  * per message; context_provider/main.py writes them). The sandbox has no
  * Redis and no client libs, so the engine ships the protocol subset the
  * reference exercises, from the public RESP spec: requests are arrays of
  * bulk strings, replies are simple strings / bulk strings / null bulk.
  *
  * Scale role: a point-lookup KV sits at the ingestion edge for SMALL,
  * mutable context. The engine's default enrichment is the broadcast join
  * (semantically stronger, fully distributed); the [[RespClient]]-based
  * mapPartitions variant exists for context that mutates mid-stream,
  * where a per-partition connection does live lookups.
  */
final class RespServer(port0: Int = 0) extends AutoCloseable {
  private val server = new ServerSocket(port0, 64, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort

  private val store = new ConcurrentHashMap[String, String]()
  // accepted sockets, tracked so close() can unblock handler threads
  // sitting in read() — closing only the listener would leave each
  // connection's thread (and its client) hung instead of seeing EOF
  private val conns = ConcurrentHashMap.newKeySet[Socket]()
  @volatile private var closed = false

  def put(k: String, v: String): Unit = store.put(k, v)

  private val acceptor = new Thread(() => {
    try while (!closed) serve(server.accept())
    catch { case _: Throwable if closed => () }
  }, "resp-server-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(socket: Socket): Unit = {
    conns.add(socket)
    val t = new Thread(() => {
      val in = new BufferedInputStream(socket.getInputStream)
      val out = new BufferedOutputStream(socket.getOutputStream)
      try while (!closed) {
        Resp.readCommand(in) match {
          case "PING" :: Nil => Resp.writeSimple(out, "PONG")
          case "GET" :: k :: Nil => Resp.writeBulk(out, Option(store.get(k)))
          case "SET" :: k :: v :: Nil => store.put(k, v); Resp.writeSimple(out, "OK")
          case "DEL" :: k :: Nil =>
            Resp.writeInt(out, if (store.remove(k) != null) 1 else 0)
          case cmd => Resp.writeError(out, s"unknown command ${cmd.headOption.getOrElse("")}")
        }
        out.flush()
      } catch { case _: Throwable => () }
      finally {
        conns.remove(socket)
        try socket.close() catch { case _: Throwable => () }
      }
    }, s"resp-server-conn-${socket.getPort}")
    t.setDaemon(true)
    t.start()
  }

  override def close(): Unit = {
    closed = true
    try server.close() catch { case _: Throwable => () }
    // close live connections too (the MqttBroker pattern): clients then
    // see EOF promptly instead of a hung server
    conns.forEach(s => try s.close() catch { case _: Throwable => () })
    conns.clear()
  }
}

/** RESP2 framing shared by [[RespServer]] and [[RespClient]]. */
private[net] object Resp {
  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new EOFException("connection closed")
      sb.append(c.toChar); c = in.read()
    }
    require(in.read() == '\n', "malformed RESP line terminator")
    sb.toString
  }

  /** Read one client command: an array of bulk strings. */
  def readCommand(in: InputStream): List[String] = {
    val head = readLine(in)
    require(head.startsWith("*"), s"expected RESP array, got: $head")
    (1 to head.tail.toInt).map { _ =>
      val lenLine = readLine(in)
      require(lenLine.startsWith("$"), s"expected bulk string, got: $lenLine")
      val n = lenLine.tail.toInt
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new EOFException("connection closed")
        off += r
      }
      require(in.read() == '\r' && in.read() == '\n', "malformed bulk terminator")
      new String(buf, StandardCharsets.UTF_8)
    }.toList
  }

  def writeCommand(out: OutputStream, parts: Seq[String]): Unit = {
    out.write(s"*${parts.length}\r\n".getBytes(StandardCharsets.UTF_8))
    parts.foreach { p =>
      val b = p.getBytes(StandardCharsets.UTF_8)
      out.write(s"$$${b.length}\r\n".getBytes(StandardCharsets.UTF_8))
      out.write(b); out.write('\r'); out.write('\n')
    }
  }

  def writeSimple(out: OutputStream, s: String): Unit =
    out.write(s"+$s\r\n".getBytes(StandardCharsets.UTF_8))
  def writeError(out: OutputStream, s: String): Unit =
    out.write(s"-ERR $s\r\n".getBytes(StandardCharsets.UTF_8))
  def writeInt(out: OutputStream, n: Long): Unit =
    out.write(s":$n\r\n".getBytes(StandardCharsets.UTF_8))
  def writeBulk(out: OutputStream, v: Option[String]): Unit = v match {
    case None => out.write("$-1\r\n".getBytes(StandardCharsets.UTF_8))
    case Some(s) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.write(s"$$${b.length}\r\n".getBytes(StandardCharsets.UTF_8))
      out.write(b); out.write('\r'); out.write('\n')
  }

  /** Read one server reply (simple / bulk / integer / error). */
  def readReply(in: InputStream): Option[String] = {
    val line = readLine(in)
    line.head match {
      case '+' => Some(line.tail)
      case ':' => Some(line.tail)
      case '-' => throw new RuntimeException(s"RESP error: ${line.tail}")
      case '$' =>
        val n = line.tail.toInt
        if (n < 0) None
        else {
          val buf = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(buf, off, n - off)
            if (r < 0) throw new EOFException("connection closed")
            off += r
          }
          require(in.read() == '\r' && in.read() == '\n', "malformed bulk terminator")
          Some(new String(buf, StandardCharsets.UTF_8))
        }
      case c => throw new IllegalArgumentException(s"unsupported RESP reply type '$c'")
    }
  }
}

/** Blocking RESP2 client for [[RespServer]] — the engine-side twin of the
  * reference's redis-py usage (`redis_client.get(...)`,
  * hydration_agent/main.py:73-74). One socket, synchronous
  * request/reply; executor tasks open one per partition (see
  * DataflowOps.enrichJoinKv).
  */
final class RespClient(host: String, port: Int) extends AutoCloseable {
  private val socket = new Socket(InetAddress.getByName(host), port)
  socket.setTcpNoDelay(true)
  private val in = new BufferedInputStream(socket.getInputStream)
  private val out = new BufferedOutputStream(socket.getOutputStream)

  private def call(parts: String*): Option[String] = synchronized {
    Resp.writeCommand(out, parts); out.flush(); Resp.readReply(in)
  }

  def ping(): Boolean = call("PING").contains("PONG")
  def get(k: String): Option[String] = call("GET", k)
  def set(k: String, v: String): Unit = call("SET", k, v)

  override def close(): Unit =
    try socket.close() catch { case _: Throwable => () }
}
