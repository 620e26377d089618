package graft.streaming

import java.io.{DataInputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.US_ASCII

/** Clean-room ZMTP 3.0 wire protocol — the published ZeroMQ transport spec
  * (rfc.zeromq.org/spec/23, public). This is what closes the "true ZeroMQ
  * wire compatibility" gap (`/root/reference/src/publisher.rs:6-25` binds a
  * zmq PUB socket): no ZeroMQ LIBRARY exists in this environment, but the
  * PROTOCOL is a public document, so the engine speaks it directly over
  * TCP. A stock libzmq/jeromq/pyzmq SUB socket connecting to
  * [[ZmtpPubServer]] performs the standard greeting → NULL-mechanism READY
  * handshake → message-based subscription flow and receives each published
  * message as a single ZMTP message frame — exactly what it gets from the
  * reference's `zmq::PUB`. (No real libzmq peer exists in this offline
  * sandbox to prove interop end-to-end; conformance is pinned instead by
  * golden octet tests against the RFC's normative grammar — greeting
  * layout, READY command encoding, short/long frame forms — plus a
  * loopback SUB implementing the same grammar independently. See
  * ZmtpSpec.)
  *
  * Scope: the NULL security mechanism (the reference uses unencrypted
  * tcp://), PUB socket role, ZMTP 3.0 message-style subscriptions
  * (one-frame messages whose body is 0x01+prefix subscribe / 0x00+prefix
  * cancel — what a 3.0 SUB peer sends; the 3.1 SUBSCRIBE/CANCEL command
  * forms are accepted too).
  */
object Zmtp {

  /** greeting = signature(10) version(2) mechanism(20) as-server(1)
    * filler(31) — 64 octets. signature = %xFF 8×%x00 %x7F; version = 3.0;
    * mechanism = "NULL" zero-padded; as-server = 0 under NULL. */
  def greeting: Array[Byte] = {
    val g = new Array[Byte](64)
    g(0) = 0xFF.toByte
    g(9) = 0x7F.toByte
    g(10) = 3 // version-major
    g(11) = 0 // version-minor
    val mech = "NULL".getBytes(US_ASCII)
    System.arraycopy(mech, 0, g, 12, mech.length) // rest stays zero-padded
    g // as-server 0x00 + 31 filler octets are the zero initialization
  }

  /** Validates a peer greeting: signature frame, version-major ≥ 3 (3.1
    * peers are compatible — they must downgrade to our announced 3.0), and
    * the NULL mechanism (the only one the reference uses). */
  def validateGreeting(g: Array[Byte]): Either[String, Unit] =
    if (g.length != 64) Left(s"greeting must be 64 octets, got ${g.length}")
    else if (g(0) != 0xFF.toByte || g(9) != 0x7F.toByte) Left("bad signature")
    else if (g(10) < 3) Left(s"unsupported ZMTP major version ${g(10)}")
    else {
      val mech = new String(g, 12, 20, US_ASCII).takeWhile(_ != 0)
      if (mech != "NULL") Left(s"unsupported mechanism '$mech'") else Right(())
    }

  /** One ZMTP frame. flags bit 0 = MORE, bit 1 = LONG (wire form only),
    * bit 2 = COMMAND. */
  final case class Frame(flags: Int, body: Array[Byte]) {
    def isCommand: Boolean = (flags & 0x04) != 0
    def more: Boolean = (flags & 0x01) != 0
  }

  /** frame = flags size body; short form (size < 256) uses a 1-octet size,
    * long form sets flags bit 1 and uses an 8-octet network-order size. */
  def encodeFrame(body: Array[Byte], command: Boolean = false,
      more: Boolean = false): Array[Byte] = {
    val base = (if (command) 0x04 else 0x00) | (if (more) 0x01 else 0x00)
    if (body.length < 256)
      ByteBuffer.allocate(2 + body.length)
        .put(base.toByte).put(body.length.toByte).put(body).array()
    else
      ByteBuffer.allocate(9 + body.length)
        .put((base | 0x02).toByte).putLong(body.length.toLong).put(body).array()
  }

  /** Blocking read of one frame; throws EOFException on a closed peer. */
  def readFrame(in: DataInputStream): Frame = {
    val flags = in.readUnsignedByte()
    val size =
      if ((flags & 0x02) != 0) in.readLong()
      else in.readUnsignedByte().toLong
    require(size >= 0 && size <= 64 * 1024 * 1024, s"frame size $size out of bounds")
    val body = new Array[Byte](size.toInt)
    in.readFully(body)
    Frame(flags & ~0x02, body) // LONG is a wire detail, not frame semantics
  }

  /** READY command frame for the NULL handshake: command-name "READY" then
    * metadata properties (name = 1-octet-length string, value =
    * 4-octet-network-order-length octets). Announces Socket-Type. */
  def readyCommand(socketType: String): Array[Byte] = {
    val name = "READY".getBytes(US_ASCII)
    val prop = "Socket-Type".getBytes(US_ASCII)
    val v = socketType.getBytes(US_ASCII)
    val body = ByteBuffer.allocate(1 + name.length + 1 + prop.length + 4 + v.length)
      .put(name.length.toByte).put(name)
      .put(prop.length.toByte).put(prop)
      .putInt(v.length).put(v).array()
    encodeFrame(body, command = true)
  }

  /** Parses a command frame body into (command-name, metadata). */
  def parseCommand(body: Array[Byte]): (String, Map[String, String]) = {
    val bb = ByteBuffer.wrap(body)
    def shortStr(): String = {
      val n = bb.get() & 0xFF
      val b = new Array[Byte](n); bb.get(b); new String(b, US_ASCII)
    }
    val name = shortStr()
    val meta = Map.newBuilder[String, String]
    while (bb.remaining() > 0) {
      val k = shortStr()
      val vn = bb.getInt()
      val vb = new Array[Byte](vn); bb.get(vb)
      meta += k -> new String(vb, US_ASCII)
    }
    (name, meta.result())
  }

  /** Socket types a PUB endpoint accepts (spec 23 compatibility matrix). */
  val pubPeers: Set[String] = Set("SUB", "XSUB")

  /** Port of a `tcp://host:port` bind address — accepts `config.rs`'s
    * `ZMQ_PUBLISHER_ADDRESS` forms (wildcard or concrete host), so
    * `new ZmtpPublisher(Zmtp.bindPort(config.zmqAddress))` is the drop-in
    * of `ZmqPublisher::new(address)`. */
  def bindPort(address: String): Int = {
    require(address.startsWith("tcp://"), s"unsupported transport in '$address'")
    address.substring(address.lastIndexOf(':') + 1).toInt
  }
}

/** ZMTP 3.0 PUB endpoint: binds, handshakes each subscriber, tracks its
  * prefix subscriptions, and broadcasts every published payload as one
  * message frame to matching subscribers — `zmq::PUB` semantics including
  * no-subscriber drops and per-subscriber drop-at-HWM (a stalled peer's
  * bounded queue overflows and loses messages; the publish call never
  * blocks — `publisher.rs:19-24` fire-and-forget).
  *
  * `port = 0` binds an ephemeral port (see [[boundPort]]). */
final class ZmtpPubServer(port: Int, highWaterMark: Int = 1000)
    extends AutoCloseable {
  import Zmtp._

  private val server = new ServerSocket(port)
  def boundPort: Int = server.getLocalPort

  private final class Conn(socket: Socket) {
    @volatile private var subs: Set[Seq[Byte]] = Set.empty
    private val queue =
      new java.util.concurrent.LinkedBlockingQueue[Array[Byte]](highWaterMark)
    @volatile var alive = true

    def subscribedTo(msg: Array[Byte]): Boolean =
      subs.exists(p => p.length <= msg.length &&
        java.util.Arrays.equals(p.toArray, msg.take(p.length)))

    /** PUB drop-at-HWM: non-blocking, overflow loses the frame. */
    def offer(frame: Array[Byte]): Unit =
      if (alive && !queue.offer(frame)) () // dropped — at-most-once

    private def handleSubscription(f: Frame): Unit =
      if (f.isCommand) {
        // ZMTP 3.1 command-style subscriptions, accepted for forward compat
        val (name, _) = parseCommand(f.body)
        val topic = {
          // command body after the name string is the topic
          val nameLen = 1 + (f.body(0) & 0xFF)
          f.body.drop(nameLen).toSeq
        }
        if (name == "SUBSCRIBE") subs += topic
        else if (name == "CANCEL") subs -= topic
      } else if (f.body.nonEmpty) {
        // ZMTP 3.0 message-style: 0x01 + prefix / 0x00 + prefix
        if (f.body(0) == 1) subs += f.body.tail.toSeq
        else if (f.body(0) == 0) subs -= f.body.tail.toSeq
      }

    private val thread = new Thread(() => {
      try {
        val out = socket.getOutputStream
        val in = new DataInputStream(socket.getInputStream)
        // greeting exchange (send eagerly, then read+validate the peer's)
        out.write(greeting); out.flush()
        val peer = new Array[Byte](64); in.readFully(peer)
        validateGreeting(peer) match {
          case Left(err) => throw new SocketException(s"peer greeting: $err")
          case Right(()) =>
        }
        // NULL handshake: both sides send READY; peer must be SUB/XSUB
        out.write(readyCommand("PUB")); out.flush()
        val ready = readFrame(in)
        if (!ready.isCommand) throw new SocketException("expected READY command")
        val (name, meta) = parseCommand(ready.body)
        if (name != "READY" || !pubPeers.contains(meta.getOrElse("Socket-Type", "")))
          throw new SocketException(s"incompatible peer: $name ${meta.get("Socket-Type")}")
        conns.add(this)
        // writer leg: drain the bounded queue to the socket
        val writer = new Thread(() => {
          try {
            while (alive || !queue.isEmpty) {
              val f = queue.poll(50, java.util.concurrent.TimeUnit.MILLISECONDS)
              if (f != null) { out.write(f); out.flush() }
            }
          } catch { case _: Exception => alive = false }
        }, s"zmtp-pub-writer-${socket.getPort}")
        writer.setDaemon(true); writer.start()
        // reader leg: subscription management until the peer departs
        try while (alive) handleSubscription(readFrame(in))
        catch { case _: EOFException | _: SocketException => }
      } catch {
        case _: Exception => // failed handshake or torn connection
      } finally {
        alive = false
        conns.remove(this)
        try socket.close() catch { case _: Exception => () }
      }
    }, s"zmtp-pub-conn-${socket.getPort}")
    thread.setDaemon(true)
    thread.start()

    def shutdown(): Unit = {
      alive = false
      try socket.close() catch { case _: Exception => () }
    }
  }

  private val conns =
    new java.util.concurrent.CopyOnWriteArrayList[Conn]()

  private val acceptThread = new Thread(() => {
    try while (!server.isClosed) new Conn(server.accept())
    catch { case _: Exception => () }
  }, s"zmtp-pub-accept-$port")
  acceptThread.setDaemon(true)
  acceptThread.start()

  /** Fire-and-forget broadcast of one payload as a single message frame to
    * every subscriber whose prefix set matches (PUB semantics: no
    * subscribers, or no matching prefix → the message is simply gone). */
  def publish(payload: Array[Byte]): Unit = {
    val frame = Zmtp.encodeFrame(payload)
    conns.forEach(c => if (c.subscribedTo(payload)) c.offer(frame))
  }

  /** Number of completed subscriber handshakes currently attached. */
  def subscriberCount: Int = conns.size()

  override def close(): Unit = {
    try server.close() catch { case _: Exception => () }
    conns.forEach(_.shutdown())
  }
}

/** ZMTP 3.0 SUB client — the consume direction: attach to a running
  * reference instance's `zmq::PUB` endpoint (`publisher.rs:14` binds
  * `tcp://0.0.0.0:9500`) and receive its raw-protobuf messages, no ZeroMQ
  * library required. Connect → greeting exchange → NULL READY handshake
  * (announces SUB, requires a PUB/XPUB peer) → message-style
  * subscriptions → blocking [[recv]]. */
final class ZmtpSubClient(host: String, port: Int,
    prefixes: Seq[Array[Byte]] = Seq(Array.empty)) extends AutoCloseable {
  import Zmtp._

  private val socket = new Socket(host, port)
  private val out = socket.getOutputStream
  private val in = new DataInputStream(socket.getInputStream)

  {
    out.write(greeting); out.flush()
    val peer = new Array[Byte](64); in.readFully(peer)
    validateGreeting(peer) match {
      case Left(err) => socket.close(); throw new SocketException(s"peer greeting: $err")
      case Right(()) =>
    }
    out.write(readyCommand("SUB")); out.flush()
    val ready = readFrame(in)
    val ok = ready.isCommand && {
      val (name, meta) = parseCommand(ready.body)
      name == "READY" && Set("PUB", "XPUB").contains(meta.getOrElse("Socket-Type", ""))
    }
    if (!ok) { socket.close(); throw new SocketException("peer is not a PUB/XPUB socket") }
    prefixes.foreach(subscribe)
  }

  def subscribe(prefix: Array[Byte]): Unit = {
    out.write(encodeFrame(1.toByte +: prefix)); out.flush()
  }
  def cancel(prefix: Array[Byte]): Unit = {
    out.write(encodeFrame(0.toByte +: prefix)); out.flush()
  }

  /** Blocking receive of the next message payload (multi-frame messages
    * are concatenated; the reference publishes single frames). */
  def recv(): Array[Byte] = {
    var f = readFrame(in)
    while (f.isCommand) f = readFrame(in) // skip unsolicited commands
    if (!f.more) f.body
    else {
      val buf = Array.newBuilder[Byte]
      buf ++= f.body
      while (f.more) { f = readFrame(in); if (!f.isCommand) buf ++= f.body }
      buf.result()
    }
  }

  /** recv with a socket timeout; None on expiry. */
  def recvWithin(timeoutMs: Int): Option[Array[Byte]] = {
    socket.setSoTimeout(timeoutMs)
    try Some(recv())
    catch { case _: java.net.SocketTimeoutException => None }
    finally socket.setSoTimeout(0)
  }

  override def close(): Unit =
    try socket.close() catch { case _: Exception => () }
}

object ZmtpPubServer {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ZmtpPubServer]()
  /** Process-wide shared bound endpoint, keyed by name — what
    * `Sinks.publishStream`'s per-partition factory needs: every partition's
    * [[SharedZmtpPublisher]] reaches the ONE server that subscribers are
    * attached to (local-mode executors share the JVM — the InMemoryPublisher
    * pattern; a cluster deployment binds one endpoint per executor and
    * subscribers connect to all, standard ZMQ PUB fan-in). */
  def shared(name: String): ZmtpPubServer =
    registry.computeIfAbsent(name, _ => new ZmtpPubServer(0))
  def closeShared(name: String): Unit = {
    val s = registry.remove(name)
    if (s != null) s.close()
  }
}

/** [[MessagePublisher]] view of a process-shared [[ZmtpPubServer]]:
  * instantiable per partition, publishes into the one bound endpoint. */
final class SharedZmtpPublisher(name: String) extends MessagePublisher {
  override def publish(message: Array[Byte]): Unit =
    ZmtpPubServer.shared(name).publish(message)
}

/** [[MessagePublisher]] over [[ZmtpPubServer]] — the drop-in twin of the
  * reference's `ZmqPublisher::new(address)` + `publish(proto_bytes)`
  * (`publisher.rs:11-24`): binds the PUB endpoint at construction,
  * publishes each encoded message as one ZMTP message frame. Batch ids are
  * intentionally NOT on this wire — the ZMQ wire carries the raw protobuf
  * only, exactly like the reference (the TCP stand-in keeps them; see
  * SURVEY §7.3#4 for the replay-dedup trade). */
final class ZmtpPublisher(port: Int, highWaterMark: Int = 1000)
    extends MessagePublisher {
  @transient private var opened = false
  @transient private lazy val server =
    { opened = true; new ZmtpPubServer(port, highWaterMark) }
  def boundPort: Int = server.boundPort
  override def publish(message: Array[Byte]): Unit = server.publish(message)
  override def close(): Unit = if (opened) server.close()
}
