package graft.streaming

import java.io.DataInputStream
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** TcpPublisher vs the ZMQ PUB contract it stands in for
  * (`publisher.rs:19-24`): fire-and-forget, and a slow subscriber causes
  * drops at the high-water mark — never a stalled micro-batch. */
class TcpPublisherSpec extends AnyFunSuite {

  test("frames arrive with length+batchId framing intact") {
    val server = new ServerSocket(0)
    val received = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val reader = new Thread(() => {
      val s = server.accept()
      val in = new DataInputStream(s.getInputStream)
      (1 to 3).foreach { _ =>
        val len = in.readInt()
        val bid = in.readLong()
        val buf = new Array[Byte](len)
        in.readFully(buf)
        received.synchronized { received += ((bid, new String(buf, StandardCharsets.UTF_8))) }
      }
      s.close()
    })
    reader.start()
    val p = new TcpPublisher("127.0.0.1", server.getLocalPort)
    try Seq("a", "bb", "ccc").zipWithIndex.foreach { case (m, i) =>
      p.publishBatch(i.toLong, m.getBytes(StandardCharsets.UTF_8))
    } finally p.close()
    reader.join(5000)
    server.close()
    assert(received.toSeq == Seq((0L, "a"), (1L, "bb"), (2L, "ccc")))
  }

  test("stalled subscriber: publishBatch never blocks, frames drop at HWM") {
    // server accepts (via backlog) but never reads → the OS send buffer
    // fills, the writer thread parks on the socket, and the bounded queue
    // takes over. The round-1 implementation did a blocking write on the
    // caller thread here and wedged the micro-batch indefinitely.
    val server = new ServerSocket(0)
    val p = new TcpPublisher("127.0.0.1", server.getLocalPort, highWaterMark = 4)
    val payload = new Array[Byte](512 * 1024)
    val t0 = System.nanoTime()
    try (1 to 64).foreach(i => p.publishBatch(i.toLong, payload))
    finally p.close()
    server.close()
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(elapsedSec < 10.0,
      f"64 x 512KiB against a stalled subscriber took $elapsedSec%.1f s — publish blocked")
  }

  test("no subscriber at all: connect fails, publishes are swallowed") {
    val dead = { val s = new ServerSocket(0); val port = s.getLocalPort; s.close(); port }
    val p = new TcpPublisher("127.0.0.1", dead)
    try {
      p.publish("x".getBytes(StandardCharsets.UTF_8)) // must not throw
    } finally p.close()
  }
}
