package graft.lsp

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** The wire-interactive client ([[LspClient]]) against the echo peer
  * ([[LspEchoServer]]) over real localhost UDP — `sample_client.c`'s
  * session shape, plus the reliability cases the reference exercises
  * with its drop-rate dial: retransmission, duplicate tolerance, and
  * the epoch-count connection-loss verdict. */
class LspClientSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("handshake + sample_client echo loop (one msg, then seq 2..9)") {
    val server = new LspEchoServer(epochMs = 100)
    try {
      val c = LspClient.connect("127.0.0.1", server.port,
        epochMs = 100, epochCnt = 5)
      try {
        assert(c.connid === 1L)
        c.write(bytes("ilovethiscoursealready"))
        assert(new String(c.read(), UTF_8) === "ilovethiscoursealready")
        (2 until 10).foreach { i =>
          c.write(bytes(s"seq count $i"))
          assert(new String(c.read(), UTF_8) === s"seq count $i")
        }
      } finally c.close()
    } finally server.close()
  }

  test("stop-and-wait survives deterministic packet loss (every 3rd send dropped)") {
    val server = new LspEchoServer(epochMs = 60, dropEvery = 3)
    try {
      val c = LspClient.connect("127.0.0.1", server.port,
        epochMs = 60, epochCnt = 50)
      try {
        // a third of ALL server sends (conn acks, data acks, echoes,
        // echo retransmits) vanish; epoch retransmission must still
        // deliver every message exactly once, in order
        (1 to 12).foreach { i =>
          c.write(bytes(s"chaos $i"))
          assert(new String(c.read(), UTF_8) === s"chaos $i", s"msg $i")
        }
      } finally c.close()
    } finally server.close()
  }

  test("consecutive writes without an interleaved read lose no echo") {
    // the server must QUEUE unacked echoes: with a single unacked slot,
    // write(w1); write(w2) overwrites echo(w1) before it is acked and
    // the first read() ConnectionLosts on a live connection (ADVICE r10)
    val server = new LspEchoServer(epochMs = 60, dropEvery = 3)
    try {
      val c = LspClient.connect("127.0.0.1", server.port,
        epochMs = 60, epochCnt = 50)
      try {
        (1 to 3).foreach(i => c.write(bytes(s"burst $i")))
        (1 to 3).foreach { i =>
          assert(new String(c.read(), UTF_8) === s"burst $i", s"echo $i")
        }
      } finally c.close()
    } finally server.close()
  }

  test("two clients get distinct connids; a retransmitted handshake does not") {
    val server = new LspEchoServer(epochMs = 100)
    try {
      val a = LspClient.connect("127.0.0.1", server.port, 100, 5)
      val b = LspClient.connect("127.0.0.1", server.port, 100, 5)
      try {
        assert(a.connid !== b.connid)
        a.write(bytes("from a")); b.write(bytes("from b"))
        assert(new String(a.read(), UTF_8) === "from a")
        assert(new String(b.read(), UTF_8) === "from b")
      } finally { a.close(); b.close() }
    } finally server.close()
  }

  test("epoch-count exhaustion raises ConnectionLost") {
    // a socket nobody answers: the handshake must give up after
    // epochCnt epochs, not hang
    val dead = new java.net.DatagramSocket()
    try {
      val t0 = System.nanoTime()
      intercept[LspClient.ConnectionLost] {
        LspClient.connect("127.0.0.1", dead.getLocalPort,
          epochMs = 40, epochCnt = 3)
      }
      val ms = (System.nanoTime() - t0) / 1000000
      assert(ms >= 3 * 40, s"gave up too early: ${ms}ms")
    } finally dead.close()
  }

  test("write rejects empty payloads (empty = ACK on this wire)") {
    val server = new LspEchoServer(epochMs = 100)
    try {
      val c = LspClient.connect("127.0.0.1", server.port, 100, 5)
      try intercept[IllegalArgumentException](c.write(Array.emptyByteArray))
      finally c.close()
    } finally server.close()
  }
}
