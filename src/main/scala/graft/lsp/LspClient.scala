package graft.lsp

import java.net.{DatagramPacket, DatagramSocket, InetAddress, InetSocketAddress, SocketTimeoutException}

/** Wire-interactive LSP client — the stop-and-wait peer the reference's
  * `request` and `sample_client` binaries link (`lsp_client.c`): the one
  * surface of the reference that ingest-only bridging
  * ([[graft.sources.LspSocketBridge]]) does not cover. Speaks the same
  * protobuf frames ([[LspWire]]) over UDP with the reference's message
  * typing (`lsp_common.c:149-158`):
  *
  *   - CONN_REQ  (0, 0, empty)       — `lsp_client_create` handshake
  *   - CONN_ACK  (connid, 0, empty)  — server assigns the connid
  *   - DATA_SEND (connid, s>0, pld)  — sequenced payload
  *   - DATA_ACK  (connid, s>0, empty)
  *
  * Reliability contract (mirrors `lsp_client.c`):
  *   - [[write]] is STOP-AND-WAIT: one outstanding message; it
  *     retransmits every epoch until the matching DATA_ACK arrives
  *     (`client_sig_timer` → `lsp_client_resend_lastmsgbuf`).
  *   - Each epoch also re-ACKs the last received server seqnum (or 0
  *     before any data) — the keep-alive that feeds the server's
  *     liveness scan (`lsp_client.c:41-43`).
  *   - [[read]] delivers only in-order data (`seqnum == serverSeq + 1`,
  *     `lsp_client.c:234-242`), acks it, and silently drops duplicates
  *     and strays.
  *   - `epochCnt` receive-less epochs kill the connection
  *     (`client_sig_timer:27-31`) — calls then throw
  *     [[LspClient.ConnectionLost]].
  *
  * Epochs are realized as socket receive timeouts instead of SIGALRM —
  * same cadence, no global mutable client. The reference's 2 s epoch ×
  * 5 is the default; tests dial it down. */
final class LspClient private (
    socket: DatagramSocket,
    server: InetSocketAddress,
    val connid: Long,
    epochMs: Int,
    epochCnt: Int) {

  private var clientSeq = 0L
  private var serverSeq = 0L
  private var lost = false

  private def send(connid: Long, seqnum: Long, payload: Array[Byte]): Unit = {
    val bytes = LspWire.encode(connid, seqnum, payload)
    socket.send(new DatagramPacket(bytes, bytes.length, server))
  }

  private def recv(): Option[(Long, Long, Array[Byte])] = {
    val buf = new Array[Byte](4096)
    val pkt = new DatagramPacket(buf, buf.length)
    try {
      socket.receive(pkt)
      val row = LspWire.decode(
        java.util.Arrays.copyOf(pkt.getData, pkt.getLength))
      if (row == null) None // malformed frame: ignored, like unpack failure
      else Some((row.getLong(0), row.getLong(1), row.getBinary(2)))
    } catch { case _: SocketTimeoutException => None }
  }

  private def ensureLive(): Unit =
    if (lost) throw new LspClient.ConnectionLost(connid)

  /** Keep-alive: ack the most recent server data (seqnum 0 before any). */
  private def ackLastReceived(): Unit = send(connid, serverSeq, null)

  /** Send `payload` with the next seqnum; block until the server acks it
    * (retransmitting every epoch). Mirrors `lsp_client_write`. */
  def write(payload: Array[Byte]): Unit = {
    ensureLive()
    require(payload != null && payload.nonEmpty,
      "LSP data messages carry a non-empty payload (empty = ACK)")
    clientSeq += 1
    send(connid, clientSeq, payload)
    var epochs = 0
    var acked = false
    while (!acked) {
      recv() match {
        case Some((c, s, p)) =>
          epochs = 0 // any traffic resets the liveness window
          if (c == connid && s == clientSeq && p.isEmpty) acked = true
          // in-order data crossing a write: absorb it for a later read
          else if (c == connid && s == serverSeq + 1 && p.nonEmpty) {
            pending = pending :+ p
            serverSeq = s
            send(connid, s, null)
          }
          // duplicate data (server retransmit): re-ack, same as read() —
          // otherwise the retransmit keeps resetting our epoch window
          // without ever terminating the server's retransmit loop, and
          // recovery of our own unacked DATA_SEND rides on timing jitter
          else if (c == connid && s > 0 && s <= serverSeq && p.nonEmpty)
            send(connid, s, null)
        case None =>
          epochs += 1
          if (epochs > epochCnt) {
            lost = true
            throw new LspClient.ConnectionLost(connid)
          }
          send(connid, clientSeq, payload) // stop-and-wait retransmit
          ackLastReceived()
      }
    }
  }

  private var pending = Vector.empty[Array[Byte]]

  /** Block until the next IN-ORDER server data message; ack and return
    * its payload. Mirrors `lsp_client_read`. */
  def read(): Array[Byte] = {
    ensureLive()
    if (pending.nonEmpty) {
      val h = pending.head
      pending = pending.tail
      return h
    }
    var epochs = 0
    while (true) {
      recv() match {
        case Some((c, s, p)) =>
          epochs = 0
          if (c == connid && s == serverSeq + 1 && p.nonEmpty) {
            serverSeq = s
            send(connid, s, null)
            return p
          }
          // duplicate data (retransmit): re-ack it so the server stops
          if (c == connid && s > 0 && s <= serverSeq && p.nonEmpty)
            send(connid, s, null)
        case None =>
          epochs += 1
          if (epochs > epochCnt) {
            lost = true
            throw new LspClient.ConnectionLost(connid)
          }
          ackLastReceived()
      }
    }
    sys.error("unreachable")
  }

  def close(): Unit = socket.close()
}

object LspClient {

  final class ConnectionLost(connid: Long)
    extends RuntimeException(s"lsp connection $connid lost (epoch timeout)")

  /** `lsp_client_create`: bind, send CONN_REQ, await CONN_ACK (with the
    * same epoch retransmit + give-up discipline as writes). */
  def connect(
      host: String, port: Int,
      epochMs: Int = 2000, epochCnt: Int = 5): LspClient = {
    val socket = new DatagramSocket()
    socket.setSoTimeout(epochMs)
    val server = new InetSocketAddress(InetAddress.getByName(host), port)
    val req = LspWire.encode(0L, 0L, null)
    def sendReq(): Unit =
      socket.send(new DatagramPacket(req, req.length, server))
    sendReq()
    var epochs = 0
    val buf = new Array[Byte](4096)
    while (true) {
      val pkt = new DatagramPacket(buf, buf.length)
      try {
        socket.receive(pkt)
        val row = LspWire.decode(
          java.util.Arrays.copyOf(pkt.getData, pkt.getLength))
        if (row != null && row.getLong(0) != 0L && row.getLong(1) == 0L &&
          row.getBinary(2).isEmpty)
          return new LspClient(socket, server, row.getLong(0),
            epochMs, epochCnt)
      } catch {
        case _: SocketTimeoutException =>
          epochs += 1
          if (epochs > epochCnt) {
            socket.close()
            throw new ConnectionLost(0L)
          }
          sendReq()
      }
    }
    sys.error("unreachable")
  }
}
