package graft.sync

import java.io.{DataInputStream, IOException, InputStream, OutputStream}
import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.{CompletionStage, LinkedBlockingQueue, TimeUnit}

/**
 * Minimal RFC 6455 WebSocket plumbing for the Smart Transfer Protocol
 * (reference: `src/adapter/http/src/smart_protocol/ws_tungstenite_client.rs`
 * runs the same message flow over tungstenite; axum handles the server-side
 * upgrade). The JDK has a WebSocket CLIENT built in (`java.net.http
 * .WebSocket`) but no server, so the server half — upgrade handshake plus
 * frame codec — is implemented here directly from the public RFC:
 *
 *  - handshake: `Sec-WebSocket-Accept = base64(sha1(key + GUID))` (RFC 6455
 *    §4.2.2) over a plain HTTP/1.1 101 response;
 *  - frames: FIN/opcode byte, 7/16/64-bit payload lengths, client-to-server
 *    masking (§5.2-5.3); fragmented text is reassembled; pings are ponged;
 *    close is echoed.
 *
 * The protocol exchanges only text frames carrying JSON (one message per
 * request/response step), so the surface is deliberately small: blocking
 * `readText`/`writeText` on the server socket streams, and a synchronous
 * request/response client wrapper over the JDK WebSocket.
 */
object Ws {

  private val AcceptGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  def acceptKey(secWebSocketKey: String): String = {
    val sha1 = MessageDigest.getInstance("SHA-1")
    Base64.getEncoder.encodeToString(
      sha1.digest((secWebSocketKey + AcceptGuid).getBytes(UTF_8)))
  }

  /** Parsed HTTP upgrade request: (path, headers lower-cased). */
  final case class UpgradeRequest(path: String, headers: Map[String, String])

  /** Read the client's HTTP upgrade request off the raw socket stream.
    * Header block only — a WS handshake has no body (RFC 6455 §4.1). */
  def readUpgradeRequest(in: InputStream): UpgradeRequest = {
    val sb = new StringBuilder
    // CRs are dropped as we read, so the header block ends at "\n\n" whether
    // the client sent CRLF or bare LF separators. The terminator check runs
    // right after each append — reading one byte past it would block forever
    // (the client says nothing more until our 101).
    var done = false
    while (!done) {
      val c = in.read()
      if (c == -1) done = true
      else {
        if (c != '\r') sb.append(c.toChar)
        if (sb.endsWith("\n\n")) done = true
      }
      if (sb.length > 64 * 1024) throw new IOException("upgrade request too large")
    }
    val lines = sb.toString.split("\n").toSeq
    require(lines.nonEmpty, "empty upgrade request")
    val requestLine = lines.head.split(" ")
    require(requestLine.length >= 2 && requestLine(0) == "GET",
      s"WS upgrade must be GET: ${lines.head}")
    val headers = lines.tail.takeWhile(_.nonEmpty).flatMap { l =>
      l.indexOf(':') match {
        case -1 => None
        case i  => Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
      }
    }.toMap
    UpgradeRequest(requestLine(1), headers)
  }

  /** Complete the server side of the handshake (101 Switching Protocols). */
  def writeUpgradeResponse(out: OutputStream, req: UpgradeRequest): Unit = {
    require(req.headers.get("upgrade").exists(_.equalsIgnoreCase("websocket")),
      "not a websocket upgrade request")
    val key = req.headers.getOrElse("sec-websocket-key",
      throw new IOException("missing Sec-WebSocket-Key"))
    val resp =
      "HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\n" +
        "Connection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: ${acceptKey(key)}\r\n\r\n"
    out.write(resp.getBytes(UTF_8))
    out.flush()
  }

  /** Refuse a non-upgradable request politely so stray HTTP probes see a
    * well-formed error rather than a dropped connection. */
  def writeRejectResponse(out: OutputStream, code: Int, message: String): Unit = {
    val body = message.getBytes(UTF_8)
    val resp = s"HTTP/1.1 $code Error\r\nContent-Type: text/plain\r\n" +
      s"Content-Length: ${body.length}\r\nConnection: close\r\n\r\n"
    out.write(resp.getBytes(UTF_8)); out.write(body); out.flush()
  }

  // ------------------------------------------------------------- frame codec

  /** One wire frame: (fin, opcode, unmasked payload). */
  private def readFrame(in: DataInputStream, maxLen: Long): (Boolean, Int, Array[Byte]) = {
    val b0 = in.readUnsignedByte()
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0f
    val b1 = in.readUnsignedByte()
    val masked = (b1 & 0x80) != 0
    val len7 = b1 & 0x7f
    val len: Long = len7 match {
      case 126 => in.readUnsignedShort().toLong
      case 127 => in.readLong()
      case n   => n.toLong
    }
    if (len < 0 || len > maxLen)
      throw new IOException(s"frame length $len exceeds limit $maxLen")
    val mask = if (masked) { val m = new Array[Byte](4); in.readFully(m); m } else null
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    if (masked) {
      var i = 0
      while (i < payload.length) { payload(i) = (payload(i) ^ mask(i & 3)).toByte; i += 1 }
    }
    (fin, opcode, payload)
  }

  private def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte]): Unit =
    out.synchronized {
      out.write(0x80 | opcode) // FIN + opcode; server frames are unmasked (§5.1)
      val len = payload.length
      if (len < 126) out.write(len)
      else if (len <= 0xffff) { out.write(126); out.write(len >>> 8); out.write(len & 0xff) }
      else {
        out.write(127)
        var i = 7
        while (i >= 0) { out.write(((len.toLong >>> (8 * i)) & 0xff).toInt); i -= 1 }
      }
      out.write(payload)
      out.flush()
    }

  /** Blocking read of the next complete TEXT message; answers pings and
    * echoes close. `None` = peer closed the session. */
  def readText(in: DataInputStream, out: OutputStream, maxLen: Long = 256L << 20): Option[String] = {
    val acc = new java.io.ByteArrayOutputStream()
    var inMessage = false
    while (true) {
      val (fin, opcode, payload) = readFrame(in, maxLen)
      opcode match {
        case 0x8 => // close: echo and finish
          try writeFrame(out, 0x8, payload.take(125)) catch { case _: IOException => () }
          return None
        case 0x9 => writeFrame(out, 0xA, payload) // ping -> pong
        case 0xA => ()                            // unsolicited pong: ignore
        case 0x1 | 0x2 =>
          require(!inMessage, "new data frame inside a fragmented message")
          acc.write(payload); inMessage = true
          if (fin) return Some(new String(acc.toByteArray, UTF_8))
        case 0x0 =>
          require(inMessage, "continuation frame without a message start")
          acc.write(payload)
          if (fin) return Some(new String(acc.toByteArray, UTF_8))
        case other => throw new IOException(s"unsupported ws opcode $other")
      }
      if (acc.size() > maxLen) throw new IOException("fragmented message too large")
    }
    None // unreachable
  }

  def writeText(out: OutputStream, text: String): Unit =
    writeFrame(out, 0x1, text.getBytes(UTF_8))

  def writeClose(out: OutputStream): Unit =
    try writeFrame(out, 0x8, Array(0x03.toByte, 0xE8.toByte)) // 1000 normal closure
    catch { case _: IOException => () }

  // ------------------------------------------------------------------ client

  /**
   * Synchronous request/response client over the JDK WebSocket. The smart
   * protocol is strictly client-driven — the server only ever speaks in
   * response to a client message — so a blocking `call` (send one text
   * message, await one) models the whole conversation.
   */
  final class Client(uri: String, timeoutSec: Long = 60) extends AutoCloseable {
    private val inbox = new LinkedBlockingQueue[Either[Throwable, String]]()

    private val listener = new java.net.http.WebSocket.Listener {
      private val partial = new StringBuilder
      override def onText(ws: java.net.http.WebSocket, data: CharSequence,
          last: Boolean): CompletionStage[_] = {
        partial.append(data)
        if (last) { inbox.put(Right(partial.toString)); partial.clear() }
        ws.request(1)
        null
      }
      override def onError(ws: java.net.http.WebSocket, error: Throwable): Unit =
        inbox.put(Left(error))
      override def onClose(ws: java.net.http.WebSocket, statusCode: Int,
          reason: String): CompletionStage[_] = {
        inbox.put(Left(new IOException(s"ws closed by peer: $statusCode $reason")))
        null
      }
    }

    private val ws: java.net.http.WebSocket =
      java.net.http.HttpClient.newHttpClient().newWebSocketBuilder()
        .buildAsync(URI.create(uri), listener)
        .get(timeoutSec, TimeUnit.SECONDS)

    /** Fire-and-forget (upload-progress notifications have no response). */
    def send(message: String): Unit =
      ws.sendText(message, true).get(timeoutSec, TimeUnit.SECONDS)

    def receive(): String =
      inbox.poll(timeoutSec, TimeUnit.SECONDS) match {
        case null          => throw new IOException(s"ws response timeout after ${timeoutSec}s")
        case Right(text)   => text
        case Left(failure) => throw new IOException("ws session failed", failure)
      }

    def call(message: String): String = { send(message); receive() }

    def close(): Unit =
      try ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done")
        .get(5, TimeUnit.SECONDS)
      catch { case _: Exception => ws.abort() }
  }
}
