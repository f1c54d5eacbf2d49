package graft.ingest

import java.io.{BufferedInputStream, DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

class MqttSpec extends SparkSpec {

  /** In-process mini broker: accepts one client, answers CONNACK/SUBACK,
    * pushes the given messages, then closes. Returns the bound port. */
  private def miniBroker(messages: Seq[(String, String)]): (ServerSocket, Thread) = {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      val sock = server.accept()
      try {
        val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
        val out = new DataOutputStream(sock.getOutputStream)
        val connect = Mqtt.readPacket(in)
        assert(connect.ptype == 1)
        out.write(Mqtt.connackPacket); out.flush()
        val sub = Mqtt.readPacket(in)
        assert(sub.ptype == 8)
        out.write(Mqtt.subackPacket(1, 1)); out.flush()
        messages.foreach { case (topic, payload) =>
          out.write(Mqtt.publishPacket(topic, payload.getBytes(UTF_8)))
        }
        out.flush()
      } finally sock.close()
    })
    t.setDaemon(true)
    t.start()
    (server, t)
  }

  test("mqtt drain: connect/subscribe handshake, payloads delivered in order, bounded by close") {
    val msgs = Seq(
      "sensors/a" -> """{"city":"vancouver","population":675000}""",
      "sensors/a" -> """{"city":"seattle","population":733000}""",
      "sensors/b" -> """{"city":"kyiv","population":2884000}"""
    )
    val (server, _) = miniBroker(msgs)
    try {
      val got = Mqtt.drain("127.0.0.1", server.getLocalPort, Seq("sensors/#"), idleTimeoutMs = 2000)
      assert(got.size === 3)
      assert(got.map(_.topic) === Seq("sensors/a", "sensors/a", "sensors/b"))
      assert(new String(got(2).payload, UTF_8).contains("kyiv"))
    } finally server.close()
  }

  test("mqtt fetch: drained payloads form an NDJSON batch the reader ingests") {
    val msgs = Seq(
      "t" -> """{"city":"vancouver","population":675000}""",
      "t" -> """{"city":"seattle","population":733000}"""
    )
    val (server, _) = miniBroker(msgs)
    try {
      val fetched = Fetch.mqtt("127.0.0.1", server.getLocalPort, Seq("t"), idleTimeoutMs = 2000)
      assert(fetched.isDefined)
      val df = Readers.ndjson(spark, fetched.get.path.toString,
        Some("city STRING, population INT"))
      assert(df.count() === 2)
      assert(df.orderBy("city").collect().map(_.getString(0)).toSeq === Seq("seattle", "vancouver"))
    } finally server.close()
  }

  test("mqtt drain: maxMessages bounds the drain") {
    val msgs = (1 to 10).map(i => "t" -> s"""{"i":$i}""")
    val (server, _) = miniBroker(msgs)
    try {
      val got = Mqtt.drain("127.0.0.1", server.getLocalPort, Seq("t"), maxMessages = 4, idleTimeoutMs = 2000)
      assert(got.size === 4)
    } finally server.close()
  }

  test("mqtt session: clean-session=false connect, QoS 1 subscribe, PUBACK per delivery") {
    val server = new ServerSocket(0)
    @volatile var connectFlags = -1
    @volatile var subQos = -1
    @volatile var pubacks = List.empty[Int]
    val t = new Thread(() => {
      val sock = server.accept()
      try {
        val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
        val out = new DataOutputStream(sock.getOutputStream)
        val connect = Mqtt.readPacket(in)
        // CONNECT body: "MQTT" utf8 (6) + level (1) + flags (1) + keepalive...
        connectFlags = connect.body(7) & 0xFF
        out.write(Mqtt.connackPacket); out.flush()
        val sub = Mqtt.readPacket(in)
        subQos = sub.body.last & 0xFF // requested QoS is the last byte
        out.write(Mqtt.subackPacket(1, 1)); out.flush()
        out.write(Mqtt.publishPacketQos1("t", """{"i":1}""".getBytes(UTF_8), 41))
        out.write(Mqtt.publishPacketQos1("t", """{"i":2}""".getBytes(UTF_8), 42))
        out.flush()
        (1 to 2).foreach { _ =>
          val p = Mqtt.readPacket(in)
          assert(p.ptype == 4) // PUBACK
          pubacks ::= (((p.body(0) & 0xFF) << 8) | (p.body(1) & 0xFF))
        }
      } finally sock.close()
    })
    t.setDaemon(true); t.start()
    try {
      val got = Mqtt.drain("127.0.0.1", server.getLocalPort, Seq("t"),
        clientId = "graft-session", idleTimeoutMs = 2000)
      t.join(5000)
      assert(got.size === 2)
      assert(connectFlags === 0x00) // clean-session bit NOT set -> broker keeps the session
      assert(subQos === 1)
      assert(pubacks.sorted === List(41, 42))
    } finally server.close()
  }

  test("mqtt session: messages published between polls are delivered on the next poll") {
    // Stateful broker: QoS 1 queue survives disconnects for a persistent
    // session; what a poll PUBACKs is consumed, the rest (plus anything
    // published while disconnected) is delivered to the next poll.
    val server = new ServerSocket(0)
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    queue.add("""{"i":1}"""); queue.add("""{"i":2}""")
    val t = new Thread(() => {
      var conn = 0
      while (conn < 2) {
        val sock = server.accept()
        conn += 1
        try {
          val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
          val out = new DataOutputStream(sock.getOutputStream)
          Mqtt.readPacket(in) // CONNECT
          out.write(Mqtt.connackPacket); out.flush()
          Mqtt.readPacket(in) // SUBSCRIBE
          out.write(Mqtt.subackPacket(1, 1)); out.flush()
          var pid = 100
          val inflight = collection.mutable.Map.empty[Int, String]
          queue.forEach { m => pid += 1; inflight(pid) = m; out.write(Mqtt.publishPacketQos1("t", m.getBytes(UTF_8), pid)) }
          out.flush()
          var open = true
          while (open) {
            try {
              val p = Mqtt.readPacket(in)
              if (p.ptype == 4) { // PUBACK consumes from the session queue
                val acked = ((p.body(0) & 0xFF) << 8) | (p.body(1) & 0xFF)
                inflight.remove(acked).foreach(queue.remove)
              } else if (p.ptype == 14) open = false // DISCONNECT
            } catch { case _: Exception => open = false }
          }
        } finally sock.close()
        // Between polls: two more messages arrive while no drain is connected.
        if (conn == 1) { queue.add("""{"i":3}"""); queue.add("""{"i":4}""") }
      }
    })
    t.setDaemon(true); t.start()
    try {
      val poll1 = Mqtt.drain("127.0.0.1", server.getLocalPort, Seq("t"),
        clientId = "graft-resume", idleTimeoutMs = 3000)
      assert(poll1.map(m => new String(m.payload, UTF_8)) === Seq("""{"i":1}""", """{"i":2}"""))
      val poll2 = Mqtt.drain("127.0.0.1", server.getLocalPort, Seq("t"),
        clientId = "graft-resume", idleTimeoutMs = 3000)
      // The resumed session sees ONLY what was published between polls —
      // nothing lost, nothing redelivered.
      assert(poll2.map(m => new String(m.payload, UTF_8)) === Seq("""{"i":3}""", """{"i":4}"""))
    } finally server.close()
  }
}
