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
}
