package graft.adapter

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.HttpServer

import graft.SparkSpec
import graft.adapter.Webhooks._

/** Webhook subscriptions + RFC 9421-signed DATASET.REF.UPDATED deliveries,
  * verified subscriber-side against a real HTTP endpoint; CLI lifecycle. */
class WebhooksSpec extends SparkSpec {

  private case class Received(
      path: String, body: Array[Byte], headers: Map[String, String])

  /** Local endpoint capturing deliveries; responds with `status`. */
  private def withServer[T](status: Int)(f: (String, ConcurrentLinkedQueue[Received]) => T): T = {
    val received = new ConcurrentLinkedQueue[Received]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", { exchange =>
      val body = exchange.getRequestBody.readAllBytes()
      val headers = {
        val it = exchange.getRequestHeaders.entrySet().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) {
          val e = it.next()
          b += e.getKey.toLowerCase -> e.getValue.get(0)
        }
        b.result()
      }
      received.add(Received(exchange.getRequestURI.getPath, body, headers))
      exchange.sendResponseHeaders(status, -1)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/hook", received)
    finally server.stop(0)
  }

  private def registry(root: java.nio.file.Path) = new Registry(
    new org.apache.hadoop.fs.Path(root.toUri), spark.sparkContext.hadoopConfiguration)

  test("delivery carries the signed headers; subscriber-side verification accepts, tamper rejects") {
    withServer(200) { (url, received) =>
      val root = Files.createTempDirectory("graft-wh-")
      val reg = registry(root)
      reg.add(Subscription("cities", url, secret = "s3cret"))
      reg.add(Subscription("other_ds", url, secret = "nope")) // different dataset: not fired

      val ds = Webhooks.notifyRefUpdated(reg, "cities", "abc123", Some("def456"), 1700000000000L)
      assert(ds.map(d => (d.statusCode, d.error)) === Seq((200, None)))
      assert(received.size === 1)
      val r = received.poll()

      // payload is the reference's entity shape (version 2, head ref)
      val body = new String(r.body, "UTF-8")
      assert(body ===
        """{"version":2,"dataset_id":"cities","block_ref":"head","new_hash":"abc123","old_hash":"def456"}""")
      assert(r.headers("x-webhook-event-type") === "DATASET.REF.UPDATED")
      // Unix SECONDS on the wire — reference parity
      // (webhook_delivery_worker_impl.rs:135)
      assert(r.headers("x-webhook-timestamp") === "1700000000")
      assert(r.headers("content-digest") === Webhooks.contentDigest(r.body))
      assert(r.headers("signature-input").startsWith(
        """sig1=("@method" "@path" "@authority" "x-webhook-timestamp" "content-digest"); keyid="default"; alg="hmac-sha256"; created=1700000000"""))

      // subscriber-side verify: right secret accepts; wrong secret or
      // tampered body rejects
      val uri = java.net.URI.create(url)
      assert(Webhooks.verify("s3cret", "POST", uri, 1700000000L, r.body,
        r.headers("signature")))
      assert(!Webhooks.verify("wrong", "POST", uri, 1700000000L, r.body,
        r.headers("signature")))
      assert(!Webhooks.verify("s3cret", "POST", uri, 1700000000L,
        (body + " ").getBytes("UTF-8"), r.headers("signature")))
    }
  }

  test("failed deliveries report but never throw; no-subscription datasets are silent") {
    withServer(500) { (url, received) =>
      val root = Files.createTempDirectory("graft-wh2-")
      val reg = registry(root)
      reg.add(Subscription("cities", url, "k"))
      val d = Webhooks.notifyRefUpdated(reg, "cities", "h1", None, 1000L)
      assert(d.head.statusCode === 500 && d.head.error === Some("HTTP 500"))
      // dead endpoint: connection refused surfaces as error, not exception
      reg.remove("cities", url)
      reg.add(Subscription("cities", "http://127.0.0.1:1/hook", "k"))
      val dead = Webhooks.notifyRefUpdated(reg, "cities", "h2", None, 2000L)
      assert(dead.head.statusCode === -1 && dead.head.error.isDefined)
      // unsubscribed dataset: nothing fires
      assert(Webhooks.notifyRefUpdated(reg, "unknown_ds", "h3", None, 3000L) === Nil)
    }
  }

  test("failed deliveries queue and redeliver with backoff until success") {
    val statuses = new java.util.concurrent.atomic.AtomicReference[List[Int]](List(500, 500, 200))
    val received = new ConcurrentLinkedQueue[Received]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", { exchange =>
      val body = exchange.getRequestBody.readAllBytes()
      val headers = {
        val it = exchange.getRequestHeaders.entrySet().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += e.getKey.toLowerCase -> e.getValue.get(0) }
        b.result()
      }
      received.add(Received(exchange.getRequestURI.getPath, body, headers))
      val status = statuses.getAndUpdate(l => if (l.tail.isEmpty) l else l.tail).head
      exchange.sendResponseHeaders(status, -1)
      exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/hook"
      val root = Files.createTempDirectory("graft-wh-retry-")
      val reg = registry(root)
      reg.add(Subscription("cities", url, "rk"))
      val policy = graft.flow.FlowService.RetryPolicy(
        3, 10000L, graft.flow.FlowService.Backoff.Fixed)

      // initial delivery fails -> queued with one failed attempt
      val t0 = 1700000000000L
      val d0 = Webhooks.notifyRefUpdated(reg, "cities", "h1", None, t0, retryPolicy = policy)
      assert(d0.head.error === Some("HTTP 500"))
      val q0 = reg.queued()
      assert(q0.map(p => (p.attempts, p.nextAttemptAt, p.lastError)) ===
        Seq((1, t0 + 10000L, "HTTP 500")))

      // before the backoff instant: nothing attempted
      assert(Webhooks.redeliverDue(reg, t0 + 5000L, retryPolicy = policy) === Nil)
      // retry 1 fails again -> rescheduled one step later
      val r1 = Webhooks.redeliverDue(reg, t0 + 10000L, retryPolicy = policy)
      assert(r1.map(_.error) === Seq(Some("HTTP 500")))
      assert(reg.queued().map(p => (p.attempts, p.nextAttemptAt)) ===
        Seq((2, t0 + 20000L)))

      // retry 2 succeeds -> queue drains; the retried delivery is the
      // ORIGINAL payload, re-signed with the fresh seconds timestamp
      val r2 = Webhooks.redeliverDue(reg, t0 + 20000L, retryPolicy = policy)
      assert(r2.map(d => (d.statusCode, d.error)) === Seq((200, None)))
      assert(reg.queued() === Nil)
      assert(received.size === 3)
      received.poll(); received.poll()
      val last = received.poll()
      assert(new String(last.body, "UTF-8") ===
        """{"version":2,"dataset_id":"cities","block_ref":"head","new_hash":"h1"}""")
      assert(last.headers("x-webhook-timestamp") === ((t0 + 20000L) / 1000L).toString)
      assert(Webhooks.verify("rk", "POST", java.net.URI.create(url),
        last.headers("x-webhook-timestamp").toLong, last.body, last.headers("signature")))

      // exhausted attempts: a permanently-dead endpoint is given up on
      statuses.set(List(500))
      val tiny = graft.flow.FlowService.RetryPolicy(
        1, 10000L, graft.flow.FlowService.Backoff.Fixed)
      Webhooks.notifyRefUpdated(reg, "cities", "h2", None, t0 + 100000L, retryPolicy = tiny)
      assert(reg.queued().size === 1)
      val r3 = Webhooks.redeliverDue(reg, t0 + 110000L, retryPolicy = tiny)
      assert(r3.map(_.error) === Seq(Some("HTTP 500")))
      assert(reg.queued() === Nil) // dropped, not retried forever

      // unsubscribed entries are dropped without an attempt
      Webhooks.notifyRefUpdated(reg, "cities", "h3", None, t0 + 200000L, retryPolicy = policy)
      assert(reg.queued().size === 1)
      reg.remove("cities", url)
      assert(Webhooks.redeliverDue(reg, t0 + 300000L, retryPolicy = policy) === Nil)
      assert(reg.queued() === Nil)
    } finally server.stop(0)
  }

  test("CLI: webhook add/list/rm; ingest fires a signed delivery on head move") {
    import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
    withServer(200) { (url, received) =>
      val root = Files.createTempDirectory("graft-wh-cli-")
      val csv = root.resolve("towns.csv")
      Files.writeString(csv, "town,pop\nnola,364000\n")
      val ds = graft.dataset.Dataset.create(spark, root.resolve("towns"), "towns")
      ds.chain.append(
        graft.model.MetadataEvent.SetPollingSource(readFormat = "csv",
          schemaDdl = Some("town STRING, pop INT"),
          merge = graft.model.MergeConf("ledger", primaryKey = Seq("town"))), 0L)

      def cli(args: String*): (Int, String) = {
        val bos = new ByteArrayOutputStream()
        val code = graft.Cli.run(spark, args.toSeq,
          new BufferedReader(new StringReader("")), new PrintStream(bos, true, "UTF-8"))
        (code, bos.toString("UTF-8"))
      }

      assert(cli("--workspace", root.toString, "webhook", "add", "towns", url, "k2")._1 === 0)
      val (_, listed) = cli("--workspace", root.toString, "webhook", "list")
      assert(listed.trim === s"towns\t$url\tDATASET.REF.UPDATED")

      val (ci, _) = cli("--workspace", root.toString,
        "ingest", "towns", csv.toString, "2024-01-01T00:00:00Z")
      assert(ci === 0)
      assert(received.size === 1)
      val r = received.poll()
      val newHead = graft.dataset.Dataset.open(spark, root.resolve("towns")).chain.head.get._2
      assert(new String(r.body, "UTF-8").contains(s""""new_hash":"$newHead""""))
      assert(Webhooks.verify("k2", "POST", java.net.URI.create(url),
        r.headers("x-webhook-timestamp").toLong, r.body, r.headers("signature")))

      // idempotent re-ingest: head unchanged, no delivery
      val (ci2, out2) = cli("--workspace", root.toString,
        "ingest", "towns", csv.toString, "2024-02-01T00:00:00Z")
      assert(ci2 === 0 && out2.contains("up to date"))
      assert(received.isEmpty)

      assert(cli("--workspace", root.toString, "webhook", "rm", "towns", url)._1 === 0)
      assert(cli("--workspace", root.toString, "webhook", "list")._2.trim.isEmpty)
    }
  }

  test("failure events deliver through the queue, filtered by subscription event types") {
    withServer(200) { (url, received) =>
      val root = Files.createTempDirectory("graft-wh-fail-")
      val reg = registry(root)
      // default subscription listens to REF.UPDATED only — no failure pages
      reg.add(Subscription("cities", url, "k"))
      reg.add(Subscription("cities", url + "?pager", "k2",
        eventTypes = Seq(Webhooks.EventFlowFailed, Webhooks.EventVerificationFailed)))

      val d1 = Webhooks.notifyEvent(reg, "cities", Webhooks.EventFlowFailed,
        Webhooks.flowFailedPayload("cities", attempts = 3, error = "boom \"quoted\""),
        1700000000000L)
      assert(d1.map(d => (d.statusCode, d.error)) === Seq((200, None)))
      assert(received.size === 1, "only the pager subscription matches")
      val r1 = received.poll()
      assert(r1.headers("x-webhook-event-type") === "FLOW.RUN.FAILED")
      val body1 = new String(r1.body, "UTF-8")
      assert(body1.contains(""""dataset_id":"cities"""") && body1.contains(""""attempts":3"""))
      assert(body1.contains("""boom \"quoted\"""")) // JSON-escaped, not mangled
      assert(Webhooks.verify("k2", "POST", java.net.URI.create(url + "?pager"),
        r1.headers("x-webhook-timestamp").toLong, r1.body, r1.headers("signature")))

      val d2 = Webhooks.notifyEvent(reg, "cities", Webhooks.EventVerificationFailed,
        Webhooks.verificationFailedPayload("cities", "slice 2 hash mismatch"), 1700000001000L)
      assert(d2.size === 1 && received.size === 1)
      assert(received.poll().headers("x-webhook-event-type") === "DATASET.VERIFICATION.FAILED")
    }
  }

  test("CLI: flow run pages FLOW.RUN.FAILED subscribers on exhausted failures") {
    import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
    withServer(200) { (url, received) =>
      val root = Files.createTempDirectory("graft-wh-flowfail-")
      // a root dataset whose polling source reads a MISSING glob dir is
      // fine (no files = up to date); break it with an invalid fetch kind
      val ds = graft.dataset.Dataset.create(spark, root.resolve("towns"), "towns")
      ds.chain.append(
        graft.model.MetadataEvent.SetPollingSource(readFormat = "csv",
          schemaDdl = Some("town STRING, pop INT"),
          merge = graft.model.MergeConf("ledger", primaryKey = Seq("town")),
          fetch = Some(graft.model.MetadataEvent.FetchConf(kind = "url",
            url = Some("http://127.0.0.1:1/unreachable.csv")))), 0L)

      def cli(args: String*): (Int, String) = {
        val bos = new ByteArrayOutputStream()
        val code = graft.Cli.run(spark, args.toSeq,
          new BufferedReader(new StringReader("")), new PrintStream(bos, true, "UTF-8"))
        (code, bos.toString("UTF-8"))
      }
      assert(cli("--workspace", root.toString, "webhook", "add", "towns", url, "k",
        "FLOW.RUN.FAILED")._1 === 0)
      assert(cli("--workspace", root.toString, "webhook", "add", "towns", url, "k",
        "NOT.A.TYPE")._1 === 1)
      assert(cli("--workspace", root.toString, "flow", "set", "towns", "every", "1h")._1 === 0)

      val (code, out) = cli("--workspace", root.toString,
        "flow", "run", "2024-06-01T00:00:00Z")
      assert(code === 1 && out.contains("failed"), out)
      assert(received.size === 1)
      val r = received.poll()
      assert(r.headers("x-webhook-event-type") === "FLOW.RUN.FAILED")
      assert(new String(r.body, "UTF-8").contains(""""dataset_id":"towns""""))
    }
  }
}
