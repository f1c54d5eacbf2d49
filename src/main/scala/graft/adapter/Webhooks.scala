package graft.adapter

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.json4s.DefaultFormats
import org.json4s.jackson.Serialization

/**
 * Webhooks: signed `DATASET.REF.UPDATED` notifications to subscriber URLs —
 * the reference's webhook subsystem (src/domain/webhooks/; payload entity
 * src/adapter/flow-webhook/src/entities/webhook_dataset_ref_updated_payload
 * .rs:16-27; delivery headers src/domain/webhooks/services/src/services/
 * webhook_headers.rs) with its RFC 9421 HTTP-message-signature scheme
 * (webhook_signer_impl.rs:125-184):
 *
 *  - `Content-Digest: sha-256=:<b64(sha256(payload))>:`
 *  - signature base over `"@method" "@path" "@authority"
 *    "x-webhook-timestamp" "content-digest"` + `"@signature-params"` line;
 *  - `Signature: sig1=:<b64(hmac-sha256(base, secret))>:` and the matching
 *    `Signature-Input` header.
 *
 * Subscriptions live in `<workspace>/.graft/webhooks.json` (the reference
 * keeps them in its DB). Delivery is attempted synchronously on commit;
 * failures land in a persistent queue (`.graft/webhook_queue.json`) and are
 * redelivered with exponential backoff on subsequent commits/ticks, capped
 * at [[DefaultRetryPolicy]] attempts — the moral equivalent of the
 * reference's task-system-driven delivery worker
 * (src/domain/webhooks/services/src/services/webhook_delivery_worker_impl.rs).
 * Retried deliveries carry the ORIGINAL payload re-signed with a fresh
 * timestamp, exactly like a fresh delivery.
 *
 * `x-webhook-timestamp` carries Unix SECONDS, matching the reference
 * (webhook_delivery_worker_impl.rs:135, `created_at.timestamp()`); the
 * same seconds value is what the signature base signs.
 */
object Webhooks {

  val EventRefUpdated = "DATASET.REF.UPDATED"
  /** Beyond the reference's two-type catalog (webhook_event_type.rs:17-19:
    * TEST + DATASET.REF.UPDATED): operational failure events, delivered
    * through the same signed queue — a subscriber can page on a pipeline
    * break, not only on successful head moves. */
  val EventFlowFailed = "FLOW.RUN.FAILED"
  val EventVerificationFailed = "DATASET.VERIFICATION.FAILED"
  val EventTest = "TEST"
  val AllEventTypes: Seq[String] =
    Seq(EventRefUpdated, EventFlowFailed, EventVerificationFailed, EventTest)
  val KeyId = "default"

  final case class Subscription(
      dataset: String,
      url: String,
      secret: String,
      eventTypes: Seq[String] = Seq(EventRefUpdated)
  )

  final case class Delivery(
      subscription: Subscription,
      statusCode: Int,
      error: Option[String]
  )

  /** A failed delivery awaiting redelivery: the original payload (base64,
    * re-signed fresh on each attempt), how many attempts have failed, and
    * when the next one is due. */
  final case class PendingDelivery(
      dataset: String,
      url: String,
      eventType: String,
      payloadB64: String,
      attempts: Int,
      nextAttemptAt: Long,
      lastError: String
  )

  /** 5 retries, 30 s base, exponential (30s → 1m → 2m → 4m → 8m), jittered
    * deterministically per (url, attempt) by [[graft.flow.FlowService
    * .RetryPolicy]] — webhook redelivery rides the same policy machinery as
    * flow retries, like the reference routes both through its task system.
    * The jitter spreads simultaneous redeliveries of many subscribers after
    * a shared outage; the delivery sites pass the subscriber URL as seed. */
  val DefaultRetryPolicy: graft.flow.FlowService.RetryPolicy =
    graft.flow.FlowService.RetryPolicy(
      5, 30000L, graft.flow.FlowService.Backoff.ExponentialWithJitter)

  // --------------------------------------------------------------- registry

  final class Registry(workspace: Path, conf: Configuration) {
    private implicit val formats: DefaultFormats.type = DefaultFormats
    private val file = new Path(new Path(workspace, ".graft"), "webhooks.json")
    private val fs = file.getFileSystem(conf)

    def list(): Seq[Subscription] =
      if (!fs.exists(file)) Nil
      else {
        val in = fs.open(file)
        val s = try new String(in.readAllBytes(), UTF_8) finally in.close()
        Serialization.read[Seq[Subscription]](s)
      }

    def add(sub: Subscription): Unit = write(list() :+ sub)

    /** Remove every subscription of `dataset` pointing at `url`. */
    def remove(dataset: String, url: String): Unit =
      write(list().filterNot(s => s.dataset == dataset && s.url == url))

    def forDataset(dataset: String, eventType: String): Seq[Subscription] =
      list().filter(s => s.dataset == dataset && s.eventTypes.contains(eventType))

    private def write(subs: Seq[Subscription]): Unit =
      graft.FsAtomic.write(fs, file, Serialization.write(subs).getBytes(UTF_8))

    // -------- delivery queue (same .graft dir, separate file)

    private val queueFile = new Path(new Path(workspace, ".graft"), "webhook_queue.json")

    def queued(): Seq[PendingDelivery] =
      if (!fs.exists(queueFile)) Nil
      else {
        val in = fs.open(queueFile)
        val s = try new String(in.readAllBytes(), UTF_8) finally in.close()
        Serialization.read[Seq[PendingDelivery]](s)
      }

    def saveQueue(q: Seq[PendingDelivery]): Unit =
      graft.FsAtomic.write(fs, queueFile, Serialization.write(q).getBytes(UTF_8))
  }

  // ---------------------------------------------------------------- signing

  private def b64(bytes: Array[Byte]): String = Base64.getEncoder.encodeToString(bytes)

  def contentDigest(payload: Array[Byte]): String =
    s"sha-256=:${b64(MessageDigest.getInstance("SHA-256").digest(payload))}:"

  private def hmacSha256(base: String, secret: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
    b64(mac.doFinal(base.getBytes(UTF_8)))
  }

  /** (signature, signature-input, content-digest) headers for one delivery —
    * the construction of webhook_signer_impl.rs:142-184, verifiable by any
    * RFC 9421 consumer. */
  def rfc9421Headers(
      secret: String,
      timestampMs: Long,
      payload: Array[Byte],
      targetUrl: java.net.URI
  ): (String, String, String) = {
    val digest = contentDigest(payload)
    val created = timestampMs / 1000L
    val fields = """"@method" "@path" "@authority" "x-webhook-timestamp" "content-digest""""
    val params = s""";keyid="$KeyId";alg="hmac-sha256";created=$created"""
    val sigInput = s"""sig1=($fields); keyid="$KeyId"; alg="hmac-sha256"; created=$created"""
    val authority = targetUrl.getAuthority
    val path = if (targetUrl.getPath.isEmpty) "/" else targetUrl.getPath
    // the signed x-webhook-timestamp value is the SECONDS string actually
    // sent on the wire (reference parity: seconds, not millis)
    val base = Seq(
      s""""@method": POST""",
      s""""@path": $path""",
      s""""@authority": $authority""",
      s""""x-webhook-timestamp": $created""",
      s""""content-digest": $digest""",
      s""""@signature-params": ($fields)""",
      params
    ).mkString("\n")
    (s"sig1=:${hmacSha256(base, secret)}:", sigInput, digest)
  }

  // --------------------------------------------------------------- delivery

  /** The DATASET.REF.UPDATED payload (webhook_dataset_ref_updated_payload
    * .rs:16-27; `block_ref` is always "head" here — the only ref a chain
    * carries). */
  def refUpdatedPayload(dataset: String, newHash: String, oldHash: Option[String]): String = {
    val old = oldHash.map(h => s""","old_hash":"$h"""").getOrElse("")
    s"""{"version":2,"dataset_id":"$dataset","block_ref":"head","new_hash":"$newHash"$old}"""
  }

  /** One signed POST to one subscriber. Never throws. */
  private def sendOne(
      sub: Subscription,
      eventType: String,
      payload: Array[Byte],
      nowMs: Long,
      client: java.net.http.HttpClient
  ): Delivery =
    try {
      val uri = java.net.URI.create(sub.url)
      val (sig, sigInput, digest) = rfc9421Headers(sub.secret, nowMs, payload, uri)
      val req = java.net.http.HttpRequest.newBuilder(uri)
        .header("content-type", "application/json")
        .header("content-digest", digest)
        .header("signature", sig)
        .header("signature-input", sigInput)
        // Unix seconds — the exact value the signature base covers
        .header("x-webhook-timestamp", (nowMs / 1000L).toString)
        .header("x-webhook-event-type", eventType)
        .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(payload))
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
      Delivery(sub, resp.statusCode(),
        if (resp.statusCode() / 100 == 2) None else Some(s"HTTP ${resp.statusCode()}"))
    } catch {
      case e: Exception => Delivery(sub, -1, Some(e.getMessage))
    }

  /** The FLOW.RUN.FAILED payload (beyond-reference; version field and
    * dataset_id key follow the ref-updated payload's conventions). */
  def flowFailedPayload(dataset: String, attempts: Int, error: String): String = {
    implicit val formats: DefaultFormats.type = DefaultFormats
    Serialization.write(Map(
      "version" -> 1, "dataset_id" -> dataset, "event" -> "flow_run_failed",
      "attempts" -> attempts, "error" -> error))
  }

  /** The DATASET.VERIFICATION.FAILED payload (beyond-reference). */
  def verificationFailedPayload(dataset: String, detail: String): String = {
    implicit val formats: DefaultFormats.type = DefaultFormats
    Serialization.write(Map(
      "version" -> 1, "dataset_id" -> dataset, "event" -> "verification_failed",
      "detail" -> detail))
  }

  /** Deliver one signed event to every matching subscription. Failures are
    * reported per-delivery, never thrown — a dead subscriber must not fail
    * the commit that triggered the notification — and are queued for
    * backoff redelivery by [[redeliverDue]]. */
  def notifyEvent(
      registry: Registry,
      dataset: String,
      eventType: String,
      payloadJson: String,
      nowMs: Long,
      client: java.net.http.HttpClient = java.net.http.HttpClient.newHttpClient(),
      retryPolicy: graft.flow.FlowService.RetryPolicy = DefaultRetryPolicy
  ): Seq[Delivery] = {
    val payload = payloadJson.getBytes(UTF_8)
    val deliveries = registry.forDataset(dataset, eventType).map { sub =>
      sub -> sendOne(sub, eventType, payload, nowMs, client)
    }
    val failed = deliveries.collect { case (sub, d) if d.error.isDefined =>
      PendingDelivery(dataset, sub.url, eventType, b64(payload),
        attempts = 1,
        nextAttemptAt = retryPolicy.nextAttemptAt(1, nowMs, sub.url).getOrElse(Long.MaxValue),
        lastError = d.error.get)
    }
    // capped at 0 retries -> nextAttemptAt = MaxValue entries would pin the
    // queue forever; drop them immediately instead
    val keep = failed.filter(_.nextAttemptAt != Long.MaxValue)
    if (keep.nonEmpty) registry.saveQueue(registry.queued() ++ keep)
    deliveries.map(_._2)
  }

  /** [[notifyEvent]] specialized to the reference's DATASET.REF.UPDATED. */
  def notifyRefUpdated(
      registry: Registry,
      dataset: String,
      newHash: String,
      oldHash: Option[String],
      nowMs: Long,
      client: java.net.http.HttpClient = java.net.http.HttpClient.newHttpClient(),
      retryPolicy: graft.flow.FlowService.RetryPolicy = DefaultRetryPolicy
  ): Seq[Delivery] =
    notifyEvent(registry, dataset, EventRefUpdated,
      refUpdatedPayload(dataset, newHash, oldHash), nowMs, client, retryPolicy)

  /** Redeliver every queued delivery whose backoff instant has come.
    * Success or exhausted attempts remove the entry; another failure
    * reschedules it one backoff step later. Deliveries whose subscription
    * has since been removed are dropped. Returns the attempted deliveries
    * (empty when nothing was due). */
  def redeliverDue(
      registry: Registry,
      nowMs: Long,
      client: java.net.http.HttpClient = java.net.http.HttpClient.newHttpClient(),
      retryPolicy: graft.flow.FlowService.RetryPolicy = DefaultRetryPolicy
  ): Seq[Delivery] = {
    val q = registry.queued()
    if (q.isEmpty) return Nil
    val subs = registry.list().map(s => (s.dataset, s.url) -> s).toMap
    var attempted = Vector.empty[Delivery]
    val next = q.flatMap { p =>
      if (nowMs < p.nextAttemptAt) Some(p) // not due yet
      else subs.get((p.dataset, p.url)) match {
        case None => None // unsubscribed since: drop silently
        case Some(sub) =>
          val payload = Base64.getDecoder.decode(p.payloadB64)
          val d = sendOne(sub, p.eventType, payload, nowMs, client)
          attempted :+= d
          if (d.error.isEmpty) None
          else {
            val attempts = p.attempts + 1
            retryPolicy.nextAttemptAt(attempts, nowMs, sub.url) match {
              case Some(at) => Some(p.copy(attempts = attempts, nextAttemptAt = at,
                lastError = d.error.get))
              case None     => None // exhausted: give up on this delivery
            }
          }
      }
    }
    registry.saveQueue(next)
    attempted
  }

  /** Recompute + compare the signature of a received delivery — the
    * subscriber-side verification (used by the spec; handed to library
    * consumers as the reference verifier for their endpoints).
    * `timestampS` is the `x-webhook-timestamp` header value: Unix SECONDS. */
  def verify(
      secret: String,
      method: String,
      uri: java.net.URI,
      timestampS: Long,
      payload: Array[Byte],
      signatureHeader: String
  ): Boolean = {
    require(method == "POST", "webhook deliveries are always POST")
    val (expected, _, _) = rfc9421Headers(secret, timestampS * 1000L, payload, uri)
    java.security.MessageDigest.isEqual(expected.getBytes(UTF_8), signatureHeader.getBytes(UTF_8))
  }
}
