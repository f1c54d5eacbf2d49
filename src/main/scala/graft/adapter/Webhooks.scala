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
 * keeps them in its DB); delivery is synchronous fire-per-commit here —
 * retry queues/backoff are the flow-system side of the reference, out of
 * scope the same way batching conditions are for flow-lite.
 */
object Webhooks {

  val EventRefUpdated = "DATASET.REF.UPDATED"
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

    private def write(subs: Seq[Subscription]): Unit = {
      fs.mkdirs(file.getParent)
      val out = fs.create(file, true)
      try out.write(Serialization.write(subs).getBytes(UTF_8))
      finally out.close()
    }
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
    val base = Seq(
      s""""@method": POST""",
      s""""@path": $path""",
      s""""@authority": $authority""",
      s""""x-webhook-timestamp": $timestampMs""",
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

  /** Deliver one signed event to every matching subscription. Failures are
    * reported per-delivery, never thrown — a dead subscriber must not fail
    * the commit that triggered the notification. */
  def notifyRefUpdated(
      registry: Registry,
      dataset: String,
      newHash: String,
      oldHash: Option[String],
      nowMs: Long,
      client: java.net.http.HttpClient = java.net.http.HttpClient.newHttpClient()
  ): Seq[Delivery] = {
    val payload = refUpdatedPayload(dataset, newHash, oldHash).getBytes(UTF_8)
    registry.forDataset(dataset, EventRefUpdated).map { sub =>
      try {
        val uri = java.net.URI.create(sub.url)
        val (sig, sigInput, digest) = rfc9421Headers(sub.secret, nowMs, payload, uri)
        val req = java.net.http.HttpRequest.newBuilder(uri)
          .header("content-type", "application/json")
          .header("content-digest", digest)
          .header("signature", sig)
          .header("signature-input", sigInput)
          .header("x-webhook-timestamp", nowMs.toString)
          .header("x-webhook-event-type", EventRefUpdated)
          .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(payload))
          .build()
        val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
        Delivery(sub, resp.statusCode(),
          if (resp.statusCode() / 100 == 2) None else Some(s"HTTP ${resp.statusCode()}"))
      } catch {
        case e: Exception => Delivery(sub, -1, Some(e.getMessage))
      }
    }
  }

  /** Recompute + compare the signature of a received delivery — the
    * subscriber-side verification (used by the spec; handed to library
    * consumers as the reference verifier for their endpoints). */
  def verify(
      secret: String,
      method: String,
      uri: java.net.URI,
      timestampMs: Long,
      payload: Array[Byte],
      signatureHeader: String
  ): Boolean = {
    require(method == "POST", "webhook deliveries are always POST")
    val (expected, _, _) = rfc9421Headers(secret, timestampMs, payload, uri)
    java.security.MessageDigest.isEqual(expected.getBytes(UTF_8), signatureHeader.getBytes(UTF_8))
  }
}
