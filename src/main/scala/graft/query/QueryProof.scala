package graft.query

import java.nio.charset.StandardCharsets
import java.security.{KeyFactory, KeyPair, KeyPairGenerator, PublicKey, Signature}
import java.security.spec.X509EncodedKeySpec
import java.util.Base64

import graft.chain.MetadataChain

/**
 * Reproducible-and-signable query responses — the commitment machinery of
 * the reference's `/query` proof support
 * (src/adapter/http/src/data/query_types.rs:223-307): a response can carry a
 * proof binding (statement, pinned input blocks, result hash) under a node
 * signature, so a third party can later (a) check the signature, and
 * (b) re-run the statement against the pinned block hashes and compare the
 * result hash — catching both a lying node and a changed dataset.
 *
 * The result hash is the engine's order/layout-independent logical hash
 * (XOR-aggregated row hashes + count), so reproduction is insensitive to
 * partitioning or row order. Signatures are Ed25519 via the JDK.
 */
final case class QueryProof(
    queryDigest: String,
    inputs: Map[String, String], // dataset name -> pinned block hash
    resultHash: String,
    signature: Option[String] = None, // base64(Ed25519 over canonicalString)
    publicKey: Option[String] = None  // base64(X.509 SPKI)
) {

  /** The byte string the signature covers — versioned, order-canonical. */
  def canonicalString: String = {
    val pins = inputs.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
    s"graft-query-proof-v1\n$queryDigest\n$pins\n$resultHash"
  }

  def signed(keyPair: KeyPair): QueryProof = {
    val sig = Signature.getInstance("Ed25519")
    sig.initSign(keyPair.getPrivate)
    sig.update(canonicalString.getBytes(StandardCharsets.UTF_8))
    copy(
      signature = Some(Base64.getEncoder.encodeToString(sig.sign())),
      publicKey = Some(Base64.getEncoder.encodeToString(keyPair.getPublic.getEncoded))
    )
  }

  /** Does the embedded signature verify over the canonical form? */
  def signatureValid: Boolean =
    (signature, publicKey) match {
      case (Some(s), Some(pk)) =>
        try {
          val key: PublicKey = KeyFactory
            .getInstance("Ed25519")
            .generatePublic(new X509EncodedKeySpec(Base64.getDecoder.decode(pk)))
          val sig = Signature.getInstance("Ed25519")
          sig.initVerify(key)
          sig.update(canonicalString.getBytes(StandardCharsets.UTF_8))
          sig.verify(Base64.getDecoder.decode(s))
        } catch { case _: Exception => false }
      case _ => false
    }
}

object QueryProof {

  def queryDigest(statement: String): String =
    MetadataChain.sha256Hex(statement.getBytes(StandardCharsets.UTF_8))

  /** A fresh Ed25519 node identity (callers persist their own for a stable
    * node identity; tests and ephemeral sessions generate one). */
  def generateKeyPair(): KeyPair =
    KeyPairGenerator.getInstance("Ed25519").generateKeyPair()
}
