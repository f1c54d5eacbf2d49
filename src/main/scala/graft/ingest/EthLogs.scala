package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/**
 * EthereumLogs fetch (SURVEY §2.1 #14 — fetch_service/evm.rs:38-196; DTO
 * FetchStepEthereumLogs dtos_generated.rs:2204): drain `eth_getLogs` over
 * bounded block ranges with resume-from-last-block source state, emitting
 * one NDJSON row per log for the normal read→merge pipeline.
 *
 * The reference compiles a SQL filter expression into getLogs topics via
 * datafusion-ethers; here the filter is the structured (address, topics,
 * block-range) form that API accepts natively. The RPC transport is
 * pluggable: [[JsonRpc]] speaks real JSON-RPC over HTTP (unreachable in this
 * zero-egress environment), and tests drive the identical drain logic
 * through a fake transport.
 */
object EthLogs {

  final case class LogFilter(
      address: Option[String] = None,
      topics: Seq[String] = Nil,
      fromBlock: Option[Long] = None,
      toBlock: Option[Long] = None
  )

  final case class EthLog(
      blockNumber: Long,
      transactionHash: String,
      logIndex: Long,
      address: String,
      topics: Seq[String],
      data: String
  )

  trait EthRpc {
    def blockNumber(): Long
    def getLogs(fromBlock: Long, toBlock: Long, filter: LogFilter): Seq[EthLog]
  }

  /** JSON-RPC 2.0 transport (api: eth_blockNumber, eth_getLogs). */
  final class JsonRpc(nodeUrl: String) extends EthRpc {
    private implicit val formats: Formats = DefaultFormats
    private val client = java.net.http.HttpClient.newHttpClient()

    private def call(method: String, params: JArray): JValue = {
      val body = Serialization.write(
        Map("jsonrpc" -> "2.0", "id" -> 1, "method" -> method)
      ).stripSuffix("}") + s""","params":${JsonMethods.compact(params)}}"""
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(nodeUrl))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2, s"eth rpc: HTTP ${resp.statusCode()}")
      JsonMethods.parse(resp.body()) \ "result"
    }

    private def hex(n: Long): String = "0x" + n.toHexString
    private def unhex(v: JValue): Long =
      java.lang.Long.parseLong(v.extract[String].stripPrefix("0x"), 16)

    override def blockNumber(): Long = {
      implicit val formats: Formats = DefaultFormats
      unhex(call("eth_blockNumber", JArray(Nil)))
    }

    override def getLogs(fromBlock: Long, toBlock: Long, filter: LogFilter): Seq[EthLog] = {
      val f = JObject(
        List(
          "fromBlock" -> JString(hex(fromBlock)),
          "toBlock" -> JString(hex(toBlock))
        ) ++ filter.address.map(a => "address" -> (JString(a): JValue)).toList ++
          (if (filter.topics.nonEmpty)
             List("topics" -> (JArray(filter.topics.map(JString(_): JValue).toList): JValue))
           else Nil)
      )
      (call("eth_getLogs", JArray(List(f))) match {
        case JArray(items) => items
        case _             => Nil
      }).map { log =>
        EthLog(
          blockNumber = unhex(log \ "blockNumber"),
          transactionHash = (log \ "transactionHash").extract[String],
          logIndex = unhex(log \ "logIndex"),
          address = (log \ "address").extract[String],
          topics = (log \ "topics").extract[Seq[String]],
          data = (log \ "data").extract[String]
        )
      }
    }
  }

  /**
   * Bounded drain: fetch logs from (last-ingested-block + 1) — or the
   * filter's fromBlock on the first poll — up to min(latest, toBlock), in
   * `batchBlocks` ranges, at most `maxBatches` ranges per poll (a poll must
   * terminate; the next poll resumes from the returned state). Returns None
   * when there is nothing new, else the NDJSON batch + the new source state
   * (`ethBlock=<last>`), ready for `Readers.ndjson`.
   */
  def fetch(
      rpc: EthRpc,
      filter: LogFilter,
      prevState: Option[String] = None,
      batchBlocks: Long = 1000,
      maxBatches: Int = 10
  ): Option[Fetch.Fetched] = {
    require(batchBlocks > 0 && maxBatches > 0, "batchBlocks and maxBatches must be positive")
    val start = prevState
      .map(_.stripPrefix("ethBlock=").toLong + 1)
      .orElse(filter.fromBlock)
      .getOrElse(0L)
    val end = math.min(rpc.blockNumber(), filter.toBlock.getOrElse(Long.MaxValue))
    if (start > end) return None

    val logs = Seq.newBuilder[EthLog]
    var lo = start
    var batches = 0
    while (lo <= end && batches < maxBatches) {
      val hi = math.min(lo + batchBlocks - 1, end)
      logs ++= rpc.getLogs(lo, hi, filter)
      lo = hi + 1
      batches += 1
    }
    val lastCovered = lo - 1

    implicit val formats: Formats = DefaultFormats
    val lines = logs.result().map(Serialization.write(_))
    val tmp = Files.createTempFile("graft-ethlogs-", ".ndjson")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(UTF_8))
    Some(Fetch.Fetched(tmp, Some(s"ethBlock=$lastCovered")))
  }
}
