package graft.adapter

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.operators.Export
import graft.query.QueryService

/**
 * Minimal REST data API over a set of datasets — the reference's HTTP data
 * adapter surface (src/adapter/http/src/data/{query_handler,ingest_handler}
 * .rs), on the JDK's built-in HttpServer (zero extra dependencies; this is a
 * control-plane adapter, not a data-plane component).
 *
 *   POST /query                  {"query":"SELECT …"} → {"data":[{…}],"state":{…}}
 *                                {"query":…,"format":"arrow"} → Arrow IPC bytes
 *                                (the FlightSQL do_get_statement result
 *                                surface, adapter/flight-sql/service.rs:871)
 *   GET  /datasets               list dataset names
 *   GET  /datasets/{name}/tail?n=10          last n records (JsonAoS)
 *   GET  /datasets/{name}/schema?format=ddl|json|parquet|arrow
 *                                (odf/data-utils/src/schema/format.rs)
 *   POST /datasets/{name}/ingest?format=csv  push-ingest the request body
 *                                (ingest_handler.rs:66-175)
 */
final class RestServer(
    qs: QueryService,
    datasets: Map[String, Dataset],
    port: Int = 0,
    nodeKey: Option[java.security.KeyPair] = None
) {
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  def start(): RestServer = {
    server.createContext("/query", (ex: HttpExchange) => handle(ex)(handleQuery))
    server.createContext("/datasets", (ex: HttpExchange) => handle(ex)(handleDatasets))
    server.createContext("/odata", (ex: HttpExchange) => handle(ex)(handleOData))
    server.createContext("/graphql", (ex: HttpExchange) => handle(ex)(handleGraphQL))
    server.setExecutor(null)
    server.start()
    this
  }

  /** GraphQL data surface (adapter/graphql/src/queries/data.rs:26-91):
    * POST /graphql {"query":"{ dataset(name: \"x\") { tail(limit: 5) } }"}. */
  private def handleGraphQL(ex: HttpExchange): Response = {
    if (ex.getRequestMethod != "POST") return json(405, """{"error":"POST required"}""")
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val doc = extractJsonField(body, "query")
      .getOrElse(return json(400, """{"error":"body must be {\"query\":\"{...}\"}"}"""))
    json(200, GraphQL.execute(qs, datasets, doc))
  }

  def stop(): Unit = server.stop(0)

  private def handle(ex: HttpExchange)(f: HttpExchange => Response): Unit =
    try {
      val r = f(ex)
      respond(ex, r.code, r.body, r.contentType)
    } catch {
      case e: Exception =>
        respond(ex, 400,
          s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.getClass.getName))}}""".getBytes(StandardCharsets.UTF_8),
          "application/json")
    } finally ex.close()

  private final case class Response(code: Int, body: Array[Byte], contentType: String)
  private def json(code: Int, s: String): Response =
    Response(code, s.getBytes(StandardCharsets.UTF_8), "application/json")

  private def handleQuery(ex: HttpExchange): Response = {
    if (ex.getRequestMethod != "POST") return json(405, """{"error":"POST required"}""")
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val sql = extractJsonField(body, "query")
      .getOrElse(return json(400, """{"error":"body must be {\"query\":\"...\"}"}"""))
    val skip = extractJsonField(body, "skip").map(_.toLong).getOrElse(0L)
    val limit = extractJsonField(body, "limit").map(_.toInt).getOrElse(100)
    val (df, state) = qs.sqlWithState(sql)
    val page = qs.page(df, skip, limit)
    extractJsonField(body, "format") match {
      case Some("arrow") =>
        // Result page as one Arrow IPC stream — what a FlightSQL client
        // would fetch from do_get; state pins travel in a response header.
        val pins = state.inputs.map { case (k, v) => s"$k=$v" }.mkString(";")
        ex.getResponseHeaders.add("X-Graft-State", pins)
        Response(200, graft.operators.ArrowCodec.toArrowIpc(page),
          "application/vnd.apache.arrow.stream")
      case _ =>
        val data = Export.jsonAoS(page)
        val pins =
          state.inputs.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
        // {"proof":true} -> attach the signed commitment over the FULL result
        // (query_types.rs:223-307); pagination happens after proving.
        val proofJson =
          if (body.replaceAll("\\s", "").contains("\"proof\":true")) {
            val (_, proof) = qs.sqlProved(sql, nodeKey = nodeKey)
            val fields = Seq(
              s""""queryDigest":${jstr(proof.queryDigest)}""",
              s""""resultHash":${jstr(proof.resultHash)}"""
            ) ++ proof.signature.map(s => s""""signature":${jstr(s)}""") ++
              proof.publicKey.map(k => s""""publicKey":${jstr(k)}""")
            s""","proof":{${fields.mkString(",")}}"""
          } else ""
        json(200, s"""{"data":$data,"state":$pins$proofJson}""")
    }
  }

  private def queryParam(ex: HttpExchange, key: String): Option[String] =
    Option(ex.getRequestURI.getQuery)
      .flatMap(_.split("&").find(_.startsWith(s"$key=")))
      .map(_.stripPrefix(s"$key="))

  /** URL-decoded query options (OData options carry spaces and quotes). */
  private def queryOptions(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery)
      .map(_.split("&").toSeq.flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) =>
            Some(
              java.net.URLDecoder.decode(k, StandardCharsets.UTF_8) ->
                java.net.URLDecoder.decode(v, StandardCharsets.UTF_8))
          case _ => None
        }
      }.toMap)
      .getOrElse(Map.empty)

  /** OData v4 read surface (context.rs:71-162): service doc, $metadata,
    * entity-set queries with $top/$skip/$select/$orderby/$filter. */
  private def handleOData(ex: HttpExchange): Response = {
    val path = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
    path.toSeq match {
      case Seq("odata") => json(200, OData.serviceDocument(qs, "/odata"))
      case Seq("odata", "$metadata") =>
        Response(200, OData.metadataXml(qs).getBytes(StandardCharsets.UTF_8), "application/xml")
      case Seq("odata", name) =>
        if (!datasets.contains(name))
          return json(404, s"""{"error":"unknown entity set $name"}""")
        val df = OData.entitySet(qs, name, queryOptions(ex))
        json(200,
          s"""{"@odata.context":"/odata/$$metadata#$name","value":${Export.jsonAoS(df)}}""")
      case _ => json(404, """{"error":"not found"}""")
    }
  }

  private def handleDatasets(ex: HttpExchange): Response = {
    val path = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
    path match {
      case Array("datasets") =>
        json(200, qs.knownDatasets.map(jstr).mkString("[", ",", "]"))
      case Array("datasets", name, "tail") =>
        val n = queryParam(ex, "n").map(_.toInt).getOrElse(10)
        json(200, Export.jsonAoS(qs.tail(name, n)))
      case Array("datasets", name, "schema") =>
        val form = queryParam(ex, "format").getOrElse("ddl")
        val resolved = form match {
          case "ddl"     => qs.schemaDdl(name).map(d => s"""{"format":"ddl","schema":${jstr(d)}}""")
          case "json"    => qs.schemaJson(name).map(d => s"""{"format":"json","schema":$d}""")
          case "parquet" => qs.schemaParquet(name).map(d => s"""{"format":"parquet","schema":${jstr(d)}}""")
          case "arrow"   => qs.schemaArrowJson(name).map(d => s"""{"format":"arrow","schema":$d}""")
          case other     => return json(400, s"""{"error":"unknown schema format $other"}""")
        }
        resolved
          .map(json(200, _))
          .getOrElse(json(404, s"""{"error":"dataset $name has no schema yet"}"""))
      case Array("datasets", name, "ingest") =>
        if (ex.getRequestMethod != "POST") return json(405, """{"error":"POST required"}""")
        val ds = datasets.getOrElse(
          name, return json(404, s"""{"error":"unknown dataset $name"}"""))
        val tmp: Path = Files.createTempFile("graft-push-", ".dat")
        Files.write(tmp, ex.getRequestBody.readAllBytes())
        // ?source=<name> routes through a declared AddPushSource; otherwise
        // the polling source's read config is reused (prep skipped — the
        // body is already the prepared payload, ingest_handler.rs:66-175).
        val pushSource = Option(ex.getRequestURI.getQuery)
          .flatMap(_.split("&").find(_.startsWith("source=")))
          .map(_.stripPrefix("source="))
        val event = pushSource match {
          case Some(src) =>
            IngestWriter.ingestPushSource(ds, src, tmp.toString, System.currentTimeMillis())
          case None =>
            IngestWriter.ingestFile(ds, tmp.toString, System.currentTimeMillis(), applyPrep = false)
        }
        event match {
          case Some(e) =>
            json(200, s"""{"committed":true,"offsetStart":${e.offsetStart},"offsetEnd":${e.offsetEnd},"numRecords":${e.numRecords}}""")
          case None => json(200, """{"committed":false,"upToDate":true}""")
        }
      // ---- simple transfer protocol (read side): enough surface for a
      // remote client to mirror the chain — head ref, the content-addressed
      // block/slice/checkpoint objects. The HTTP analog of the reference's
      // dataset object endpoints backing SimpleTransferProtocol
      // (src/infra/core/src/utils/simple_transfer_protocol.rs).
      case Array("datasets", name, "sync", "head") =>
        val ds = datasets.getOrElse(
          name, return json(404, s"""{"error":"unknown dataset $name"}"""))
        ds.chain.head match {
          case Some((seq, hash)) => json(200, s"""{"seq":$seq,"hash":${jstr(hash)}}""")
          case None              => json(404, """{"error":"empty chain"}""")
        }
      case Array("datasets", name, "sync", "blocks") =>
        val ds = datasets.getOrElse(
          name, return json(404, s"""{"error":"unknown dataset $name"}"""))
        json(200, ds.chain.blockFiles().map(p => jstr(p.getName)).mkString("[", ",", "]"))
      case Array("datasets", name, "sync", "blocks", blockFile) =>
        serveChainFile(name, c => new org.apache.hadoop.fs.Path(c.blocksDir, blockFile))
      case Array("datasets", name, "sync", "data", hash) =>
        serveChainFile(name, _.dataFile(hash))
      case Array("datasets", name, "sync", "checkpoints", ckpt) =>
        val ds = datasets.getOrElse(
          name, return json(404, s"""{"error":"unknown dataset $name"}"""))
        val dir = new org.apache.hadoop.fs.Path(ds.chain.checkpointsDir, ckpt)
        if (!ds.chain.fs.exists(dir)) return json(404, """{"error":"no such checkpoint"}""")
        def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
          ds.chain.fs.listStatus(p).toSeq.sortBy(_.getPath.getName).flatMap { st =>
            if (st.isDirectory) walk(st.getPath)
            else Seq(st.getPath.toUri.getPath.stripPrefix(dir.toUri.getPath).stripPrefix("/"))
          }
        json(200, walk(dir).map(jstr).mkString("[", ",", "]"))
      case Array("datasets", name, "sync", "checkpoints", ckpt, "file") =>
        val rel = queryParam(ex, "path")
          .getOrElse(return json(400, """{"error":"path param required"}"""))
        require(!rel.contains(".."), "path traversal")
        serveChainFile(name,
          c => new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(c.checkpointsDir, ckpt), rel))
      case _ => json(404, """{"error":"not found"}""")
    }
  }

  /** Stream one content-addressed chain object (block / slice / checkpoint
    * file) as application/octet-stream. */
  private def serveChainFile(
      name: String,
      resolve: graft.chain.MetadataChain => org.apache.hadoop.fs.Path): Response = {
    val ds = datasets.getOrElse(
      name, return json(404, s"""{"error":"unknown dataset $name"}"""))
    val p = resolve(ds.chain)
    if (!ds.chain.fs.exists(p)) return json(404, """{"error":"no such object"}""")
    // raw FS (no .crc sidecar verification): integrity is the CLIENT's job —
    // every object is content-addressed and HttpSync verifies on receipt,
    // same posture as MetadataChain's own raw reads
    val fs = ds.chain.fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other                                      => other
    }
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    Response(200, bytes, "application/octet-stream")
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte], contentType: String): Unit = {
    ex.getResponseHeaders.add("Content-Type", contentType)
    ex.sendResponseHeaders(code, body.length.toLong)
    ex.getResponseBody.write(body)
  }

  /** Tiny extractor for one string/number field of a flat JSON object —
    * avoids a parser dependency for the 2-field request body. */
  private def extractJsonField(json: String, key: String): Option[String] = {
    val str = ("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    val num = ("\"" + key + "\"\\s*:\\s*(-?\\d+)").r
    str
      .findFirstMatchIn(json)
      .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\").replace("\\n", "\n"))
      .orElse(num.findFirstMatchIn(json).map(_.group(1)))
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
}
