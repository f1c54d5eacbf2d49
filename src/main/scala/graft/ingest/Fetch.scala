package graft.ingest

import java.io.{BufferedInputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{GZIPInputStream, ZipInputStream}

import scala.jdk.CollectionConverters._

/**
 * Fetch + prepare: how external bytes arrive before the reader sees them —
 * driver-side steps, mirroring the reference's fetch service
 * (src/infra/core/src/services/ingest/fetch_service/{http,file}.rs) and prep
 * service (prep_service.rs:31-168). Each fetch returns the local file to
 * read plus an opaque source-state string; passing the previous state back
 * lets a poll short-circuit to "up to date" (the reference's ETag /
 * Last-Modified savepoints).
 */
object Fetch {

  final case class Fetched(path: Path, sourceState: Option[String])

  /**
   * Fetch a URL. `file://` (and bare paths) are served locally with
   * mtime+size as the caching state. `http(s)://` uses the JDK client with
   * ETag / Last-Modified conditional requests — the reference's semantics
   * (fetch_service/http.rs), though unreachable in this zero-egress
   * environment.
   */
  def url(url: String, prevState: Option[String] = None): Option[Fetched] = {
    if (url.startsWith("http://") || url.startsWith("https://")) fetchHttp(url, prevState)
    else {
      val p = Paths.get(url.stripPrefix("file://"))
      require(Files.exists(p), s"fetch url: $p does not exist")
      val state = s"mtime=${Files.getLastModifiedTime(p).toMillis};size=${Files.size(p)}"
      if (prevState.contains(state)) None // unchanged -> up to date
      else Some(Fetched(p, Some(state)))
    }
  }

  private def fetchHttp(u: String, prevState: Option[String]): Option[Fetched] = {
    val client = java.net.http.HttpClient.newHttpClient()
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(u))
    prevState.foreach {
      case s if s.startsWith("etag=") => b.header("If-None-Match", s.stripPrefix("etag="))
      case s if s.startsWith("lm=")   => b.header("If-Modified-Since", s.stripPrefix("lm="))
      case _                          => ()
    }
    val resp = client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() == 304) None
    else {
      require(resp.statusCode() / 100 == 2, s"fetch url: HTTP ${resp.statusCode()} for $u")
      val tmp = Files.createTempFile("graft-fetch-", ".bin")
      Files.write(tmp, resp.body())
      val state = resp.headers().firstValue("ETag").map[String]("etag=" + _)
        .or(() => resp.headers().firstValue("Last-Modified").map[String]("lm=" + _))
      Some(Fetched(tmp, Option(state.orElse(null))))
    }
  }

  /**
   * Glob over local files, ordered by name; the source state is the last
   * file name already ingested, so each poll returns only newer files
   * (fetch_service/file.rs FilesGlob + EventTimeSource::FromPath).
   * `eventTimeRegex`, when given, must capture the event time from the file
   * name (group 1); returned alongside each file.
   */
  final case class GlobFile(path: Path, eventTimeFromPath: Option[String])

  def filesGlob(
      pattern: String,
      prevState: Option[String] = None,
      eventTimeRegex: Option[String] = None
  ): (Seq[GlobFile], Option[String]) = {
    val p = Paths.get(pattern)
    val dir = Option(p.getParent).getOrElse(Paths.get("."))
    val matcher = dir.getFileSystem.getPathMatcher("glob:" + p.getFileName.toString)
    val all = Files
      .list(dir)
      .iterator()
      .asScala
      .filter(f => matcher.matches(f.getFileName))
      .toSeq
      .sortBy(_.getFileName.toString)
    val fresh = prevState match {
      case Some(last) => all.filter(_.getFileName.toString > last)
      case None       => all
    }
    val re = eventTimeRegex.map(_.r)
    val files = fresh.map { f =>
      val et = re.flatMap(_.findFirstMatchIn(f.getFileName.toString).map(_.group(1)))
      GlobFile(f, et)
    }
    val newState = fresh.lastOption.map(_.getFileName.toString).orElse(prevState)
    (files, newState)
  }

  /** Run a command and capture its stdout as the fetched payload
    * (fetch_service/container.rs — sans the container runtime: the contract
    * is "exec something, consume stdout"). */
  def container(command: Seq[String], env: Map[String, String] = Map.empty): Fetched = {
    val tmp = Files.createTempFile("graft-container-", ".out")
    val pb = new ProcessBuilder(command.asJava)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectOutput(tmp.toFile)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val code = proc.waitFor()
    require(code == 0, s"container fetch: '${command.mkString(" ")}' exited $code")
    Fetched(tmp, None)
  }

  /**
   * Subscribe to MQTT topics and drain until idle — each message payload
   * becomes one NDJSON line of the fetched batch (fetch_service/mqtt.rs;
   * payloads are expected to be single-line JSON documents, the reference's
   * convention). Returns None when the poll drained nothing (up to date).
   */
  def mqtt(
      host: String,
      port: Int,
      topics: Seq[String],
      clientId: String = "graft",
      maxMessages: Int = 10000,
      idleTimeoutMs: Int = 1000
  ): Option[Fetched] = {
    val msgs = Mqtt.drain(host, port, topics, clientId, maxMessages, idleTimeoutMs)
    if (msgs.isEmpty) None
    else {
      val tmp = Files.createTempFile("graft-mqtt-", ".ndjson")
      val outBytes = msgs
        .map(m => new String(m.payload, java.nio.charset.StandardCharsets.UTF_8).trim)
        .filter(_.nonEmpty)
        .mkString("", "\n", "\n")
      Files.write(tmp, outBytes.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Some(Fetched(tmp, None))
    }
  }

  // ------------------------------------------------------------------ prep

  /** Gzip/zip decompression (prep_service.rs:31-108). For zip, `subPath`
    * selects an entry (default: the first). */
  def decompress(path: Path, format: String, subPath: Option[String] = None): Path = {
    val out = Files.createTempFile("graft-prep-", ".dat")
    format.toLowerCase match {
      case "gzip" | "gz" =>
        val in = new GZIPInputStream(new BufferedInputStream(new FileInputStream(path.toFile)))
        try Files.copy(in, out, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
      case "zip" =>
        val zin = new ZipInputStream(new BufferedInputStream(new FileInputStream(path.toFile)))
        try {
          var entry = zin.getNextEntry
          var found = false
          while (entry != null && !found) {
            if (!entry.isDirectory && subPath.forall(_ == entry.getName)) {
              Files.copy(zin, out, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              found = true
            } else entry = zin.getNextEntry
          }
          require(found, s"zip entry ${subPath.getOrElse("<first>")} not found in $path")
        } finally zin.close()
      case other => throw new IllegalArgumentException(s"unsupported decompress format: $other")
    }
    out
  }

  /** Pipe the payload through an arbitrary command's stdin→stdout
    * (prep_service.rs:106-168). */
  def pipe(path: Path, command: Seq[String]): Path = {
    val out = Files.createTempFile("graft-prep-", ".dat")
    val pb = new ProcessBuilder(command.asJava)
    pb.redirectInput(path.toFile)
    pb.redirectOutput(out.toFile)
    val proc = pb.start()
    val code = proc.waitFor()
    require(code == 0, s"prep pipe: '${command.mkString(" ")}' exited $code")
    out
  }
}
