package graft.sync

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.chain.MetadataChain
import graft.model.MetadataEvent.{AddData, ExecuteTransform}

/**
 * Pull a dataset from a SERVED graft node (the `/datasets/<name>/sync/...`
 * endpoints of [[graft.adapter.RestServer]]) — the HTTP client half of the
 * reference's Simple Transfer Protocol (simple_transfer_protocol.rs; the
 * reference's `kamu pull <node-url>/<dataset>` story). Pull/status only:
 * pushing into a served node is an authenticated write surface the
 * reference gates behind accounts, which are out of scope here.
 *
 * Same commit discipline as [[SyncService]]: content-addressed objects land
 * via write-temp + rename (an existing file is therefore complete and
 * skippable — natural resume), every transferred object is hash-verified
 * (an HTTP remote is never a trusted source), and the local head ref moves
 * only after everything is in place.
 */
object HttpSync {

  private def get(client: HttpClient, url: String): Array[Byte] = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() == 200, s"GET $url -> HTTP ${resp.statusCode()}")
    resp.body()
  }

  /** Block file names from the listing endpoint, seq-sorted. */
  private def blockNames(client: HttpClient, base: String): Seq[String] = {
    implicit val formats: org.json4s.DefaultFormats.type = org.json4s.DefaultFormats
    org.json4s.jackson.Serialization
      .read[Seq[String]](new String(get(client, s"$base/sync/blocks"), UTF_8))
      .sorted
  }

  /** Compare the LOCAL chain against a served one without transferring
    * anything (block hashes come from the content-addressed names) — same
    * local-as-src orientation as [[SyncService.compare]]: `Ahead` = local
    * has blocks the remote lacks, `Behind` = the remote is ahead. */
  def status(
      baseUrl: String,
      dataset: String,
      localRoot: Path,
      conf: Configuration,
      client: HttpClient = HttpClient.newHttpClient()
  ): SyncService.ChainsStatus = {
    val base = s"${baseUrl.stripSuffix("/")}/datasets/$dataset"
    val remoteHashes = blockNames(client, base).map(n =>
      MetadataChain.parseName(new Path(n))._2)
    val local =
      if (MetadataChain.exists(localRoot, conf))
        MetadataChain.open(localRoot, conf).blocksWithHashes()
      else Nil
    SyncService.compareHashes(local, remoteHashes)
  }

  /**
   * Pull `dataset` from the node at `baseUrl` into `localRoot`. Transfers
   * only the blocks the local chain is missing plus the data slices and
   * checkpoints they reference; verifies every object against its content
   * address; commits with one atomic head move. Local-ahead / diverged
   * chains refuse unless `force`.
   */
  def pull(
      baseUrl: String,
      dataset: String,
      localRoot: Path,
      conf: Configuration,
      force: Boolean = false,
      client: HttpClient = HttpClient.newHttpClient()
  ): SyncService.SyncResult = {
    val base = s"${baseUrl.stripSuffix("/")}/datasets/$dataset"
    val names = blockNames(client, base)
    require(names.nonEmpty, s"remote dataset $dataset has no blocks")
    val remote = names.map(n => MetadataChain.parseName(new Path(n)))

    val exists = MetadataChain.exists(localRoot, conf)
    val local = if (exists) MetadataChain.open(localRoot, conf)
                else MetadataChain.create(localRoot, conf)
    val localHashes = if (exists) local.blockHashes() else Nil
    val oldHead = local.head

    val common = remote.map(_._2).zip(localHashes).takeWhile { case (a, b) => a == b }.size
    if (common == remote.size && common == localHashes.size) return SyncService.UpToDate
    if (!force && common < localHashes.size) {
      val st =
        if (common < remote.size) SyncService.Diverged(remote.size - common, localHashes.size - common)
        else SyncService.Behind(localHashes.size - common)
      throw new SyncService.SyncException(
        s"local chain at $localRoot is ahead of or diverged from the remote; use force", st)
    }

    val have = local.blockFiles().map(_.getName).toSet
    var dataCopied = 0
    names.foreach { blockName =>
      if (!have.contains(blockName)) {
        val (_, hash) = MetadataChain.parseName(new Path(blockName))
        val bytes = get(client, s"$base/sync/blocks/$blockName")
        require(MetadataChain.sha256Hex(bytes) == hash,
          s"remote block $blockName fails its content address")
        writeViaStaging(local, new Path(local.blocksDir, blockName), bytes)
        // fetch the objects this block references
        val block = org.json4s.jackson.Serialization
          .read[graft.model.MetadataBlock](new String(bytes, UTF_8))(
            MetadataChain.formats, manifest[graft.model.MetadataBlock])
        val (dataRefs, ckptRefs) = block.event match {
          case a: AddData          => (Seq(a.physicalHash), Nil)
          case e: ExecuteTransform =>
            (e.newData.map(_.physicalHash).toSeq, e.newCheckpoint.map(_.name).toSeq)
          case _                   => (Nil, Nil)
        }
        dataRefs.foreach { ph =>
          if (!local.fs.exists(local.dataFile(ph))) {
            val slice = get(client, s"$base/sync/data/$ph")
            require(MetadataChain.sha256Hex(slice) == ph,
              s"remote slice $ph fails its content address")
            writeViaStaging(local, local.dataFile(ph), slice)
            dataCopied += 1
          }
        }
        ckptRefs.foreach { ckpt =>
          implicit val formats: org.json4s.DefaultFormats.type = org.json4s.DefaultFormats
          val rels = org.json4s.jackson.Serialization.read[Seq[String]](
            new String(get(client, s"$base/sync/checkpoints/$ckpt"), UTF_8))
          rels.foreach { rel =>
            val target = new Path(new Path(local.checkpointsDir, ckpt), rel)
            if (!local.fs.exists(target)) {
              val enc = java.net.URLEncoder.encode(rel, "UTF-8")
              writeViaStaging(local, target,
                get(client, s"$base/sync/checkpoints/$ckpt/file?path=$enc"))
            }
          }
        }
      }
    }

    val (lastSeq, lastHash) = remote.last
    local.setHead(lastSeq, lastHash)
    SyncService.Updated(oldHead.map(_._2), lastHash, remote.size - common, dataCopied)
  }

  private def writeViaStaging(chain: MetadataChain, target: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(new Path(chain.root, "staging"), s"http-${java.util.UUID.randomUUID()}")
    chain.fs.mkdirs(tmp.getParent)
    val out = chain.fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    chain.fs.mkdirs(target.getParent)
    require(chain.fs.rename(tmp, target), s"rename $tmp -> $target failed")
  }
}
