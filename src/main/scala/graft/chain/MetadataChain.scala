package graft.chain

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import org.json4s.{Formats, ShortTypeHints}
import org.json4s.jackson.Serialization

import graft.model.{DatasetVocabulary, MergeConf, MetadataBlock, MetadataEvent}
import graft.model.MetadataEvent._

/**
 * File-backed hash-linked metadata chain.
 *
 * Layout under the dataset root (mirrors
 * src/odf/dataset/src/entities/dataset_layout.rs:30-41):
 * {{{
 *   blocks/NNNNNN-<sha256>.json   one block per file, seq-prefixed
 *   refs/head                     "<seq> <hash>" of the current head
 *   data/<physicalHash>           parquet slice files
 *   checkpoints/                  engine state for streaming transforms
 * }}}
 *
 * Blocks serialize as JSON (json4s, `kind` discriminator). The block hash is
 * SHA-256 over the canonical serialized form — `prevBlockHash` inside the
 * block is what makes the chain tamper-evident, like a git history.
 */
final class MetadataChain private (val root: Path) {
  import MetadataChain._

  private def blocksDir: Path = root.resolve("blocks")
  private def refsDir: Path = root.resolve("refs")
  def dataDir: Path = root.resolve("data")
  def checkpointsDir: Path = root.resolve("checkpoints")

  /** (sequenceNumber, blockHash) of the head, if any block exists. */
  def head: Option[(Long, String)] = {
    val f = refsDir.resolve("head")
    if (!Files.exists(f)) None
    else {
      val Array(seq, hash) = Files.readString(f).trim.split(" ")
      Some((seq.toLong, hash))
    }
  }

  /** hash → block file path, from the directory listing. The listing is an
    * index, not the source of truth: chain membership is decided by walking
    * `prevBlockHash` links back from the head ref (git-style), so staged or
    * orphaned block files — e.g. a compaction rewrite in progress, or blocks
    * abandoned by a reset — are simply unreachable rather than corrupting
    * reads. */
  private def blockFilesByHash(): Map[String, Path] =
    Files
      .list(blocksDir)
      .iterator()
      .asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .map(p => parseName(p)._2 -> p)
      .toMap

  /** All blocks in sequence order (optionally only up to `asOfHash`),
    * resolved by walking prev links back from the head (or `asOfHash`). */
  def blocks(asOfHash: Option[String] = None): Seq[MetadataBlock] = {
    val byHash = blockFilesByHash()
    val start = asOfHash.orElse(head.map(_._2))
    val acc = List.newBuilder[MetadataBlock]
    var cur = start
    while (cur.isDefined) {
      val h = cur.get
      val p = byHash.getOrElse(h, throw new IllegalStateException(
        s"block $h not found in chain at $root"))
      val b = read(p)
      acc += b
      cur = b.prevBlockHash
    }
    acc.result().reverse
  }

  /** (block, hash) pairs in sequence order — one walk, hashes from the
    * content-addressed filenames. */
  def blocksWithHashes(asOfHash: Option[String] = None): Seq[(MetadataBlock, String)] = {
    val byHash = blockFilesByHash()
    val start = asOfHash.orElse(head.map(_._2))
    val acc = List.newBuilder[(MetadataBlock, String)]
    var cur = start
    while (cur.isDefined) {
      val h = cur.get
      val p = byHash.getOrElse(h, throw new IllegalStateException(
        s"block $h not found in chain at $root"))
      val b = read(p)
      acc += ((b, h))
      cur = b.prevBlockHash
    }
    acc.result().reverse
  }

  /** Hash of the reachable block with the given sequence number. */
  def hashAt(seq: Long): Option[String] =
    blocksWithHashes().collectFirst { case (b, h) if b.sequenceNumber == seq => h }

  /** Write a block file WITHOUT moving the head ref — the staging half of an
    * append. Returns (block, hash). Used by append and by chain rewrites
    * (compaction), which stage a whole new chain next to the old one and
    * commit with a single atomic [[setHead]]. */
  def writeDetachedBlock(
      prev: Option[(Long, String)],
      event: MetadataEvent,
      systemTime: Long
  ): (MetadataBlock, String) = {
    val block = MetadataBlock(prev.map(_._1 + 1).getOrElse(0L), prev.map(_._2), systemTime, event)
    val json = Serialization.write(block)(formats)
    val hash = sha256Hex(json.getBytes(StandardCharsets.UTF_8))
    Files.createDirectories(blocksDir)
    Files.writeString(blocksDir.resolve(f"${block.sequenceNumber}%06d-$hash.json"), json)
    (block, hash)
  }

  /** Atomically move the head ref (write-temp + atomic rename) — the single
    * commit point of every chain mutation: a crash before it leaves the old
    * chain fully intact (staged block files are unreachable, not corrupting),
    * a crash after it leaves the new chain fully committed. */
  def setHead(seq: Long, hash: String): Unit = {
    Files.createDirectories(refsDir)
    val tmp = refsDir.resolve(s".head-tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, s"$seq $hash")
    Files.move(tmp, refsDir.resolve("head"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append an event as a new block; returns (block, hash). */
  def append(event: MetadataEvent, systemTime: Long): (MetadataBlock, String) = {
    val (block, hash) = writeDetachedBlock(head, event, systemTime)
    setHead(block.sequenceNumber, hash)
    (block, hash)
  }

  /** Rewind the head ref to an earlier block (Reset operator,
    * src/infra/core/src/services/reset). Blocks after it stay on disk but
    * become unreachable (the head-backwards walk never sees them); a
    * subsequent append branches off the reset point with a fresh hash. */
  def reset(toHash: String): Unit = {
    val target = blocksWithHashes().find(_._2 == toHash)
    require(target.isDefined, s"block $toHash not found in chain at $root")
    setHead(target.get._1.sequenceNumber, toHash)
  }

  def blockHashes(): Seq[String] = blocksWithHashes().map(_._2)

  /** Delete block files no longer reachable from the head — the GC half of a
    * chain rewrite. Safe to run (or crash and re-run) at any time. */
  def gcUnreachableBlocks(): Unit = {
    val reachable = blocksWithHashes().map(_._2).toSet
    blockFilesByHash().foreach { case (h, p) =>
      if (!reachable.contains(h)) Files.deleteIfExists(p)
    }
  }

  // ------------------------------------------------------------- visitors

  /** Latest declared vocabulary (SetVocab) or defaults. */
  def vocabulary(asOf: Option[String] = None): DatasetVocabulary =
    blocks(asOf).reverseIterator
      .collectFirst { case MetadataBlock(_, _, _, v: SetVocab) => v.toVocabulary }
      .getOrElse(DatasetVocabulary.Default)

  /** Latest declared schema DDL (SetDataSchema). */
  def schemaDdl(asOf: Option[String] = None): Option[String] =
    blocks(asOf).reverseIterator.collectFirst {
      case MetadataBlock(_, _, _, SetDataSchema(ddl)) => ddl
    }

  /** Latest polling source declaration; None after a DisablePollingSource
    * that follows it (dtos_generated.rs:1010). */
  def pollingSource(asOf: Option[String] = None): Option[SetPollingSource] =
    blocks(asOf).reverseIterator
      .collectFirst {
        case MetadataBlock(_, _, _, s: SetPollingSource)  => Some(s)
        case MetadataBlock(_, _, _, _: DisablePollingSource) => None
      }
      .flatten

  /** Latest declaration of the named push source; None if disabled after
    * (AddPushSource / DisablePushSource, dtos_generated.rs:880-903,1023). */
  def pushSource(sourceName: String, asOf: Option[String] = None): Option[AddPushSource] =
    blocks(asOf).reverseIterator
      .collectFirst {
        case MetadataBlock(_, _, _, s: AddPushSource) if s.sourceName == sourceName    => Some(s)
        case MetadataBlock(_, _, _, DisablePushSource(n)) if n == sourceName           => None
      }
      .flatten

  /** Latest attachments (SetAttachments). */
  def attachments(asOf: Option[String] = None): Seq[Attachment] =
    blocks(asOf).reverseIterator
      .collectFirst { case MetadataBlock(_, _, _, SetAttachments(a)) => a }
      .getOrElse(Nil)

  /** Latest transform declaration. */
  def transform(asOf: Option[String] = None): Option[SetTransform] =
    blocks(asOf).reverseIterator.collectFirst {
      case MetadataBlock(_, _, _, t: SetTransform) => t
    }

  /** Push sources currently enabled: latest AddPushSource per name, unless a
    * DisablePushSource follows it — one pass, same disable semantics as
    * `pushSource(name)`. */
  def enabledPushSources(asOf: Option[String] = None): Seq[AddPushSource] = {
    val latest = scala.collection.mutable.LinkedHashMap.empty[String, Option[AddPushSource]]
    blocks(asOf).foreach {
      case MetadataBlock(_, _, _, s: AddPushSource)     => latest(s.sourceName) = Some(s)
      case MetadataBlock(_, _, _, DisablePushSource(n)) => latest(n) = None
      case _                                            => ()
    }
    latest.values.flatten.toSeq
  }

  /** Primary key from the merge strategy — polling source first, else any
    * ENABLED push source that declares one (changelog-projection service
    * needs it — query_service_impl.rs:630-738). A disabled source's key is
    * not used, consistent with `pushSource` disable semantics. */
  def primaryKey(asOf: Option[String] = None): Seq[String] =
    pollingSource(asOf)
      .map(_.merge.primaryKey)
      .filter(_.nonEmpty)
      .orElse(
        enabledPushSources(asOf).reverseIterator
          .map(_.merge.primaryKey)
          .find(_.nonEmpty)
      )
      .getOrElse(Nil)

  /** All data slices in chain order (AddData + ExecuteTransform events). */
  def slices(asOf: Option[String] = None): Seq[AddData] =
    blocks(asOf).collect {
      case MetadataBlock(_, _, _, a: AddData)                         => a
      case MetadataBlock(_, _, _, ExecuteTransform(_, Some(newData))) => newData
    }

  /** Head-backwards slice selection until `lastRecords` records are covered —
    * the record-limit file pruning of kamu_table.rs:230-295. */
  def slicesForLastRecords(lastRecords: Long, asOf: Option[String] = None): Seq[AddData] = {
    val all = slices(asOf).reverse
    var acc = 0L
    val taken = all.takeWhile { s =>
      val need = acc < lastRecords
      acc += s.numRecords
      need
    }
    taken.reverse
  }

  /** Offset of the last record written, if any. */
  def lastOffset(asOf: Option[String] = None): Option[Long] =
    slices(asOf).lastOption.map(_.offsetEnd)

  /** Current watermark: latest non-empty newWatermark. */
  def watermark(asOf: Option[String] = None): Option[Long] =
    slices(asOf).reverseIterator.collectFirst {
      case s if s.newWatermark.isDefined => s.newWatermark.get
    }

  /** Last ExecuteTransform event (for incremental elaboration). */
  def lastExecuteTransform(asOf: Option[String] = None): Option[ExecuteTransform] =
    blocks(asOf).reverseIterator.collectFirst {
      case MetadataBlock(_, _, _, t: ExecuteTransform) => t
    }

  /** Seed event (must be block 0). */
  def seed: Seed = blocks().head.event match {
    case s: Seed => s
    case other   => throw new IllegalStateException(s"chain at $root starts with $other, not Seed")
  }

  /** Absolute paths of the given slices' data files. */
  def slicePaths(ss: Seq[AddData]): Seq[String] =
    ss.map(s => dataDir.resolve(s.physicalHash).toString)
}

object MetadataChain {

  /** json4s formats with a `kind` discriminator for the event ADT. Hint
    * names are the bare event names (Seed, AddData, …) — the default
    * ShortTypeHints would leak the `MetadataEvent$` outer-object prefix into
    * the on-disk block files. */
  val formats: Formats = Serialization.formats(
    new ShortTypeHints(
      List(
        classOf[Seed],
        classOf[SetVocab],
        classOf[SetDataSchema],
        classOf[SetPollingSource],
        classOf[SetTransform],
        classOf[AddData],
        classOf[ExecuteTransform],
        classOf[SetInfo],
        classOf[SetLicense],
        classOf[SetAttachments],
        classOf[AddPushSource],
        classOf[DisablePushSource],
        classOf[DisablePollingSource]
      ),
      "kind"
    ) {
      override def hintFor(clazz: Class[_]): Some[String] =
        Some(clazz.getSimpleName.stripSuffix("$"))
      override def classFor(hint: String, parent: Class[_]): Option[Class[_]] =
        hints.find(_.getSimpleName.stripSuffix("$") == hint)
    }
  )

  def create(root: Path): MetadataChain = {
    Files.createDirectories(root.resolve("blocks"))
    Files.createDirectories(root.resolve("refs"))
    Files.createDirectories(root.resolve("data"))
    Files.createDirectories(root.resolve("checkpoints"))
    new MetadataChain(root)
  }

  def open(root: Path): MetadataChain = {
    require(Files.isDirectory(root.resolve("blocks")), s"no metadata chain at $root")
    new MetadataChain(root)
  }

  def exists(root: Path): Boolean =
    Files.isDirectory(root.resolve("blocks")) && Files.exists(root.resolve("refs").resolve("head"))

  private def read(p: Path): MetadataBlock =
    Serialization.read[MetadataBlock](Files.readString(p))(formats, manifest[MetadataBlock])

  /** blocks/NNNNNN-<hash>.json -> (seq, hash) */
  private def parseName(p: Path): (Long, String) = {
    val name = p.getFileName.toString.stripSuffix(".json")
    val dash = name.indexOf('-')
    (name.substring(0, dash).toLong, name.substring(dash + 1))
  }

  def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes).map("%02x".format(_)).mkString

  def sha256HexOfFile(p: Path): String = sha256Hex(Files.readAllBytes(p))
}
