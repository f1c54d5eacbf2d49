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

  /** All blocks in sequence order (optionally only up to `asOfHash`). */
  def blocks(asOfHash: Option[String] = None): Seq[MetadataBlock] = {
    val all = Files
      .list(blocksDir)
      .iterator()
      .asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .toSeq
      .sortBy(_.getFileName.toString)
      .map(p => (parseName(p), read(p)))
    asOfHash match {
      case None => all.map(_._2)
      case Some(h) =>
        val idx = all.indexWhere(_._1._2 == h)
        require(idx >= 0, s"block $h not found in chain at $root")
        all.take(idx + 1).map(_._2)
    }
  }

  /** Hash of the block with the given sequence number. */
  def hashAt(seq: Long): Option[String] =
    Files
      .list(blocksDir)
      .iterator()
      .asScala
      .map(p => parseName(p))
      .find(_._1 == seq)
      .map(_._2)

  /** Append an event as a new block; returns (block, hash). */
  def append(event: MetadataEvent, systemTime: Long): (MetadataBlock, String) = {
    val (prevSeq, prevHash) = head.map { case (s, h) => (s, Some(h)) }.getOrElse((-1L, None))
    val block = MetadataBlock(prevSeq + 1, prevHash, systemTime, event)
    val json = Serialization.write(block)(formats)
    val hash = sha256Hex(json.getBytes(StandardCharsets.UTF_8))
    Files.createDirectories(blocksDir)
    Files.createDirectories(refsDir)
    Files.writeString(blocksDir.resolve(f"${block.sequenceNumber}%06d-$hash.json"), json)
    Files.writeString(refsDir.resolve("head"), s"${block.sequenceNumber} $hash")
    (block, hash)
  }

  /** Rewind the head ref to an earlier block (Reset operator,
    * src/infra/core/src/services/reset — blocks after it stay on disk but
    * are no longer reachable; a subsequent append overwrites their files). */
  def reset(toHash: String): Unit = {
    val target = blocks().zip(blockHashes()).find(_._2 == toHash)
    require(target.isDefined, s"block $toHash not found in chain at $root")
    val seq = target.get._1.sequenceNumber
    // Drop now-unreachable block files so blocks() stays consistent.
    Files
      .list(blocksDir)
      .iterator()
      .asScala
      .filter(p => parseName(p)._1 > seq)
      .toSeq
      .foreach(Files.delete)
    Files.writeString(refsDir.resolve("head"), s"$seq $toHash")
  }

  def blockHashes(): Seq[String] =
    Files
      .list(blocksDir)
      .iterator()
      .asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .toSeq
      .sortBy(_.getFileName.toString)
      .map(p => parseName(p)._2)

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

  /** Primary key from the merge strategy — polling source first, else any
    * push source that declares one (changelog-projection service needs it —
    * query_service_impl.rs:630-738). */
  def primaryKey(asOf: Option[String] = None): Seq[String] =
    pollingSource(asOf)
      .map(_.merge.primaryKey)
      .filter(_.nonEmpty)
      .orElse(blocks(asOf).reverseIterator.collectFirst {
        case MetadataBlock(_, _, _, s: AddPushSource) if s.merge.primaryKey.nonEmpty =>
          s.merge.primaryKey
      })
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
