package graft.model

/**
 * Metadata-chain domain model: a dataset's history is an append-only,
 * hash-linked chain of blocks, each carrying one event.
 *
 * Mirrors the reference's `MetadataBlock` / `MetadataEvent`
 * (src/odf/metadata/src/dtos/dtos_generated.rs:1231-1260) re-expressed as a
 * plain Scala ADT. Times are epoch milliseconds (ODF normalizes all
 * timestamps to ms UTC); hashes are lowercase hex SHA-256.
 */
final case class MetadataBlock(
    sequenceNumber: Long,
    prevBlockHash: Option[String],
    systemTime: Long,
    event: MetadataEvent
)

sealed trait MetadataEvent

object MetadataEvent {

  /** First block of every chain (dtos_generated.rs Seed). */
  final case class Seed(datasetName: String, datasetKind: String) extends MetadataEvent

  /** Remap the system-column names (SetVocab, dtos_generated.rs:1456). */
  final case class SetVocab(
      offsetColumn: Option[String] = None,
      operationTypeColumn: Option[String] = None,
      systemTimeColumn: Option[String] = None,
      eventTimeColumn: Option[String] = None
  ) extends MetadataEvent {
    def toVocabulary: DatasetVocabulary = {
      val d = DatasetVocabulary.Default
      DatasetVocabulary(
        offsetColumn.getOrElse(d.offsetColumn),
        operationTypeColumn.getOrElse(d.operationTypeColumn),
        systemTimeColumn.getOrElse(d.systemTimeColumn),
        eventTimeColumn.getOrElse(d.eventTimeColumn)
      )
    }
  }

  /** Explicit dataset schema as a Spark DDL string (SetDataSchema,
    * dtos_generated.rs:1406 — the reference stores an ODF schema; we store
    * the Spark-native equivalent, `StructType.fromDDL`-compatible). */
  final case class SetDataSchema(ddl: String) extends MetadataEvent

  /** How a Root dataset ingests: optional fetch + prep steps, reader format
    * + options, optional preprocess SQL (runs against a temp view named
    * `input`), and the merge strategy (SetPollingSource,
    * dtos_generated.rs:1418, simplified to the parts that affect data). */
  final case class SetPollingSource(
      readFormat: String,
      readOptions: Map[String, String] = Map.empty,
      schemaDdl: Option[String] = None,
      preprocessSql: Option[String] = None,
      merge: MergeConf = MergeConf("append"),
      fetch: Option[FetchConf] = None,
      prep: Option[Seq[PrepConf]] = None
  ) extends MetadataEvent

  /** Fetch step config (FetchStep, dtos_generated.rs:2229-2263 simplified).
    * kind: url | filesGlob | container. */
  final case class FetchConf(
      kind: String,
      url: Option[String] = None,
      glob: Option[String] = None,
      eventTimeRegex: Option[String] = None,
      command: Option[Seq[String]] = None
  )

  /** Prep step config (PrepStep, dtos_generated.rs:2974,2602).
    * kind: decompress | pipe. */
  final case class PrepConf(
      kind: String,
      format: Option[String] = None,
      subPath: Option[String] = None,
      command: Option[Seq[String]] = None
  )

  /** Declares a derivative dataset's transform (SetTransform,
    * dtos_generated.rs:1445): named inputs + SQL steps. The last step (or the
    * single query) produces the output; earlier steps become temp views. */
  /** `engine` selects the execution mode, like the reference's
    * `Transform::Sql.engine` ("spark"/"flink"/"datafusion",
    * dtos_generated.rs Transform): None/other = stateless batch SQL over the
    * (prev,new] input slices; `Some("spark-streaming")` = STATEFUL Structured
    * Streaming SQL — windowed aggregations whose state store persists in the
    * recorded checkpoint artifact across incremental runs (the role the
    * reference hands to its checkpointed Flink engine). Absent in chains
    * written before this field existed (reads as None — batch). */
  final case class SetTransform(
      inputs: Seq[String],
      steps: Seq[SqlStep],
      engine: Option[String] = None
  ) extends MetadataEvent

  final case class SqlStep(alias: Option[String], query: String)

  /** A data slice added by ingest (AddData, dtos_generated.rs:904-921). */
  final case class AddData(
      prevOffset: Option[Long],
      offsetStart: Long,
      offsetEnd: Long,
      numRecords: Long,
      physicalHash: String,
      logicalHash: String,
      newWatermark: Option[Long],
      sourceState: Option[String] = None,
      // optional second logical hash: layout-independent SHA3-256 record
      // digest (operators.RecordDigest; hash.rs:24-64 family). Stamped when
      // spark.graft.digest.sha3=true; verify checks it whenever present.
      logicalHashSha3: Option[String] = None
  ) extends MetadataEvent

  /** Content-addressed reference to an engine checkpoint directory — the
    * `Checkpoint` artifact an ExecuteTransform carries in the reference
    * (dtos_generated.rs:967,1199). `contentHash` digests the sorted
    * (relative-path, file-hash) pairs of the checkpoint dir, so verification
    * can prove the recorded engine state is the one on disk. */
  final case class CheckpointRef(
      name: String,
      contentHash: String,
      sizeBytes: Long
  )

  /** A data slice produced by a derivative transform run
    * (ExecuteTransform, dtos_generated.rs:1171-1196). `newData` is None for
    * runs that only advanced watermarks; `newCheckpoint` records the
    * engine-state artifact for streaming transforms (None for stateless
    * batch SQL runs). */
  final case class ExecuteTransform(
      inputs: Seq[TransformInputState],
      newData: Option[AddData],
      newCheckpoint: Option[CheckpointRef] = None
  ) extends MetadataEvent

  /** Which half-open offset interval (prev, new] of an input this run saw. */
  final case class TransformInputState(
      datasetName: String,
      prevOffset: Option[Long],
      newOffset: Option[Long]
  )

  final case class SetInfo(description: String) extends MetadataEvent
  final case class SetLicense(name: String, url: Option[String]) extends MetadataEvent

  /** Embedded dataset attachments (SetAttachments, dtos_generated.rs:1390). */
  final case class Attachment(name: String, content: String)
  final case class SetAttachments(attachments: Seq[Attachment]) extends MetadataEvent

  /** Named push-source declaration (AddPushSource, dtos_generated.rs:880-903):
    * the polling source's read/preprocess/merge config minus fetch — data
    * arrives via the push API instead of being pulled. */
  final case class AddPushSource(
      sourceName: String,
      readFormat: String,
      readOptions: Map[String, String] = Map.empty,
      schemaDdl: Option[String] = None,
      preprocessSql: Option[String] = None,
      merge: MergeConf = MergeConf("append")
  ) extends MetadataEvent

  /** Disables the named push source (DisablePushSource, dtos_generated.rs:1023). */
  final case class DisablePushSource(sourceName: String) extends MetadataEvent

  /** Disables the polling source (DisablePollingSource, dtos_generated.rs:1010). */
  final case class DisablePollingSource() extends MetadataEvent
}

/** Merge strategy configuration stored in the chain; resolved to a
  * [[graft.operators.MergeStrategy]] at ingest time. Kinds: append, ledger,
  * snapshot, changelogStream, upsertStream. */
final case class MergeConf(
    kind: String,
    primaryKey: Seq[String] = Nil,
    compareColumns: Option[Seq[String]] = None,
    arrivalOrderColumn: Option[String] = None
)
