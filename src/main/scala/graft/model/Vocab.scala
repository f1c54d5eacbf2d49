package graft.model

/**
 * ODF dataset vocabulary: the four system columns every dataset carries,
 * with remappable names.
 *
 * Mirrors the reference's `DatasetVocabulary` defaults
 * (src/odf/metadata/src/dtos/dtos_generated.rs:1077-1130) and the RFC-015
 * changelog operation codes (src/odf/metadata/src/data/operation_type.rs:14-19).
 *
 * Physical encoding note: ODF declares `offset: UInt64` and `op: UInt8`, but the
 * reference itself writes Int64/Int32 for engine compatibility
 * (src/infra/ingest-datafusion/src/writer.rs:360-369). We adopt the same signed
 * physical encoding.
 */
final case class DatasetVocabulary(
    offsetColumn: String = "offset",
    operationTypeColumn: String = "op",
    systemTimeColumn: String = "system_time",
    eventTimeColumn: String = "event_time"
) {
  /** System columns in canonical order (writer.rs:374-383). */
  def systemColumns: Seq[String] =
    Seq(offsetColumn, operationTypeColumn, systemTimeColumn, eventTimeColumn)
}

object DatasetVocabulary {
  val Default: DatasetVocabulary = DatasetVocabulary()
}

/** RFC-015 changelog operation codes. */
object Op {
  val Append: Int = 0      // +A
  val Retract: Int = 1     // -R
  val CorrectFrom: Int = 2 // -C (old value of a correction pair)
  val CorrectTo: Int = 3   // +C (new value of a correction pair)
}
