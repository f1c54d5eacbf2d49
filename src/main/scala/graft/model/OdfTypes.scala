package graft.model

import org.apache.spark.sql.types._

/**
 * ODF logical type algebra ↔ Spark types (SURVEY §1.3; DataType enum,
 * src/odf/metadata/src/dtos/dtos_generated.rs:548-574).
 *
 * Spark has no unsigned integers, so unsigned types WIDEN to the next signed
 * type that holds the full range (UInt64 → Decimal(20,0)). The reference
 * itself ships signed physical encodings for op/offset "until Spark is
 * updated" (writer.rs:360-369, issue kamu-data/kamu-cli#445) — this module
 * makes that policy total over the type algebra. The original logical type
 * is preserved in field metadata under `odf:type` so a round-trip keeps it.
 */
object OdfTypes {

  val OdfTypeKey = "odf:type"

  /** Split a comma-joined type-argument list at top level only — commas
    * inside nested `<...>` / `(...)` belong to the nested type. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case ',' if depth == 0 => out += sb.toString.trim; sb.clear()
      case c =>
        if (c == '<' || c == '(') depth += 1
        if (c == '>' || c == ')') depth -= 1
        sb += c
    }
    if (sb.nonEmpty) out += sb.toString.trim
    out.result()
  }

  /** ODF logical type name → Spark type (+ whether widening occurred). */
  def toSpark(odf: String): DataType = odf match {
    case "Bool"                      => BooleanType
    case "Int8"                      => ByteType
    case "Int16"                     => ShortType
    case "Int32"                     => IntegerType
    case "Int64"                     => LongType
    case "UInt8"                     => ShortType // widen: 0..255 > Byte range
    case "UInt16"                    => IntegerType
    case "UInt32"                    => LongType
    case "UInt64"                    => DecimalType(20, 0)
    case "Float16"                   => FloatType // lossy-free upcast
    case "Float32"                   => FloatType
    case "Float64"                   => DoubleType
    case "String"                    => StringType
    case "Binary"                    => BinaryType
    case "Date"                      => DateType
    case "Timestamp"                 => TimestampType
    case "Duration"                  => DayTimeIntervalType()
    case "Time"                      => LongType // no native time-of-day: ms since midnight
    case "Null"                      => NullType
    case s if s.startsWith("Decimal") =>
      // Decimal(p,s); negative scale is normalized to scale 0 with widened
      // precision (Spark disallows negative scale).
      val args = s.stripPrefix("Decimal").stripPrefix("(").stripSuffix(")").split(",")
      val (p, sc) = (args(0).trim.toInt, args(1).trim.toInt)
      if (sc < 0) DecimalType(math.min(p - sc, 38), 0) else DecimalType(math.min(p, 38), sc)
    case s if s.startsWith("Time(") && s.endsWith(")") =>
      // Time with an explicit unit (s|ms|us|ns, dtos_generated.rs:769):
      // count-since-midnight in that unit; the unit survives in odf:type.
      LongType
    case s if s.startsWith("Timestamp(") && s.endsWith(")") =>
      // Unit-qualified timestamp; Spark is microsecond-precision internally,
      // nanos truncate on ingest (the writer normalizes to ms anyway).
      TimestampType
    case s if s.startsWith("Binary(") && s.endsWith(")") =>
      // Fixed-size binary (dtos_generated.rs:725): Spark has no fixed-width
      // binary — the declared width survives in odf:type metadata.
      BinaryType
    case s if s.startsWith("List<") && s.endsWith(">") =>
      val e = s.stripPrefix("List<").stripSuffix(">")
      ArrayType(toSpark(e), containsNull = e.startsWith("Option<"))
    case s if s.startsWith("Map<") && s.endsWith(">") =>
      val Seq(k, v) = splitTop(s.stripPrefix("Map<").stripSuffix(">"))
      MapType(toSpark(k), toSpark(v), valueContainsNull = v.startsWith("Option<"))
    case s if s.startsWith("Struct<") && s.endsWith(">") =>
      StructType(splitTop(s.stripPrefix("Struct<").stripSuffix(">")).map { decl =>
        val i = decl.indexOf(':')
        require(i > 0, s"struct field declaration needs name:type, got '$decl'")
        field(decl.take(i).trim, decl.drop(i + 1).trim)
      })
    case s if s.startsWith("Option<") && s.endsWith(">") =>
      toSpark(s.stripPrefix("Option<").stripSuffix(">")) // nullability handled at field level
    case other => throw new IllegalArgumentException(s"unsupported ODF type: $other")
  }

  /** Build a StructField from an ODF field declaration; nullability comes
    * from an Option<> wrapper (dtos_generated.rs:744). */
  def field(name: String, odfType: String): StructField = {
    val nullable = odfType.startsWith("Option<")
    StructField(
      name,
      toSpark(odfType),
      nullable,
      new MetadataBuilder().putString(OdfTypeKey, odfType).build()
    )
  }

  def schema(fields: (String, String)*): StructType = StructType(fields.map((field _).tupled))

  /** Spark type → ODF logical type name (uses preserved metadata if any). */
  def fromSpark(f: StructField): String = {
    if (f.metadata.contains(OdfTypeKey)) return f.metadata.getString(OdfTypeKey)
    val base = f.dataType match {
      case BooleanType          => "Bool"
      case ByteType             => "Int8"
      case ShortType            => "Int16"
      case IntegerType          => "Int32"
      case LongType             => "Int64"
      case FloatType            => "Float32"
      case DoubleType           => "Float64"
      case StringType           => "String"
      case BinaryType           => "Binary"
      case DateType             => "Date"
      case TimestampType        => "Timestamp"
      case _: DayTimeIntervalType => "Duration"
      case d: DecimalType       => s"Decimal(${d.precision},${d.scale})"
      case ArrayType(e, cn)     => s"List<${fromSpark(StructField("", e, nullable = cn))}>"
      case MapType(k, v, vcn)   =>
        s"Map<${fromSpark(StructField("", k, nullable = false))}," +
          s"${fromSpark(StructField("", v, nullable = vcn))}>"
      case StructType(fields)   =>
        s"Struct<${fields.map(sf => s"${sf.name}:${fromSpark(sf)}").mkString(",")}>"
      case NullType             => "Null"
      case other                => throw new IllegalArgumentException(s"unmapped Spark type: $other")
    }
    if (f.nullable && !base.startsWith("Option<")) s"Option<$base>" else base
  }
}
