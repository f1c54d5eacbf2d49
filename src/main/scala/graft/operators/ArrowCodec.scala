package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Arrow IPC (stream format) response codec — the result surface the
 * reference serves over FlightSQL (src/adapter/flight-sql/src/service.rs:871
 * `do_get_statement`): a query result page encoded as one Arrow record
 * batch. Like the other response encoders this collects, so it is for
 * pagination-bounded API payloads (default limit 100), never bulk data
 * movement — bulk export is the parquet sink.
 *
 * Built directly on the Arrow Java library that ships with Spark; the
 * type mapping covers the scalar types the engine's schemas produce.
 */
object ArrowCodec {

  def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case BooleanType   => ArrowType.Bool.INSTANCE
      case IntegerType   => new ArrowType.Int(32, true)
      case LongType      => new ArrowType.Int(64, true)
      case FloatType     => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType    => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType    => ArrowType.Utf8.INSTANCE
      case BinaryType    => ArrowType.Binary.INSTANCE
      case TimestampType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
      case DateType      => new ArrowType.Date(DateUnit.DAY)
      case other =>
        throw new IllegalArgumentException(s"arrow response codec: unsupported type $other")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), java.util.Collections.emptyList())
  }

  def arrowSchema(st: StructType): Schema =
    new Schema(st.fields.map(arrowField).toSeq.asJava)

  /** Encode a (bounded) DataFrame as one Arrow IPC stream. */
  def toArrowIpc(df: DataFrame): Array[Byte] = {
    val rows = df.collect()
    val sparkSchema = df.schema
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(arrowSchema(sparkSchema), allocator)
    try {
      root.allocateNew()
      sparkSchema.fields.zipWithIndex.foreach { case (f, c) =>
        val vec = root.getVector(c)
        rows.zipWithIndex.foreach { case (row, i) =>
          if (row.isNullAt(c)) () // vectors default to null
          else
            (vec, f.dataType) match {
              case (v: BitVector, BooleanType) => v.setSafe(i, if (row.getBoolean(c)) 1 else 0)
              case (v: IntVector, IntegerType) => v.setSafe(i, row.getInt(c))
              case (v: BigIntVector, LongType) => v.setSafe(i, row.getLong(c))
              case (v: Float4Vector, FloatType) => v.setSafe(i, row.getFloat(c))
              case (v: Float8Vector, DoubleType) => v.setSafe(i, row.getDouble(c))
              case (v: VarCharVector, StringType) =>
                v.setSafe(i, row.getString(c).getBytes(StandardCharsets.UTF_8))
              case (v: VarBinaryVector, BinaryType) => v.setSafe(i, row.getAs[Array[Byte]](c))
              case (v: TimeStampMicroTZVector, TimestampType) =>
                val ts = row.getAs[java.sql.Timestamp](c)
                v.setSafe(i, ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L)
              case (v: DateDayVector, DateType) =>
                v.setSafe(i, row.getAs[java.sql.Date](c).toLocalDate.toEpochDay.toInt)
              case (v, t) =>
                throw new IllegalStateException(s"arrow codec: vector $v for type $t")
            }
        }
      }
      root.setRowCount(rows.length)
      val bos = new ByteArrayOutputStream()
      val writer = new ArrowStreamWriter(root, null, Channels.newChannel(bos))
      writer.start()
      writer.writeBatch()
      writer.end()
      writer.close()
      bos.toByteArray
    } finally {
      root.close()
      allocator.close()
    }
  }

  /** Decode an Arrow IPC stream back to a DataFrame (for round-trip tests
    * and Arrow-speaking clients of the JVM API). */
  def fromArrowIpc(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val allocator = new RootAllocator()
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val sparkFields = root.getSchema.getFields.asScala.map { f =>
        val dt = f.getType match {
          case _: ArrowType.Bool => BooleanType
          case t: ArrowType.Int if t.getBitWidth == 32 => IntegerType
          case t: ArrowType.Int if t.getBitWidth == 64 => LongType
          case t: ArrowType.FloatingPoint if t.getPrecision == FloatingPointPrecision.SINGLE =>
            FloatType
          case t: ArrowType.FloatingPoint => DoubleType
          case _: ArrowType.Utf8 => StringType
          case _: ArrowType.Binary => BinaryType
          case _: ArrowType.Timestamp => TimestampType
          case _: ArrowType.Date => DateType
          case other => throw new IllegalArgumentException(s"arrow codec: unsupported $other")
        }
        StructField(f.getName, dt, f.isNullable)
      }
      val schema = StructType(sparkFields.toSeq)
      val out = Seq.newBuilder[Row]
      while (reader.loadNextBatch()) {
        (0 until root.getRowCount).foreach { i =>
          val values = root.getFieldVectors.asScala.zip(sparkFields).map { case (vec, f) =>
            if (vec.isNull(i)) null
            else
              (vec, f.dataType) match {
                case (v: BitVector, _) => v.get(i) == 1
                case (v: IntVector, _) => v.get(i)
                case (v: BigIntVector, _) => v.get(i)
                case (v: Float4Vector, _) => v.get(i)
                case (v: Float8Vector, _) => v.get(i)
                case (v: VarCharVector, _) => new String(v.get(i), StandardCharsets.UTF_8)
                case (v: VarBinaryVector, _) => v.get(i)
                case (v: TimeStampMicroTZVector, _) =>
                  val micros = v.get(i)
                  val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
                  ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
                  ts
                case (v: DateDayVector, _) =>
                  java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.get(i).toLong))
                case (v, t) => throw new IllegalStateException(s"arrow codec: $v for $t")
              }
          }
          out += Row.fromSeq(values.toSeq)
        }
      }
      spark.createDataFrame(out.result().asJava, schema)
    } finally {
      reader.close()
      allocator.close()
    }
  }
}
