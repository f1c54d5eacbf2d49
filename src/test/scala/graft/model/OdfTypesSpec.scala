package graft.model

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class OdfTypesSpec extends AnyFunSuite {

  test("unsigned types widen to the next signed type that holds the range") {
    assert(OdfTypes.toSpark("UInt8") === ShortType)
    assert(OdfTypes.toSpark("UInt16") === IntegerType)
    assert(OdfTypes.toSpark("UInt32") === LongType)
    assert(OdfTypes.toSpark("UInt64") === DecimalType(20, 0))
  }

  test("decimals: negative scale normalizes, precision caps at 38") {
    assert(OdfTypes.toSpark("Decimal(10,2)") === DecimalType(10, 2))
    assert(OdfTypes.toSpark("Decimal(10,-3)") === DecimalType(13, 0))
    assert(OdfTypes.toSpark("Decimal(50,2)") === DecimalType(38, 2))
  }

  test("nullability via Option wrapper; odf:type survives in metadata") {
    val f = OdfTypes.field("x", "Option<Int32>")
    assert(f.nullable && f.dataType === IntegerType)
    assert(f.metadata.getString(OdfTypes.OdfTypeKey) === "Option<Int32>")
    assert(OdfTypes.fromSpark(f) === "Option<Int32>")

    val g = OdfTypes.field("y", "UInt64")
    assert(!g.nullable && g.dataType === DecimalType(20, 0))
    assert(OdfTypes.fromSpark(g) === "UInt64") // metadata wins over the widened physical type
  }

  test("containers and round-trip without metadata") {
    assert(OdfTypes.toSpark("List<Int64>") === ArrayType(LongType))
    // default ArrayType has nullable elements -> element type gets the Option wrapper
    assert(OdfTypes.fromSpark(StructField("z", ArrayType(LongType), nullable = false)) === "List<Option<Int64>>")
    assert(
      OdfTypes.fromSpark(StructField("z", ArrayType(LongType, containsNull = false), nullable = false))
        === "List<Int64>"
    )
    assert(OdfTypes.fromSpark(StructField("t", TimestampType, nullable = true)) === "Option<Timestamp>")
  }
}
