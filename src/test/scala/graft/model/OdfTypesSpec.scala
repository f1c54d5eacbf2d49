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
    // element nullability follows the Option<> wrapper both ways
    assert(OdfTypes.toSpark("List<Int64>") === ArrayType(LongType, containsNull = false))
    assert(OdfTypes.toSpark("List<Option<Int64>>") === ArrayType(LongType, containsNull = true))
    assert(OdfTypes.fromSpark(StructField("z", ArrayType(LongType), nullable = false)) === "List<Option<Int64>>")
    assert(
      OdfTypes.fromSpark(StructField("z", ArrayType(LongType, containsNull = false), nullable = false))
        === "List<Int64>"
    )
    assert(OdfTypes.fromSpark(StructField("t", TimestampType, nullable = true)) === "Option<Timestamp>")
  }

  test("Map and Struct types round-trip, including nested Struct-in-List") {
    assert(OdfTypes.toSpark("Map<String,Int64>") ===
      MapType(StringType, LongType, valueContainsNull = false))
    assert(OdfTypes.toSpark("Map<String,Option<Int64>>") ===
      MapType(StringType, LongType, valueContainsNull = true))

    val st = OdfTypes.toSpark("Struct<a:Int32,b:Option<String>>").asInstanceOf[StructType]
    assert(st.fields.map(_.name).toSeq === Seq("a", "b"))
    assert(st("a").dataType === IntegerType && !st("a").nullable)
    assert(st("b").dataType === StringType && st("b").nullable)

    // nested: list of structs whose field is a map — commas split at top level only
    val nested = "List<Struct<k:String,m:Map<String,Int32>>>"
    val t = OdfTypes.toSpark(nested)
    val elem = t.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(elem("m").dataType === MapType(StringType, IntegerType, valueContainsNull = false))
    // round-trip via a plain field (no metadata)
    val back = OdfTypes.fromSpark(StructField("x", t, nullable = false))
    assert(OdfTypes.toSpark(back) === t)
  }

  test("Time units, unit-qualified Timestamp, fixed-size Binary") {
    assert(OdfTypes.toSpark("Time(ms)") === LongType)
    assert(OdfTypes.toSpark("Time(ns)") === LongType)
    assert(OdfTypes.toSpark("Timestamp(ns)") === TimestampType)
    assert(OdfTypes.toSpark("Binary(16)") === BinaryType)
    // the logical declaration survives in field metadata
    val f = OdfTypes.field("fp", "Binary(16)")
    assert(f.metadata.getString(OdfTypes.OdfTypeKey) === "Binary(16)")
    assert(OdfTypes.fromSpark(f) === "Binary(16)")
  }
}
