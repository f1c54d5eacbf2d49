package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/**
 * Layout-independent SHA3-256 record digest — the second ("logical") hash a
 * dataset commit can carry, in the construction family of the reference's
 * `get_parquet_logical_hash` (src/odf/data-utils/src/data/hash.rs:24-64:
 * RecordDigestV0<Sha3_256> = per-column digests over logical values,
 * combined with a schema digest; multicodec `arrow0-sha3-256`).
 *
 * INTEROP BOUNDARY, stated precisely: the reference's exact byte-level
 * encoding lives in the external `arrow-digest` crate, whose source is not
 * available in this environment (zero egress), so bit-exact cross-
 * verification against real kamu output cannot be golden-vectored here.
 * What IS guaranteed — and spec-pinned by frozen vectors — is this digest's
 * own contract, which is the property the chain needs:
 *
 *  - depends only on (schema, ordered logical values): identical rows in
 *    identical order produce the same digest regardless of file layout,
 *    row-group split, compression, or encoding;
 *  - any value/null/type/field-order change produces a different digest;
 *  - the canonical encoding below is fully documented, so any other engine
 *    can implement it from this scaladoc alone.
 *
 * Canonical encoding (v0):
 *  - schema digest S = SHA3-256 over UTF-8 of `name:typeDDL;` per field, in
 *    field order (the nullable FLAG is excluded — it is layout metadata that
 *    flips on a parquet round-trip; null CONTENT is captured by the per-value
 *    markers below);
 *  - one digest D_i per top-level field: for each row in offset order,
 *    null → byte 0x00; non-null → 0x01 ++ enc(value) with
 *      bool → 1 byte; integral (byte/short/int/long) → int64 LE;
 *      float/double → float64 IEEE-754 bits LE, NaN canonicalized, -0.0 → 0.0;
 *      decimal → int32 LE scale ++ int32 LE length ++ unscaled big-endian;
 *      string → int32 LE UTF-8 length ++ bytes;  binary → int32 LE len ++ bytes;
 *      timestamp → epoch micros int64 LE;  date → epoch days int64 LE;
 *      array → int32 LE length ++ element encodings (null markers included);
 *      map → int32 LE size ++ interleaved key/value encodings;
 *      struct → field encodings in order (null markers included);
 *  - result = hex(SHA3-256(S ++ D_1 ++ … ++ D_n)).
 */
object RecordDigest {

  /** Spark-conf switch: when "true", IngestWriter stamps AddData with this
    * digest alongside the xxhash64-XOR fast hash. Off by default — it is a
    * driver-side sequential pass over the committed slice. */
  val ConfKey = "spark.graft.digest.sha3"

  def enabled(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption(ConfKey).contains("true")

  private def sha3(): MessageDigest = MessageDigest.getInstance("SHA3-256")

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  /** Digest the frame IN ITS CURRENT ROW ORDER (callers pass offset-ordered
    * data). Streams via toLocalIterator — constant driver memory. */
  def digest(df: DataFrame): String = {
    val schema = df.schema
    val schemaDigest = {
      val d = sha3()
      schema.fields.foreach { f =>
        d.update(s"${f.name}:${f.dataType.sql};".getBytes("UTF-8"))
      }
      d.digest()
    }
    val colDigests = schema.fields.map(_ => sha3())
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      var i = 0
      while (i < colDigests.length) {
        updateValue(colDigests(i), row.isNullAt(i), if (row.isNullAt(i)) null else row.get(i),
          schema.fields(i).dataType)
        i += 1
      }
    }
    val fin = sha3()
    fin.update(schemaDigest)
    colDigests.foreach(d => fin.update(d.digest()))
    hex(fin.digest())
  }

  private def le64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  private def updateValue(d: MessageDigest, isNull: Boolean, v: Any, dt: DataType): Unit = {
    if (isNull) { d.update(0x00.toByte); return }
    d.update(0x01.toByte)
    dt match {
      case BooleanType => d.update(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
      case ByteType    => d.update(le64(v.asInstanceOf[Byte].toLong))
      case ShortType   => d.update(le64(v.asInstanceOf[Short].toLong))
      case IntegerType => d.update(le64(v.asInstanceOf[Int].toLong))
      case LongType    => d.update(le64(v.asInstanceOf[Long]))
      case FloatType   => d.update(le64(canonicalDoubleBits(v.asInstanceOf[Float].toDouble)))
      case DoubleType  => d.update(le64(canonicalDoubleBits(v.asInstanceOf[Double])))
      case _: DecimalType =>
        val dec = v.asInstanceOf[java.math.BigDecimal]
        val unscaled = dec.unscaledValue().toByteArray
        d.update(le32(dec.scale())); d.update(le32(unscaled.length)); d.update(unscaled)
      case StringType =>
        val b = v.toString.getBytes("UTF-8")
        d.update(le32(b.length)); d.update(b)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        d.update(le32(b.length)); d.update(b)
      case TimestampType =>
        val ts = v.asInstanceOf[java.sql.Timestamp]
        d.update(le64(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000))
      case TimestampNTZType =>
        d.update(le64(
          v.asInstanceOf[java.time.LocalDateTime].toInstant(java.time.ZoneOffset.UTC)
            .toEpochMilli * 1000L))
      case DateType =>
        d.update(le64(v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay))
      case ArrayType(et, _) =>
        val seq = v.asInstanceOf[scala.collection.Seq[Any]]
        d.update(le32(seq.length))
        seq.foreach(e => updateValue(d, e == null, e, et))
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[scala.collection.Map[Any, Any]]
        d.update(le32(m.size))
        m.foreach { case (k, mv) =>
          updateValue(d, k == null, k, kt)
          updateValue(d, mv == null, mv, vt)
        }
      case st: StructType =>
        val r = v.asInstanceOf[Row]
        var i = 0
        while (i < st.fields.length) {
          updateValue(d, r.isNullAt(i), if (r.isNullAt(i)) null else r.get(i), st.fields(i).dataType)
          i += 1
        }
      case other =>
        // fall back to the value's stable string form (calendar intervals …)
        val b = String.valueOf(v).getBytes("UTF-8")
        d.update(le32(b.length)); d.update(b)
    }
  }

  private def canonicalDoubleBits(x: Double): Long =
    if (x.isNaN) java.lang.Double.doubleToLongBits(Double.NaN)
    else if (x == 0.0) 0L // collapse -0.0
    else java.lang.Double.doubleToLongBits(x)
}
