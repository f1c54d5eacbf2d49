package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Minimal ESRI Shapefile reader: .shp geometry + .dbf attributes → rows of
 * attribute columns plus a `geometry` column holding GeoJSON — the same
 * output contract as the reference's shapefile reader, which converts
 * shapes to GeoJSON strings via NDJSON (readers/shapefile.rs:77-87).
 *
 * Implemented from the public ESRI Shapefile Technical Description (July
 * 1998) and dBASE III/IV header layout: supports shape types Point (1),
 * PolyLine (3) and Polygon (5), and DBF field types C (string), N/F
 * (numeric), L (logical), D (date-as-string). Null shapes (0) yield a null
 * geometry. Enough for the reference's supported surface; exotic types
 * (M/Z variants, memo fields) are rejected with a clear error.
 *
 * Parsing happens driver-side into an NDJSON temp file, then Spark reads it
 * — shapefiles are a fetch-stage artifact (bounded size), not a data-plane
 * format.
 */
object Shapefile {

  def read(spark: SparkSession, shpPath: String): DataFrame = {
    val nd = toNdjson(Paths.get(shpPath))
    Readers.ndjson(spark, nd.toString)
  }

  /** Convert .shp (+ sibling .dbf) into flat NDJSON: one record per shape
    * with the attribute fields plus `geometry` as an embedded GeoJSON STRING
    * (exactly shapefile.rs:77-87's output shape — keeping geometry a string
    * avoids union-typing Point vs Polygon coordinate arrays on re-read). */
  def toNdjson(shp: Path): Path = {
    val geoms = readShp(shp)
    val dbf = shp.resolveSibling(shp.getFileName.toString.replaceAll("\\.shp$", ".dbf"))
    val attrs: Seq[Map[String, String]] =
      if (Files.exists(dbf)) readDbf(dbf) else Seq.fill(geoms.size)(Map.empty[String, String])
    require(
      attrs.size == geoms.size,
      s"shapefile mismatch: ${geoms.size} shapes vs ${attrs.size} dbf records"
    )
    val out = Files.createTempFile("graft-shp-", ".ndjson")
    val lines = geoms.zip(attrs).map { case (geom, props) =>
      val fields = props.map { case (k, v) => s"${jstr(k)}:$v" } ++
        Seq(s""""geometry":${geom.map(jstr).getOrElse("null")}""")
      fields.mkString("{", ",", "}")
    }
    Files.write(out, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    out
  }

  // ------------------------------------------------------------------ .shp

  /** GeoJSON geometry string (None = null shape) per record. */
  private def readShp(path: Path): Seq[Option[String]] = {
    val buf = ByteBuffer.wrap(Files.readAllBytes(path))
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, s"$path is not a shapefile (bad magic)")
    val fileLenBytes = buf.getInt(24) * 2
    var pos = 100
    val shapes = Seq.newBuilder[Option[String]]
    while (pos < fileLenBytes) {
      val contentLenBytes = buf.order(ByteOrder.BIG_ENDIAN).getInt(pos + 4) * 2
      val rec = buf.duplicate().position(pos + 8).limit(pos + 8 + contentLenBytes)
        .slice().order(ByteOrder.LITTLE_ENDIAN)
      shapes += parseShape(rec)
      pos += 8 + contentLenBytes
    }
    shapes.result()
  }

  private def parseShape(b: ByteBuffer): Option[String] = {
    val shapeType = b.getInt(0)
    shapeType match {
      case 0 => None
      case 1 => // Point: x, y doubles
        Some(s"""{"type":"Point","coordinates":[${num(b.getDouble(4))},${num(b.getDouble(12))}]}""")
      case 3 | 5 => // PolyLine / Polygon: box, numParts, numPoints, parts[], points[]
        val numParts = b.getInt(36)
        val numPoints = b.getInt(40)
        val partStarts = (0 until numParts).map(i => b.getInt(44 + i * 4))
        val pointsOff = 44 + numParts * 4
        def pt(i: Int): String = {
          val x = b.getDouble(pointsOff + i * 16)
          val y = b.getDouble(pointsOff + i * 16 + 8)
          s"[${num(x)},${num(y)}]"
        }
        val rings = partStarts.zipWithIndex.map { case (start, i) =>
          val end = if (i + 1 < numParts) partStarts(i + 1) else numPoints
          (start until end).map(pt).mkString("[", ",", "]")
        }
        if (shapeType == 3) {
          if (numParts == 1)
            Some(s"""{"type":"LineString","coordinates":${rings.head}}""")
          else
            Some(s"""{"type":"MultiLineString","coordinates":${rings.mkString("[", ",", "]")}}""")
        } else
          Some(s"""{"type":"Polygon","coordinates":${rings.mkString("[", ",", "]")}}""")
      case other =>
        throw new IllegalArgumentException(s"unsupported shapefile shape type: $other")
    }
  }

  private def num(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString else d.toString

  // ------------------------------------------------------------------ .dbf

  /** Each record as fieldName → JSON-encoded value. */
  private def readDbf(path: Path): Seq[Map[String, String]] = {
    val bytes = Files.readAllBytes(path)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xffff
    val recordSize = buf.getShort(10) & 0xffff

    // field descriptors: 32 bytes each, from offset 32 until the 0x0D terminator
    final case class Field(name: String, typ: Char, len: Int)
    val fields = Iterator
      .from(0)
      .map(i => 32 + i * 32)
      .takeWhile(off => off < headerSize && bytes(off) != 0x0d)
      .map { off =>
        val name = new String(bytes, off, 11, StandardCharsets.US_ASCII).takeWhile(_ != 0).trim
        val typ = bytes(off + 11).toChar
        val len = bytes(off + 16) & 0xff
        Field(name, typ, len)
      }
      .toSeq

    (0 until numRecords).map { r =>
      var off = headerSize + r * recordSize + 1 // +1 skips the deletion flag
      fields.map { f =>
        val raw = new String(bytes, off, f.len, StandardCharsets.UTF_8).trim
        off += f.len
        val json = f.typ match {
          case 'C' | 'D'     => jstr(raw)
          case 'N' | 'F'     => if (raw.isEmpty) "null" else raw
          case 'L'           => if ("YyTt".contains(raw.headOption.getOrElse('?'))) "true" else "false"
          case other         => throw new IllegalArgumentException(s"unsupported dbf field type: $other")
        }
        f.name -> json
      }.toMap
    }
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
}
