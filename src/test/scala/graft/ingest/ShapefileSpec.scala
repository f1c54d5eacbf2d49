package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

import graft.SparkSpec

/** Builds a tiny 2-record shapefile (Point + Polygon) byte-by-byte from the
  * public ESRI spec, plus its .dbf sidecar, and reads it back. */
class ShapefileSpec extends SparkSpec {

  private def buildShp(dir: Path): Path = {
    val point = {
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(0, 1) // Point
      b.putDouble(4, 30.5)
      b.putDouble(12, 50.25)
      b.array()
    }
    val polygon = {
      // 1 ring, 4 points (closed triangle)
      val n = 4
      val b = ByteBuffer.allocate(44 + 4 + 16 * n).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(0, 5) // Polygon
      // bbox (ignored by parser)
      b.putInt(36, 1) // numParts
      b.putInt(40, n) // numPoints
      b.putInt(44, 0) // part 0 start
      val pts = Seq((0.0, 0.0), (4.0, 0.0), (0.0, 3.0), (0.0, 0.0))
      pts.zipWithIndex.foreach { case ((x, y), i) =>
        b.putDouble(48 + i * 16, x)
        b.putDouble(48 + i * 16 + 8, y)
      }
      b.array()
    }
    val records = Seq(point, polygon)
    val totalWords = (100 + records.map(8 + _.length).sum) / 2
    val out = ByteBuffer.allocate(totalWords * 2)
    out.order(ByteOrder.BIG_ENDIAN)
    out.putInt(0, 9994)
    out.putInt(24, totalWords)
    out.order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(28, 1000) // version
    out.putInt(32, 1) // declared type (header-level; parser reads per-record)
    var pos = 100
    records.zipWithIndex.foreach { case (rec, i) =>
      out.order(ByteOrder.BIG_ENDIAN)
      out.putInt(pos, i + 1)
      out.putInt(pos + 4, rec.length / 2)
      var j = 0
      while (j < rec.length) { out.put(pos + 8 + j, rec(j)); j += 1 }
      pos += 8 + rec.length
    }
    val f = dir.resolve("test.shp")
    Files.write(f, out.array())
    f
  }

  private def buildDbf(dir: Path): Unit = {
    // fields: NAME C(10), POP N(8)
    val numRecords = 2
    val headerSize = 32 + 2 * 32 + 1
    val recordSize = 1 + 10 + 8
    val total = headerSize + numRecords * recordSize + 1
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0, 0x03.toByte)
    b.putInt(4, numRecords)
    b.putShort(8, headerSize.toShort)
    b.putShort(10, recordSize.toShort)
    def field(off: Int, name: String, typ: Char, len: Int): Unit = {
      name.getBytes.zipWithIndex.foreach { case (c, i) => b.put(off + i, c) }
      b.put(off + 11, typ.toByte)
      b.put(off + 16, len.toByte)
    }
    field(32, "NAME", 'C', 10)
    field(64, "POP", 'N', 8)
    b.put(96, 0x0d.toByte)
    def record(off: Int, name: String, pop: String): Unit = {
      b.put(off, ' '.toByte)
      val n = name.padTo(10, ' ')
      n.getBytes.zipWithIndex.foreach { case (c, i) => b.put(off + 1 + i, c) }
      val p = pop.reverse.padTo(8, ' ').reverse
      p.getBytes.zipWithIndex.foreach { case (c, i) => b.put(off + 11 + i, c) }
    }
    record(headerSize, "kyiv", "2884000")
    record(headerSize + recordSize, "triangle", "7")
    b.put(total - 1, 0x1a.toByte)
    Files.write(dir.resolve("test.dbf"), b.array())
  }

  test("shapefile: .shp + .dbf -> attribute columns + GeoJSON geometry") {
    val dir = Files.createTempDirectory("graft-shp-")
    val shp = buildShp(dir)
    buildDbf(dir)
    val got = Shapefile.read(spark, shp.toString).orderBy("NAME")
    assert(got.columns.toSet === Set("NAME", "POP", "geometry"))
    val rows = got.collect().map(r =>
      (r.getAs[String]("NAME"), r.getAs[Long]("POP"), r.getAs[String]("geometry"))
    )
    assert(rows(0)._1 === "kyiv" && rows(0)._2 === 2884000L)
    assert(rows(0)._3 === """{"type":"Point","coordinates":[30.5,50.25]}""")
    assert(rows(1)._1 === "triangle" && rows(1)._2 === 7L)
    assert(rows(1)._3 === """{"type":"Polygon","coordinates":[[[0,0],[4,0],[0,3],[0,0]]]}""")
    // registry dispatch works for the format name + extension
    assert(Readers.forFormat("shapefile")(spark, shp.toString).count() === 2)
    assert(Readers.forPath(shp.toString)(spark, shp.toString).count() === 2)
  }
}
