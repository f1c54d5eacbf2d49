package graft.operators

import graft.SparkSpec

/** Grid radius join: inclusive boundary, cross-cell discovery, exactly-once
  * pair emission, and candidate pruning beyond one cell. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("radiusJoin: inclusive boundary, cross-cell pairs found exactly once, far pairs pruned") {
    val r = 10L
    val pts = Seq(
      (1L, 100L, 100L),
      (2L, 106L, 108L), // dist2 = 36+64 = 100 = r^2 -> INCLUDED (inclusive)
      (3L, 111L, 100L), // vs 1: dist2 = 121 > 100 -> excluded; vs 2: 25+64=89 -> included
      (4L, 109L, 100L), // vs 1: 81 -> included, CROSSES the cell boundary (cells 10 vs 10.. 109 DIV 10 = 10, same; vs 3: 4 -> included)
      (5L, 500L, 500L)  // isolated
    ).toDF("id", "x", "y")
    val out = Geo.radiusJoin(pts, "id", "x", "y", r)
      .collect().map(row => (row.getLong(0), row.getLong(1)) -> row.getLong(2)).toMap
    assert(out === Map(
      (1L, 2L) -> 100L, (2L, 3L) -> 89L, (1L, 4L) -> 81L,
      (3L, 4L) -> 4L, (2L, 4L) -> 73L))
    // exactly-once: collect() into a map would hide dupes — count raw rows
    assert(Geo.radiusJoin(pts, "id", "x", "y", r).count() === 5L)
  }

  test("radiusJoin: neighbors straddling a cell edge are found (|Δcell| = 1)") {
    // cells of width 100: x=99 -> cell 0, x=101 -> cell 1; dist2 = 4
    val pts = Seq((1L, 99L, 50L), (2L, 101L, 50L)).toDF("id", "x", "y")
    val out = Geo.radiusJoin(pts, "id", "x", "y", 100L).collect()
    assert(out.length === 1 && out(0).getLong(2) === 4L)
  }
}
