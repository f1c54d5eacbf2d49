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

  test("nearestNeighbor: argmin per point, id tiebreak, isolated points drop") {
    val pts = Seq(
      (1L, 100L, 100L),
      (2L, 103L, 100L), // 1's nearest (dist2 9)
      (3L, 108L, 100L), // nearest to 2 (25 < 2->1's 9? no: 2->1 is 9, 2->3 is 25 -> nn(2)=1)
      (4L, 500L, 500L), // isolated
      (5L, 108L, 103L), // ties with nobody; 3's nearest (dist2 9)
      (6L, 114L, 100L)  // 36 from 3, 36+9 from 5 -> nn(6)=3
    ).toDF("id", "x", "y")
    val out = Geo.nearestNeighbor(pts, "id", "x", "y", radius = 10L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((2L, 9L)), 2L -> ((1L, 9L)), 3L -> ((5L, 9L)),
      5L -> ((3L, 9L)), 6L -> ((3L, 36L))))
    assert(!out.contains(4L))
    // equidistant neighbors: the smaller id wins
    val tie = Seq((1L, 100L, 100L), (2L, 103L, 100L), (3L, 97L, 100L)).toDF("id", "x", "y")
    val t1 = Geo.nearestNeighbor(tie, "id", "x", "y", 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t1(1L) === 2L) // dist2 9 both ways; nn=min(2,3)=2
  }
}
