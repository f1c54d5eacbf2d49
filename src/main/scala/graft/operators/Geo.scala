package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Spatial joins over planar integer coordinates — the geo sibling of the
 * LSH/IVF candidate machinery: grid cells bound the candidate set, an
 * exact integer predicate verifies, and nothing ever goes points².
 *
 * Reference provenance: kamu ingests geo formats (GeoJSON/Shapefile,
 * `src/infra/ingest-datafusion/src/readers/`) but has no spatial join;
 * this serves the "which records are near X" curation query with the
 * standard grid-file candidate scheme (Nievergelt 1984).
 */
object Geo {

  /**
   * All pairs of points within `radius` (inclusive, Euclidean) of each
   * other: `(id1, id2, dist2)` with `id1 < id2` and `dist2` the exact
   * squared distance. Coordinates must be non-negative integers (micro-
   * degrees, millimeters — any planar integer grid); all arithmetic is
   * BIGINT, so results replicate bit-for-bit on any engine.
   *
   * Scale shape: each point lands in ONE `radius`-sized grid cell; the
   * left side expands to its 3×3 cell neighborhood (a fixed 9×
   * fan-out of the slim (id, x, y) projection) and joins the right side's
   * HOME cell — |Δcoord| ≤ radius forces |Δcell| ≤ 1, so the neighborhood
   * join finds every qualifying pair EXACTLY ONCE (one (Δcx, Δcy) offset
   * matches per pair; spec-pinned), and candidate volume is bounded by
   * cell co-occupancy, never points². Skewed cells (urban cores) are the
   * residual risk — cap density upstream or shrink the cell the way the
   * LSH buckets cap their candidate lists.
   */
  def radiusJoin(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      radius: Long
  ): DataFrame = {
    require(radius > 0, "radius must be positive")
    val p = points.select(
      col(idCol).as("id"),
      col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val off = array(lit(-1L), lit(0L), lit(1L))
    val left = p
      .withColumn("__ox", explode(off))
      .withColumn("__oy", explode(off))
      .select(col("id").as("id1"), col("x").as("__x1"), col("y").as("__y1"),
        (expr(s"x DIV ${radius}L") + col("__ox")).as("__jx"),
        (expr(s"y DIV ${radius}L") + col("__oy")).as("__jy"))
    val right = p.select(
      col("id").as("id2"), col("x").as("__x2"), col("y").as("__y2"),
      expr(s"x DIV ${radius}L").as("__jx"), expr(s"y DIV ${radius}L").as("__jy"))
    val dx = col("__x1") - col("__x2")
    val dy = col("__y1") - col("__y2")
    left
      .join(right, Seq("__jx", "__jy"))
      .filter(col("id1") < col("id2"))
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("id1"), col("id2"), col("dist2"))
  }

  /**
   * Nearest neighbor within `radius` for every point that has one:
   * `(id, nn_id, dist2)` — the argmin over the [[radiusJoin]] candidates,
   * ties broken by the smaller neighbor id (deterministic). Points with
   * no neighbor inside `radius` emit nothing: the radius bound is what
   * keeps the search grid-cell-local instead of points² — pick it from
   * the data's density the way an IVF probe picks nprobe.
   *
   * Scale shape: the candidate pairs are cell-bounded (radiusJoin), the
   * symmetrization doubles them, and the argmin is one map-side-
   * combinable min(struct) per id — no per-point sort, no global order.
   */
  def nearestNeighbor(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      radius: Long
  ): DataFrame = {
    val pairs = radiusJoin(points, idCol, xCol, yCol, radius)
    val sym = pairs
      .select(col("id1").as("id"), col("id2").as("nn"), col("dist2"))
      .unionByName(
        pairs.select(col("id2").as("id"), col("id1").as("nn"), col("dist2")))
    sym
      .groupBy(col("id"))
      .agg(min(struct(col("dist2"), col("nn"))).as("__m"))
      .select(col("id"), col("__m.nn").as("nn_id"), col("__m.dist2").as("dist2"))
  }
}
