package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial range join — the scale path behind GeoSPARQL's `geof:sfWithin`
  * (the reference portal's "facilities inside this area" query,
  * `/root/reference/data/ontology/facilities.ttl:211-218`, done properly).
  *
  * Scale posture: NEVER a cross join. Points map to one grid cell each
  * (narrow); areas explode to the cells their envelope covers (bounded by
  * area size / cellSize); the join is a plain EQUI-join on the cell id with
  * the exact bbox predicate evaluated inside it. A point inside an envelope
  * is found in exactly the point's own cell, so no post-join dedup is
  * needed. At 100 TB: both sides shuffle-partition by cell — co-located,
  * skew-bounded by cell occupancy (pick cellSize so a city-block cell holds
  * thousands, not millions, of points).
  */
object GeoSpatial {

  /** Single-area bbox restriction (the reference Q4 shape) as PLAIN column
    * comparisons against literals, so the predicate reaches the parquet
    * scan (`PushedFilters: GreaterThanOrEqual(lon,…)`) — a 100 TB facility
    * table never leaves storage for points outside the area. Plan-asserted
    * in PlanSpec.
    */
  def withinEnvelope(points: DataFrame, minx: Double, miny: Double,
      maxx: Double, maxy: Double): DataFrame =
    points.filter(col("lon") >= minx && col("lon") <= maxx &&
      col("lat") >= miny && col("lat") <= maxy)

  /** Join `points(pid, lon, lat)` with `areas(aid, minx, miny, maxx, maxy)`
    * on point-within-envelope (inclusive bounds). `cellSize` is the grid
    * pitch in coordinate units.
    */
  def withinJoin(points: DataFrame, areas: DataFrame,
      cellSize: Double): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    val pts = points.select(col("pid"), col("lon"), col("lat"),
      floor(col("lon") / cellSize).cast("long").as("cx"),
      floor(col("lat") / cellSize).cast("long").as("cy"))
    val cells = areas
      .select(col("aid"), col("minx"), col("miny"), col("maxx"), col("maxy"),
        explode(sequence(floor(col("minx") / cellSize).cast("long"),
          floor(col("maxx") / cellSize).cast("long"))).as("cx"))
      .select(col("aid"), col("minx"), col("miny"), col("maxx"), col("maxy"),
        col("cx"),
        explode(sequence(floor(col("miny") / cellSize).cast("long"),
          floor(col("maxy") / cellSize).cast("long"))).as("cy"))
    pts.join(cells, Seq("cx", "cy"))
      .filter(col("lon") >= col("minx") && col("lon") <= col("maxx") &&
        col("lat") >= col("miny") && col("lat") <= col("maxy"))
      .select(col("aid"), col("pid"), col("lon"), col("lat"))
  }

  /** Join `points(pid, lon, lat)` with real POLYGONS
    * `polys(aid, ring: array<struct<x,y>>)` (closed exterior rings, e.g.
    * from [[graft.functions.SparqlFunctions.wktRingText]]) on exact
    * point-in-polygon.
    *
    * Scale posture mirrors [[withinJoin]]: the polygon's ENVELOPE explodes
    * to grid cells, the join stays a plain EQUI-join on (cx, cy) with the
    * cheap codegen'd bbox predicate inside it, and the exact ray-cast
    * verify ([[graft.functions.SparqlFunctions.pointInRing]], interpreted)
    * runs as a post-join filter whose cost is ∝ bbox-surviving candidates —
    * never ∝ |points| × |polys|.
    */
  def polygonJoin(points: DataFrame, polys: DataFrame,
      cellSize: Double): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    val withEnv = polys.select(col("aid"), col("ring"),
      array_min(transform(col("ring"), p => p.getField("x"))).as("minx"),
      array_min(transform(col("ring"), p => p.getField("y"))).as("miny"),
      array_max(transform(col("ring"), p => p.getField("x"))).as("maxx"),
      array_max(transform(col("ring"), p => p.getField("y"))).as("maxy"))
    val pts = points.select(col("pid"), col("lon"), col("lat"),
      floor(col("lon") / cellSize).cast("long").as("cx"),
      floor(col("lat") / cellSize).cast("long").as("cy"))
    val cells = withEnv
      .select(col("aid"), col("ring"), col("minx"), col("miny"),
        col("maxx"), col("maxy"),
        explode(sequence(floor(col("minx") / cellSize).cast("long"),
          floor(col("maxx") / cellSize).cast("long"))).as("cx"))
      .select(col("aid"), col("ring"), col("minx"), col("miny"),
        col("maxx"), col("maxy"), col("cx"),
        explode(sequence(floor(col("miny") / cellSize).cast("long"),
          floor(col("maxy") / cellSize).cast("long"))).as("cy"))
    pts.join(cells, Seq("cx", "cy"))
      .filter(col("lon") >= col("minx") && col("lon") <= col("maxx") &&
        col("lat") >= col("miny") && col("lat") <= col("maxy"))
      .filter(graft.functions.SparqlFunctions.pointInRing(
        col("lon"), col("lat"), col("ring")))
      .select(col("aid"), col("pid"), col("lon"), col("lat"))
  }
}
