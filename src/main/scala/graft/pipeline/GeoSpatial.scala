package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
    val withEnv = polys.select(col("aid"), col("ring"),
      array_min(transform(col("ring"), p => p.getField("x"))).as("minx"),
      array_min(transform(col("ring"), p => p.getField("y"))).as("miny"),
      array_max(transform(col("ring"), p => p.getField("x"))).as("maxx"),
      array_max(transform(col("ring"), p => p.getField("y"))).as("maxy"))
    gridPointJoin(points, withEnv, cellSize,
      graft.functions.SparqlFunctions.pointInRing(
        col("lon"), col("lat"), col("ring")))
  }

  /** [[polygonJoin]] for polygons WITH interior rings (r12 cont.):
    * `polys(aid, rings)` where `rings` is `array<array<struct<x,y>>>` —
    * exterior ring FIRST, then holes (e.g. from
    * [[graft.functions.SparqlFunctions.wktRingsText]]).
    *
    * The grid explode and bbox prune read the EXTERIOR ring's envelope
    * (holes never widen it), so the join stays the same equi-join on grid
    * cells; the exact verify is even-odd parity over ALL rings
    * ([[graft.functions.UnionWithin]], boundary-in) — closed membership of
    * polygon-minus-holes, cost ∝ bbox-surviving candidates.
    */
  def holedPolygonJoin(points: DataFrame, polys: DataFrame,
      cellSize: Double): DataFrame = {
    val ext = element_at(col("rings"), 1)
    val withEnv = polys.select(col("aid"), col("rings"),
      array_min(transform(ext, p => p.getField("x"))).as("minx"),
      array_min(transform(ext, p => p.getField("y"))).as("miny"),
      array_max(transform(ext, p => p.getField("x"))).as("maxx"),
      array_max(transform(ext, p => p.getField("y"))).as("maxy"))
    gridPointJoin(points, withEnv, cellSize,
      coalesce(graft.functions.UnionWithin(
        array(struct(col("lon").cast("double").as("x"),
          col("lat").cast("double").as("y"))), col("rings")), lit(false)))
  }

  /** The shared point×polygon grid scaffold: explode each polygon's
    * envelope to covered cells, plain EQUI-join on (cx, cy) with the
    * cheap codegen'd bbox predicate, then the caller's exact `verify`
    * predicate as a post-join filter ∝ bbox survivors.
    * `polysEnv`: (aid, <geometry column>, minx, miny, maxx, maxy).
    */
  private def gridPointJoin(points: DataFrame, polysEnv: DataFrame,
      cellSize: Double, verify: Column): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    val pts = points.select(col("pid"), col("lon"), col("lat"),
      floor(col("lon") / cellSize).cast("long").as("cx"),
      floor(col("lat") / cellSize).cast("long").as("cy"))
    val cells = polysEnv
      .withColumn("cx", explode(sequence(
        floor(col("minx") / cellSize).cast("long"),
        floor(col("maxx") / cellSize).cast("long"))))
      .withColumn("cy", explode(sequence(
        floor(col("miny") / cellSize).cast("long"),
        floor(col("maxy") / cellSize).cast("long"))))
    pts.join(cells, Seq("cx", "cy"))
      .filter(col("lon") >= col("minx") && col("lon") <= col("maxx") &&
        col("lat") >= col("miny") && col("lat") <= col("maxy"))
      .filter(verify)
      .select(col("aid"), col("pid"), col("lon"), col("lat"))
  }

  /** Join polygons `a(aid, ring)` × polygons `b(bid, ring)` on EXACT ring
    * intersection ([[graft.functions.SparqlFunctions.ringsIntersect]] —
    * proper crossing, containment, or boundary contact).
    *
    * Scale posture: both sides' envelopes explode to covered grid cells and
    * the join is the plain EQUI-join on the cell id — never a cross join.
    * Because BOTH sides span multiple cells, a pair can meet in several
    * cells; instead of a post-join `distinct` (a second shuffle) each pair
    * is emitted only from its CANONICAL cell — the south-west cell of the
    * two envelopes' intersection, computable per joined row — so the output
    * is exactly-once with no extra exchange. The cheap codegen'd bbox
    * predicate prunes inside the join; the interpreted exact verify runs as
    * a post-join filter ∝ bbox-surviving candidates.
    */
  def polygonIntersectsJoin(a: DataFrame, b: DataFrame,
      cellSize: Double): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    def cells(df: DataFrame, id: String, p: String): DataFrame = {
      val env = df.select(col(id), col("ring").as(p + "ring"),
        array_min(transform(col("ring"), q => q.getField("x"))).as(p + "minx"),
        array_min(transform(col("ring"), q => q.getField("y"))).as(p + "miny"),
        array_max(transform(col("ring"), q => q.getField("x"))).as(p + "maxx"),
        array_max(transform(col("ring"), q => q.getField("y"))).as(p + "maxy"))
      env
        .withColumn("cx", explode(sequence(
          floor(col(p + "minx") / cellSize).cast("long"),
          floor(col(p + "maxx") / cellSize).cast("long"))))
        .withColumn("cy", explode(sequence(
          floor(col(p + "miny") / cellSize).cast("long"),
          floor(col(p + "maxy") / cellSize).cast("long"))))
    }
    cells(a, "aid", "a").join(cells(b, "bid", "b"), Seq("cx", "cy"))
      .filter(col("aminx") <= col("bmaxx") && col("bminx") <= col("amaxx") &&
        col("aminy") <= col("bmaxy") && col("bminy") <= col("amaxy"))
      .filter(col("cx") === greatest(
          floor(col("aminx") / cellSize), floor(col("bminx") / cellSize))
          .cast("long") &&
        col("cy") === greatest(
          floor(col("aminy") / cellSize), floor(col("bminy") / cellSize))
          .cast("long"))
      .filter(graft.functions.SparqlFunctions.ringsIntersect(
        col("aring"), col("bring")))
      .select(col("aid"), col("bid"))
  }

  /** Join MULTI-polygons `a(aid, rings: array<ring>)` × `b(bid, rings)` on
    * "some component of a intersects some component of b" (the exact
    * multi-geometry sfIntersects semantics, at scale).
    *
    * Components explode to (id, ring) rows and run through the SAME
    * grid-cell equi-join as [[polygonIntersectsJoin]] — never a cross join,
    * cost ∝ component count, not geometry count. The canonical-cell trick
    * makes each COMPONENT pair exactly-once, but two component pairs of the
    * same (aid, bid) can both intersect, so the id pairs dedup with one
    * hash aggregation — partial map-side combine keeps the extra exchange
    * small (∝ distinct pairs, not candidates).
    */
  def multiPolygonIntersectsJoin(a: DataFrame, b: DataFrame,
      cellSize: Double): DataFrame = {
    val ea = a.select(col("aid"), explode(col("rings")).as("ring"))
    val eb = b.select(col("bid"), explode(col("rings")).as("ring"))
    polygonIntersectsJoin(ea, eb, cellSize).distinct()
  }
}
