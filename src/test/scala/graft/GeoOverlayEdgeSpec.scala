package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Overlay contact edges (r14): boundaries CROSSING THROUGH a shared
  * vertex are now answered — the vertex is classified by the cyclic
  * order of its four incident boundary rays (alternating A/B rays =
  * transversal crossing) and joins the Greiner–Hormann node lists as a
  * first-class intersection; touch vertices coexisting with proper
  * crossings no longer veto the trace. r15: shared-edge-plus-crossing
  * and weaving-through-contact inputs answer through the makeValid
  * ARRANGEMENT (faces + per-boundary parity); remaining pinch
  * ambiguities stay refusals: correct-by-refusal, never a wrong polygon.
  *
  * Every answered case is pinned through the area-conservation laws
  * |A∩B| + |A∪B| = |A| + |B|, |A−B| = |A| − |A∩B|,
  * |AΔB| = |A∪B| − |A∩B|, plus hand-computed exact areas.
  */
class GeoOverlayEdgeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private val F = graft.functions.SparqlFunctions

  private def ops(wa: String, wb: String): (String, String, String, String) = {
    val r = Seq((wa, wb)).toDF("wa", "wb").select(
      F.geoIntersection(F.strT(col("wa")), F.strT(col("wb")))
        .getField("value").as("i"),
      F.geoUnion(F.strT(col("wa")), F.strT(col("wb")))
        .getField("value").as("u"),
      F.geoDifference(F.strT(col("wa")), F.strT(col("wb")))
        .getField("value").as("d"),
      F.geoSymDifference(F.strT(col("wa")), F.strT(col("wb")))
        .getField("value").as("sd")).head()
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
  }

  private def ringArea(body: String): Double = {
    val ps = body.split(",").map(_.trim.split("\\s+"))
      .map(a => (a(0).toDouble, a(1).toDouble))
    math.abs(ps.sliding(2).map { case Array((x1, y1), (x2, y2)) =>
      x1 * y2 - x2 * y1 }.sum / 2.0)
  }

  /** General WKT area: POLYGON first ring minus holes; MULTIPOLYGON
    * members may themselves carry holes (r14 serializeMulti).
    */
  private def areaOf(wkt: String): Double = {
    if (wkt == null) fail("unexpected refusal")
    if (wkt == "POLYGON EMPTY") return 0.0
    // structural split (r18 — the old regex produced ", " phantom rings
    // for a HOLED member inside a MULTIPOLYGON): members separated by
    // ")), ((", rings within a member by "), ("
    val members: Seq[Seq[String]] =
      if (wkt.startsWith("MULTIPOLYGON"))
        wkt.stripPrefix("MULTIPOLYGON (").dropRight(1)
          .split("\\)\\), \\(\\(").toSeq
          .map(_.stripPrefix("((").stripSuffix("))")
            .split("\\), \\(").toSeq.map(_.stripPrefix("(").stripSuffix(")")))
      else
        Seq(wkt.stripPrefix("POLYGON (").dropRight(1)
          .split("\\), \\(").toSeq.map(_.stripPrefix("(").stripSuffix(")")))
    members.map { rs =>
      ringArea(rs.head) - rs.tail.map(ringArea).sum
    }.sum
  }

  private def laws(wa: String, wb: String,
      expI: Double, expU: Double): Unit = {
    val (i, u, d, sd) = ops(wa, wb)
    val (aA, aB) = (areaOf(wa), areaOf(wb))
    val eps = 1e-9 * (aA + aB + 1)
    assert(math.abs(areaOf(i) - expI) < eps, s"∩: $i")
    assert(math.abs(areaOf(u) - expU) < eps, s"∪: $u")
    assert(math.abs(areaOf(i) + areaOf(u) - (aA + aB)) < eps, s"law: $i / $u")
    assert(math.abs(areaOf(d) - (aA - areaOf(i))) < eps, s"−: $d")
    assert(math.abs(areaOf(sd) - (areaOf(u) - areaOf(i))) < eps, s"Δ: $sd")
  }

  private val Square4 = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"

  test("boundaries crossing THROUGH a shared vertex (plus a proper " +
      "crossing) are answered: triangle with a vertex on the square's " +
      "edge, one ray in, one ray out") {
    // B's vertex (4 2) sits on A's right edge; B's rays go to (2 3)
    // (inside) and (6 3) (outside) — alternating with A's edge rays →
    // a transversal crossing; B's far edge crosses x=4 again at (4 3).
    val b = "POLYGON ((4 2, 2 3, 6 3, 4 2))"
    // A∩B = triangle (4 2)(2 3)(4 3), area 1; |B| = 2
    laws(Square4, b, expI = 1.0, expU = 16.0 + 2.0 - 1.0)
  }

  test("vertex crossing with a single extra proper hit: square corner " +
      "shared with a poking diamond") {
    val a = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    // B's vertex at A's corner (2 2), rays to (0.5 1) (inside A) and
    // (0.5 3) (outside) separate A's corner rays → crossing; B exits
    // through A's left edge at (0 1.2).
    val b = "POLYGON ((2 2, 0.5 1, -2 2, 0.5 3, 2 2))"
    // A∩B = (2 2)(0.5 1)(0 1.2)(0 2), area 1.2; |A| = 4, |B| = 4
    laws(a, b, expI = 1.2, expU = 4.0 + 4.0 - 1.2)
  }

  test("a TOUCH vertex coexisting with proper crossings no longer " +
      "vetoes the trace: intersection/difference answer; the union " +
      "(which pinches through the touch vertex) answers via the " +
      "arrangement as point-touching members (r15 — was a refusal)") {
    // B touches A's top edge at (2 4) from above (both rays outside A)
    // and dips into A with a separate lobe crossing at (3.25 4), (4 3).
    val b = "POLYGON ((1 5, 2 4, 3 5, 3.5 3, 5 3, 5 6, 1 6, 1 5))"
    val (i, u, d, sd) = ops(Square4, b)
    // A∩B = quad (3.25 4)(3.5 3)(4 3)(4 4), area 0.625
    assert(math.abs(areaOf(i) - 0.625) < 1e-9, s"∩: $i")
    assert(math.abs(areaOf(d) - (16.0 - 0.625)) < 1e-9, s"−: $d")
    // union boundary passes through the touch vertex twice — the
    // arrangement splits the pinch into touching members (JTS shape)
    // |A∪B| = 16 + 8.5 − 0.625
    assert(u != null && math.abs(areaOf(u) - 23.875) < 1e-9, s"∪: $u")
    // symdiff = (A−B) ∪ (B−A): each half passes the touch vertex once
    // (two rings meeting at a point) — answered as a MULTIPOLYGON
    // |AΔB| = |A| + |B| − 2|A∩B| = 16 + 8.5 − 1.25
    assert(sd != null && math.abs(areaOf(sd) - 23.25) < 1e-9, s"Δ: $sd")
  }

  test("pure corner touch (non-alternating rays) still resolves " +
      "degenerately, not through the trace") {
    val b = "POLYGON ((4 4, 8 4, 8 8, 4 8, 4 4))"
    val (i, u, d, _) = ops(Square4, b)
    assert(areaOf(i) == 0.0, s"∩: $i")
    assert(u.startsWith("MULTIPOLYGON"), s"∪: $u")
    assert(math.abs(areaOf(u) - 32.0) < 1e-9)
    assert(math.abs(areaOf(d) - 16.0) < 1e-9)
  }

  test("non-convex polygon buffer (r14): reflex vertices mitre-trim " +
      "exactly; area matches edge strips + sampled convex fans minus " +
      "the reflex overlap") {
    def buffer(wkt: String, r: Double): String = {
      val row = Seq(wkt).toDF("w").select(
        F.geoBuffer(F.strT(col("w")), F.numT(lit(r)), F.strT(lit("degree")))
          .getField("value").as("b")).head()
      if (row.isNullAt(0)) null else row.getString(0)
    }
    // L-shape, one right-angle reflex vertex at (2 2)
    val L = "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"
    val out = buffer(L, 0.5)
    assert(out != null && out.startsWith("POLYGON"), out)
    // the mitred inner corner is the EXACT offset point (2.5 2.5)
    assert(out.contains("2.5 2.5"), out)
    // area = |L| + P·r + 5 sampled quarter-fans − r² (reflex overlap):
    // 12 + 16·0.5 + 5·(sin(π/16)·r²·8/2)/… = 12 + 8 − 0.25 + 5·0.0487…
    val expected = 12.0 + 16 * 0.5 - 0.25 +
      5 * (8 * 0.5 * 0.25 * math.sin(math.Pi / 16))
    assert(math.abs(areaOf(out) - expected) < 1e-6,
      s"${areaOf(out)} vs $expected")
    // C-shape, slot width 2: r = 0.8 answers (walls offset to 2.8/3.2,
    // no seal)
    val C = "POLYGON ((0 0, 6 0, 6 6, 4 6, 4 2, 2 2, 2 6, 0 6, 0 0))"
    val ok = buffer(C, 0.8)
    assert(ok != null && ok.contains("3.2 2.8") && ok.contains("2.8"),
      ok)
    // convex input unchanged: still answers (the geo_pbuffer oracle pins
    // the exact envelope; here just the class)
    assert(buffer("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", 0.5)
      .startsWith("POLYGON"))
  }

  test("pocket-sealing buffer (r15 — was a refusal): a radius sealing " +
      "the C slot fills it (winding-2 overlap band, ONE ring, no false " +
      "hole); a lipped flask with an unreachable chamber grows a HOLE") {
    def buffer(wkt: String, r: Double): String = {
      val row = Seq(wkt).toDF("w").select(
        F.geoBuffer(F.strT(col("w")), F.numT(lit(r)), F.strT(lit("degree")))
          .getField("value").as("b")).head()
      if (row.isNullAt(0)) null else row.getString(0)
    }
    def nrings(wkt: String): Int = wkt.count(_ == '(') - 1
    // C slot width 2, r = 1.2 > half-width: the whole slot is within r of
    // a wall — the nonzero fill keeps the double-covered band FILLED
    // (even-odd would punch a false hole) and the boundary dips to the
    // arcs' seal crossing above the mouth
    val C = "POLYGON ((0 0, 6 0, 6 6, 4 6, 4 2, 2 2, 2 6, 0 6, 0 0))"
    val sealedC = buffer(C, 1.2)
    assert(sealedC != null && sealedC.startsWith("POLYGON (("), sealedC)
    assert(nrings(sealedC) == 1, sealedC)
    // envelope grown by exactly r on every side
    val pts = "(-?[0-9.]+) (-?[0-9.]+)".r.findAllMatchIn(sealedC)
      .map(m => (m.group(1).toDouble, m.group(2).toDouble)).toSeq
    assert(math.abs(pts.map(_._1).min - -1.2) < 1e-12 &&
      math.abs(pts.map(_._1).max - 7.2) < 1e-12 &&
      math.abs(pts.map(_._2).max - 7.2) < 1e-12, sealedC)
    // the seal: boundary vertices exist ABOVE the mouth (y in (6, 7.2))
    // strictly inside the slot's x-range — the crossing notch
    assert(pts.exists { case (x, y) => x > 2.2 && x < 3.8 && y > 6 && y < 7.2 },
      sealedC)
    // area: strictly more than the unsealed true buffer of the filled
    // 6x6 square MINUS nothing... bound it: at least the square's own
    // buffer minus the wedge, at most the full square buffer
    val sqBuf = 36.0 + 24 * 1.2 + math.Pi * 1.44
    assert(areaOf(sealedC) < sqBuf && areaOf(sealedC) > 36.0, sealedC)
    // FLASK: slot x in [2,6] (width 4 > 2r), lips narrowing the mouth to
    // x in [3.5,4.5] (gap 1 < 2r): the mouth seals, the chamber interior
    // (clearance > r) survives as a genuine interior ring
    val flask = "POLYGON ((0 0, 8 0, 8 8, 4.5 8, 4.5 7.5, 6 7.5, 6 2, " +
      "2 2, 2 7.5, 3.5 7.5, 3.5 8, 0 8, 0 0))"
    val holed = buffer(flask, 0.8)
    assert(holed != null && holed.startsWith("POLYGON (("), holed)
    assert(nrings(holed) == 2, holed)
    // the hole's straight walls are the slot offsets: x 2.8/5.2, bottom
    // y 2.8, lip undersides y 6.7
    assert(holed.contains("2.8 2.8") && holed.contains("5.2 2.8"), holed)
    assert(holed.contains("6.7"), holed)
    // hole area < slot area; outer ring still spans the grown envelope
    val holePts = "(-?[0-9.]+) (-?[0-9.]+)".r.findAllMatchIn(holed)
      .map(m => (m.group(1).toDouble, m.group(2).toDouble)).toSeq
    assert(math.abs(holePts.map(_._1).min - -0.8) < 1e-12 &&
      math.abs(holePts.map(_._2).max - 8.8) < 1e-12, holed)
    // r = 2 on the C also answers (trims stay in-segment; the slot fills
    // completely and the boundary dips to the r=2 arc seal)
    val deep = buffer(C, 2.0)
    assert(deep != null && nrings(deep) == 1, deep)
    // radius past the LOCAL feature size now ANSWERS (r18 — the raw
    // offset corner + nonzero-winding fill replaced the last buffer
    // refusal): on the L the reflex corner is swallowed; the boundary
    // keeps a small DENT where neither notch-corner disc reaches —
    // strictly between the L's own Minkowski lower pieces and the filled
    // square's buffer. The exact-by-grid pin lives in the dedicated
    // swallowed-corner test; here: answers, one ring, dent vertex on
    // both corner arcs (distance 2.5 from (2,4) AND (4,2)).
    val L = "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"
    val swallowed = buffer(L, 2.5)
    assert(swallowed != null && nrings(swallowed) == 1, swallowed)
    val sqMink = 16.0 + 16 * 2.5 + math.Pi * 2.5 * 2.5
    assert(areaOf(swallowed) < sqMink, swallowed)
    val sPts = "(-?[0-9.]+) (-?[0-9.]+)".r.findAllMatchIn(swallowed)
      .map(m => (m.group(1).toDouble, m.group(2).toDouble)).toSeq
    assert(sPts.exists { case (x, y) =>
      math.abs(math.hypot(x - 2, y - 4) - 2.5) < 0.01 &&
        math.abs(math.hypot(x - 4, y - 2) - 2.5) < 0.01 }, swallowed)
  }

  test("shared EDGE plus a proper crossing is ANSWERED via the " +
      "arrangement (r15 — was a refusal)") {
    // B shares the segment (4 1)-(4 2) of A's right edge and also
    // properly crosses A's top edge at (10/3, 4); the wedge
    // ((4 2),(10/3 4),(4 4)) is the intersection, area 2/3
    val b = "POLYGON ((4 1, 4 2, 3 5, 6 5, 4 1))"
    laws(Square4, b, expI = 2.0 / 3.0, expU = 16.0 + 5.5 - 2.0 / 3.0)
    // the difference's notch boundary runs A's right edge up to (4 2)
    // then B's edge toward the top-edge crossing
    val (_, _, d, _) = ops(Square4, b)
    assert(d.contains("4.0 2.0") && d.contains("3.33333333"), d)
  }

  test("a boundary WEAVING through shared structure (shared edge + " +
      "collinear overlap, free edges both inside and outside, NO proper " +
      "crossings) is answered via the arrangement (r15 — was a refusal)") {
    // B: step polygon sharing (4 1)-(4 2) of A's right edge, overlapping
    // A's bottom edge collinearly on (3 0)-(4 0), one lobe [3,4]x[0,1]
    // inside A and one [4,5]x[0,2] outside
    val b = "POLYGON ((3 1, 4 1, 4 2, 5 2, 5 0, 3 0, 3 1))"
    laws(Square4, b, expI = 1.0, expU = 16.0 + 3.0 - 1.0)
    val (i, _, _, _) = ops(Square4, b)
    // the intersection is exactly the inside lobe
    assert(areaOf(i) == 1.0, i)
  }

  test("REPAIR-THEN-OVERLAY (r18 — was a refusal): a self-intersecting " +
      "operand routes through makeValid and the repaired ring set " +
      "overlays via the per-component arrangement") {
    // bowtie = even-odd pair of 4-area triangles pinched at (2 2)
    val bowtie = "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))"
    // center square overlaps both lobes by exactly 1 each. (laws() is
    // unusable here: the RAW bowtie's shoelace is 0 — its repaired area
    // is 8, asserted directly.)
    val centerSq = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
    val (ci, cu, cd, csd) = ops(bowtie, centerSq)
    assert(math.abs(areaOf(ci) - 2.0) < 1e-9, ci)
    assert(math.abs(areaOf(cu) - 10.0) < 1e-9, cu)
    assert(math.abs(areaOf(cd) - 6.0) < 1e-9, cd)
    assert(math.abs(areaOf(csd) - 8.0) < 1e-9, csd)
    // DISJOINT partner exercises the component seeding (A's two lobes +
    // B are separate arrangement components); the union must emit the
    // REPAIRED bowtie, never the raw self-crossing ring
    val farSq = "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))"
    val (fi, fu, fd, fsd) = ops(bowtie, farSq)
    assert(areaOf(fi) == 0.0, fi)
    assert(math.abs(areaOf(fu) - 12.0) < 1e-9, fu)
    assert(!fu.contains("0 0, 4 4, 4 0, 0 4"), fu)
    assert(math.abs(areaOf(fd) - 8.0) < 1e-9, fd)
    assert(math.abs(areaOf(fsd) - 12.0) < 1e-9, fsd)
    // partner strictly INSIDE one repaired lobe: ambient state (1,0) for
    // B's component; the difference grows a genuine hole
    val inLobe = "POLYGON ((0.5 1.5, 1 1.5, 1 2.5, 0.5 2.5, 0.5 1.5))"
    val (ii, iu, id, isd) = ops(bowtie, inLobe)
    assert(math.abs(areaOf(ii) - 0.5) < 1e-9, ii)
    assert(math.abs(areaOf(iu) - 8.0) < 1e-9, iu)
    assert(math.abs(areaOf(id) - 7.5) < 1e-9, id)
    assert(id.contains("), ("), id) // the hole ring
    assert(math.abs(areaOf(isd) - 7.5) < 1e-9, isd)
    // BOTH operands self-intersecting
    val bow2 = "POLYGON ((1 1, 3 3, 3 1, 1 3, 1 1))"
    val (bi, bu, bd, bsd) = ops(bowtie, bow2)
    assert(math.abs(areaOf(bi) + areaOf(bu) - 10.0) < 1e-9, s"$bi / $bu")
    assert(math.abs(areaOf(bd) - (8.0 - areaOf(bi))) < 1e-9, bd)
    assert(math.abs(areaOf(bsd) - (areaOf(bu) - areaOf(bi))) < 1e-9, bsd)
  }

  test("swallowed-corner buffer (r18 — was a refusal) matches the exact " +
      "distance field on a dense grid") {
    def buffer(wkt: String, r: Double): String = {
      val row = Seq(wkt).toDF("w").select(
        F.geoBuffer(F.strT(col("w")), F.numT(lit(r)), F.strT(lit("degree")))
          .getField("value").as("b")).head()
      if (row.isNullAt(0)) null else row.getString(0)
    }
    def ringsOf(wkt: String): Seq[Array[(Double, Double)]] =
      "\\(([^()]+)\\)".r.findAllMatchIn(wkt).map(_.group(1)).toSeq.map { s =>
        s.split(",").map(_.trim.split("\\s+"))
          .map(a => (a(0).toDouble, a(1).toDouble))
      }
    def pip(x: Double, y: Double, rs: Seq[Array[(Double, Double)]]): Boolean = {
      var inside = false
      rs.foreach { r =>
        var i = 0
        while (i < r.length - 1) {
          val (ax, ay) = r(i); val (bx, by) = r(i + 1)
          if (((ay > y) != (by > y)) &&
              (x < (bx - ax) * (y - ay) / (by - ay) + ax)) inside = !inside
          i += 1
        }
      }
      inside
    }
    def distTo(x: Double, y: Double, p: Array[(Double, Double)]): Double = {
      if (pip(x, y, Seq(p))) return 0.0
      var best = Double.MaxValue
      var i = 0
      while (i < p.length - 1) {
        val (ax, ay) = p(i); val (bx, by) = p(i + 1)
        val dx = bx - ax; val dy = by - ay
        val tt = math.max(0.0, math.min(1.0,
          ((x - ax) * dx + (y - ay) * dy) / (dx * dx + dy * dy)))
        val d = math.hypot(x - (ax + tt * dx), y - (ay + tt * dy))
        if (d < best) best = d
        i += 1
      }
      best
    }
    // V-notched square: adjacent notch edges have length sqrt(2) << r=3,
    // so the reflex mitre trim lands outside its offset segments and the
    // corner is SWALLOWED — the raw offset corner + winding fill answer.
    // Ground truth is the definition itself: P is in the buffer iff
    // dist(P, polygon) <= r. A 0.05-wide band around the r-contour is
    // excluded (arc sampling: inscribed 2pi/32 chords).
    for ((wkt, r) <- Seq(
      ("POLYGON ((0 0, 10 0, 10 10, 6 10, 5 9, 4 10, 0 10, 0 0))", 3.0),
      // the pocket test's L at the formerly-refused radius: the dent
      // where neither notch-corner disc reaches must survive exactly
      ("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))", 2.5))) {
      val poly = ringsOf(wkt).head
      val out = buffer(wkt, r)
      assert(out != null, s"swallowed-corner buffer refused: $wkt @ $r")
      val rs = ringsOf(out)
      var bad = 0
      var gy = -r - 1.5
      while (gy <= 10 + r + 1.5) {
        var gx = -r - 1.5
        while (gx <= 10 + r + 1.5) {
          val d = distTo(gx, gy, poly)
          if (math.abs(d - r) > 0.05 && (d <= r) != pip(gx, gy, rs)) bad += 1
          gx += 0.2
        }
        gy += 0.2
      }
      assert(bad == 0, s"$bad grid mismatches: $out")
    }
  }
}
