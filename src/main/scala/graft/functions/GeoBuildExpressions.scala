package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Geometry CONSTRUCTORS for the `geof:` non-topological functions —
  * native expressions emitting WKT text (the same one-node-per-function
  * posture as [[RingRelate]]; Column-combinator encodings of these
  * algorithms would be enormous or impossible — a hull needs a stack).
  *
  * Determinism contract: every vertex is computed from the parsed input
  * doubles with fixed-association arithmetic and serialized with the JVM
  * shortest round-trip digits in plain decimal form (never scientific
  * notation), so coordinates that originate as decimal text (`-6.38`)
  * survive hull/clip verbatim and oracles can reconstruct outputs by
  * string algebra.
  */
private object WktOut {
  /** Proper self-crossing among non-adjacent edges → not simple. */
  def selfIntersecting(ring: Array[(Double, Double)]): Boolean = {
    val n = ring.length
    var i = 0
    while (i < n) {
      var j = i + 2
      while (j < n) {
        if (!(i == 0 && j == n - 1)) {
          val (px, py) = ring(i); val (qx, qy) = ring((i + 1) % n)
          val (ux, uy) = ring(j); val (vx, vy) = ring((j + 1) % n)
          val d1x = qx - px; val d1y = qy - py
          val d2x = vx - ux; val d2y = vy - uy
          val denom = d1x * d2y - d1y * d2x
          if (denom != 0.0) {
            val wx = ux - px; val wy = uy - py
            val t = (wx * d2y - wy * d2x) / denom
            val s = (wx * d1y - wy * d1x) / denom
            if (t > 0.0 && t < 1.0 && s > 0.0 && s < 1.0) return true
          }
        }
        j += 1
      }
      i += 1
    }
    false
  }

  /** Shortest JVM round-trip digits rendered in PLAIN decimal form —
    * `Double.toString` alone emits scientific notation for |x| < 1e-3 or
    * >= 1e7, which the downstream WKT coordinate regexes (`-?[0-9.]+`)
    * would silently truncate ("8.9E-4" parses as 4). -0.0 normalizes to
    * 0.0 (clip line intersections can produce the negative-zero bit
    * pattern). */
  def fmt(d: Double): String = {
    val s = (if (d == 0.0) 0.0 else d).toString
    if (s.indexOf('E') < 0) s
    else {
      val plain = new java.math.BigDecimal(s).toPlainString
      // BigDecimal keeps a trailing ".0"-less integer form; WKT readers
      // here accept both, so return it verbatim.
      plain
    }
  }
  def ring(pts: IndexedSeq[(Double, Double)]): String =
    pts.map { case (x, y) => s"${fmt(x)} ${fmt(y)}" }.mkString(", ")
  def decode(a: Any): Array[(Double, Double)] = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[(Double, Double)](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val r = arr.getStruct(i, 2)
      if (r.isNullAt(0) || r.isNullAt(1)) return null
      out(i) = (r.getDouble(0), r.getDouble(1))
      i += 1
    }
    out
  }
  @inline def cross(o: (Double, Double), a: (Double, Double),
      b: (Double, Double)): Double =
    (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
}

/** `geof:convexHull` over ALL coordinate pairs of the input geometry
  * (any WKT class including multis). Andrew's monotone chain over the
  * sorted distinct points: output is a CCW closed POLYGON starting at the
  * leftmost-lowest vertex; degenerate inputs collapse per Simple Features
  * (1 point → POINT, all collinear → LINESTRING between the extremes).
  */
case class ConvexHull(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_convex_hull"

  override protected def nullSafeEval(input: Any): Any = {
    import WktOut._
    val raw = decode(input)
    if (raw == null || raw.isEmpty) return null
    val pts = raw.distinct.sorted
    val res: String =
      if (pts.length == 1) s"POINT (${fmt(pts(0)._1)} ${fmt(pts(0)._2)})"
      else {
        val hull = chain(pts)
        if (hull.length == 2)
          s"LINESTRING (${ring(hull.toIndexedSeq)})"
        else
          s"POLYGON ((${ring((hull :+ hull.head).toIndexedSeq)}))"
      }
    UTF8String.fromString(res)
  }

  /** Monotone chain; returns the CCW hull without the closing vertex. */
  private def chain(pts: Array[(Double, Double)]): Array[(Double, Double)] = {
    import WktOut.cross
    val n = pts.length
    val h = new Array[(Double, Double)](2 * n)
    var k = 0
    var i = 0
    while (i < n) { // lower hull
      while (k >= 2 && cross(h(k - 2), h(k - 1), pts(i)) <= 0) k -= 1
      h(k) = pts(i); k += 1; i += 1
    }
    val lower = k + 1
    i = n - 2
    while (i >= 0) { // upper hull
      while (k >= lower && cross(h(k - 2), h(k - 1), pts(i)) <= 0) k -= 1
      h(k) = pts(i); k += 1; i -= 1
    }
    h.take(k - 1) // last point == first
  }

  override protected def withNewChildInternal(c: Expression): ConvexHull =
    copy(child = c)
}

object ConvexHull {
  def apply(points: Column): Column =
    ColumnBridge.column(ConvexHull(ColumnBridge.expression(points)))
}

/** `geof:buffer` of a POINT: the planar regular 32-gon (JTS's default 8
  * quadrant segments) of radius `rDeg` (already converted to degrees by the
  * caller), CCW from angle 0 (due east), closed. A planar circle in CRS84
  * degrees — the same small-radius approximation a planar JTS buffer makes.
  */
case class PointBuffer(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_point_buffer"

  override protected def nullSafeEval(x: Any, y: Any, r: Any): Any = {
    import WktOut._
    val cx = x.asInstanceOf[Double]
    val cy = y.asInstanceOf[Double]
    val rd = r.asInstanceOf[Double]
    val n = 32
    val pts = (0 until n).map { k =>
      val th = 2.0 * math.Pi * k / n
      (cx + rd * math.cos(th), cy + rd * math.sin(th))
    }
    UTF8String.fromString(s"POLYGON ((${ring(pts :+ pts.head)}))")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): PointBuffer = copy(first = f, second = s, third = t)
}

object PointBuffer {
  def apply(x: Column, y: Column, rDeg: Column): Column =
    ColumnBridge.column(PointBuffer(ColumnBridge.expression(x),
      ColumnBridge.expression(y), ColumnBridge.expression(rDeg)))
}

/** `geof:intersection` of two CONVEX rings (Sutherland–Hodgman clip —
  * exact for convex×convex; a non-convex input returns NULL/error rather
  * than a wrong polygon — the documented scope). Inputs are CLOSED vertex
  * lists; output is the clipped CCW closed POLYGON WKT starting at its
  * leftmost-lowest vertex, or `POLYGON EMPTY` when the overlap is empty
  * or degenerate (boundary-only contact).
  */
case class ConvexClip(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_convex_clip"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    import WktOut._
    val a0 = decode(l)
    val b0 = decode(r)
    if (a0 == null || b0 == null || a0.length < 4 || b0.length < 4) return null
    val subj = toCcwOpen(a0)
    val clip = toCcwOpen(b0)
    if (subj == null || clip == null) return null // non-convex → error
    var out = subj.toVector
    var ci = 0
    while (ci < clip.length && out.nonEmpty) {
      val p1 = clip(ci)
      val p2 = clip((ci + 1) % clip.length)
      val in = out
      out = Vector.empty
      var i = 0
      while (i < in.length) {
        val cur = in(i)
        val prev = in((i + in.length - 1) % in.length)
        val curIn = cross(p1, p2, cur) >= 0
        val prevIn = cross(p1, p2, prev) >= 0
        if (curIn) {
          if (!prevIn) out :+= isect(prev, cur, p1, p2)
          out :+= cur
        } else if (prevIn) out :+= isect(prev, cur, p1, p2)
        i += 1
      }
      ci += 1
    }
    val dedup = out.distinct
    if (dedup.length < 3) UTF8String.fromString("POLYGON EMPTY")
    else {
      // rotate to the leftmost-lowest start for a deterministic lexical form
      val start = dedup.indexOf(dedup.min)
      val rot = (dedup.drop(start) ++ dedup.take(start)).toIndexedSeq
      UTF8String.fromString(s"POLYGON ((${ring(rot :+ rot.head)}))")
    }
  }

  /** Closed ring → open CCW vertex list; null when non-convex. */
  private def toCcwOpen(closed: Array[(Double, Double)]): Array[(Double, Double)] = {
    import WktOut.cross
    val open = if (closed.head == closed.last) closed.dropRight(1) else closed
    var area2 = 0.0
    var i = 0
    while (i < open.length) {
      val (x1, y1) = open(i)
      val (x2, y2) = open((i + 1) % open.length)
      area2 += x1 * y2 - x2 * y1
      i += 1
    }
    val ccw = if (area2 < 0) open.reverse else open
    // convexity: every turn non-right
    i = 0
    while (i < ccw.length) {
      if (cross(ccw(i), ccw((i + 1) % ccw.length),
        ccw((i + 2) % ccw.length)) < 0) return null
      i += 1
    }
    ccw
  }

  private def isect(a: (Double, Double), b: (Double, Double),
      p1: (Double, Double), p2: (Double, Double)): (Double, Double) = {
    val a1 = b._2 - a._2; val b1 = a._1 - b._1
    val c1 = a1 * a._1 + b1 * a._2
    val a2 = p2._2 - p1._2; val b2 = p1._1 - p2._1
    val c2 = a2 * p1._1 + b2 * p1._2
    val det = a1 * b2 - a2 * b1
    ((b2 * c1 - b1 * c2) / det, (a1 * c2 - a2 * c1) / det)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ConvexClip = copy(left = newLeft, right = newRight)
}

object ConvexClip {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ConvexClip(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}

/** Greiner–Hormann polygon overlay (`geof:intersection`/`union`/
  * `difference`/`symDifference`) for SIMPLE polygons — the general-shape
  * complement to [[ConvexClip]]'s convex-only scope (r10 VERDICT missing
  * #1; algorithm from the published Greiner–Hormann 1998 clipping paper).
  *
  * Phases: (1) insert every PROPER edge×edge crossing into both rings'
  * circular vertex lists, parameter-sorted; (2) mark each crossing
  * entry/exit by ray-cast parity of the ring's start vertex; (3) trace
  * result rings — forward from an entry, backward from an exit, switching
  * rings at each crossing. Flag complements select the operation:
  * intersection = none, union = both, A−B = A's flags (verified by the
  * worked square×square example in the spec tests).
  *
  * ERROR POSTURE (null, never a wrong polygon — same contract as the
  * other constructors): self-intersecting input; shared EDGES combined
  * with proper crossings; coincident incident rays at a shared vertex;
  * result rings that PINCH through a touch vertex; unassignable hole
  * nesting (numerical residue). Crossings THROUGH a shared VERTEX are
  * ANSWERED (r14): each shared vertex classifies by the cyclic order of
  * its four incident boundary rays — alternating A/B rays is a
  * transversal crossing and the vertex joins the node lists as a
  * first-class intersection; non-alternating is a touch and stays a
  * plain node. HOLE-PRODUCING results are ANSWERED (r12 cont., depth
  * generalized r14): B strictly inside A for difference/symDifference
  * serializes as A with B as an interior ring, and traced/stitched ring
  * sets classify by containment depth at ARBITRARY nesting — even depth
  * shells, odd depth holes of the unique depth-(d−1) parent — the
  * membership kernels read holed polygons with even-odd parity, so the
  * answers round-trip. Boundary-free cases resolve by containment: e.g.
  * intersection of nested rings is the inner ring, union of disjoint
  * rings the exact MULTIPOLYGON.
  *
  * Determinism: fixed-association IEEE intersection arithmetic; each
  * output ring normalized CCW, rotated to its leftmost-lowest vertex;
  * multiple rings sorted lexically — one canonical WKT per input pair.
  */
/** Ring geometry + serialization helpers shared by [[PolyOverlay]] and
  * [[MakeValid]] — pure functions over (x,y) vertex arrays: exact
  * orientation/membership predicates, canonical CCW ring form, and the
  * containment-depth hole classifier.
  */
private[functions] object GeoRings {
  def cross3(ox: Double, oy: Double, ax: Double, ay: Double,
      bx: Double, by: Double): Double =
    (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

  def pointIn(x: Double, y: Double,
      ring: Array[(Double, Double)]): Boolean = {
    var c = 0
    var i = 0
    val n = ring.length
    while (i < n) {
      val (ax, ay) = ring(i)
      val (bx, by) = ring((i + 1) % n)
      if (((ay > y) != (by > y)) && (x < (bx - ax) * (y - ay) / (by - ay) + ax))
        c += 1
      i += 1
    }
    c % 2 == 1
  }

  def onEdge(x: Double, y: Double,
      ring: Array[(Double, Double)]): Boolean = {
    var i = 0
    val n = ring.length
    while (i < n) {
      val (ax, ay) = ring(i)
      val (bx, by) = ring((i + 1) % n)
      if (cross3(ax, ay, bx, by, x, y) == 0.0 &&
        x >= math.min(ax, bx) && x <= math.max(ax, bx) &&
        y >= math.min(ay, by) && y <= math.max(ay, by)) return true
      i += 1
    }
    false
  }

  /** (x,y) strictly inside segment p–q (collinear, between, not an
    * endpoint) — the refinement test for degenerate contact.
    */
  def onSegmentStrict(x: Double, y: Double, px: Double, py: Double,
      qx: Double, qy: Double): Boolean =
    !(x == px && y == py) && !(x == qx && y == qy) &&
      cross3(px, py, qx, qy, x, y) == 0.0 &&
      x >= math.min(px, qx) && x <= math.max(px, qx) &&
      y >= math.min(py, qy) && y <= math.max(py, qy)

  /** Decompose a face walk (which may revisit pinch vertices) into
    * simple vertex cycles: a stack pops each closed loop as it completes.
    * (Shared by the makeValid repair and the r15 arrangement overlay.)
    */
  def simpleCycles(walk: Vector[(Double, Double)])
      : List[Vector[(Double, Double)]] = {
    val stack = collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val pos = collection.mutable.Map.empty[(Double, Double), Int]
    val out = collection.mutable.ListBuffer.empty[Vector[(Double, Double)]]
    walk.foreach { p =>
      pos.get(p) match {
        case Some(i) =>
          val cyc = stack.slice(i, stack.length).toVector
          var k = i
          while (k < stack.length) { pos.remove(stack(k)); k += 1 }
          stack.remove(i, stack.length - i)
          if (cyc.length >= 3) out += cyc
          pos(p) = stack.length; stack += p
        case None => pos(p) = stack.length; stack += p
      }
    }
    if (stack.length >= 3) out += stack.toVector
    out.toList
  }

  def canon(r: Vector[(Double, Double)]): IndexedSeq[(Double, Double)] = {
    var area2 = 0.0
    var i = 0
    while (i < r.length) {
      val (x1, y1) = r(i); val (x2, y2) = r((i + 1) % r.length)
      area2 += x1 * y2 - x2 * y1
      i += 1
    }
    val ccw = if (area2 < 0) r.reverse else r
    val start = ccw.indexOf(ccw.min)
    (ccw.drop(start) ++ ccw.take(start)) :+ ccw(start)
  }

  /** A single polygon WITH interior rings (r12 cont. — hole-producing
    * overlay results are now ANSWERED; the membership kernels are parity-
    * based, so ring winding is canonical CCW like every other output).
    * Holes sort lexically for one canonical WKT per input pair.
    */
  def serializeHoled(outer: Vector[(Double, Double)],
      holes: List[Vector[(Double, Double)]]): UTF8String = {
    import WktOut.{ring => wr}
    val body = (s"(${wr(canon(outer))})" ::
      holes.map(h => s"(${wr(canon(h))})").sorted).mkString(", ")
    UTF8String.fromString(s"POLYGON ($body)")
  }

  def serialize(rings: List[Vector[(Double, Double)]]): UTF8String = {
    import WktOut.{ring => wr}
    rings match {
      case Nil => UTF8String.fromString("POLYGON EMPTY")
      case one :: Nil =>
        UTF8String.fromString(s"POLYGON ((${wr(canon(one))}))")
      case many =>
        val bodies = many.map(r => s"((${wr(canon(r))}))").sorted
        UTF8String.fromString(s"MULTIPOLYGON (${bodies.mkString(", ")})")
    }
  }

  /** Serialize a traced/stitched ring set. Nested rings are HOLES, at
    * ARBITRARY depth (r14 — was single-level since r12): overlay output
    * rings never cross, so containment is a forest and each ring's depth
    * (the count of rings strictly containing it) classifies it exactly —
    * even depth is a shell, odd depth a hole of the UNIQUE depth-(d-1)
    * shell containing it (two non-crossing rings both containing a third
    * are themselves nested, so the parent at d-1 is unique). An
    * unassignable hole is numerical residue — refused, never wrong.
    * The containment probe uses a vertex OFF the other ring's boundary:
    * symDifference halves legitimately touch at the crossing points.
    */
  def finishRings(rings: List[Vector[(Double, Double)]]): Any = {
    def ringInside(r1: Vector[(Double, Double)],
        r2: Vector[(Double, Double)]): Boolean = {
      val arr2 = r2.toArray
      r1.find { case (x, y) => !onEdge(x, y, arr2) }
        .exists { case (x, y) => pointIn(x, y, arr2) }
    }
    val withD = rings.map(r =>
      (r, rings.count(o => (o ne r) && ringInside(r, o))))
    if (withD.forall(_._2 == 0)) serialize(rings)
    else {
      val shells = withD.filter(_._2 % 2 == 0)
      val holes = withD.filter(_._2 % 2 == 1)
      val assigned = holes.map { case (hole, dh) =>
        val parents = shells.collect {
          case (s, ds) if ds == dh - 1 && ringInside(hole, s) => s }
        if (parents.size != 1) return null
        (parents.head, hole)
      }
      serializeMulti(shells.map { case (s, _) =>
        (s, assigned.collect { case (p, hole) if p eq s => hole }) })
    }
  }

  /** Multi-member serialization with holes (r14): each (shell, holes)
    * member renders like [[serializeHoled]]; members sort lexically for
    * one canonical WKT per input pair.
    */
  def serializeMulti(
      polys: List[(Vector[(Double, Double)], List[Vector[(Double, Double)]])]): UTF8String = {
    import WktOut.{ring => wr}
    polys match {
      case Nil => UTF8String.fromString("POLYGON EMPTY")
      case (o, Nil) :: Nil => serialize(List(o))
      case (o, hs) :: Nil => serializeHoled(o, hs)
      case many =>
        val bodies = many.map { case (o, hs) =>
          "(" + (s"(${wr(canon(o))})" ::
            hs.map(h2 => s"(${wr(canon(h2))})").sorted).mkString(", ") + ")"
        }.sorted
        UTF8String.fromString(s"MULTIPOLYGON (${bodies.mkString(", ")})")
    }
  }
}

case class PolyOverlay(op: String, left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  import GeoRings._
  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_overlay_$op"

  private final class Node(val x: Double, val y: Double, val alpha: Double,
      var intersect: Boolean) {
    var next: Node = _
    var prev: Node = _
    var neighbor: Node = _
    var entry = false
    var visited = false
  }

  /** Insert `other`'s vertices that lie strictly inside an edge of `r`
    * (parameter-ordered), so all boundary contact becomes vertex-to-vertex
    * or exactly-shared directed edges — the perturbation-free
    * normalization that lets degenerate contact be CLASSIFIED instead of
    * refused.
    */
  private def refine(r: Array[(Double, Double)],
      other: Array[(Double, Double)]): Array[(Double, Double)] = {
    val out = collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    while (i < r.length) {
      val (px, py) = r(i); val (qx, qy) = r((i + 1) % r.length)
      out += ((px, py))
      val on = other.filter { case (x, y) =>
        onSegmentStrict(x, y, px, py, qx, qy) }
      val t = (v: (Double, Double)) =>
        if (math.abs(qx - px) >= math.abs(qy - py)) (v._1 - px) / (qx - px)
        else (v._2 - py) / (qy - py)
      out ++= on.sortBy(t)
      i += 1
    }
    out.toArray
  }

  private def dirEdges(r: Array[(Double, Double)])
      : Vector[((Double, Double), (Double, Double))] =
    r.indices.map(i => (r(i), r((i + 1) % r.length))).toVector

  /** Link directed edges (after opposite-pair cancellation) into closed
    * rings by following unique successors. Ambiguity (a vertex with two
    * outgoing edges — a pinch) or a dangling edge → None, and the operator
    * refuses rather than guessing.
    */
  private def stitch(edges: Vector[((Double, Double), (Double, Double))])
      : Option[List[Vector[(Double, Double)]]] = {
    // cancel (u→v, v→u) pairs across the multiset
    val counts = collection.mutable.Map
      .empty[((Double, Double), (Double, Double)), Int]
    edges.foreach(e => counts(e) = counts.getOrElse(e, 0) + 1)
    val live = collection.mutable.ArrayBuffer
      .empty[((Double, Double), (Double, Double))]
    edges.foreach { e =>
      val rev = (e._2, e._1)
      if (counts.getOrElse(rev, 0) > 0 && counts(e) > 0) {
        counts(e) -= 1; counts(rev) -= 1
      }
    }
    counts.foreach { case (e, n) =>
      if (n > 1) return None // duplicate directed edge: invalid overlay
      if (n == 1) live += e
    }
    if (live.isEmpty) return Some(Nil)
    val succ = collection.mutable.Map
      .empty[(Double, Double), (Double, Double)]
    live.foreach { case (u, v) =>
      if (succ.contains(u)) return None // pinch vertex: ambiguous trace
      succ(u) = v
    }
    val visited = collection.mutable.Set.empty[(Double, Double)]
    var rings = List.empty[Vector[(Double, Double)]]
    live.map(_._1).sorted.foreach { start =>
      if (!visited(start)) {
        val ring = collection.mutable.ArrayBuffer.empty[(Double, Double)]
        var cur = start
        while (!visited(cur)) {
          visited += cur
          ring += cur
          cur = succ.getOrElse(cur, return None)
        }
        if (cur != start) return None // walked into a previous ring: tangled
        if (ring.length < 3) return None
        rings ::= ring.toVector
      }
    }
    Some(rings)
  }

  /** Closed decoded ring → open CCW vertex array (signed-area orient).
    * Consecutive duplicate vertices collapse first — a zero-length edge
    * would slip past every denom!=0 guard and malform the trace.
    */
  private def openCcw(closed: Array[(Double, Double)]): Array[(Double, Double)] = {
    val open0 = if (closed.length > 1 && closed.head == closed.last)
      closed.dropRight(1) else closed
    val open = open0.zipWithIndex.collect {
      case (p, i) if p != open0((i + 1) % open0.length) => p
    }
    var area2 = 0.0
    var i = 0
    while (i < open.length) {
      val (x1, y1) = open(i)
      val (x2, y2) = open((i + 1) % open.length)
      area2 += x1 * y2 - x2 * y1
      i += 1
    }
    if (area2 < 0) open.reverse else open
  }


  /** Degenerate-contact resolution (r12): called when the refined rings
    * share boundary (vertices/edges) but have NO proper crossings. The
    * shared-edge structure plus strict midpoint containment of the
    * NON-shared edges classifies the pair — equal, contained-touching,
    * or interior-disjoint-touching — and the answers assemble by directed
    * edge cancellation + stitching (union of edge-adjacent polygons
    * dissolves the shared boundary; difference of a touching-inscribed
    * polygon pinches it out). Since r14 boundary crossings through a
    * shared VERTEX are routed to the trace before this resolver runs (ray
    * classification in nullSafeEval), so mixed midpoints here are
    * numerical residue only; anything the classification cannot prove
    * (a pinch shows up as an ambiguous stitch) stays a refusal:
    * correct-by-refusal, never wrong.
    */
  private def degenerate(a: Array[(Double, Double)],
      b: Array[(Double, Double)]): Any = {
    val eA = dirEdges(a); val eB = dirEdges(b)
    val setA = eA.toSet; val setB = eB.toSet
    if (setA == setB)
      return op match {
        case "intersection" | "union" => serialize(List(a.toVector))
        case _ => serialize(Nil)
      }
    def isShared(e: ((Double, Double), (Double, Double)),
        other: Set[((Double, Double), (Double, Double))]): Boolean =
      other.contains(e) || other.contains((e._2, e._1))
    val aFree = eA.filterNot(isShared(_, setB))
    val bFree = eB.filterNot(isShared(_, setA))
    if (aFree.isEmpty || bFree.isEmpty) return null
    def mid(e: ((Double, Double), (Double, Double))): (Double, Double) =
      ((e._1._1 + e._2._1) / 2, (e._1._2 + e._2._2) / 2)
    val aMids = aFree.map(mid); val bMids = bFree.map(mid)
    // refinement guarantees non-shared edge interiors are off the other
    // boundary; verify cheaply and refuse any numerical residue
    if (aMids.exists { case (x, y) => onEdge(x, y, b) } ||
        bMids.exists { case (x, y) => onEdge(x, y, a) }) return null
    val aIn = aMids.map { case (x, y) => pointIn(x, y, b) }
    val bIn = bMids.map { case (x, y) => pointIn(x, y, a) }
    val aAll = aIn.forall(identity); val aAny = aIn.exists(identity)
    val bAll = bIn.forall(identity); val bAny = bIn.exists(identity)
    if ((aAny && !aAll) || (bAny && !bAll))
      return arrangementOverlay(Seq(a), Seq(b)) // boundary weaves through contact (r15)
    def stitched(es: Vector[((Double, Double), (Double, Double))]): Any =
      stitch(es).map(finishRings).getOrElse(null)
    if (aAll && !bAny) op match { // A inside B, touching
      case "intersection" => serialize(List(a.toVector))
      case "union" => serialize(List(b.toVector))
      case "difference" => serialize(Nil)
      case _ => stitched(eB ++ eA.map(e => (e._2, e._1)))
    } else if (bAll && !aAny) op match { // B inside A, touching
      case "intersection" => serialize(List(b.toVector))
      case "union" => serialize(List(a.toVector))
      case _ => stitched(eA ++ eB.map(e => (e._2, e._1)))
    } else if (!aAny && !bAny) op match { // interiors disjoint, touching
      case "intersection" => serialize(Nil)
      case "difference" => serialize(List(a.toVector))
      case _ =>
        if (eA.exists(e => setB.contains((e._2, e._1))))
          stitched(eA ++ eB) // shared edges dissolve
        else serialize(List(a.toVector, b.toVector)) // vertex-touch only
    } else null // aAll && bAll cannot happen for distinct simple rings
  }

  /** ARRANGEMENT overlay (r15): the contact families `degenerate` cannot
    * classify — shared edges COMBINED WITH proper crossings, and mixed
    * midpoint containment (a boundary weaving through shared structure) —
    * resolve through the makeValid arrangement machinery instead of
    * refusing. Node every contact (the caller's refinement already turned
    * collinear overlaps into exactly-shared sub-edges; this adds proper
    * crossings and vertex touches), trace faces with interior-on-the-left
    * half-edges, then propagate PER-BOUNDARY parity from the unbounded
    * face: stepping across an A-owned sub-segment toggles inA, a B-owned
    * one inB, a SHARED one both. The op selects faces by (inA, inB); the
    * kept region's boundary — half-edges whose face is kept and twin face
    * is not — traces by clockwise rotation scan. Anything the machinery
    * cannot prove (parity conflict, disconnected residue, untraceable
    * pinch) still refuses: correct-by-refusal, never a wrong polygon.
    */
  private def arrangementOverlay(aRs: Seq[Array[(Double, Double)]],
      bRs: Seq[Array[(Double, Double)]]): Any = {
    type Pt = (Double, Double)
    // ---- 1. node: directed edges with owner masks (1 = A, 2 = B).
    // r18: each side is a RING SET — a repaired (formerly
    // self-intersecting) operand contributes every shell and hole ring
    // under its one owner mask; parity toggling handles holes natively.
    val edges: Array[(Pt, Pt, Int)] =
      (aRs.flatMap(a => a.indices.map(i => (a(i), a((i + 1) % a.length), 1))) ++
        bRs.flatMap(b => b.indices.map(i => (b(i), b((i + 1) % b.length), 2)))).toArray
    val allVerts = (aRs.flatten ++ bRs.flatten).distinct.toArray
    val splits = Array.fill(edges.length)(
      collection.mutable.ArrayBuffer.empty[Pt])
    var j = 0
    while (j < edges.length) {
      val ((px, py), (qx, qy), _) = edges(j)
      var i = 0
      while (i < allVerts.length) {
        val (vx, vy) = allVerts(i)
        if (onSegmentStrict(vx, vy, px, py, qx, qy)) splits(j) += allVerts(i)
        i += 1
      }
      j += 1
    }
    var i = 0
    while (i < edges.length) { // proper A×B crossings split both edges
      val (p, q, mi) = edges(i)
      var k = i + 1
      while (k < edges.length) {
        val (u, w, mk) = edges(k)
        if (mi != mk) {
          val d1x = q._1 - p._1; val d1y = q._2 - p._2
          val d2x = w._1 - u._1; val d2y = w._2 - u._2
          val denom = d1x * d2y - d1y * d2x
          if (denom != 0.0) {
            val wx = u._1 - p._1; val wy = u._2 - p._2
            val t = (wx * d2y - wy * d2x) / denom
            val s = (wx * d1y - wy * d1x) / denom
            if (t > 0.0 && t < 1.0 && s > 0.0 && s < 1.0) {
              val pt = (p._1 + t * d1x, p._2 + t * d1y)
              if (pt != p && pt != q) splits(i) += pt
              if (pt != u && pt != w) splits(k) += pt
            }
          }
        }
        k += 1
      }
      i += 1
    }
    // ---- 2. undirected sub-segments with OR'd owner masks
    val segMask = collection.mutable.LinkedHashMap.empty[(Pt, Pt), Int]
    val ord = implicitly[Ordering[Pt]]
    i = 0
    while (i < edges.length) {
      val (p, q, m) = edges(i)
      val t = (v: Pt) =>
        if (math.abs(q._1 - p._1) >= math.abs(q._2 - p._2))
          (v._1 - p._1) / (q._1 - p._1)
        else (v._2 - p._2) / (q._2 - p._2)
      val pts = (p +: splits(i).distinct.sortBy(t)) :+ q
      var k = 0
      while (k + 1 < pts.length) {
        val x = pts(k); val y = pts(k + 1)
        if (x != y) {
          val key = if (ord.lt(x, y)) (x, y) else (y, x)
          val prev = segMask.getOrElse(key, 0)
          // the same owner twice on one geometric segment = self-overlap
          // residue a simple ring cannot produce — refuse
          if ((prev & m) != 0) return null
          segMask(key) = prev | m
        }
        k += 1
      }
      i += 1
    }
    val und = segMask.keysIterator.toArray.sorted
    val mask = und.map(segMask)
    val m2 = und.length * 2 // half-edge 2k = fwd, 2k+1 = rev; twin = ^1
    def srcOf(h: Int): Pt = if ((h & 1) == 0) und(h >> 1)._1 else und(h >> 1)._2
    def dstOf(h: Int): Pt = if ((h & 1) == 0) und(h >> 1)._2 else und(h >> 1)._1
    // ---- 3. rotation system (CCW outgoing per vertex) + faces
    val outgoing = collection.mutable.LinkedHashMap
      .empty[Pt, collection.mutable.ArrayBuffer[Int]]
    var h = 0
    while (h < m2) {
      outgoing.getOrElseUpdate(srcOf(h),
        collection.mutable.ArrayBuffer.empty[Int]) += h
      h += 1
    }
    val posIn = new Array[Int](m2)
    outgoing.valuesIterator.foreach { ring =>
      val sorted = ring.sortBy(e =>
        math.atan2(dstOf(e)._2 - srcOf(e)._2, dstOf(e)._1 - srcOf(e)._1))
      ring.clear(); ring ++= sorted
      var k = 0
      while (k < ring.length) { posIn(ring(k)) = k; k += 1 }
    }
    def nextHe(e: Int): Int = {
      val tw = e ^ 1
      val ring = outgoing(srcOf(tw))
      ring((posIn(tw) - 1 + ring.length) % ring.length)
    }
    val faceOf = Array.fill(m2)(-1)
    val walks = collection.mutable.ArrayBuffer.empty[Vector[Int]]
    h = 0
    while (h < m2) {
      if (faceOf(h) < 0) {
        val walk = collection.mutable.ArrayBuffer.empty[Int]
        var cur = h
        while (faceOf(cur) < 0) {
          faceOf(cur) = walks.length; walk += cur; cur = nextHe(cur)
        }
        walks += walk.toVector
      }
      h += 1
    }
    val areas = walks.map { walk =>
      var a2 = 0.0
      walk.foreach { e =>
        val (x1, y1) = srcOf(e); val (x2, y2) = dstOf(e)
        a2 += x1 * y2 - x2 * y1
      }
      a2
    }
    // ---- 3b. connected components (r18 — repaired operands may be
    // MULTI/holed, and the A and B structures need not touch): union-find
    // over sub-segment endpoints; each component's outer (negative-area)
    // walk seeds the BFS with the component's AMBIENT (inA, inB) state,
    // ray-counted per owner mask against every OTHER component's
    // sub-segments — the same posture as MakeValid.repair's
    // ambientParity, extended to the two-owner pair. (A vertex of one
    // component lying on another component's edge would have been noded
    // into the SAME component, so the ray test is never degenerate.)
    val vid = collection.mutable.LinkedHashMap.empty[Pt, Int]
    und.foreach { case (p, q) =>
      vid.getOrElseUpdate(p, vid.size); vid.getOrElseUpdate(q, vid.size)
      ()
    }
    val uf = Array.tabulate(vid.size)(identity)
    def find(x: Int): Int = { var r = x; while (uf(r) != r) r = uf(r)
      var c = x; while (uf(c) != c) { val nx = uf(c); uf(c) = r; c = nx }; r }
    und.foreach { case (p, q) =>
      val (rp, rq) = (find(vid(p)), find(vid(q)))
      if (rp != rq) uf(rp) = rq
    }
    val compOfWalk = walks.map(w => find(vid(srcOf(w.head)))).toArray
    val comps = compOfWalk.distinct
    val outerOf = collection.mutable.Map.empty[Int, Int]
    walks.indices.foreach { f =>
      if (areas(f) < 0) {
        if (outerOf.contains(compOfWalk(f))) return null // residue
        outerOf(compOfWalk(f)) = f
      }
    }
    if (comps.exists(c => !outerOf.contains(c))) return null
    def ambientState(c: Int): Int = {
      val (x, y) = vid.collectFirst { case (p, i) if find(i) == c => p }.get
      var cntA = 0; var cntB = 0
      var k = 0
      while (k < und.length) {
        val (p, q) = und(k)
        if (find(vid(p)) != c) {
          val (ax, ay) = p; val (bx, by) = q
          if (((ay > y) != (by > y)) &&
              (x < (bx - ax) * (y - ay) / (by - ay) + ax)) {
            if ((mask(k) & 1) != 0) cntA += 1
            if ((mask(k) & 2) != 0) cntB += 1
          }
        }
        k += 1
      }
      (cntA & 1) | ((cntB & 1) << 1)
    }
    // ---- 4. (inA, inB) parity BFS per component from its outer walk
    val state = Array.fill(walks.length)(-1)
    comps.foreach { c =>
      val outer = outerOf(c)
      state(outer) = ambientState(c)
      val queue = collection.mutable.Queue(outer)
      while (queue.nonEmpty) {
        val f = queue.dequeue()
        walks(f).foreach { e =>
          val g = faceOf(e ^ 1)
          val want = state(f) ^ mask(e >> 1)
          if (state(g) < 0) { state(g) = want; queue += g }
          else if (state(g) != want && g != f) return null // parity conflict
        }
      }
    }
    if (state.exists(_ < 0)) return null
    val keep: Int => Boolean = {
      val sel: Int => Boolean = op match {
        case "intersection" => st => st == 3
        case "union" => st => st != 0
        case "difference" => st => st == 1
        case "symdifference" => st => st == 1 || st == 2
      }
      f => sel(state(f))
    }
    // ---- 5. trace the kept region's boundary (kept face on the LEFT)
    def isBoundary(e: Int): Boolean = keep(faceOf(e)) && !keep(faceOf(e ^ 1))
    val visited = new Array[Boolean](m2)
    val rings = collection.mutable.ListBuffer.empty[Vector[Pt]]
    h = 0
    while (h < m2) {
      if (isBoundary(h) && !visited(h)) {
        val walk = collection.mutable.ArrayBuffer.empty[Pt]
        var cur = h
        var steps = 0
        while (!visited(cur)) {
          visited(cur) = true
          walk += srcOf(cur)
          // CW rotation scan at dst(cur) for the next boundary half-edge
          var c = nextHe(cur)
          var guard = outgoing(srcOf(c)).length
          while (!isBoundary(c) && guard > 0) { c = nextHe(c ^ 1); guard -= 1 }
          if (!isBoundary(c)) return null // dangling boundary: residue
          cur = c
          steps += 1
          if (steps > m2) return null // untraceable: residue
        }
        if (cur != h) return null // walked into a previous ring: tangled
        // noding vertices left collinear on the kept boundary (e.g. the
        // far endpoint of a shared segment) drop for the canonical WKT
        simpleCycles(walk.toVector).foreach { cyc =>
          val n = cyc.length
          val slim = cyc.indices.collect {
            case k if cross3(cyc((k + n - 1) % n)._1, cyc((k + n - 1) % n)._2,
              cyc((k + 1) % n)._1, cyc((k + 1) % n)._2,
              cyc(k)._1, cyc(k)._2) != 0.0 => cyc(k)
          }.toVector
          if (slim.length < 3) return null // degenerate sliver: residue
          rings += slim
        }
      }
      h += 1
    }
    if (rings.isEmpty) {
      // no boundary at all: the kept region is empty or everything
      if (walks.indices.exists(f => keep(f))) null // kept = plane: residue
      else serialize(Nil)
    } else finishRings(rings.toList)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a0 = WktOut.decode(l)
    val b0 = WktOut.decode(r)
    if (a0 == null || b0 == null || a0.length < 4 || b0.length < 4) return null
    val aO = openCcw(a0)
    val bO = openCcw(b0)
    if (aO.length < 3 || bO.length < 3) return null
    if (WktOut.selfIntersecting(aO) || WktOut.selfIntersecting(bO)) {
      // REPAIR-THEN-OVERLAY (r18 — previously an unconditional refusal):
      // the engine owns the even-odd repair machinery (MakeValid), so a
      // self-intersecting operand routes through repair and the repaired
      // ring set overlays via the arrangement (which, also r18, seeds
      // per-component ambient state, so the repaired MULTI/holed result
      // and a non-touching partner are both in-domain). Refusal remains
      // exactly where repair or the arrangement itself refuses.
      def rep(o: Array[(Double, Double)]): List[Vector[(Double, Double)]] =
        if (WktOut.selfIntersecting(o)) MakeValid.repairRings(Seq(o))
        else List(o.toVector)
      val aR = rep(aO)
      val bR = rep(bO)
      if (aR == null || bR == null) return null
      // an operand whose even-odd interior repaired to EMPTY resolves
      // set-algebraically (∅ is the identity/absorber per op)
      if (aR.isEmpty || bR.isEmpty) return op match {
        case "intersection" => serialize(Nil)
        case "difference" =>
          if (aR.isEmpty) serialize(Nil) else finishRings(aR)
        case _ => // union / symdifference: the non-empty side (or empty)
          if (aR.isEmpty && bR.isEmpty) serialize(Nil)
          else finishRings(if (aR.isEmpty) bR else aR)
      }
      return arrangementOverlay(aR.map(_.toArray), bR.map(_.toArray))
    }
    // refine so every boundary contact is a shared vertex or an exactly
    // shared directed edge; with no contact this is the identity and the
    // Greiner-Hormann path below runs untouched
    val a = refine(aO, bO)
    val b = refine(bO, aO)
    val contact = { val bs = b.toSet; a.exists(bs.contains) }

    // ---- phase 1: proper crossings, inserted parameter-sorted ----
    // crossings(i)(j): on A edge i at param t, on B edge j at param s
    final case class Hit(ai: Int, t: Double, bi: Int, s: Double,
        x: Double, y: Double)
    val hits = collection.mutable.ArrayBuffer.empty[Hit]
    var i = 0
    while (i < a.length) {
      val (px, py) = a(i); val (qx, qy) = a((i + 1) % a.length)
      val d1x = qx - px; val d1y = qy - py
      var j = 0
      while (j < b.length) {
        val (ux, uy) = b(j); val (vx, vy) = b((j + 1) % b.length)
        val d2x = vx - ux; val d2y = vy - uy
        val denom = d1x * d2y - d1y * d2x
        if (denom == 0.0) {
          // parallel: collinear overlap is degenerate (vertex-on-edge
          // already caught containment of endpoints; a full-edge overlap
          // with no contained endpoint is impossible for simple rings)
        } else {
          val wx = ux - px; val wy = uy - py
          val t = (wx * d2y - wy * d2x) / denom
          val s = (wx * d1y - wy * d1x) / denom
          // endpoint touches (t/s at 0 or 1) are EXPECTED under contact
          // (shared vertices after refinement) — only strictly interior
          // parameter pairs are proper crossings
          if (t > 0.0 && t < 1.0 && s > 0.0 && s < 1.0)
            hits += Hit(i, t, j, s, px + t * d1x, py + t * d1y)
        }
        j += 1
      }
      i += 1
    }

    // r14: contact no longer blocks the trace wholesale. Shared EDGES
    // combined with proper crossings route through the ARRANGEMENT
    // overlay (r15 — faces + per-boundary parity, the makeValid
    // machinery); pure shared-edge contact
    // still resolves through `degenerate`. Shared VERTICES classify by
    // the cyclic order of the four incident boundary rays around the
    // vertex: A/B rays ALTERNATING means the boundaries CROSS through
    // the vertex — it joins the node lists as a first-class
    // intersection; non-alternating means touch — the vertex stays a
    // plain node, and a traced ring that revisits it is a pinch
    // (refused after tracing, never a wrong polygon).
    val crossingVerts: Set[(Double, Double)] =
      if (!contact) Set.empty
      else {
        val eAset = dirEdges(a).toSet
        val sharedEdge = dirEdges(b).exists(e =>
          eAset.contains(e) || eAset.contains((e._2, e._1)))
        if (sharedEdge) {
          // shared edges + proper crossings (r15): the arrangement
          // answers what `degenerate` cannot classify
          if (hits.nonEmpty) return arrangementOverlay(Seq(a), Seq(b))
          return degenerate(a, b)
        }
        val bset = b.toSet
        val shared = a.filter(bset.contains)
        val cls: Array[((Double, Double), Int)] = shared.map { v =>
          val ia = a.indexOf(v); val ib = b.indexOf(v)
          def ang(p: (Double, Double)): Double =
            math.atan2(p._2 - v._2, p._1 - v._1)
          val rays = Seq(
            (ang(a((ia + a.length - 1) % a.length)), 0),
            (ang(a((ia + 1) % a.length)), 0),
            (ang(b((ib + b.length - 1) % b.length)), 1),
            (ang(b((ib + 1) % b.length)), 1)).sortBy(_._1)
          if (rays.map(_._1).distinct.size != 4) (v, -1) // coincident rays
          else {
            val o = rays.map(_._2)
            (v, if (o(0) != o(1) && o(1) != o(2) && o(2) != o(3)) 1 else 0)
          }
        }
        if (cls.exists(_._2 == -1)) return null // ambiguous: refuse
        cls.filter(_._2 == 1).map(_._1).toSet
      }
    if (contact && hits.isEmpty && crossingVerts.isEmpty)
      return degenerate(a, b)

    val aInB = pointIn(a(0)._1, a(0)._2, b)
    val bInA = pointIn(b(0)._1, b(0)._2, a)

    if (hits.isEmpty && crossingVerts.isEmpty) {
      // boundary-free: containment / disjoint resolution per op
      val res: Either[Unit, List[Vector[(Double, Double)]]] = op match {
        case "intersection" =>
          Right(if (aInB) List(a.toVector)
                else if (bInA) List(b.toVector) else Nil)
        case "union" =>
          if (aInB) Right(List(b.toVector))
          else if (bInA) Right(List(a.toVector))
          else Right(List(a.toVector, b.toVector))
        case "difference" =>
          if (aInB) Right(Nil)            // A fully clipped away
          // B strictly inside A: A keeps its exterior and gains B as an
          // interior ring (r12 cont. — answered, no longer refused)
          else if (bInA) return serializeHoled(a.toVector, List(b.toVector))
          else Right(List(a.toVector))    // disjoint: A unchanged
        case "symdifference" =>
          // one strictly inside the other: the outer ring minus the inner
          // = the holed polygon (the inner-minus-outer half is empty)
          if (aInB) return serializeHoled(b.toVector, List(a.toVector))
          else if (bInA) return serializeHoled(a.toVector, List(b.toVector))
          else Right(List(a.toVector, b.toVector))
      }
      return res match {
        case Left(_) => null
        case Right(rs) => serialize(rs)
      }
    }

    // ---- build circular node lists with crossings spliced in ----
    def buildList(ring: Array[(Double, Double)],
        perEdge: Int => Seq[(Double, Double, Double, Int)]): (Node, Array[Node], Array[Node]) = {
      // perEdge(i) = sorted (alpha, x, y, hitId)
      val nodes = collection.mutable.ArrayBuffer.empty[Node]
      val xNodes = new Array[Node](hits.length)
      val vNodes = new Array[Node](ring.length)
      var k = 0
      while (k < ring.length) {
        // a crossing shared vertex (r14) is an intersection in its own
        // right — the boundaries transversally cross there
        val vn = new Node(ring(k)._1, ring(k)._2, 0.0,
          crossingVerts.contains(ring(k)))
        vNodes(k) = vn
        nodes += vn
        perEdge(k).foreach { case (al, x, y, id) =>
          val nd = new Node(x, y, al, true)
          xNodes(id) = nd
          nodes += nd
        }
        k += 1
      }
      val arr = nodes.toArray
      var m = 0
      while (m < arr.length) {
        arr(m).next = arr((m + 1) % arr.length)
        arr(m).prev = arr((m + arr.length - 1) % arr.length)
        m += 1
      }
      (arr(0), xNodes, vNodes)
    }
    val hitsIdx = hits.toArray.zipWithIndex
    val (aHead, aX, aV) = buildList(a, i => hitsIdx.filter(_._1.ai == i)
      .sortBy(_._1.t).map { case (h, id) => (h.t, h.x, h.y, id) }.toSeq)
    val (bHead, bX, bV) = buildList(b, j => hitsIdx.filter(_._1.bi == j)
      .sortBy(_._1.s).map { case (h, id) => (h.s, h.x, h.y, id) }.toSeq)
    var h = 0
    while (h < aX.length) {
      aX(h).neighbor = bX(h)
      bX(h).neighbor = aX(h)
      h += 1
    }
    // crossing-vertex neighbor links, coordinate-keyed: a simple ring
    // holds each shared vertex exactly once
    val aVx = aV.filter(_.intersect)
    if (aVx.nonEmpty) {
      val bByCoord = bV.map(n => ((n.x, n.y), n)).toMap
      aVx.foreach { nA =>
        val nB = bByCoord((nA.x, nA.y))
        nA.neighbor = nB
        nB.neighbor = nA
      }
    }

    // ---- phase 2: entry/exit by start-vertex parity, alternating ----
    def mark(head: Node, startInside: Boolean, complement: Boolean): Unit = {
      var entry = !startInside
      if (complement) entry = !entry
      var nd = head
      do {
        if (nd.intersect) { nd.entry = entry; entry = !entry }
        nd = nd.next
      } while (nd ne head)
    }

    // ---- phase 3: trace (shared for every op via flag complements) ----
    val startNodes: Array[Node] = aX ++ aVx
    def trace(): List[Vector[(Double, Double)]] = {
      val out = collection.mutable.ListBuffer.empty[Vector[(Double, Double)]]
      var k = 0
      while (k < startNodes.length) {
        if (!startNodes(k).visited) {
          val ring = collection.mutable.ArrayBuffer.empty[(Double, Double)]
          var cur = startNodes(k)
          val startX = cur.x; val startY = cur.y
          var guard = 0
          val cap = 4 * (a.length + b.length + 2 * hits.length)
          var done = false
          while (!done && guard < cap) {
            cur.visited = true
            if (cur.neighbor != null) cur.neighbor.visited = true
            ring += ((cur.x, cur.y))
            if (cur.entry) {
              do { cur = cur.next; ring += ((cur.x, cur.y)); guard += 1 }
              while (!cur.intersect && guard < cap)
            } else {
              do { cur = cur.prev; ring += ((cur.x, cur.y)); guard += 1 }
              while (!cur.intersect && guard < cap)
            }
            cur.visited = true
            cur = cur.neighbor
            if (cur.x == startX && cur.y == startY) done = true
            guard += 1
          }
          if (!done) return null // tracing failed: refuse
          // drop the duplicated closing point appended by the last hop
          if (ring.length > 1 && ring.last == ring.head) ring.remove(ring.length - 1)
          // collapse consecutive duplicates (each crossing contributes
          // its coordinates from both lists); under boundary CONTACT a
          // remaining NON-adjacent repeat means the ring pinches through
          // a touch vertex — refuse, never a wrong polygon
          val collapsed = ring.zipWithIndex.collect {
            case (p, i) if i == 0 || p != ring(i - 1) => p }
          val cleaned =
            if (collapsed.length > 1 && collapsed.last == collapsed.head)
              collapsed.dropRight(1) else collapsed
          if (contact && cleaned.distinct.length != cleaned.length)
            return null
          out += cleaned.distinct.toVector
        }
        k += 1
      }
      out.toList.filter(_.length >= 3)
    }

    def run(compA: Boolean, compB: Boolean): List[Vector[(Double, Double)]] = {
      var nd = aHead
      do { if (nd.intersect) nd.visited = false; nd = nd.next } while (nd ne aHead)
      nd = bHead
      do { if (nd.intersect) nd.visited = false; nd = nd.next } while (nd ne bHead)
      // start parity from the midpoint of the sub-edge ARRIVING at the
      // head node: between two adjacent list nodes there is no crossing,
      // so the midpoint's side is exactly the walk state just before the
      // head — well-defined even when the head itself is a shared
      // (possibly crossing) vertex, where the vertex's own side is not
      def before(head: Node, other: Array[(Double, Double)]): Boolean =
        pointIn((head.prev.x + head.x) / 2, (head.prev.y + head.y) / 2, other)
      mark(aHead, before(aHead, b), compA)
      mark(bHead, before(bHead, a), compB)
      trace()
    }

    val rings: List[Vector[(Double, Double)]] = op match {
      case "intersection" => run(compA = false, compB = false)
      case "union" => run(compA = true, compB = true)
      case "difference" => run(compA = true, compB = false)
      case "symdifference" =>
        val d1 = run(compA = true, compB = false)
        val d2 = run(compA = false, compB = true)
        if (d1 == null || d2 == null) null else d1 ++ d2
    }
    // a Greiner–Hormann trace that pinches through a touch vertex (or
    // otherwise fails) falls back to the ARRANGEMENT (r15): its rotation
    // trace separates pinch lobes into touching members instead of
    // refusing — e.g. a union whose halves meet only at a point answers
    // as the MULTIPOLYGON of point-touching shells (the JTS shape).
    if (rings == null) return arrangementOverlay(Seq(a), Seq(b))
    finishRings(rings)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PolyOverlay = copy(left = newLeft, right = newRight)
}

object PolyOverlay {
  val ops: Set[String] = Set("intersection", "union", "difference",
    "symdifference")
  def apply(op: String, a: Column, b: Column): Column =
    ColumnBridge.column(PolyOverlay(op, ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}

/** TRUE iff the decoded ring (`array<struct<x,y>>`) is a SIMPLE closed
  * ring — at least 3 distinct vertices and no boundary self-crossing
  * (r18). The guard that keeps geoUnion's verbatim disjoint fast path
  * from emitting a self-intersecting operand unrepaired; such pairs
  * fall through to the overlay's repair-then-overlay path instead.
  */
case class RingSimple(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_ring_simple"
  override protected def nullSafeEval(input: Any): Any = {
    val closed = WktOut.decode(input)
    if (closed == null || closed.length < 4) return false
    val open0 = if (closed.length > 1 && closed.head == closed.last)
      closed.dropRight(1) else closed
    val open = open0.zipWithIndex.collect {
      case (p, i) if p != open0((i + 1) % open0.length) => p
    }
    open.length >= 3 && !WktOut.selfIntersecting(open)
  }
  override protected def withNewChildInternal(c: Expression): RingSimple =
    copy(child = c)
}
object RingSimple {
  def apply(ring: Column): Column =
    ColumnBridge.column(RingSimple(ColumnBridge.expression(ring)))
}

/** `geof:buffer` of a SIMPLE polygon: each edge offsets outward by the
  * radius; CONVEX vertices round with a circular arc sampled at the same
  * 2π/32 granularity as [[PointBuffer]]'s 32-gon (JTS's default quadrant
  * segments) — for convex input the exact planar Minkowski sum with the
  * sampled disc. REFLEX vertices (r14 — non-convex input was previously
  * a wholesale error) TRIM: the two adjacent offset edges meet at their
  * line intersection, the standard mitred inner join, which equals the
  * true offset boundary whenever the radius is below the local feature
  * size. A radius large enough to SEAL A POCKET (the offset curve
  * self-intersects) answers through the nonzero-winding fill of the
  * offset curve (r15, [[MakeValid.nonzeroFill]]): the sealed void
  * becomes an interior ring, overlap bands stay filled. The honest-
  * refusal guard that remains: each reflex mitre trim must fall INSIDE
  * both offset segments (radius beyond the local feature size), else
  * null — never a wrong polygon. The input ring may wind either way
  * (normalized CCW).
  *
  * left: `array<struct<x,y>>` closed ring; right: radius in degrees.
  */
case class PolygonBuffer(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_polygon_buffer"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    import WktOut.{cross, ring => wr}
    val closed = WktOut.decode(l)
    val rad = r.asInstanceOf[Double]
    if (closed == null || closed.length < 4 || !(rad > 0)) return null
    val open0 = if (closed.head == closed.last) closed.dropRight(1) else closed
    val open = open0.zipWithIndex.collect {
      case (p, i) if p != open0((i + 1) % open0.length) => p
    }
    if (open.length < 3) return null
    var area2 = 0.0
    for (i <- open.indices) {
      val (x1, y1) = open(i); val (x2, y2) = open((i + 1) % open.length)
      area2 += x1 * y2 - x2 * y1
    }
    val ccw = if (area2 < 0) open.reverse else open
    val nv = ccw.length
    if (WktOut.selfIntersecting(ccw)) return null
    val step = 2.0 * math.Pi / 32
    val out = collection.mutable.ArrayBuffer.empty[(Double, Double)]
    // set when a reflex mitre trim fell outside its offset segments and
    // the raw corner arc was emitted instead (r18): the curve must then
    // ALWAYS resolve through the winding fill, even if the float test
    // below misses a tangential self-contact
    var rawCorner = false
    // outward unit normals of the incoming and outgoing edges (CCW ring:
    // outward normal of a→b is (dy, -dx)/|ab|)
    def normal(a: (Double, Double), b: (Double, Double)): (Double, Double) = {
      val dx = b._1 - a._1; val dy = b._2 - a._2
      val len = math.sqrt(dx * dx + dy * dy)
      (dy / len, -dx / len)
    }
    for (i <- 0 until nv) {
      val (px, py) = ccw(i)
      val prev = ccw((i + nv - 1) % nv)
      val next = ccw((i + 1) % nv)
      val nIn = normal(prev, ccw(i))
      val nOut = normal(ccw(i), next)
      if (cross(prev, ccw(i), next) >= 0) {
        // convex: round with the sampled arc (CCW traversal turns the
        // outward normal counter-clockwise)
        val aIn = math.atan2(nIn._2, nIn._1)
        var aOut = math.atan2(nOut._2, nOut._1)
        while (aOut < aIn) aOut += 2.0 * math.Pi
        val sweep = aOut - aIn
        val steps = math.max(1, math.ceil(sweep / step - 1e-12).toInt)
        for (k <- 0 to steps) {
          val th = aIn + sweep * k / steps
          out += ((px + rad * math.cos(th), py + rad * math.sin(th)))
        }
      } else {
        // reflex (r14): mitred trim — the two adjacent offset edges meet
        // at their line intersection. Offset edge in: (prev + r·nIn) →
        // (v + r·nIn) along d1; offset edge out: (v + r·nOut) →
        // (next + r·nOut) along d2.
        val d1x = px - prev._1; val d1y = py - prev._2
        val d2x = next._1 - px; val d2y = next._2 - py
        val denom = d1x * d2y - d1y * d2x
        if (denom == 0.0) return null // straight reflex: unreachable
        // solve (prev + r nIn) + t d1 = (v + r nOut) + s d2
        val wx = px + rad * nOut._1 - (prev._1 + rad * nIn._1)
        val wy = py + rad * nOut._2 - (prev._2 + rad * nIn._2)
        val t = (wx * d2y - wy * d2x) / denom
        val s = (wx * d1y - wy * d1x) / denom
        if (!(t >= 0.0 && t <= 1.0 && s >= 0.0 && s <= 1.0)) {
          // Trim outside the offset segments = radius beyond the LOCAL
          // feature size: the corner is SWALLOWED (r18 — previously a
          // refusal). Emit the RAW offset corner instead — the full
          // offset endpoints of both edges joined by the CLOCKWISE arc
          // of radius r around the reflex vertex (the Chen–McMains 2005
          // raw offset curve, "Polygon Offsetting by Computing Winding
          // Numbers"): the curve now self-intersects where non-adjacent
          // wall offsets cross, and the SAME nonzero-winding fill as the
          // pocket seal below recovers {winding ≠ 0} = the Minkowski
          // coverage — the CW arc's backtracked lens cancels to winding
          // 0 exactly where the disc does not reach.
          val aIn = math.atan2(nIn._2, nIn._1)
          var aOut = math.atan2(nOut._2, nOut._1)
          while (aOut >= aIn) aOut -= 2.0 * math.Pi // CW (negative) sweep
          val sweep = aIn - aOut
          val steps = math.max(1, math.ceil(sweep / step - 1e-12).toInt)
          for (k <- 0 to steps) {
            val th = aIn - sweep * k / steps
            out += ((px + rad * math.cos(th), py + rad * math.sin(th)))
          }
          rawCorner = true
        } else
          out += ((prev._1 + rad * nIn._1 + t * d1x,
            prev._2 + rad * nIn._2 + t * d1y))
      }
    }
    val dedup = out.distinct
    // a pocket-sealing radius makes the offset curve self-intersect: the
    // true buffer is the NONZERO-WINDING fill of that curve (winding =
    // Minkowski coverage depth, r15) — double-covered overlap bands stay
    // filled, an unreachable pocket void becomes the HOLE. Radii past
    // the LOCAL feature size still refuse above at the mitre trim, never
    // emitting a wrong polygon.
    if (dedup.length >= 3 &&
        (rawCorner || WktOut.selfIntersecting(dedup.toArray)))
      return MakeValid.nonzeroFill(dedup.toArray)
    val start = dedup.indexOf(dedup.min)
    val rot = (dedup.drop(start) ++ dedup.take(start)).toIndexedSeq
    UTF8String.fromString(s"POLYGON ((${wr(rot :+ rot.head)}))")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PolygonBuffer =
    copy(left = newLeft, right = newRight)
}

object PolygonBuffer {
  def apply(ring: Column, rDeg: Column): Column =
    ColumnBridge.column(PolygonBuffer(ColumnBridge.expression(ring),
      ColumnBridge.expression(rDeg)))
}

/** EVEN-ODD REPAIR of an invalid polygon RING SET — the analog of the
  * JTS makeValid/buffer(0) normalization the reference's shipped binary
  * applies before its overlays answer invalid input. The ring is NODED at
  * every proper self-crossing and vertex-on-edge touch, the planar
  * arrangement's faces are traced with a half-edge rotation walk, each
  * face's filled/unfilled status is the PARITY of its dual-graph distance
  * from the unbounded face (adjacent faces differ by exactly one curve
  * crossing, so BFS parity IS the even-odd winding parity — no point-in-
  * polygon probes, no new arithmetic beyond the crossing coordinates
  * themselves), and the odd faces serialize through the shared
  * containment-depth classifier ([[GeoRings.finishRings]]): holes at
  * arbitrary nesting, canonical CCW rings, lexically sorted members.
  * A bowtie becomes the MULTIPOLYGON of its two triangles; a figure-eight
  * through a shared vertex splits at the pinch; a ring that is already
  * simple returns its canonical POLYGON unchanged; a ring whose filled
  * set is empty (a doubled-back zero-area walk) is POLYGON EMPTY.
  *
  * MULTI-RING input (r14 cont. — a polygon's holes, a MULTIPOLYGON's
  * members): every ring joins ONE arrangement; disconnected curve
  * components get their even-odd parity seeded by an AMBIENT ray cast of
  * one component vertex against the other components' sub-segments (a
  * vertex touching another component would have been noded into it, so
  * the cast is never degenerate), then the per-component dual BFS runs as
  * before. A valid hole's interior is parity 2 (unfilled), disjoint
  * members parity 1 each, and OVERLAPPING members XOR — the documented
  * even-odd semantics of this repair.
  *
  * Collinear OVERLAPPING edges are ANSWERED (r16): the vertex-on-edge
  * noding decomposes an overlap into exactly-coincident sub-segments,
  * and the even-odd MULTIPLICITY rule cancels even-count sub-segments
  * out of the arrangement (crossing a doubled edge toggles parity back —
  * it bounds nothing), so retraced spikes drop away and a hole sharing
  * part of its shell's edge dissolves into a boundary notch.
  *
  * Boundary that cancels ENTIRELY (a pure spike, a fully doubled ring)
  * is ANSWERED as `POLYGON EMPTY` (r17): GF(2) cancellation leaves no
  * sub-segment, so the even-odd interior is exactly the empty set — the
  * JTS buffer(0) analog, a defined answer rather than a refusal.
  *
  * ERROR posture (null, never a wrong polygon): any numerical residue
  * the guards catch (an arrangement with more than one unbounded walk,
  * a dual-parity conflict) and degenerate sub-3-vertex input. Crossing coordinates are
  * fixed-association IEEE doubles — the same precision posture as the
  * overlay's refinement; the exact predicates (orientation, on-segment)
  * run on input coordinates.
  */
case class MakeValid(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import GeoRings._
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_make_valid"

  private type Pt = (Double, Double)

  override protected def nullSafeEval(input: Any): Any = {
    // input: ring SET (array<array<struct<x,y>>>) — a POLYGON's exterior
    // plus holes, or every ring of every MULTIPOLYGON member; the
    // even-odd arrangement handles them uniformly (a valid hole's
    // interior has crossing parity 2 = unfilled)
    val arrIn = input.asInstanceOf[ArrayData]
    val nrIn = arrIn.numElements()
    if (nrIn == 0) return null
    val ringsIn = collection.mutable.ArrayBuffer.empty[Array[Pt]]
    var ri = 0
    while (ri < nrIn) {
      val ra = arrIn.getArray(ri)
      val m = ra.numElements()
      val closed = new Array[Pt](m)
      var k = 0
      while (k < m) {
        val st = ra.getStruct(k, 2)
        if (st.isNullAt(0) || st.isNullAt(1)) return null
        closed(k) = (st.getDouble(0), st.getDouble(1))
        k += 1
      }
      val open0 = if (closed.length > 1 && closed.head == closed.last)
        closed.dropRight(1) else closed
      val open = open0.zipWithIndex.collect {
        case (p, i) if p != open0((i + 1) % open0.length) => p }
      // a closed walk over < 3 distinct vertices (a point, an out-and-
      // back spike) is exactly a GF(2)-cancelling boundary: it bounds no
      // even-odd interior, so it DROPS from the arrangement (r17) rather
      // than refusing the whole input
      if (open.length >= 3) ringsIn += open
      ri += 1
    }
    if (ringsIn.isEmpty) return UTF8String.fromString("POLYGON EMPTY")
    MakeValid.repair(ringsIn.toSeq)
  }

  override protected def withNewChildInternal(c: Expression): MakeValid =
    copy(child = c)
}

object MakeValid {
  import GeoRings._
  private type Pt = (Double, Double)

  def apply(rings: Column): Column =
    ColumnBridge.column(MakeValid(ColumnBridge.expression(rings)))

  /** Any vertex strictly interior to a non-incident edge? (simple rings
    * with a tangent vertex still need the arrangement).
    */
  private def vertexTouch(open: Array[Pt]): Boolean = {
    val n = open.length
    var j = 0
    while (j < n) {
      val (px, py) = open(j); val (qx, qy) = open((j + 1) % n)
      var i = 0
      while (i < n) {
        val (vx, vy) = open(i)
        if (onSegmentStrict(vx, vy, px, py, qx, qy)) return true
        i += 1
      }
      j += 1
    }
    false
  }

  /** NONZERO-WINDING fill of a single closed directed curve — the
    * pocket-sealing buffer's repair rule (r15). The raw offset curve of
    * a polygon covers each point of the true buffer with multiplicity =
    * its winding number (the offset "sheets" of the Minkowski union),
    * so the buffer region is exactly {winding ≠ 0}: an overlap band
    * where two wall offsets double-cover stays FILLED (winding 2), while
    * a sealed pocket's unreachable void is a genuine HOLE (winding 0) —
    * even-odd parity would wrongly punch holes in the former. Node the
    * curve at self-crossings and vertex touches, trace interior-on-left
    * faces, propagate winding from the unbounded face (+1 crossing the
    * curve right-to-left, −1 left-to-right), keep winding ≠ 0, trace the
    * kept boundary. Residue (duplicate sub-segments, collinear overlap,
    * disconnection, winding conflict) refuses — never a wrong polygon.
    */
  private[functions] def nonzeroFill(curve: Array[Pt]): Any = {
    val n0 = curve.length
    if (n0 < 3) return null
    val edges = Array.tabulate(n0)(i => (curve(i), curve((i + 1) % n0)))
    val verts = curve.distinct
    val splits = Array.fill(n0)(collection.mutable.ArrayBuffer.empty[Pt])
    var j = 0
    while (j < n0) {
      val ((px, py), (qx, qy)) = edges(j)
      var i = 0
      while (i < verts.length) {
        val (vx, vy) = verts(i)
        if (onSegmentStrict(vx, vy, px, py, qx, qy)) splits(j) += verts(i)
        i += 1
      }
      j += 1
    }
    var i = 0
    while (i < n0) {
      var k = i + 1
      while (k < n0) {
        val (p, q) = edges(i); val (u, w) = edges(k)
        val d1x = q._1 - p._1; val d1y = q._2 - p._2
        val d2x = w._1 - u._1; val d2y = w._2 - u._2
        val denom = d1x * d2y - d1y * d2x
        if (denom == 0.0) {
          if (cross3(p._1, p._2, q._1, q._2, u._1, u._2) == 0.0 &&
              cross3(p._1, p._2, q._1, q._2, w._1, w._2) == 0.0) {
            val horiz = math.abs(d1x) >= math.abs(d1y)
            def lo(e: (Pt, Pt)) = if (horiz) math.min(e._1._1, e._2._1)
              else math.min(e._1._2, e._2._2)
            def hi(e: (Pt, Pt)) = if (horiz) math.max(e._1._1, e._2._1)
              else math.max(e._1._2, e._2._2)
            if (math.min(hi(edges(i)), hi(edges(k))) -
                math.max(lo(edges(i)), lo(edges(k))) > 0) return null
          }
        } else {
          val wx = u._1 - p._1; val wy = u._2 - p._2
          val t = (wx * d2y - wy * d2x) / denom
          val s = (wx * d1y - wy * d1x) / denom
          if (t > 0.0 && t < 1.0 && s > 0.0 && s < 1.0) {
            val pt = (p._1 + t * d1x, p._2 + t * d1y)
            if (pt != p && pt != q) splits(i) += pt
            if (pt != u && pt != w) splits(k) += pt
          }
        }
        k += 1
      }
      i += 1
    }
    // directed sub-segments; per undirected key remember the CURVE's
    // traversal direction (fwd = key order a < b)
    val ord = implicitly[Ordering[Pt]]
    val dirOf = collection.mutable.LinkedHashMap.empty[(Pt, Pt), Boolean]
    i = 0
    while (i < n0) {
      val (p, q) = edges(i)
      val t = (v: Pt) =>
        if (math.abs(q._1 - p._1) >= math.abs(q._2 - p._2))
          (v._1 - p._1) / (q._1 - p._1)
        else (v._2 - p._2) / (q._2 - p._2)
      val pts = (p +: splits(i).distinct.sortBy(t)) :+ q
      var k = 0
      while (k + 1 < pts.length) {
        val x = pts(k); val y = pts(k + 1)
        if (x != y) {
          val fwd = ord.lt(x, y)
          val key = if (fwd) (x, y) else (y, x)
          if (dirOf.contains(key)) return null // doubled segment: residue
          dirOf(key) = fwd
        }
        k += 1
      }
      i += 1
    }
    val und = dirOf.keysIterator.toArray.sorted
    val fwdIsCurve = und.map(dirOf)
    val m2 = und.length * 2
    def srcOf(h: Int): Pt = if ((h & 1) == 0) und(h >> 1)._1 else und(h >> 1)._2
    def dstOf(h: Int): Pt = if ((h & 1) == 0) und(h >> 1)._2 else und(h >> 1)._1
    val outgoing = collection.mutable.LinkedHashMap
      .empty[Pt, collection.mutable.ArrayBuffer[Int]]
    var h = 0
    while (h < m2) {
      outgoing.getOrElseUpdate(srcOf(h),
        collection.mutable.ArrayBuffer.empty[Int]) += h
      h += 1
    }
    val posIn = new Array[Int](m2)
    outgoing.valuesIterator.foreach { ring =>
      val sorted = ring.sortBy(e =>
        math.atan2(dstOf(e)._2 - srcOf(e)._2, dstOf(e)._1 - srcOf(e)._1))
      ring.clear(); ring ++= sorted
      var k = 0
      while (k < ring.length) { posIn(ring(k)) = k; k += 1 }
    }
    def nextHe(e: Int): Int = {
      val tw = e ^ 1
      val ring = outgoing(srcOf(tw))
      ring((posIn(tw) - 1 + ring.length) % ring.length)
    }
    val faceOf = Array.fill(m2)(-1)
    val walks = collection.mutable.ArrayBuffer.empty[Vector[Int]]
    h = 0
    while (h < m2) {
      if (faceOf(h) < 0) {
        val walk = collection.mutable.ArrayBuffer.empty[Int]
        var cur = h
        while (faceOf(cur) < 0) {
          faceOf(cur) = walks.length; walk += cur; cur = nextHe(cur)
        }
        walks += walk.toVector
      }
      h += 1
    }
    val areas = walks.map { walk =>
      var a2 = 0.0
      walk.foreach { e =>
        val (x1, y1) = srcOf(e); val (x2, y2) = dstOf(e)
        a2 += x1 * y2 - x2 * y1
      }
      a2
    }
    val unbounded = walks.indices.filter(f => areas(f) < 0)
    if (unbounded.length != 1) return null // one curve: connected
    // winding BFS: the face LEFT of the curve direction is one higher
    val wind = Array.fill(walks.length)(Int.MinValue)
    wind(unbounded.head) = 0
    val queue = collection.mutable.Queue(unbounded.head)
    while (queue.nonEmpty) {
      val f = queue.dequeue()
      walks(f).foreach { e =>
        val g = faceOf(e ^ 1)
        val curveHe = if (fwdIsCurve(e >> 1)) (e >> 1) * 2 else (e >> 1) * 2 + 1
        // f is left of e; if e IS the curve direction, f = right-side + 1
        val want = if (e == curveHe) wind(f) - 1 else wind(f) + 1
        if (wind(g) == Int.MinValue) { wind(g) = want; queue += g }
        else if (wind(g) != want && g != f) return null // conflict
      }
    }
    if (wind.contains(Int.MinValue)) return null
    def keep(f: Int): Boolean = wind(f) != 0
    def isBoundary(e: Int): Boolean = keep(faceOf(e)) && !keep(faceOf(e ^ 1))
    val visited = new Array[Boolean](m2)
    val rings = collection.mutable.ListBuffer.empty[Vector[Pt]]
    h = 0
    while (h < m2) {
      if (isBoundary(h) && !visited(h)) {
        val walk = collection.mutable.ArrayBuffer.empty[Pt]
        var cur = h
        var steps = 0
        while (!visited(cur)) {
          visited(cur) = true
          walk += srcOf(cur)
          var c = nextHe(cur)
          var guard = outgoing(srcOf(c)).length
          while (!isBoundary(c) && guard > 0) { c = nextHe(c ^ 1); guard -= 1 }
          if (!isBoundary(c)) return null
          cur = c
          steps += 1
          if (steps > m2) return null
        }
        if (cur != h) return null
        simpleCycles(walk.toVector).foreach { cyc =>
          val m = cyc.length
          val slim = cyc.indices.collect {
            case k if cross3(cyc((k + m - 1) % m)._1, cyc((k + m - 1) % m)._2,
              cyc((k + 1) % m)._1, cyc((k + 1) % m)._2,
              cyc(k)._1, cyc(k)._2) != 0.0 => cyc(k)
          }.toVector
          if (slim.length < 3) return null
          rings += slim
        }
      }
      h += 1
    }
    if (rings.isEmpty) UTF8String.fromString("POLYGON EMPTY")
    else finishRings(rings.toList)
  }

  /** Even-odd arrangement repair over decoded OPEN rings — the kernel
    * body shared by the [[MakeValid]] expression and (as the nonzero
    * variant above) the pocket-sealing buffer (r15). Returns canonical
    * WKT (UTF8String) or null (refusal).
    */
  private[functions] def repair(ringsIn: Seq[Array[Pt]]): Any = {
    val rs = repairRings(ringsIn)
    if (rs == null) null
    else if (rs.isEmpty) UTF8String.fromString("POLYGON EMPTY")
    else finishRings(rs)
  }

  /** The repaired RING LIST itself (r18) — null = refusal, Nil = empty
    * even-odd interior. Split out of [[repair]] so the overlay can route
    * a self-intersecting operand through repair and feed the repaired
    * boundary straight into its own arrangement without a WKT round-trip.
    */
  private[functions] def repairRings(
      ringsIn: Seq[Array[Pt]]): List[Vector[Pt]] = {
    if (ringsIn.length == 1) {
      val open = ringsIn.head
      if (!WktOut.selfIntersecting(open) &&
          open.distinct.length == open.length && !vertexTouch(open))
        return List(open.toVector)
    }

    // ---- 1. node: split every edge at crossings and vertex touches
    val segs = ringsIn.toArray.flatMap(r =>
      r.indices.map(i => (r(i), r((i + 1) % r.length))))
    val allVerts = ringsIn.toArray.flatten.distinct
    val n = segs.length
    val splits = Array.fill(n)(collection.mutable.ArrayBuffer.empty[Pt])
    var j = 0
    while (j < n) { // vertex-on-edge: the EXACT predicate, original coords
      val ((px, py), (qx, qy)) = segs(j)
      var i = 0
      while (i < allVerts.length) {
        val (vx, vy) = allVerts(i)
        if (onSegmentStrict(vx, vy, px, py, qx, qy)) splits(j) += allVerts(i)
        i += 1
      }
      j += 1
    }
    var i = 0
    while (i < n) { // proper interior crossings
      var k = i + 1
      while (k < n) {
        val (p, q) = segs(i); val (u, w) = segs(k)
        val d1x = q._1 - p._1; val d1y = q._2 - p._2
        val d2x = w._1 - u._1; val d2y = w._2 - u._2
        val denom = d1x * d2y - d1y * d2x
        if (denom == 0.0) {
          // collinear pairs (overlapping or not) need NO extra noding
          // here: an overlap's endpoints are each a VERTEX of one of the
          // two edges, and the vertex-on-edge pass above already split
          // both edges at every such vertex — so two collinear
          // overlapping edges decompose into sub-segments that either
          // coincide EXACTLY or are disjoint, and the even-odd
          // multiplicity rule below (r16) cancels the coincident pairs.
        } else {
          val wx = u._1 - p._1; val wy = u._2 - p._2
          val t = (wx * d2y - wy * d2x) / denom
          val s = (wx * d1y - wy * d1x) / denom
          if (t > 0.0 && t < 1.0 && s > 0.0 && s < 1.0) {
            val pt = (p._1 + t * d1x, p._2 + t * d1y)
            if (pt != p && pt != q) splits(i) += pt
            if (pt != u && pt != w) splits(k) += pt
          }
        }
        k += 1
      }
      i += 1
    }
    // ---- 2. sub-segment multiset (undirected); duplicates are refused
    val undCount = collection.mutable.LinkedHashMap.empty[(Pt, Pt), Int]
    val ord = implicitly[Ordering[Pt]]
    i = 0
    while (i < n) {
      val (p, q) = segs(i)
      val t = (v: Pt) =>
        if (math.abs(q._1 - p._1) >= math.abs(q._2 - p._2))
          (v._1 - p._1) / (q._1 - p._1)
        else (v._2 - p._2) / (q._2 - p._2)
      val pts = (p +: splits(i).distinct.sortBy(t)) :+ q
      var k = 0
      while (k + 1 < pts.length) {
        val a = pts(k); val b = pts(k + 1)
        if (a != b) {
          val key = if (ord.lt(a, b)) (a, b) else (b, a)
          undCount(key) = undCount.getOrElse(key, 0) + 1
        }
        k += 1
      }
      i += 1
    }
    // EVEN-ODD MULTIPLICITY (r16 — the last arrangement kernel piece):
    // a sub-segment traversed an even number of times bounds no even-odd
    // interior change (crossing it twice toggles parity back), so it
    // CANCELS out of the arrangement; odd multiplicity keeps exactly one
    // copy. This is what answers collinear-overlap rings — a retraced
    // spike drops its doubled sub-segment, a hole sharing part of its
    // shell's edge dissolves the shared piece into a boundary notch. The
    // surviving multiset is a GF(2) cycle-space sum of closed walks, so
    // every vertex keeps even degree and the face trace below runs
    // unchanged. Nothing survives → the even-odd interior is the EMPTY
    // SET, a well-defined answer (r17): a pure spike or a fully doubled
    // ring repairs to POLYGON EMPTY (the JTS buffer(0) analog), no
    // longer a refusal.
    val und = undCount.iterator
      .collect { case (k, c) if (c & 1) == 1 => k }.toArray.sorted
    if (und.isEmpty) return Nil
    val m2 = und.length * 2 // half-edge 2k = fwd, 2k+1 = rev; twin = ^1
    def srcOf(h: Int): Pt = if ((h & 1) == 0) und(h >> 1)._1 else und(h >> 1)._2
    def dstOf(h: Int): Pt = if ((h & 1) == 0) und(h >> 1)._2 else und(h >> 1)._1
    // ---- 3. rotation system: outgoing half-edges CCW by angle per vertex
    val outgoing = collection.mutable.LinkedHashMap
      .empty[Pt, collection.mutable.ArrayBuffer[Int]]
    var h = 0
    while (h < m2) {
      outgoing.getOrElseUpdate(srcOf(h),
        collection.mutable.ArrayBuffer.empty[Int]) += h
      h += 1
    }
    val posIn = new Array[Int](m2)
    outgoing.valuesIterator.foreach { ring =>
      val sorted = ring.sortBy(e =>
        math.atan2(dstOf(e)._2 - srcOf(e)._2, dstOf(e)._1 - srcOf(e)._1))
      ring.clear(); ring ++= sorted
      var k = 0
      while (k < ring.length) { posIn(ring(k)) = k; k += 1 }
    }
    // face-with-interior-on-the-LEFT traversal: from h, step to the
    // CLOCKWISE successor of twin(h) in the rotation around dst(h)
    def nextHe(e: Int): Int = {
      val tw = e ^ 1
      val ring = outgoing(srcOf(tw))
      ring((posIn(tw) - 1 + ring.length) % ring.length)
    }
    // ---- 4. faces + signed areas
    val faceOf = Array.fill(m2)(-1)
    val walks = collection.mutable.ArrayBuffer.empty[Vector[Int]]
    h = 0
    while (h < m2) {
      if (faceOf(h) < 0) {
        val walk = collection.mutable.ArrayBuffer.empty[Int]
        var cur = h
        while (faceOf(cur) < 0) {
          faceOf(cur) = walks.length; walk += cur; cur = nextHe(cur)
        }
        walks += walk.toVector
      }
      h += 1
    }
    val areas = walks.map { walk =>
      var a2 = 0.0
      walk.foreach { e =>
        val (x1, y1) = srcOf(e); val (x2, y2) = dstOf(e)
        a2 += x1 * y2 - x2 * y1
      }
      a2
    }
    // ---- 5. CONNECTED COMPONENTS of the arrangement (holes and multi
    // members are disjoint curves): union-find over the sub-segments
    val vid = collection.mutable.LinkedHashMap.empty[Pt, Int]
    und.foreach { case (a, b) =>
      vid.getOrElseUpdate(a, vid.size); vid.getOrElseUpdate(b, vid.size)
      ()
    }
    val uf = Array.tabulate(vid.size)(identity)
    def find(x: Int): Int = { var r = x; while (uf(r) != r) r = uf(r)
      var c = x; while (uf(c) != c) { val nx = uf(c); uf(c) = r; c = nx }; r }
    und.foreach { case (a, b) =>
      val (ra, rb) = (find(vid(a)), find(vid(b)))
      if (ra != rb) uf(ra) = rb
    }
    val compOfWalk = walks.map(w => find(vid(srcOf(w.head)))).toArray
    val comps = compOfWalk.distinct
    // each component has exactly ONE unbounded (negative-area) walk
    val outerOf = collection.mutable.Map.empty[Int, Int]
    walks.indices.foreach { f =>
      if (areas(f) < 0) {
        if (outerOf.contains(compOfWalk(f))) return null // residue
        outerOf(compOfWalk(f)) = f
      }
    }
    if (comps.exists(c => !outerOf.contains(c))) return null
    // ambient parity of a component = even-odd crossings of one of its
    // vertices against every OTHER component's sub-segments (a vertex on
    // another component's edge would have been noded into the SAME
    // component, so the ray test is never degenerate)
    def ambientParity(c: Int): Int = {
      val (x, y) = vid.collectFirst { case (p, i) if find(i) == c => p }.get
      var cnt = 0
      var k = 0
      while (k < und.length) {
        val (a, b) = und(k)
        if (find(vid(a)) != c) {
          val (ax, ay) = a; val (bx, by) = b
          if (((ay > y) != (by > y)) &&
              (x < (bx - ax) * (y - ay) / (by - ay) + ax)) cnt += 1
        }
        k += 1
      }
      cnt & 1
    }
    // ---- 5b. even-odd parity: BFS per component from its unbounded
    // walk seeded with the component's ambient parity
    val parity = Array.fill(walks.length)(-1)
    comps.foreach { c =>
      val outer = outerOf(c)
      parity(outer) = ambientParity(c)
      val queue = collection.mutable.Queue(outer)
      while (queue.nonEmpty) {
        val f = queue.dequeue()
        walks(f).foreach { e =>
          val g = faceOf(e ^ 1)
          if (parity(g) < 0) { parity(g) = parity(f) ^ 1; queue += g }
          else if (parity(g) != (parity(f) ^ 1) && g != f) return null
        }
      }
    }
    // ---- 6. odd faces → simple cycles → shared hole classifier
    val rings = collection.mutable.ListBuffer.empty[Vector[Pt]]
    var f = 0
    while (f < walks.length) {
      if (parity(f) == 1) rings ++= simpleCycles(walks(f).map(srcOf))
      f += 1
    }
    rings.toList
  }
}

/** MIN geodesic DISTANCE between two geometries (r15 — `geof:distance`
  * was POINT×POINT only; the reference's JTS answers any pair, and
  * "distance from this facility to that park" is a first-class portal
  * ask). Input: two WKT texts (POINT / LINESTRING / POLYGON — exterior
  * ring; MULTI/holed inputs refuse). Semantics:
  *  - overlapping/contained pairs → 0.0 (point-in-polygon / crossing
  *    tests reuse the exact GeoRings kernels)
  *  - else min over BOTH directions of vertex→segment distances, where
  *    the candidate on a segment is the endpoint pair PLUS the
  *    perpendicular foot computed in planar lon/lat (clamped to the
  *    segment) and every candidate pair is measured by the SAME
  *    fixed-association haversine as `geof:distance` — exact for the
  *    vertex-vertex and axis-aligned-edge cases an oracle replays;
  *    the planar foot is a documented city-scale approximation of the
  *    true spherical foot otherwise.
  */
case class GeoMinDistance(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  import GeoRings._
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_geo_min_distance"

  private type Pt = (Double, Double)
  private val R = 6371008.8
  private val Rad = math.Pi / 180.0

  private def haversine(x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    val lat1 = y1 * Rad; val lon1 = x1 * Rad
    val lat2 = y2 * Rad; val lon2 = x2 * Rad
    val sdLat = math.sin((lat2 - lat1) / 2.0)
    val sdLon = math.sin((lon2 - lon1) / 2.0)
    val h = sdLat * sdLat + math.cos(lat1) * math.cos(lat2) * (sdLon * sdLon)
    (2.0 * R) * math.asin(math.sqrt(h))
  }

  /** (points, closed?) — vertices of a supported WKT class, whether they
    * form a closed ring (polygon) or an open line; null = unsupported.
    */
  private def decode(wkt: String): (Array[Pt], Boolean) = {
    val t = wkt.trim.replaceFirst("^<[^>]*>\\s*", "") // optional CRS IRI
    def pts(body: String): Array[Pt] = body.split(",").map { p =>
      val xy = p.trim.split("\\s+")
      (xy(0).toDouble, xy(1).toDouble)
    }
    if (t.startsWith("POINT")) {
      val m = "POINT\\s*\\(([^)]*)\\)".r.findFirstMatchIn(t).orNull
      if (m == null) null else (pts(m.group(1)), false)
    } else if (t.startsWith("LINESTRING")) {
      val m = "LINESTRING\\s*\\(([^)]*)\\)".r.findFirstMatchIn(t).orNull
      if (m == null) null else (pts(m.group(1)), false)
    } else if (t.startsWith("POLYGON")) {
      if ("\\)\\s*,\\s*\\(".r.findFirstIn(t).isDefined) null // holes/multi
      else {
        val m = "POLYGON\\s*\\(\\(([^)]*)\\)\\)".r.findFirstMatchIn(t).orNull
        if (m == null) null
        else {
          val p = pts(m.group(1))
          (if (p.length > 1 && p.head == p.last) p.dropRight(1) else p, true)
        }
      }
    } else null
  }

  /** min distance from one point to every segment of (pts, closed). */
  private def toSegments(px: Double, py: Double, pts: Array[Pt],
      closed: Boolean): Double = {
    var best = Double.PositiveInfinity
    val last = if (closed) pts.length else pts.length - 1
    var i = 0
    while (i < math.max(last, 1)) {
      val (ax, ay) = pts(i)
      if (last == 0) { // single point
        best = math.min(best, haversine(px, py, ax, ay))
      } else {
        val (bx, by) = pts((i + 1) % pts.length)
        best = math.min(best, haversine(px, py, ax, ay))
        best = math.min(best, haversine(px, py, bx, by))
        val dx = bx - ax; val dy = by - ay
        val den = dx * dx + dy * dy
        if (den > 0.0) {
          val s = ((px - ax) * dx + (py - ay) * dy) / den
          if (s > 0.0 && s < 1.0)
            best = math.min(best,
              haversine(px, py, ax + s * dx, ay + s * dy))
        }
      }
      i += 1
    }
    best
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = decode(l.toString)
    val b = decode(r.toString)
    if (a == null || b == null) return null
    if (a._1.isEmpty || b._1.isEmpty) return null
    // containment / crossing → 0 (closed areas contain; boundary
    // crossings of open/closed pairs also meet)
    def inside(p: Pt, g: (Array[Pt], Boolean)): Boolean =
      g._2 && g._1.length >= 3 &&
        (pointIn(p._1, p._2, g._1) || onEdge(p._1, p._2, g._1))
    if (a._1.exists(inside(_, b)) || b._1.exists(inside(_, a))) return 0.0
    // proper segment crossings (line×line, line×ring, ring×ring)
    if (a._1.length > 1 && b._1.length > 1) {
      val lastA = if (a._2) a._1.length else a._1.length - 1
      val lastB = if (b._2) b._1.length else b._1.length - 1
      var i = 0
      while (i < lastA) {
        val (px, py) = a._1(i); val (qx, qy) = a._1((i + 1) % a._1.length)
        var j = 0
        while (j < lastB) {
          val (ux, uy) = b._1(j); val (vx, vy) = b._1((j + 1) % b._1.length)
          val d1x = qx - px; val d1y = qy - py
          val d2x = vx - ux; val d2y = vy - uy
          val den = d1x * d2y - d1y * d2x
          if (den != 0.0) {
            val wx = ux - px; val wy = uy - py
            val t = (wx * d2y - wy * d2x) / den
            val s = (wx * d1y - wy * d1x) / den
            if (t >= 0.0 && t <= 1.0 && s >= 0.0 && s <= 1.0) return 0.0
          }
          j += 1
        }
        i += 1
      }
    }
    var best = Double.PositiveInfinity
    a._1.foreach { case (px, py) =>
      best = math.min(best, toSegments(px, py, b._1, b._2)) }
    b._1.foreach { case (px, py) =>
      best = math.min(best, toSegments(px, py, a._1, a._2)) }
    best
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GeoMinDistance =
    copy(left = newLeft, right = newRight)
}

object GeoMinDistance {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(GeoMinDistance(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}

/** GeoSPARQL 1.1 MEASURES over a parsed ring set
  * (`array<array<struct<x,y>>>` — exterior first, holes after, the
  * [[graft.functions.UnionWithin]] input shape):
  *  - `area`: |shoelace(exterior)|/2 − Σ|shoelace(hole)|/2 — exact
  *    fixed-association IEEE in CRS units² (planar, the JTS getArea
  *    convention the reference's plugin computes)
  *  - `perimeter`: Σ closed boundary lengths INCLUDING hole boundaries
  *    (JTS getLength on a polygon)
  *  - `openlength`: polyline length of the FIRST ring with no closing
  *    edge (LINESTRING measure)
  * GEODESIC (metre-true, r15 — lon/lat CRS84 input, the unit a user of
  * the reference's Dublin data actually wants):
  *  - `garea`: spherical-excess approximation per ring,
  *    |Σᵢ (λᵢ₊₁−λᵢ)(2 + sin φᵢ + sin φᵢ₊₁)| · R²/2 in m² (the standard
  *    lon/lat polygon-area formula on the sphere; exterior − holes)
  *  - `gperimeter` / `gopenlength`: Σ HAVERSINE segment lengths on the
  *    same mean radius as `geof:distance` (closed incl. holes / open
  *    first ring)
  * All kernels accumulate LEFT-TO-RIGHT with fixed association so a SQL
  * oracle replays the identical expression tree (trig may differ in the
  * last ulp between libm and the JVM — oracle queries round, the
  * `geof:distance` posture). Fewer than 3 vertices for areal ops → null.
  */
case class GeoMeasure(op: String, child: Expression)
    extends UnaryExpression with CodegenFallback {
  require(Set("area", "perimeter", "openlength",
    "garea", "gperimeter", "gopenlength")(op), s"bad measure $op")
  override def dataType: DataType =
    org.apache.spark.sql.types.DoubleType
  override def prettyName: String = s"graft_geo_$op"

  private def ringOf(arr: ArrayData, i: Int): Array[(Double, Double)] = {
    val r = arr.getArray(i)
    val n = r.numElements()
    val out = new Array[(Double, Double)](n)
    var k = 0
    while (k < n) {
      val st = r.getStruct(k, 2)
      if (st.isNullAt(0) || st.isNullAt(1)) return null
      out(k) = (st.getDouble(0), st.getDouble(1))
      k += 1
    }
    // drop an explicit closing point — the kernels close implicitly
    if (out.length > 1 && out.head == out.last) out.dropRight(1) else out
  }

  private def shoelace2(r: Array[(Double, Double)]): Double = {
    var a = 0.0
    var i = 0
    while (i < r.length) {
      val (x1, y1) = r(i); val (x2, y2) = r((i + 1) % r.length)
      a += x1 * y2 - x2 * y1
      i += 1
    }
    a
  }

  private def ringLen(r: Array[(Double, Double)], closed: Boolean): Double = {
    var s = 0.0
    val last = if (closed) r.length else r.length - 1
    var i = 0
    while (i < last) {
      val (x1, y1) = r(i); val (x2, y2) = r((i + 1) % r.length)
      s += math.hypot(x2 - x1, y2 - y1)
      i += 1
    }
    s
  }

  // mean radius shared with geof:distance (SparqlFunctions.geoDistance)
  private val R = 6371008.8
  private val Rad = math.Pi / 180.0

  /** One haversine segment — term-for-term the geof:distance formula so
    * the SQL oracle's replay matches association exactly.
    */
  private def haversine(x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    val lat1 = y1 * Rad; val lon1 = x1 * Rad
    val lat2 = y2 * Rad; val lon2 = x2 * Rad
    val sdLat = math.sin((lat2 - lat1) / 2.0)
    val sdLon = math.sin((lon2 - lon1) / 2.0)
    val h = sdLat * sdLat + math.cos(lat1) * math.cos(lat2) * (sdLon * sdLon)
    (2.0 * R) * math.asin(math.sqrt(h))
  }

  private def ringLenGeo(r: Array[(Double, Double)], closed: Boolean): Double = {
    var s = 0.0
    val last = if (closed) r.length else r.length - 1
    var i = 0
    while (i < last) {
      val (x1, y1) = r(i); val (x2, y2) = r((i + 1) % r.length)
      s += haversine(x1, y1, x2, y2)
      i += 1
    }
    s
  }

  /** Unsigned spherical ring area in m²: |Σ (λ2−λ1)(2 + sin φ1 + sin φ2)|
    * · R²/2, vertices left-to-right.
    */
  private def ringAreaGeo(r: Array[(Double, Double)]): Double = {
    var s = 0.0
    var i = 0
    while (i < r.length) {
      val (x1, y1) = r(i); val (x2, y2) = r((i + 1) % r.length)
      s += (x2 * Rad - x1 * Rad) * (2.0 + math.sin(y1 * Rad) + math.sin(y2 * Rad))
      i += 1
    }
    math.abs(s) * ((R * R) / 2.0)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nr = arr.numElements()
    if (nr == 0) return null
    op match {
      case "openlength" =>
        val r = ringOf(arr, 0)
        if (r == null || r.length < 2) null else ringLen(r, closed = false)
      case "gopenlength" =>
        val r = ringOf(arr, 0)
        if (r == null || r.length < 2) null else ringLenGeo(r, closed = false)
      case "perimeter" | "gperimeter" =>
        var s = 0.0
        var i = 0
        while (i < nr) {
          val r = ringOf(arr, i)
          if (r == null || r.length < 3) return null
          s += (if (op == "perimeter") ringLen(r, closed = true)
                else ringLenGeo(r, closed = true))
          i += 1
        }
        s
      case "area" | "garea" =>
        val outer = ringOf(arr, 0)
        if (outer == null || outer.length < 3) return null
        var a = if (op == "area") math.abs(shoelace2(outer)) / 2.0
                else ringAreaGeo(outer)
        var i = 1
        while (i < nr) {
          val h = ringOf(arr, i)
          if (h == null || h.length < 3) return null
          a -= (if (op == "area") math.abs(shoelace2(h)) / 2.0
                else ringAreaGeo(h))
          i += 1
        }
        a
    }
  }

  override protected def withNewChildInternal(c: Expression): GeoMeasure =
    copy(child = c)
}

object GeoMeasure {
  def apply(op: String, rings: Column): Column =
    ColumnBridge.column(GeoMeasure(op, ColumnBridge.expression(rings)))
}

/** Area-weighted CENTROID of a (possibly holed) polygon ring set — the
  * shoelace centroid of the exterior minus the holes' contributions
  * (exact fixed-association doubles), emitted as POINT WKT. Zero-area
  * input → null (no defined centroid in the areal sense).
  */
case class GeoCentroid(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_geo_centroid"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nr = arr.numElements()
    if (nr == 0) return null
    var aTot = 0.0; var cx = 0.0; var cy = 0.0
    var i = 0
    while (i < nr) {
      val ra = arr.getArray(i)
      val n0 = ra.numElements()
      val r = new Array[(Double, Double)](n0)
      var k = 0
      while (k < n0) {
        val st = ra.getStruct(k, 2)
        if (st.isNullAt(0) || st.isNullAt(1)) return null
        r(k) = (st.getDouble(0), st.getDouble(1))
        k += 1
      }
      val ring = if (r.length > 1 && r.head == r.last) r.dropRight(1) else r
      if (ring.length < 3) return null
      var a2 = 0.0; var sx = 0.0; var sy = 0.0
      var j = 0
      while (j < ring.length) {
        val (x1, y1) = ring(j); val (x2, y2) = ring((j + 1) % ring.length)
        val cr = x1 * y2 - x2 * y1
        a2 += cr
        sx += (x1 + x2) * cr
        sy += (y1 + y2) * cr
        j += 1
      }
      // hole rings subtract: use |area| signs — exterior adds, holes
      // (i >= 1) subtract regardless of stored winding
      val sgn = if (i == 0) 1.0 else -1.0
      val aAbs = math.abs(a2) / 2.0
      // centroid terms carry a2's own sign; normalize to the ring's
      // absolute area then apply the member sign
      val den = if (a2 == 0.0) return null else a2
      aTot += sgn * aAbs
      cx += sgn * aAbs * (sx / (3.0 * den))
      cy += sgn * aAbs * (sy / (3.0 * den))
      i += 1
    }
    if (aTot == 0.0) return null
    UTF8String.fromString(
      s"POINT (${WktOut.fmt(cx / aTot)} ${WktOut.fmt(cy / aTot)})")
  }

  override protected def withNewChildInternal(c: Expression): GeoCentroid =
    copy(child = c)
}

object GeoCentroid {
  def apply(rings: Column): Column =
    ColumnBridge.column(GeoCentroid(ColumnBridge.expression(rings)))
}

/** IRENET95 / Irish Transverse Mercator (EPSG:2157) — the projected CRS
  * for Ireland the reference's Dublin lon/lat data targets for metric
  * work (cf. reference `facilities.ttl:167-171`). A FIXED-ASSOCIATION
  * transcription of the published Krüger flattening series (EPSG
  * guidance note 7-2 "Transverse Mercator", JHS/Karney coefficients to
  * n⁴ — exact to well under a millimetre over the projection's domain):
  * every intermediate is composed exactly as written here, with
  * `atanh`/`sinh`/`cosh` spelled out via `log`/`exp` so the SQL oracle
  * replays the same composition term-for-term (the [[GeoMeasure]]
  * posture). IRENET95 is an ETRS89 realization, coincident with WGS84 /
  * CRS84 at this series' accuracy — the transform is pure projection
  * math, NO datum shift (datum pairs that need grid files or Helmert
  * parameters, e.g. the TM65 Irish Grid EPSG:29902, stay REFUSED:
  * approximate re-projection would be a silently wrong answer).
  *
  * Domain guard: inputs farther than 10° of longitude from the central
  * meridian (or outside ±89° latitude), and inverses that land there,
  * return NaN → error term. ITM is defined for Ireland; the truncated
  * series degrades far from the meridian, and refusing beats
  * approximating.
  */
object TransverseMercator {
  /** Reference ellipsoid (a, 1/f) with every derived constant the Krüger
    * series and the datum chain need, precomputed once: third-flattening
    * series coefficients (forward α, inverse β, conformal→geographic δ),
    * the conformal-latitude factor, the rectifying radius, and the
    * eccentricities for geodetic↔geocentric conversion. GRS80 ≈ WGS84 to
    * sub-mm; Airy Modified 1849 (EPSG:7002) carries the TM65 Irish
    * datum (r17).
    */
  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    private val n1 = f / (2.0 - f) // third flattening n
    private val n2 = n1 * n1
    private val n3 = n2 * n1
    private val n4 = n3 * n1
    /** 2√n/(1+n) — the conformal-latitude eccentricity factor. */
    val sig: Double = 2.0 * math.sqrt(n1) / (1.0 + n1)
    /** Rectifying radius A = a/(1+n)·(1 + n²/4 + n⁴/64). */
    val rA: Double = a / (1.0 + n1) * (1.0 + n2 / 4.0 + n4 / 64.0)
    val a1: Double =
      n1 / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0
    val a2: Double = 13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0
    val a3: Double = 61.0 * n3 / 240.0 - 103.0 * n4 / 140.0
    val a4: Double = 49561.0 * n4 / 161280.0
    val b1: Double = n1 / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0
    val b2: Double = n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0
    val b3: Double = 17.0 * n3 / 480.0 - 37.0 * n4 / 840.0
    val b4: Double = 4397.0 * n4 / 161280.0
    val d1: Double = 2.0 * n1 - 2.0 * n2 / 3.0 - 2.0 * n3 + 116.0 * n4 / 45.0
    val d2: Double = 7.0 * n2 / 3.0 - 8.0 * n3 / 5.0 - 227.0 * n4 / 45.0
    val d3: Double = 56.0 * n3 / 15.0 - 136.0 * n4 / 35.0
    val d4: Double = 4279.0 * n4 / 630.0
    /** First eccentricity squared e² = f(2−f). */
    val e2: Double = f * (2.0 - f)
    /** Semi-minor axis b = a(1−f). */
    val bAxis: Double = a * (1.0 - f)
    /** Second eccentricity squared e'² = e²/(1−e²). */
    val ep2: Double = e2 / (1.0 - e2)
  }
  val Grs80 = Ellipsoid(6378137.0, 298.257222101)
  /** Airy Modified 1849 (EPSG:7002) — the TM65 / Irish Grid ellipsoid. */
  val AiryMod = Ellipsoid(6377340.189, 299.3249646)

  /** One projected TM CRS: central meridian/origin latitude (degrees),
    * scale at the meridian, false easting/northing, the longitude
    * half-width of the guarded domain, and the ellipsoid the series
    * constants derive from.
    */
  final case class Params(lon0Deg: Double, lat0Deg: Double, k0: Double,
      fe: Double, fn: Double, lonHalfWidthDeg: Double, latMaxDeg: Double,
      ell: Ellipsoid = Grs80) {
    /** Rectifying latitude of the projection origin (λ'=0 ⇒ η'=0): the
      * northing offset is fn + k0·A·(ξ − xi0). Exactly 0.0 for an
      * equatorial origin (UTM).
      */
    lazy val xi0: Double = {
      val xip = math.atan2(tau(ell, lat0Deg * Rad), 1.0)
      xip + ell.a1 * math.sin(2.0 * xip) + ell.a2 * math.sin(4.0 * xip) +
        ell.a3 * math.sin(6.0 * xip) + ell.a4 * math.sin(8.0 * xip)
    }
  }
  /** IRENET95 / Irish Transverse Mercator. */
  val Itm = Params(-8.0, 53.5, 0.99982, 600000.0, 750000.0, 10.0, 89.0)
  /** WGS84 / UTM zone 29N (covers Ireland): equatorial origin, the UTM
    * scale 0.9996; latitude clipped at the UTM 84°N/80°S convention
    * (expressed symmetric — the southern hemisphere would need the
    * 10 000 000 false northing variant 32729, refused).
    */
  val Utm29N = Params(-9.0, 0.0, 0.9996, 500000.0, 0.0, 10.0, 84.0)
  /** TM65 / Irish Grid (EPSG:29902) — the PROJECTION half; coordinates in
    * this CRS also carry the TM65 datum, handled by [[Tm65Datum]].
    */
  val IrishGrid =
    Params(-8.0, 53.5, 1.000035, 200000.0, 250000.0, 10.0, 89.0, AiryMod)

  private val Rad = math.Pi / 180.0

  // GRS80 series constants, kept as named aliases: the DuckDB oracle and
  // the independent-transcription spec reference these printed doubles
  val Sig: Double = Grs80.sig
  val RA: Double = Grs80.rA
  val A1: Double = Grs80.a1
  val A2: Double = Grs80.a2
  val A3: Double = Grs80.a3
  val A4: Double = Grs80.a4
  val B1: Double = Grs80.b1
  val B2: Double = Grs80.b2
  val B3: Double = Grs80.b3
  val B4: Double = Grs80.b4
  val D1: Double = Grs80.d1
  val D2: Double = Grs80.d2
  val D3: Double = Grs80.d3
  val D4: Double = Grs80.d4

  // atanh/sinh/cosh via log/exp so the DuckDB oracle composes IDENTICALLY
  private def atanhE(x: Double): Double =
    0.5 * math.log((1.0 + x) / (1.0 - x))
  private def sinhE(x: Double): Double =
    (math.exp(x) - math.exp(-x)) / 2.0
  private def coshE(x: Double): Double =
    (math.exp(x) + math.exp(-x)) / 2.0

  private def tau(ell: Ellipsoid, phi: Double): Double =
    sinhE(atanhE(math.sin(phi)) - ell.sig * atanhE(ell.sig * math.sin(phi)))

  private def inDomain(p: Params, lonDeg: Double, latDeg: Double): Boolean =
    math.abs(lonDeg - p.lon0Deg) <= p.lonHalfWidthDeg &&
      math.abs(latDeg) <= p.latMaxDeg

  /** Geodetic (lon°, lat°) on `p`'s ellipsoid → (easting m, northing m)
    * under `p`; NaN pair when the input leaves the guarded domain.
    */
  def forward(p: Params, lonDeg: Double, latDeg: Double): (Double, Double) = {
    if (!inDomain(p, lonDeg, latDeg)) return (Double.NaN, Double.NaN)
    val el = p.ell
    val phi = latDeg * Rad
    val lam = lonDeg * Rad - p.lon0Deg * Rad
    val t = tau(el, phi)
    val xip = math.atan2(t, math.cos(lam))
    val etap = atanhE(math.sin(lam) / math.sqrt(1.0 + t * t))
    val xi = xip +
      el.a1 * math.sin(2.0 * xip) * coshE(2.0 * etap) +
      el.a2 * math.sin(4.0 * xip) * coshE(4.0 * etap) +
      el.a3 * math.sin(6.0 * xip) * coshE(6.0 * etap) +
      el.a4 * math.sin(8.0 * xip) * coshE(8.0 * etap)
    val eta = etap +
      el.a1 * math.cos(2.0 * xip) * sinhE(2.0 * etap) +
      el.a2 * math.cos(4.0 * xip) * sinhE(4.0 * etap) +
      el.a3 * math.cos(6.0 * xip) * sinhE(6.0 * etap) +
      el.a4 * math.cos(8.0 * xip) * sinhE(8.0 * etap)
    (p.fe + p.k0 * el.rA * eta, p.fn + p.k0 * el.rA * (xi - p.xi0))
  }

  /** (easting m, northing m) under `p` → geodetic (lon°, lat°) on `p`'s
    * ellipsoid; NaN pair when the result leaves the guarded domain.
    */
  def inverse(p: Params, e: Double, n: Double): (Double, Double) = {
    val el = p.ell
    val eta = (e - p.fe) / (p.k0 * el.rA)
    val xi = p.xi0 + (n - p.fn) / (p.k0 * el.rA)
    val xip = xi - (
      el.b1 * math.sin(2.0 * xi) * coshE(2.0 * eta) +
      el.b2 * math.sin(4.0 * xi) * coshE(4.0 * eta) +
      el.b3 * math.sin(6.0 * xi) * coshE(6.0 * eta) +
      el.b4 * math.sin(8.0 * xi) * coshE(8.0 * eta))
    val etap = eta - (
      el.b1 * math.cos(2.0 * xi) * sinhE(2.0 * eta) +
      el.b2 * math.cos(4.0 * xi) * sinhE(4.0 * eta) +
      el.b3 * math.cos(6.0 * xi) * sinhE(6.0 * eta) +
      el.b4 * math.cos(8.0 * xi) * sinhE(8.0 * eta))
    val sh = sinhE(etap)
    val cx = math.cos(xip)
    val taup = math.sin(xip) / math.sqrt(sh * sh + cx * cx)
    val chi = math.atan(taup)
    val phi = chi + el.d1 * math.sin(2.0 * chi) +
      el.d2 * math.sin(4.0 * chi) + el.d3 * math.sin(6.0 * chi) +
      el.d4 * math.sin(8.0 * chi)
    val lonDeg = (p.lon0Deg * Rad + math.atan2(sh, cx)) / Rad
    val latDeg = phi / Rad
    if (!inDomain(p, lonDeg, latDeg)) (Double.NaN, Double.NaN)
    else (lonDeg, latDeg)
  }
}

/** TM65 (Ireland 1965) datum ↔ ETRS89/WGS84, and the composed
  * EPSG:29902 (TM65 / Irish Grid) kernel — the first registered CRS
  * whose transform is a DATUM SHIFT, not pure projection math (the r16
  * refusal lifted deliberately, r17).
  *
  * The shift is the published OSi/OSNI Helmert-7 (EPSG:1641, "TM65 to
  * ETRS89 (2)", position-vector convention 9606): t = (482.530,
  * −130.596, 564.557) m, r = (−1.042, −0.214, −0.631) arcsec,
  * s = 8.150 ppm — the same seven numbers every public registry carries
  * for EPSG:29902. The ETRS89→TM65 direction uses the standard
  * small-angle reverse (same formula, all parameters negated; ≤ 7 mm
  * from the exact matrix inverse over Ireland — far inside the method's
  * documented accuracy). ACCURACY BOUND: a 7-parameter fit to the 1965
  * readjustment is good to ≈0.4 m across Ireland vs the OSi
  * polynomial/grid transformation (OSi "Making maps compatible with
  * GPS"); callers needing survey-grade TM65 need the grid files, which
  * stay out of scope. Sign convention pinned two ways in
  * TransverseMercatorSpec: the Dublin Spire Irish-Grid landmark (a
  * rotation-sign flip moves the result ~76 m) and an independent
  * offline path (Snyder TM + iterative geodetic + exact-inverse
  * Helmert) agreeing to ~1 mm.
  *
  * Geodetic→geocentric at h = 0 (heights are not represented in 2D
  * WKT); geocentric→geodetic via Bowring's 1976 one-shot formula
  * (≤ µm at crustal heights). Every step is arithmetic + sqrt/trig/
  * exp/ln only, composed fixed-association, so the DuckDB oracle
  * replays the full chain term-for-term.
  */
sealed class IrishDatum(tx: Double, ty: Double, tz: Double,
    rxSec: Double, rySec: Double, rzSec: Double, ppm: Double) {
  import TransverseMercator.{AiryMod, Grs80, IrishGrid}

  private val Rad = math.Pi / 180.0
  private val ArcSec = math.Pi / (180.0 * 3600.0)
  private val Tx = tx
  private val Ty = ty
  private val Tz = tz
  private val Rx = rxSec * ArcSec
  private val Ry = rySec * ArcSec
  private val Rz = rzSec * ArcSec
  private val S = 1.0 + ppm * 1e-6

  /** Geodetic (lon°, lat°, h=0) on `ell` → geocentric (X, Y, Z) m. */
  private def toXyz(ell: TransverseMercator.Ellipsoid, lonDeg: Double,
      latDeg: Double): (Double, Double, Double) = {
    val phi = latDeg * Rad
    val lam = lonDeg * Rad
    val nu = ell.a / math.sqrt(1.0 - ell.e2 * math.sin(phi) * math.sin(phi))
    (nu * math.cos(phi) * math.cos(lam),
      nu * math.cos(phi) * math.sin(lam),
      nu * (1.0 - ell.e2) * math.sin(phi))
  }

  /** Geocentric (X, Y, Z) m → geodetic (lon°, lat°) on `ell` — Bowring's
    * one-shot closed form (height discarded).
    */
  private def toGeodetic(ell: TransverseMercator.Ellipsoid, x: Double,
      y: Double, z: Double): (Double, Double) = {
    val p = math.sqrt(x * x + y * y)
    val th = math.atan2(z * ell.a, p * ell.bAxis)
    val st = math.sin(th)
    val ct = math.cos(th)
    val phi = math.atan2(z + ell.ep2 * ell.bAxis * st * st * st,
      p - ell.e2 * ell.a * ct * ct * ct)
    (math.atan2(y, x) / Rad, phi / Rad)
  }

  /** Position-vector Helmert, TM65 → ETRS89 direction. */
  private def tm65ToEtrs(x: Double, y: Double, z: Double)
      : (Double, Double, Double) =
    (Tx + S * (x - Rz * y + Ry * z),
      Ty + S * (Rz * x + y - Rx * z),
      Tz + S * (-Ry * x + Rx * y + z))

  /** Small-angle reverse (all parameters negated), ETRS89 → TM65. */
  private def etrsToTm65(x: Double, y: Double, z: Double)
      : (Double, Double, Double) = {
    val s = 1.0 - ppm * 1e-6
    (-Tx + s * (x + Rz * y - Ry * z),
      -Ty + s * (-Rz * x + y + Rx * z),
      -Tz + s * (Ry * x - Rx * y + z))
  }

  /** CRS84 (lon°, lat°) → Irish Grid (E, N) m; NaN pair out of domain. */
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    if (lonDeg.isNaN || latDeg.isNaN) return (Double.NaN, Double.NaN)
    val (x, y, z) = toXyz(Grs80, lonDeg, latDeg)
    val (xs, ys, zs) = etrsToTm65(x, y, z)
    val (lo, la) = toGeodetic(AiryMod, xs, ys, zs)
    TransverseMercator.forward(IrishGrid, lo, la)
  }

  /** Irish Grid (E, N) m → CRS84 (lon°, lat°); NaN pair out of domain. */
  def inverse(e: Double, n: Double): (Double, Double) = {
    val (lo, la) = TransverseMercator.inverse(IrishGrid, e, n)
    if (lo.isNaN || la.isNaN) return (Double.NaN, Double.NaN)
    val (x, y, z) = toXyz(AiryMod, lo, la)
    val (xt, yt, zt) = tm65ToEtrs(x, y, z)
    toGeodetic(Grs80, xt, yt, zt)
  }
}

/** TM65 (1965 adjustment) — EPSG:1641 "TM65 to ETRS89 (2)". */
object Tm65Datum
  extends IrishDatum(482.530, -130.596, 564.557, -1.042, -0.214, -0.631, 8.150)

/** TM75 (Geodetic Datum of 1965, 1975 readjustment) ↔ ETRS89, the
  * composed EPSG:29903 (TM75 / Irish Grid) kernel (r18) — the sibling
  * Irish datum: same Airy Modified ellipsoid, same Irish Grid projection
  * constants, different published Helmert-7 (EPSG:1953, "TM75 to ETRS89
  * (2)", position vector): t = (482.5, −130.6, 564.6) m, r = (−1.042,
  * −0.214, −0.631) arcsec, s = 8.15 ppm. OSi/OSNI publish the 1975
  * readjustment against the same network, so rotations/scale coincide
  * with TM65's and the translations round to the decimetre — the two
  * grids differ by only centimetres (dE ≈ +8 mm, dN ≈ −49 mm over
  * Ireland, by the offline dual-path computation in
  * TransverseMercatorSpec). Method, accuracy bound (≈0.4 m vs grid
  * files) and sign-convention pins as documented on [[IrishDatum]]/
  * [[Tm65Datum]].
  */
object Tm75Datum
  extends IrishDatum(482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15)

/** WGS84 / Pseudo-Mercator (EPSG:3857, "Web Mercator") — the spherical
  * Mercator every web map serves tiles in: E = R·λ, N = R·atanh(sin φ)
  * on the WGS84 SEMI-MAJOR sphere (R = 6378137 — by definition of 3857,
  * NOT an ellipsoidal projection; its well-known north-bias vs true
  * Mercator is part of the CRS). atanh spelled via ln for the oracle
  * replay, like [[TransverseMercator]]. Latitude guarded at the tile
  * clip ±85.051128779807° (the square-world cut); longitude ±180.
  */
object WebMercator {
  private val R = 6378137.0
  private val Rad = math.Pi / 180.0
  private val LatMax = 85.051128779807

  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    if (!(math.abs(lonDeg) <= 180.0 && math.abs(latDeg) <= LatMax))
      return (Double.NaN, Double.NaN)
    val s = math.sin(latDeg * Rad)
    (R * (lonDeg * Rad), R * (0.5 * math.log((1.0 + s) / (1.0 - s))))
  }

  def inverse(e: Double, n: Double): (Double, Double) = {
    val lonDeg = (e / R) / Rad
    val sh = (math.exp(n / R) - math.exp(-(n / R))) / 2.0
    val latDeg = math.atan(sh) / Rad
    if (!(math.abs(lonDeg) <= 180.0 && math.abs(latDeg) <= LatMax))
      (Double.NaN, Double.NaN)
    else (lonDeg, latDeg)
  }
}

/** Re-project every coordinate pair of a 2D WKT body through the
  * registered projection kernel named by `crs` ([[GeoTmProject.Kernels]]:
  * 2157 / 32629 via [[TransverseMercator]], 3857 via [[WebMercator]];
  * `fwd` = from CRS84 lon-lat to projected E-N, else the inverse).
  * Pure text→text: structure (type keywords, parens,
  * commas, MULTI/COLLECTION nesting) passes through untouched; only the
  * number pairs are rewritten ([[WktOut.fmt]] digits — shortest
  * round-trip plain decimal, so a downstream inverse re-parses the
  * EXACT double). Any out-of-domain pair nulls the whole geometry
  * (error term). Callers must pre-validate 2D-ness — a Z/M/EMPTY body
  * never reaches this expression (cf. SparqlFunctions.geoTransform).
  */
case class GeoTmProject(fwd: Boolean, crs: String, child: Expression)
    extends UnaryExpression with CodegenFallback {
  require(GeoTmProject.Kernels.contains(crs), s"unknown projection $crs")
  override def dataType: DataType = StringType
  override def prettyName: String =
    (if (fwd) "graft_geo_fwd_" else "graft_geo_inv_") + crs

  private val Pair = java.util.regex.Pattern.compile(
    "(-?(?:[0-9]+\\.?[0-9]*|\\.[0-9]+)(?:[eE][+-]?[0-9]+)?)\\s+" +
      "(-?(?:[0-9]+\\.?[0-9]*|\\.[0-9]+)(?:[eE][+-]?[0-9]+)?)")

  override protected def nullSafeEval(input: Any): Any = {
    val m = Pair.matcher(input.toString)
    val sb = new StringBuffer
    while (m.find()) {
      val x = java.lang.Double.parseDouble(m.group(1))
      val y = java.lang.Double.parseDouble(m.group(2))
      val (fk, ik) = GeoTmProject.Kernels(crs)
      val (ox, oy) = if (fwd) fk(x, y) else ik(x, y)
      if (ox.isNaN || oy.isNaN) return null
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
        s"${WktOut.fmt(ox)} ${WktOut.fmt(oy)}"))
    }
    m.appendTail(sb)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): GeoTmProject =
    copy(child = c)
}

object GeoTmProject {
  type K = (Double, Double) => (Double, Double)
  /** crs key → (forward, inverse) kernels, forward = from CRS84 lon-lat. */
  val Kernels: Map[String, (K, K)] = Map(
    "2157" -> ((TransverseMercator.forward(TransverseMercator.Itm, _, _),
      TransverseMercator.inverse(TransverseMercator.Itm, _, _))),
    "32629" -> ((TransverseMercator.forward(TransverseMercator.Utm29N, _, _),
      TransverseMercator.inverse(TransverseMercator.Utm29N, _, _))),
    "3857" -> ((WebMercator.forward _, WebMercator.inverse _)),
    // r17: the first DATUM-SHIFTING kernel (Helmert-7 + Airy Modified)
    "29902" -> ((Tm65Datum.forward _, Tm65Datum.inverse _)),
    // r18: the sibling TM75 datum, same projection, rounded Helmert
    "29903" -> ((Tm75Datum.forward _, Tm75Datum.inverse _)))

  def apply(fwd: Boolean, crs: String, body: Column): Column =
    ColumnBridge.column(
      GeoTmProject(fwd, crs, ColumnBridge.expression(body)))
}

/** GEODESIC (spherical area-weighted) CENTROID of a possibly-holed
  * polygon ring set — the last planar-only measure in the metric series
  * (r15 shipped metricArea/Perimeter/Length). The surface integral of
  * the unit position vector over a spherical polygon reduces EXACTLY to
  * a per-edge sum (Stokes: ∫∫ r̂ dA = ½ ∮ r × dr, and along a
  * great-circle arc a→b that line integral is n̂·θ with n̂ = a×b/|a×b|
  * and θ the arc angle), so the kernel is a fixed-association fold over
  * the edges — no quadrature, replayable arithmetically by the SQL
  * oracle. Ring orientation is normalized via the planar shoelace sign
  * (valid for the supported non-pole-crossing geometries); holes
  * subtract their (CCW-normalized) vector contribution before the final
  * direction is taken. The common ½ factor cancels in the direction and
  * is folded out. Zero resultant (e.g. a ring spanning a full great
  * circle symmetrically) → null: no defined direction.
  */
case class GeoGeodesicCentroid(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_geo_gcentroid"

  private val Rad = math.Pi / 180.0

  /** Ring's unnormalized surface-integral vector Σ (a×b)·θ/|a×b|,
    * CCW-normalized via the planar shoelace sign; null ring → null.
    */
  private def ringVec(ra: ArrayData): Array[Double] = {
    val n0 = ra.numElements()
    val pts = new Array[(Double, Double)](n0)
    var k = 0
    while (k < n0) {
      val st = ra.getStruct(k, 2)
      if (st.isNullAt(0) || st.isNullAt(1)) return null
      pts(k) = (st.getDouble(0), st.getDouble(1))
      k += 1
    }
    val r = if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1)
            else pts
    if (r.length < 3) return null
    // planar shoelace sign for orientation normalization
    var sh = 0.0
    var i = 0
    while (i < r.length) {
      val (x1, y1) = r(i); val (x2, y2) = r((i + 1) % r.length)
      sh += x1 * y2 - x2 * y1
      i += 1
    }
    val flip = if (sh < 0.0) -1.0 else 1.0
    var vx = 0.0; var vy = 0.0; var vz = 0.0
    i = 0
    while (i < r.length) {
      val (lon1, lat1) = r(i); val (lon2, lat2) = r((i + 1) % r.length)
      val ax = math.cos(lat1 * Rad) * math.cos(lon1 * Rad)
      val ay = math.cos(lat1 * Rad) * math.sin(lon1 * Rad)
      val az = math.sin(lat1 * Rad)
      val bx = math.cos(lat2 * Rad) * math.cos(lon2 * Rad)
      val by = math.cos(lat2 * Rad) * math.sin(lon2 * Rad)
      val bz = math.sin(lat2 * Rad)
      val cx = ay * bz - az * by
      val cy = az * bx - ax * bz
      val cz = ax * by - ay * bx
      val cn = math.sqrt(cx * cx + cy * cy + cz * cz)
      if (cn != 0.0) {
        val dot = ax * bx + ay * by + az * bz
        val theta = math.atan2(cn, dot)
        vx += cx * (theta / cn)
        vy += cy * (theta / cn)
        vz += cz * (theta / cn)
      }
      i += 1
    }
    Array(flip * vx, flip * vy, flip * vz)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nr = arr.numElements()
    if (nr == 0) return null
    val outer = ringVec(arr.getArray(0))
    if (outer == null) return null
    var vx = outer(0); var vy = outer(1); var vz = outer(2)
    var i = 1
    while (i < nr) {
      val h = ringVec(arr.getArray(i))
      if (h == null) return null
      vx -= h(0); vy -= h(1); vz -= h(2)
      i += 1
    }
    val horiz = math.sqrt(vx * vx + vy * vy)
    if (horiz == 0.0 && vz == 0.0) return null
    val lon = math.atan2(vy, vx) / Rad
    val lat = math.atan2(vz, horiz) / Rad
    UTF8String.fromString(
      s"POINT (${WktOut.fmt(lon)} ${WktOut.fmt(lat)})")
  }

  override protected def withNewChildInternal(c: Expression): GeoGeodesicCentroid =
    copy(child = c)
}

object GeoGeodesicCentroid {
  def apply(rings: Column): Column =
    ColumnBridge.column(GeoGeodesicCentroid(ColumnBridge.expression(rings)))
}
