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
  * doubles with fixed-association arithmetic and serialized with JVM
  * `Double.toString` (shortest round-trip form), so coordinates that
  * originate as decimal text (`-6.38`) survive hull/clip verbatim and
  * oracles can reconstruct outputs by string algebra.
  */
private object WktOut {
  /** Shortest JVM round-trip form; -0.0 normalizes to 0.0 (clip line
    * intersections can produce the negative-zero bit pattern). */
  def fmt(d: Double): String = (if (d == 0.0) 0.0 else d).toString
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
