package graft.functions

/** Planar geometry kernels used by custom Catalyst expressions. Plain
  * static-forwarder methods so generated Java code can call them
  * directly (graft.functions.GeoMath.clippedSegmentLength(...)).
  */
object GeoMath {

  /** Exact length of the part of segment (x1,y1)→(x2,y2) lying inside
    * the disk of center (cx,cy) radius r — the precise semantics of the
    * reference's ST_Length(ST_Intersection(ST_Buffer(point, r), road))
    * (reference duckpipe/calculator/RoadLLWCalculator.py:83-97) for
    * straight segments.
    *
    * Solve |P1 + t·d − C|² = r² for t, clamp the root interval to
    * [0,1], scale by |d|.
    */
  def clippedSegmentLength(cx: Double, cy: Double, r: Double,
                           x1: Double, y1: Double,
                           x2: Double, y2: Double): Double = {
    val dx = x2 - x1; val dy = y2 - y1
    val a = dx * dx + dy * dy
    if (a == 0.0) return 0.0 // degenerate point segment
    val fx = x1 - cx; val fy = y1 - cy
    val b = 2.0 * (dx * fx + dy * fy)
    val c = fx * fx + fy * fy - r * r
    val disc = b * b - 4.0 * a * c
    if (disc <= 0.0) return 0.0 // no (or tangent) intersection
    val sq = math.sqrt(disc)
    val t1 = (-b - sq) / (2.0 * a)
    val t2 = (-b + sq) / (2.0 * a)
    val lo = if (t1 > 0.0) t1 else 0.0
    val hi = if (t2 < 1.0) t2 else 1.0
    if (hi <= lo) 0.0 else (hi - lo) * math.sqrt(a)
  }

  /** Contribution of directed polygon edge (ax,ay)→(bx,by) — vertices
    * RELATIVE to the circle center — to the area of disk∩polygon, by
    * Green's theorem: chord part as the triangle (O, p1, p2), parts of
    * the edge outside the disk as circular sectors (a straight edge
    * subtends < π from any point off its line, so the atan2 principal
    * value IS the signed subtended angle and the per-edge sum
    * telescopes to winding·2π for far-outside polygons).
    *
    * Branch structure must stay in lockstep with the SQL oracle mirror
    * (GeoQueries.areaClipSql): every predicate compares doubles that
    * both engines derive bit-identically, so both take the same branch;
    * only the trig outputs differ (at ulp level — absorbed by the
    * per-pair DECIMAL(18,2) quantization at the oracle boundary).
    */
  def circleEdgeTerm(ax: Double, ay: Double, bx: Double, by: Double,
                     r: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val aa = dx * dx + dy * dy
    if (aa == 0.0) return 0.0 // degenerate zero-length edge
    val bb = 2.0 * (ax * dx + ay * dy)
    val cc = ax * ax + ay * ay - r * r
    val disc = bb * bb - 4.0 * aa * cc
    if (disc <= 0.0) // edge never enters the disk: pure sector
      return r * r / 2.0 * math.atan2(ax * by - ay * bx, ax * bx + ay * by)
    val sq = math.sqrt(disc)
    val t1 = (-bb - sq) / (2.0 * aa)
    val t2 = (-bb + sq) / (2.0 * aa)
    if (t2 <= 0.0 || t1 >= 1.0) // chord misses the [0,1] span: sector
      return r * r / 2.0 * math.atan2(ax * by - ay * bx, ax * bx + ay * by)
    val lo = if (t1 > 0.0) t1 else 0.0
    val hi = if (t2 < 1.0) t2 else 1.0
    val p1x = ax + lo * dx; val p1y = ay + lo * dy
    val p2x = ax + hi * dx; val p2y = ay + hi * dy
    var term = (p1x * p2y - p1y * p2x) / 2.0 // chord triangle
    if (lo > 0.0) // arc from a to the entry point
      term += r * r / 2.0 * math.atan2(ax * p1y - ay * p1x, ax * p1x + ay * p1y)
    if (hi < 1.0) // arc from the exit point to b
      term += r * r / 2.0 * math.atan2(p2x * by - p2y * bx, p2x * bx + p2y * by)
    term
  }

  /** Exact area of disk(center (cx,cy), radius r) ∩ polygon (xs, ys) —
    * the precise semantics of the reference's
    * ST_Area(ST_Intersection(landuse_polygon, ST_Buffer(point, r)))
    * (reference duckpipe/calculator/LanduseCalculator.py:116-117 and
    * _IntersectingOACalculator.py:66-90). Absolute value: vertex
    * orientation does not matter (ST_Area semantics).
    */
  def circlePolyArea(cx: Double, cy: Double, r: Double,
                     xs: org.apache.spark.sql.catalyst.util.ArrayData,
                     ys: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = xs.numElements()
    var total = 0.0
    var j = n - 1
    var i = 0
    while (i < n) {
      total += circleEdgeTerm(
        xs.getDouble(j) - cx, ys.getDouble(j) - cy,
        xs.getDouble(i) - cx, ys.getDouble(i) - cy, r)
      j = i
      i += 1
    }
    math.abs(total)
  }
}
