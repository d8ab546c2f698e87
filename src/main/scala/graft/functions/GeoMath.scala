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
}
