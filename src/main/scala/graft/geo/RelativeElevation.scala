package graft.geo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relative elevation: for each point, (1) a reference elevation — the
  * mean of raster cells near the point — and (2), per buffer radius, the
  * share of cells in the donut ring (r, r+thickness] whose elevation is
  * more than ±20/±50 m away from the reference. Mirrors the reference's
  * RelativeElevationCalculator (duckpipe/calculator/
  * RelativeElevationCalculator.py:100-151: ref = mean of intersecting
  * cells, ring = ST_Difference of two buffers, AVG of CAST(cond AS INT)).
  *
  * Cells: (x, y, elev). One grid join at the largest reach covers the
  * reference pass and every donut — a single scan of the raster table.
  */
object RelativeElevation {

  def compute(points: DataFrame, cells: DataFrame, refRadius: Double,
              radii: Seq[Double], thickness: Double = 30.0): DataFrame = {
    val reach = radii.max + thickness

    // Pass 1 — reference elevation: its own small-reach neighbor join
    // (candidate box sized to refRadius, not to the outermost ring —
    // ~5× fewer candidates than sharing the ring join) feeding a hash
    // aggregate with map-side combine. Integer-valued elevations sum
    // exactly in double, so aggregation order is moot. Ids with no
    // cell in the reference disk get no reference row — the oracle's
    // inner join on ref drops them identically.
    val ref = graft.Tables.hot(
      BufferStats.neighborJoin(points, cells, refRadius)
        .filter(col("_d2") < lit(refRadius * refRadius))
        .groupBy("id")
        .agg((sum(col("elev")) / count(lit(1))).as("ref_elev")))

    // Pass 2 — ring rows only: the annulus join prunes the hollow
    // center offsets (minReach) and keeps only donut-band rows, then
    // joins the (id, ref_elev) table and hash-aggregates per id.
    // Versus the former single-pass window plan, nothing is sorted and
    // the per-id exchange carries the ring rows once (map-side
    // partial aggregation collapses them before the shuffle).
    val anyRing = radii.map(r => col("_d2") >= lit(r * r) &&
      col("_d2") < lit((r + thickness) * (r + thickness)))
      .reduce(_ || _)
    val rings = BufferStats.neighborJoin(points, cells, reach,
        minReach = radii.min)
      .filter(anyRing)

    val ringAggs = radii.flatMap { r =>
      val inRing = col("_d2") >= lit(r * r) &&
        col("_d2") < lit((r + thickness) * (r + thickness))
      def share(cond: org.apache.spark.sql.Column, n: String) =
        // try_divide: empty ring → NULL (ANSI mode would throw on 0/0),
        // mirroring the oracle's NULLIF(denominator, 0)
        try_divide(sum(when(inRing && cond, 1).otherwise(0)),
          sum(when(inRing, 1).otherwise(0))).as(s"${n}_${r.toInt}")
      Seq(
        share(col("elev") - col("ref_elev") > 20.0, "above20"),
        share(col("elev") - col("ref_elev") < -20.0, "below20"),
        share(col("elev") - col("ref_elev") > 50.0, "above50"),
        share(col("elev") - col("ref_elev") < -50.0, "below50"))
    }
    val ringAgged = rings.join(ref, Seq("id"))
      .groupBy("id").agg(ringAggs.head, ringAggs.tail: _*)
    // left join: an id with a reference but no ring cells keeps its
    // row with NULL shares (the oracle's CASE sums are all 0 there →
    // NULLIF denominator → NULL)
    ref.join(ringAgged, Seq("id"), "left")
      .select(col("id") +: col("ref_elev") +:
        radii.flatMap(r => Seq("above20", "below20", "above50", "below50")
          .map(n => col(s"${n}_${r.toInt}"))): _*)
  }
}
