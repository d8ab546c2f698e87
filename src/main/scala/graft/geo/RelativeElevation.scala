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
    val inRef = col("_d2") < lit(refRadius * refRadius)
    // Only the reference disk and the donut bands feed any aggregate;
    // drop everything else (the box corners and the gap between the
    // reference disk and the innermost ring) right at the join output,
    // before anything shuffles. Cuts the aggregated volume ~3×.
    val needed = inRef ||
      radii.map(r => col("_d2") >= lit(r * r) &&
        col("_d2") < lit((r + thickness) * (r + thickness)))
        .reduce(_ || _)
    val joined = BufferStats.neighborJoin(points, cells, reach)
      .filter(needed)

    // Reference elevation as a window over the same id partitioning the
    // final groupBy uses — one shuffle total, no second join, and the
    // neighbor join is computed once instead of twice. The sum is over
    // integer-valued doubles, so window-vs-aggregate order is exact.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
    val flagged = joined.withColumn("ref_elev",
        sum(when(inRef, col("elev"))).over(w) /
          sum(when(inRef, lit(1L))).over(w))
      // ids with no cell in the reference disk have no reference (the
      // oracle's inner join on ref drops them too)
      .filter(col("ref_elev").isNotNull)

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
    flagged.groupBy("id")
      .agg(first(col("ref_elev")).as("ref_elev"), ringAggs: _*)
  }
}
