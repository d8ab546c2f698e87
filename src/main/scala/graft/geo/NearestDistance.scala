package graft.geo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nearest-feature distance: for every point, the minimum euclidean
  * distance to any row of a feature set — the semantics of the
  * reference's whole *DistanceCalculator family (airport/bus/coastline/
  * mdl/port/rail/river/road/mr1/mr2; e.g. reference
  * duckpipe/calculator/AirportDistanceCalculator.py:38-57, which runs
  * MIN(ST_Distance(point, feature)) per chunk).
  *
  * Two physical strategies, chosen by the caller:
  *
  *  - `broadcastNearest` — feature set is small (airports, ports…):
  *    broadcast it, partial-aggregate the min per point on the map side.
  *    No shuffle of the point table at all beyond the final groupBy,
  *    which Catalyst collapses into a partial+final hash aggregate.
  *    At 100 TB of points this is a single pass.
  *
  *  - `gridNearest` — feature set is itself huge (every road segment):
  *    bucket features into cells of `cellSize` meters, join each point
  *    to its 3×3 cell neighborhood (hash join on a packed cell key —
  *    never a cross product), take the min; points whose ring came up
  *    empty or whose found min exceeds the ring's guarantee radius
  *    retry with a doubled cell radius. Each round is a plain shuffle
  *    join, so AQE/skew handling applies; the loop runs on the driver
  *    but only over *unresolved* points, which shrink geometrically.
  *
  * Points schema: (id, x, y). Features schema: (x, y) + anything.
  */
object NearestDistance {

  def broadcastNearest(points: DataFrame, features: DataFrame,
                       outCol: String = "distance"): DataFrame = {
    val f = broadcast(features.select(col("x").as("fx"), col("y").as("fy")))
    points.join(f)
      .groupBy("id")
      .agg(min(Geo.dist(col("x"), col("y"), col("fx"), col("fy"))).as(outCol))
  }

  /** k nearest features per point (id, rank, fid, distance) — the k-NN
    * extension of the distance family. Broadcast strategy: per-point
    * top-k via row_number over the broadcast candidates; use a grid
    * candidate set first when the feature table is huge. */
  def broadcastKnn(points: DataFrame, features: DataFrame, k: Int): DataFrame = {
    val f = broadcast(features.select(
      col("id").as("fid"), col("x").as("fx"), col("y").as("fy")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("distance"), col("fid"))
    points.join(f)
      .select(col("id"), col("fid"),
        Geo.dist(col("x"), col("y"), col("fx"), col("fy")).as("distance"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id", "rank", "fid", "distance")
  }

  def gridNearest(points: DataFrame, features: DataFrame,
                  cellSize: Double, outCol: String = "distance",
                  maxRounds: Int = 12): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    val feats = features
      .select(col("x").as("fx"), col("y").as("fy"))
      .withColumn("fcx", Geo.cellOf(col("fx"), cellSize))
      .withColumn("fcy", Geo.cellOf(col("fy"), cellSize))
      .cache()

    var pending = Geo.fanout(points.select("id", "x", "y"))
      .withColumn("cx", Geo.cellOf(col("x"), cellSize))
      .withColumn("cy", Geo.cellOf(col("y"), cellSize))
      .cache()
    var resolved: Option[DataFrame] = None
    var ring = 1L // Chebyshev cell radius searched this round
    var round = 0

    while (round < maxRounds && !pending.isEmpty) {
      // Candidate cells: all features within `ring` cells on both axes.
      // Joined via packed cell key so this is a standard equi hash join.
      val offsets = (-ring to ring)
        .flatMap(dx => (-ring to ring).map(dy => (dx, dy)))
        .toDF("dx", "dy")
      val probes = pending
        .join(broadcast(offsets))
        .withColumn("ck", Geo.cellKey(col("cx") + col("dx"), col("cy") + col("dy")))
        .select("id", "x", "y", "ck")
      val cands = probes.join(
          feats.withColumn("ck", Geo.cellKey(col("fcx"), col("fcy")))
               .select("ck", "fx", "fy"),
          Seq("ck"))
        .groupBy("id")
        .agg(min(Geo.dist(col("x"), col("y"), col("fx"), col("fy"))).as(outCol))
      // A min found at d is final iff no unsearched cell could hold a
      // closer feature: anything outside the ring is > ring*cellSize away.
      val safe = lit(ring.toDouble * cellSize)
      val done = pending.join(cands, Seq("id"))
        .filter(col(outCol) <= safe)
        .select("id", outCol)
      resolved = Some(resolved.map(_.unionByName(done)).getOrElse(done))
      val doneIds = done.select("id")
      pending = pending.join(doneIds, Seq("id"), "left_anti").cache()
      ring *= 2
      round += 1
    }
    // Anything left after maxRounds falls back to the exact broadcast path
    // (vanishingly rare: isolated points in an empty region).
    val leftover =
      if (pending.isEmpty) None
      else Some(broadcastNearest(pending.select("id", "x", "y"),
        feats.select(col("fx").as("x"), col("fy").as("y")), outCol))
    (resolved.toSeq ++ leftover.toSeq).reduce(_ unionByName _)
  }
}
