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
  * Physical strategies, chosen by the caller:
  *
  *  - `broadcastNearest` / `broadcastKnn` — feature set is small
  *    (airports, ports…): broadcast it, partial-aggregate per point on
  *    the map side. At 100 TB of points this is a single pass with no
  *    point-table shuffle beyond the final hash aggregate.
  *
  *  - `gridNearest` / `gridKnn` — candidate-pruned: bucket features
  *    into cells of `cellSize` meters, join each point to the cells
  *    within a Chebyshev ring (hash join on a packed cell key — never a
  *    cross product), resolve points whose answer is provably final,
  *    widen the ring for the rest. The ring ladder is DECLARATIVE — a
  *    fixed `rings` schedule composed into ONE plan (union of
  *    stages + terminal exact fallback for the residual) — so there is
  *    no driver loop, no per-round action, and Catalyst compiles the
  *    whole thing once. Residuals shrink geometrically per stage, and
  *    AQE's empty-relation propagation eliminates the later stages and
  *    the fallback when everything resolves early (the common case).
  *
  * Ring guarantee: a point in cell c joined to all cells within
  * Chebyshev distance `ring` has seen every feature closer than
  * ring·cellSize (any unsearched feature is strictly farther), so a
  * min — or a k-th distance — ≤ ring·cellSize is final.
  *
  * Sizing `rings`: the last ring should cover the domain's largest
  * feature-free radius at the chosen cellSize; the terminal fallback
  * broadcasts the feature table, which is correct for any input but
  * only cheap when the residual is small — make the ladder long enough
  * that it is (then the fallback sees ~0 probe rows and AQE elides it).
  * Keep the ladder SHORT (≤2–3 stages of geometrically growing rings):
  * because the declarative left-anti `pending` chain is uncached, each
  * later stage re-evaluates every earlier stage's candidate join, so
  * total work grows roughly quadratically with `rings.length`. Wider
  * rings per stage are cheaper than more stages; if a long ladder is
  * ever genuinely needed, persist/localCheckpoint the per-stage done
  * ids instead of extending the schedule.
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

  /** k nearest features per point (id, rank, fid, distance) via the
    * full broadcast candidate set — bounded top-k aggregation, not a
    * window, so the |points|×|features| rows never shuffle: the
    * per-point top-k is folded map-side by partial collect_list+slice.
    * Only for feature tables small enough to broadcast; the grid
    * variant below is the scale path and the default binding. */
  def broadcastKnn(points: DataFrame, features: DataFrame, k: Int): DataFrame = {
    val f = broadcast(features.select(
      col("id").as("fid"), col("x").as("fx"), col("y").as("fy")))
    topK(points.join(f)
      .select(col("id"), col("fid"),
        Geo.dist(col("x"), col("y"), col("fx"), col("fy")).as("distance")), k)
  }

  /** (id, fid, distance) candidates → (id, rank, fid, distance) top-k
    * per id, ranked by (distance, fid). One aggregation, map-side
    * partials; no window over the full candidate set. */
  private def topK(cands: DataFrame, k: Int): DataFrame =
    cands.groupBy("id")
      .agg(slice(array_sort(collect_list(struct(col("distance"), col("fid")))),
        1, k).as("top"))
      .select(col("id"), posexplode(col("top")))
      .select(col("id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.fid").as("fid"), col("col.distance").as("distance"))

  /** k nearest features per point, grid-pruned (see object doc): ring
    * ladder of candidate joins in one declarative plan; a point is
    * final at a ring once it has k candidates with k-th distance ≤
    * ring·cellSize; the residual falls through to the exact broadcast
    * path (empty in the common case — AQE elides it).
    */
  def gridKnn(points: DataFrame, features: DataFrame, k: Int,
              cellSize: Double, rings: Seq[Long] = Seq(1L, 8L)): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    val feats = features
      .select(col("id").as("fid"), col("x").as("fx"), col("y").as("fy"))
      .withColumn("ck", Geo.cellKey(
        Geo.cellOf(col("fx"), cellSize), Geo.cellOf(col("fy"), cellSize)))

    val pts0 = Geo.fanout(points.select("id", "x", "y"))
      .withColumn("cx", Geo.cellOf(col("x"), cellSize))
      .withColumn("cy", Geo.cellOf(col("y"), cellSize))

    var pending = pts0
    val stages = rings.map { ring =>
      val offsets = (-ring to ring)
        .flatMap(dx => (-ring to ring).map(dy => (dx, dy)))
        .toDF("dx", "dy")
      val cands = pending
        .join(broadcast(offsets))
        .withColumn("ck", Geo.cellKey(col("cx") + col("dx"), col("cy") + col("dy")))
        .join(feats, Seq("ck"))
        .select(col("id"), col("fid"),
          Geo.dist(col("x"), col("y"), col("fx"), col("fy")).as("distance"))
      val agged = cands.groupBy("id").agg(
        slice(array_sort(collect_list(struct(col("distance"), col("fid")))),
          1, k).as("top"),
        count(lit(1)).as("nc"))
      val done = agged
        .filter(col("nc") >= k &&
          element_at(col("top"), k)("distance") <= lit(ring.toDouble * cellSize))
        .select(col("id"), posexplode(col("top")))
        .select(col("id"), (col("pos") + 1).cast("int").as("rank"),
          col("col.fid").as("fid"), col("col.distance").as("distance"))
      pending = pending.join(done.select("id"), Seq("id"), "left_anti")
      done
    }
    val fallback = broadcastKnn(pending.select("id", "x", "y"),
      feats.select(col("fid").as("id"), col("fx").as("x"), col("fy").as("y")), k)
    (stages :+ fallback).reduce(_ unionByName _)
  }

  /** Nearest-SEGMENT distance, grid-pruned — the LINE-feature leg of
    * the nearest family (the reference's road/river/coastline/MDL
    * calculators are `MIN(ST_Distance(point, LINESTRING))`, reference
    * duckpipe/calculator/RoadDistanceCalculator.py:46-60 — distance to
    * the geometry, NOT to its vertices). Distance per candidate is the
    * clamped projection (`Geo.segDist`).
    *
    * Cell registration: a segment's bbox can span cells, so each
    * segment is exploded into EVERY cell its bbox overlaps
    * (`sequence` over the floor-div cell range per axis — bounded by
    * ceil(len/cellSize)+1 cells per axis; size cells ≳ the typical
    * segment length so the blow-up stays ≤4×).
    *
    * Ring guarantee, re-argued for segments: if a segment was NOT seen
    * within Chebyshev ring r of the point's cell, then every cell its
    * bbox overlaps lies beyond the ring; every point q ON the segment
    * lies inside the bbox, hence in some cell beyond the ring, hence
    * differs from p by > r·cellSize on at least one axis. So a
    * candidate min ≤ r·cellSize is final. A segment overlapping both a
    * searched and an unsearched cell IS seen (it registered in the
    * searched cell); duplicate sightings across cells are harmless
    * under MIN.
    *
    * Segments schema: (x1, y1, x2, y2) + anything.
    */
  def gridNearestSegments(points: DataFrame, segments: DataFrame,
                          cellSize: Double, outCol: String = "distance",
                          rings: Seq[Long] = Seq(1L, 8L)): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    val segCells = segments
      .select(col("x1"), col("y1"), col("x2"), col("y2"))
      .withColumn("scx", explode(sequence(
        Geo.cellOf(least(col("x1"), col("x2")), cellSize),
        Geo.cellOf(greatest(col("x1"), col("x2")), cellSize))))
      .withColumn("scy", explode(sequence(
        Geo.cellOf(least(col("y1"), col("y2")), cellSize),
        Geo.cellOf(greatest(col("y1"), col("y2")), cellSize))))
      .withColumn("ck", Geo.cellKey(col("scx"), col("scy")))
      .drop("scx", "scy")

    val pts0 = Geo.fanout(points.select("id", "x", "y"))
      .withColumn("cx", Geo.cellOf(col("x"), cellSize))
      .withColumn("cy", Geo.cellOf(col("y"), cellSize))

    val sd = Geo.segDist(col("x"), col("y"),
      col("x1"), col("y1"), col("x2"), col("y2"))

    var pending = pts0
    val stages = rings.map { ring =>
      val offsets = (-ring to ring)
        .flatMap(dx => (-ring to ring).map(dy => (dx, dy)))
        .toDF("dx", "dy")
      val done = pending
        .join(broadcast(offsets))
        .withColumn("ck", Geo.cellKey(col("cx") + col("dx"), col("cy") + col("dy")))
        .join(segCells, Seq("ck"))
        .groupBy("id")
        .agg(min(sd).as(outCol))
        .filter(col(outCol) <= lit(ring.toDouble * cellSize))
      pending = pending.join(done.select("id"), Seq("id"), "left_anti")
      done
    }
    val fallback = pending.select("id", "x", "y")
      .join(broadcast(segments.select("x1", "y1", "x2", "y2")))
      .groupBy("id")
      .agg(min(sd).as(outCol))
    (stages :+ fallback).reduce(_ unionByName _)
  }

  def gridNearest(points: DataFrame, features: DataFrame,
                  cellSize: Double, outCol: String = "distance",
                  rings: Seq[Long] = Seq(1L, 8L)): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    val feats = features
      .select(col("x").as("fx"), col("y").as("fy"))
      .withColumn("ck", Geo.cellKey(
        Geo.cellOf(col("fx"), cellSize), Geo.cellOf(col("fy"), cellSize)))

    val pts0 = Geo.fanout(points.select("id", "x", "y"))
      .withColumn("cx", Geo.cellOf(col("x"), cellSize))
      .withColumn("cy", Geo.cellOf(col("y"), cellSize))

    var pending = pts0
    val stages = rings.map { ring =>
      val offsets = (-ring to ring)
        .flatMap(dx => (-ring to ring).map(dy => (dx, dy)))
        .toDF("dx", "dy")
      val cands = pending
        .join(broadcast(offsets))
        .withColumn("ck", Geo.cellKey(col("cx") + col("dx"), col("cy") + col("dy")))
        .join(feats, Seq("ck"))
        .groupBy("id")
        .agg(min(Geo.dist(col("x"), col("y"), col("fx"), col("fy"))).as(outCol))
      // A min found at d is final iff no unsearched cell could hold a
      // closer feature: anything outside the ring is > ring*cellSize away.
      val done = cands.filter(col(outCol) <= lit(ring.toDouble * cellSize))
      pending = pending.join(done.select("id"), Seq("id"), "left_anti")
      done
    }
    val fallback = broadcastNearest(pending.select("id", "x", "y"),
      feats.select(col("fx").as("x"), col("fy").as("y")), outCol)
    (stages :+ fallback).reduce(_ unionByName _)
  }
}
