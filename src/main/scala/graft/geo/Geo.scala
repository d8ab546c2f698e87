package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar-geometry column helpers shared by the geo operators.
  *
  * graft's geometry model (SURVEY.md §3): points/features are rows with
  * `x`,`y` DOUBLE columns in a projected CRS (meters), mirroring the
  * reference's use of EPSG:5179 planar coordinates for every
  * ST_Distance/ST_Area computation (reference duckpipe/common.py:6).
  * Everything here stays inside whole-stage codegen — plain column
  * arithmetic, no UDFs.
  */
object Geo {
  /** Squared euclidean distance — comparisons use d² against r² so the
    * hot path never pays a sqrt (and stays FP-exact cross-engine). */
  def dist2(px: Column, py: Column, fx: Column, fy: Column): Column =
    (px - fx) * (px - fx) + (py - fy) * (py - fy)

  def dist(px: Column, py: Column, fx: Column, fy: Column): Column =
    sqrt(dist2(px, py, fx, fy))

  /** Point-to-segment distance via the clamped projection
    * `t = ((p−a)·(b−a))/|b−a|²` onto segment a→b, t clamped to [0,1] —
    * the exact euclidean distance to a LINESTRING edge, i.e. the
    * reference's `MIN(ST_Distance(point, line_geometry))` semantics for
    * LINE features (reference duckpipe/calculator/
    * RoadDistanceCalculator.py:46-60; same template in RiverDistance/
    * CoastlineDistance/MainRoadDistance). Pure IEEE column arithmetic
    * (+,−,×,÷,sqrt, greatest/least) — bit-replayable in the oracle and
    * fully inside whole-stage codegen. Degenerate segments (a == b)
    * take tc = 0, collapsing to the vertex distance without dividing
    * by zero. */
  def segDist(px: Column, py: Column,
              ax: Column, ay: Column, bx: Column, by: Column): Column = {
    val dx = bx - ax
    val dy = by - ay
    val len2 = dx * dx + dy * dy
    val tc = when(len2 === 0.0, lit(0.0))
      .otherwise(greatest(lit(0.0), least(lit(1.0),
        ((px - ax) * dx + (py - ay) * dy) / len2)))
    dist(px, py, ax + tc * dx, ay + tc * dy)
  }

  /** Spread a compact input across the cluster BEFORE a fan-out stage
    * (offset explode, shingle explode, multi-plane folds). Scans of
    * small files arrive as one partition; exploding 9–64× inside that
    * one task serializes the whole operator. Shuffling the compact rows
    * first is cheap and restores full parallelism — at scale, inputs
    * with many splits are unaffected in spirit (the shuffle is of the
    * pre-explosion, small representation).
    */
  def fanout(df: DataFrame): DataFrame = graft.Tables.fanout(df)

  /** Grid-cell id for spatial bucketing at `cellSize` meters. */
  def cellOf(x: Column, cellSize: Double): Column =
    floor(x / lit(cellSize)).cast("long")

  /** Pack a (cx, cy) cell pair into one join key. Cells are offset so
    * negative coordinates stay distinct; 2^21 cells per axis. */
  def cellKey(cx: Column, cy: Column): Column =
    (cx + lit(1L << 20)) * lit(1L << 21) + (cy + lit(1L << 20))
}
