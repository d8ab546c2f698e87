package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Polygon coordinate modes — the reference CoordinateCalculator's
  * centroid / point-on-surface outputs for polygon inputs
  * (duckpipe/calculator/CoordinateCalculator.py:13-14: ST_Centroid,
  * ST_PointOnSurface). Vertex-array polygons (xs, ys), plain column
  * arithmetic in whole-stage codegen.
  */
object Polygons {

  /** Signed double area (shoelace) of an n-gon given as coordinate
    * array columns; terms in ring order so the oracle can mirror the
    * exact operation sequence. */
  def signedArea2(xs: Column, ys: Column, n: Int): Column =
    (0 until n).map { i =>
      val j = (i + 1) % n
      xs(i) * ys(j) - xs(j) * ys(i)
    }.reduce(_ + _)

  /** Area-weighted centroid of an n-gon (exact shoelace formula);
    * orientation-independent (the signed area cancels). Returns
    * struct(cx, cy). */
  def centroid(xs: Column, ys: Column, n: Int): Column = {
    val a2 = signedArea2(xs, ys, n)
    def weighted(v: Column): Column =
      (0 until n).map { i =>
        val j = (i + 1) % n
        (v(i) + v(j)) * (xs(i) * ys(j) - xs(j) * ys(i))
      }.reduce(_ + _) / (lit(3.0) * a2)
    struct(weighted(xs).as("cx"), weighted(ys).as("cy"))
  }

  /** Point-on-surface: the centroid when it falls inside (always, for
    * convex rings), else the first vertex — a guaranteed-on-boundary
    * fallback mirroring the spirit of ST_PointOnSurface's "some point
    * of the geometry". Uses the native point_in_polygon expression. */
  def pointOnSurface(df: DataFrame, xsCol: String, ysCol: String,
                     n: Int): DataFrame = {
    graft.GraftFunctions.register(df.sparkSession)
    val c = centroid(col(xsCol), col(ysCol), n)
    df.withColumn("_c", c)
      .withColumn("_in", call_function("point_in_polygon",
        col("_c.cx"), col("_c.cy"), col(xsCol), col(ysCol)))
      .withColumn("pos_x", when(col("_in"), col("_c.cx"))
        .otherwise(col(xsCol)(0)))
      .withColumn("pos_y", when(col("_in"), col("_c.cy"))
        .otherwise(col(ysCol)(0)))
      .drop("_c")
  }
}
