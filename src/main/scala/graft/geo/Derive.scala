package graft.geo

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic planar test geometries derived from the TPC-H-ish
  * tables (the test data carries no geometry columns). Pure int64
  * arithmetic, identical in Spark and in the DuckDB oracle SQL —
  * both sides derive bit-equal coordinates. The geo operators
  * themselves are generic over any (id, x, y[, …]) DataFrame; these
  * are just the test bindings.
  *
  * Coordinates land in a 10 km × 10 km square at 0.1 m resolution.
  */
object Derive {

  /** ~N points from customer keys. */
  def points(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").select(
      col("c_custkey").as("id"),
      ((col("c_custkey") * 7919) % 100000).cast("double") / 10.0 as "x",
      ((col("c_custkey") * 104729) % 100000).cast("double") / 10.0 as "y")

  val pointsSql: String = """
    SELECT c_custkey AS id,
           CAST((c_custkey * 7919) % 100000 AS DOUBLE) / 10.0 AS x,
           CAST((c_custkey * 104729) % 100000 AS DOUBLE) / 10.0 AS y
    FROM customer"""

  /** Small site set (airports/ports analogue) from supplier keys. */
  def sites(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "supplier").select(
      col("s_suppkey").as("id"),
      ((col("s_suppkey") * 7907 + 131) % 100000).cast("double") / 10.0 as "x",
      ((col("s_suppkey") * 104717 + 77) % 100000).cast("double") / 10.0 as "y")

  val sitesSql: String = """
    SELECT s_suppkey AS id,
           CAST((s_suppkey * 7907 + 131) % 100000 AS DOUBLE) / 10.0 AS x,
           CAST((s_suppkey * 104717 + 77) % 100000 AS DOUBLE) / 10.0 AS y
    FROM supplier"""

  /** Large feature set (roads/landuse/raster analogue) from part keys:
    * carries weight (length analogue), lanes, width, landuse code,
    * cell area, elevation, and an output-area key. */
  def feats(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part").select(
      col("p_partkey").as("fid"),
      ((col("p_partkey") * 7927 + 31) % 100000).cast("double") / 10.0 as "x",
      ((col("p_partkey") * 104723 + 997) % 100000).cast("double") / 10.0 as "y",
      (col("p_partkey") % 97 + 1).cast("double").as("weight"),
      (col("p_partkey") % 4 + 1).cast("double").as("lanes"),
      (col("p_partkey") % 7 + 1).cast("double").as("width"),
      (col("p_partkey") % 5).cast("int").as("code"),
      ((col("p_partkey") % 97 + 1) * 10).cast("double").as("area"),
      ((col("p_partkey") * 31) % 500).cast("double").as("elev"),
      (col("p_partkey") % 40).cast("long").as("key"))

  val featsSql: String = """
    SELECT p_partkey AS fid,
           CAST((p_partkey * 7927 + 31) % 100000 AS DOUBLE) / 10.0 AS x,
           CAST((p_partkey * 104723 + 997) % 100000 AS DOUBLE) / 10.0 AS y,
           CAST(p_partkey % 97 + 1 AS DOUBLE) AS weight,
           CAST(p_partkey % 4 + 1 AS DOUBLE) AS lanes,
           CAST(p_partkey % 7 + 1 AS DOUBLE) AS width,
           CAST(p_partkey % 5 AS INTEGER) AS code,
           CAST((p_partkey % 97 + 1) * 10 AS DOUBLE) AS area,
           CAST((p_partkey * 31) % 500 AS DOUBLE) AS elev,
           CAST(p_partkey % 40 AS BIGINT) AS key
    FROM part"""

  /** Road-segment analogue: endpoints up to ~28 m apart, anchored at
    * the feats coordinates. */
  def segments(s: SparkSession, dir: String): DataFrame =
    feats(s, dir).select(
      col("fid"),
      col("x").as("x1"), col("y").as("y1"),
      (col("x") + ((col("fid") * 53) % 200 - 100).cast("double") / 5.0).as("x2"),
      (col("y") + ((col("fid") * 59) % 200 - 100).cast("double") / 5.0).as("y2"))

  val segmentsSql: String = s"""
    SELECT fid, x AS x1, y AS y1,
           x + CAST((fid * 53) % 200 - 100 AS DOUBLE) / 5.0 AS x2,
           y + CAST((fid * 59) % 200 - 100 AS DOUBLE) / 5.0 AS y2
    FROM ($featsSql)"""

  /** 3-vertex polylines extending the segment analogue — the road
    * LINESTRING shape (a polyline is the unit real road tables ship;
    * duckpipe/calculator/RoadLLWCalculator.py:73-80 reads road
    * `geometry` WKT). Vertex 3 extends the segment by the same
    * bounded deterministic walk. */
  def polylines(s: SparkSession, dir: String): DataFrame =
    segments(s, dir).select(
      col("fid"),
      array(col("x1"), col("x2"),
        col("x2") + ((col("fid") * 61) % 200 - 100).cast("double") / 5.0)
        .as("xs"),
      array(col("y1"), col("y2"),
        col("y2") + ((col("fid") * 67) % 200 - 100).cast("double") / 5.0)
        .as("ys"))

  val polylinesSql: String = s"""
    SELECT fid,
           [x1, x2, x2 + CAST((fid * 61) % 200 - 100 AS DOUBLE) / 5.0] AS xs,
           [y1, y2, y2 + CAST((fid * 67) % 200 - 100 AS DOUBLE) / 5.0] AS ys
    FROM ($segmentsSql)"""

  /** Triangle polygons (vertex arrays) anchored at feats coordinates —
    * polygon analogue of the landuse/OA tables. */
  def triangles(s: SparkSession, dir: String): DataFrame =
    feats(s, dir).select(
      col("fid").as("poly_id"),
      array(col("x"), col("x") + 400.0, col("x") + ((col("fid") % 7) * 100).cast("double"))
        .as("xs"),
      array(col("y"), col("y") + ((col("fid") % 5) * 100).cast("double"), col("y") + 400.0)
        .as("ys"))

  val trianglesSql: String = s"""
    SELECT fid AS poly_id,
           [x, x + 400.0, x + CAST((fid % 7) * 100 AS DOUBLE)] AS xs,
           [y, y + CAST((fid % 5) * 100 AS DOUBLE), y + 400.0] AS ys
    FROM ($featsSql)"""

  /** Holed polygons (nested ring arrays): each triangle with a hole =
    * the same triangle shrunk halfway toward its centroid (strictly
    * interior for any non-degenerate triangle). Real landuse/OA
    * polygons carry holes (LanduseCalculator.py:99-157). Ring 1 =
    * outer, ring 2 = hole; pure arithmetic, SQL-mirrored. */
  def holedTriangles(s: SparkSession, dir: String): DataFrame =
    triangles(s, dir).select(
      col("poly_id"),
      ((col("xs")(0) + col("xs")(1) + col("xs")(2)) / 3.0).as("cx0"),
      ((col("ys")(0) + col("ys")(1) + col("ys")(2)) / 3.0).as("cy0"),
      col("xs"), col("ys"))
      .select(col("poly_id"),
        array(col("xs"),
          transform(col("xs"), v => col("cx0") + (v - col("cx0")) / 2.0))
          .as("rxs"),
        array(col("ys"),
          transform(col("ys"), v => col("cy0") + (v - col("cy0")) / 2.0))
          .as("rys"))

  val holedTrianglesSql: String = s"""
    SELECT poly_id,
           [xs, list_transform(xs, v -> cx0 + (v - cx0) / 2.0)] AS rxs,
           [ys, list_transform(ys, v -> cy0 + (v - cy0) / 2.0)] AS rys
    FROM (
      SELECT poly_id,
             (xs[1] + xs[2] + xs[3]) / 3.0 AS cx0,
             (ys[1] + ys[2] + ys[3]) / 3.0 AS cy0,
             xs, ys
      FROM ($trianglesSql))"""

  /** WGS84 lon/lat in a Korea-sized window for projection tests. */
  def wgsPoints(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").select(
      col("c_custkey").as("id"),
      (lit(126.0) + (col("c_custkey") % 1000).cast("double") / 250.0).as("lon"),
      (lit(34.0) + ((col("c_custkey") * 7) % 1000).cast("double") / 250.0).as("lat"))

  val wgsPointsSql: String = """
    SELECT c_custkey AS id,
           126.0 + CAST(c_custkey % 1000 AS DOUBLE) / 250.0 AS lon,
           34.0 + CAST((c_custkey * 7) % 1000 AS DOUBLE) / 250.0 AS lat
    FROM customer"""
}
