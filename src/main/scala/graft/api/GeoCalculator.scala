package graft.api

import graft.geo.{AreaClip, BufferStats, Geo, NearestDistance, Proj, RelativeElevation}
import graft.ops.LongWide
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fluent pipeline façade — the graft equivalent of the reference's
  * `Calculator` chain (duckpipe/core.py: add_point_with_table →
  * chunk_* → calculate_* → get_result). Each calculate_* appends
  * long-form rows (id, varname, year, value); `resultWide` pivots to
  * one column per varname, like get_result(pivot=True).
  *
  * Differences by design (SURVEY.md §5): no chunking methods — Spark
  * partitioning replaces driver-side chunk lists (use
  * geo.SpatialCurve.partitionBySpace when locality matters); feature
  * sets are DataFrames, not data_dir paths, so any source Spark reads
  * can feed a calculator. Everything stays lazy until the caller acts.
  *
  * Varname formats follow the reference macros, e.g. 'D_Airport'
  * (AirportDistanceCalculator.py:13), 'Road_L_0500'
  * (RoadLLWCalculator.py:12), 'LS2_0500_a' (LanduseCalculator.py:13).
  */
final class GeoCalculator private (
    points: DataFrame,
    acc: Vector[DataFrame]) {

  private def append(df: DataFrame): GeoCalculator =
    new GeoCalculator(points, acc :+ df)

  private def longForm(df: DataFrame, varname: Column, year: Option[Int],
                       value: Column): DataFrame =
    df.select(col("id"), varname.as("varname"),
      year.map(y => lit(y)).getOrElse(lit(null)).cast("int").as("year"),
      value.cast("double").as("value"))

  /** N varnames off ONE wide frame in ONE pass: explode an inline
    * (varname, value) array instead of unioning N projections of the
    * same subplan. A union of projections re-executes the underlying
    * join/aggregation once per branch (exchange reuse only sometimes
    * rescues it); the explode computes the wide frame exactly once —
    * this is what keeps the fluent pipeline's cost at "one pass per
    * calculator", not "one pass per varname". */
  private def longFormMulti(df: DataFrame, year: Option[Int],
                            pairs: Seq[(Column, Column)]): DataFrame =
    df.select(col("id"),
        explode(array(pairs.map { case (n, v) =>
          struct(n.cast("string").as("varname"),
            v.cast("double").as("value"))
        }: _*)).as("_e"))
      .select(col("id"), col("_e.varname").as("varname"),
        year.map(y => lit(y)).getOrElse(lit(null)).cast("int").as("year"),
        col("_e.value").as("value"))

  /** Min distance to a feature set; broadcast when small, grid-join when
    * `gridCell` is given. */
  def nearestDistance(features: DataFrame, varname: String,
                      year: Option[Int] = None,
                      gridCell: Option[Double] = None): GeoCalculator = {
    val d = gridCell match {
      case Some(cell) => NearestDistance.gridNearest(points, features, cell)
      case None       => NearestDistance.broadcastNearest(points, features)
    }
    append(longForm(d, lit(varname), year, col("distance")))
  }

  /** L / LL / LLW sums within each radius (reference Road LLW). */
  def bufferLineStats(features: DataFrame, radii: Seq[Double],
                      prefix: String = "Road",
                      year: Option[Int] = None): GeoCalculator = {
    val stats = Seq(
      "L" -> col("weight"),
      "LL" -> (col("weight") * col("lanes")),
      "LLW" -> (col("weight") * col("lanes") * col("width")))
    val wide = BufferStats.lineStats(points, features, radii, stats)
    append(longFormMulti(wide, year, Seq("L", "LL", "LLW").map { st =>
      concat(lit(s"${prefix}_${st}_"),
        lpad(col("radius").cast("int").cast("string"), 4, "0")) -> col(st)
    }))
  }

  /** Fused bufferLineStats + landuseAreaRatio: one neighbor join and
    * one per-(id, code) aggregation feed both varname families —
    * the single-scan version of the reference's two separate
    * calculators (identical outputs; see BufferStats.lineAndAreaStats
    * for the order-exactness argument). */
  def bufferLineAndLanduse(features: DataFrame, radii: Seq[Double],
                           prefix: String = "Road",
                           year: Option[Int] = None): GeoCalculator = {
    val stats = Seq(
      "L" -> col("weight"),
      "LL" -> (col("weight") * col("lanes")),
      "LLW" -> (col("weight") * col("lanes") * col("width")))
    val (lineWide, areaWide) =
      BufferStats.lineAndAreaStats(points, features, radii, stats)
    val lineLong = longFormMulti(lineWide, year,
      Seq("L", "LL", "LLW").map { st =>
        concat(lit(s"${prefix}_${st}_"),
          lpad(col("radius").cast("int").cast("string"), 4, "0")) -> col(st)
      })
    val areaLong = longFormMulti(areaWide, year,
      Seq("a" -> col("a"), "p" -> col("p")).map { case (st, c) =>
        concat(lit("LS"), col("code").cast("string"), lit("_"),
          lpad(col("radius").cast("int").cast("string"), 4, "0"),
          lit(s"_$st")) -> c
      })
    append(lineLong).append(areaLong)
  }

  /** Per-landuse-code area + proportion within each radius. */
  def landuseAreaRatio(features: DataFrame, radii: Seq[Double],
                       year: Option[Int] = None): GeoCalculator = {
    val ar = BufferStats.areaRatio(points, features, radii)
    append(longFormMulti(ar, year,
      Seq("a" -> col("a"), "p" -> col("p")).map { case (st, c) =>
        concat(lit("LS"), col("code").cast("string"), lit("_"),
          lpad(col("radius").cast("int").cast("string"), 4, "0"),
          lit(s"_$st")) -> c
      }))
  }

  /** EXACT buffer∩polygon areas via the clipped_polygon_area native
    * expression — the reference LanduseCalculator's precise
    * ST_Area(ST_Intersection(...)) path. Polys: (poly_id, xs, ys);
    * `maxVertexDist` bounds anchor-to-vertex span for pruning. */
  def landuseAreaExact(polys: DataFrame, radii: Seq[Double],
                       maxVertexDist: Double,
                       prefix: String = "AreaX"): GeoCalculator = {
    val ae = AreaClip.areaExact(points, polys, radii, maxVertexDist)
    append(longForm(ae,
      concat(lit(s"${prefix}_"),
        lpad(col("radius").cast("int").cast("string"), 4, "0")),
      None, col("A")))
  }

  /** Donut-ring relative elevation + reference elevation. */
  def relativeElevation(cells: DataFrame, refRadius: Double,
                        radii: Seq[Double], thickness: Double = 30.0,
                        prefix: String = "Alt_k"): GeoCalculator = {
    val re = RelativeElevation.compute(points, cells, refRadius, radii, thickness)
    val stats = radii.flatMap(r => Seq(
      s"above20_${r.toInt}", s"below20_${r.toInt}",
      s"above50_${r.toInt}", s"below50_${r.toInt}"))
    append(longFormMulti(re, None,
      stats.map(stc => (lit(s"${prefix}_$stc"): Column) -> col(stc)) :+
        ((lit(s"${prefix}_ref"): Column) -> col("ref_elev"))))
  }

  /** Output-area intersection ratios, cached long-form under varname
    * 'OA_<key>_<radius>' (reference calculate_intersecting_oa). */
  def intersectingOa(features: DataFrame, radii: Seq[Double]): GeoCalculator = {
    val ir = BufferStats.intersectRatio(points, features, radii)
    append(longForm(ir,
      concat(lit("OA_"), col("key").cast("string"), lit("_"),
        lpad(col("radius").cast("int").cast("string"), 4, "0")),
      None, col("ratio")))
  }

  /** Projected + geographic coordinates of each point (points assumed
    * already in the projected CRS, like the reference post-ingest). */
  def coordinates(): GeoCalculator = {
    val inv = points.withColumn("_g", Proj.inverse(col("x"), col("y")))
    append(longFormMulti(inv, None, Seq(
      ("TM_X", col("x")), ("TM_Y", col("y")),
      ("WGS_X", col("_g.lon")), ("WGS_Y", col("_g.lat")))
      .map { case (n, c) => (lit(n): Column) -> c }))
  }

  /** Long-form result (id, varname, year, value). */
  def resultLong: DataFrame = acc.reduce(_ unionByName _)

  /** Wide result: one column per varname, merged back onto the
    * original point attributes (reference get_result pivot=True). */
  def resultWide(varnames: Seq[String]): DataFrame =
    points.join(LongWide.pivotWide(resultLong, varnames), Seq("id"), "left")
}

object GeoCalculator {
  /** Entry point — reference add_point_with_table. `points` must carry
    * (id, x, y); extra columns ride along into resultWide. */
  def apply(points: DataFrame): GeoCalculator =
    new GeoCalculator(points, Vector.empty)

  /** Ingest lon/lat in WGS84 and project to the working CRS — the
    * reference's ST_Transform-on-ingest (core.py:140-152). */
  def fromWgs84(df: DataFrame, lonCol: String, latCol: String): GeoCalculator = {
    val p = df.withColumn("_p", Proj.forward(col(lonCol), col(latCol)))
      .withColumn("x", col("_p.x")).withColumn("y", col("_p.y"))
      .drop("_p")
    new GeoCalculator(p, Vector.empty)
  }

  /** Full add_point_with_table analogue: ingest x/y columns in ANY
    * supported EPSG (reference core.py:118-152 — epsg param) and
    * transform to the EPSG:5179 working CRS. 4326 means the columns
    * are lon/lat; projected codes go through the geographic pivot. */
  def fromXY(df: DataFrame, xCol: String, yCol: String,
             epsg: Int): GeoCalculator =
    if (epsg == 4326) fromWgs84(df, xCol, yCol)
    else {
      val p = df.withColumn("_p",
          Proj.transform(col(xCol), col(yCol), Proj.epsg(epsg), Proj.Epsg5179))
        .withColumn("x", col("_p.x")).withColumn("y", col("_p.y"))
        .drop("_p")
      new GeoCalculator(p, Vector.empty)
    }

  /** Ingest POINT WKT text in any supported EPSG — the reference's
    * WKT registration path (core.py:138-152 stores ST_AsText and
    * reprojects on ingest). Malformed WKT fails loudly (geo.Wkt). */
  def fromWkt(df: DataFrame, wktCol: String, epsg: Int = 5179): GeoCalculator =
    new GeoCalculator(graft.geo.Wkt.points(df, wktCol, epsg), Vector.empty)
}
