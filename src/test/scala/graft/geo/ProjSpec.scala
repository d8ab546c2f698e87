package graft.geo

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProjSpec extends SparkSpec {
  import spark.implicits._

  test("natural origin maps to false easting/northing exactly") {
    val row = Seq((127.5, 38.0)).toDF("lon", "lat")
      .select(Proj.forward(col("lon"), col("lat")).as("p"))
      .select("p.x", "p.y").head()
    assert(math.abs(row.getDouble(0) - 1000000.0) < 1e-6)
    assert(math.abs(row.getDouble(1) - 2000000.0) < 1e-6)
  }

  test("forward∘inverse round-trips to < 1e-9 degrees across Korea window") {
    val pts = Derive.wgsPoints(spark, sfDir)
    val rt = pts
      .withColumn("p", Proj.forward(col("lon"), col("lat")))
      .withColumn("g", Proj.inverse(col("p.x"), col("p.y")))
      .select(max(abs(col("g.lon") - col("lon"))).as("dlon"),
              max(abs(col("g.lat") - col("lat"))).as("dlat"))
      .head()
    assert(rt.getDouble(0) < 1e-9, s"lon err ${rt.getDouble(0)}")
    assert(rt.getDouble(1) < 1e-9, s"lat err ${rt.getDouble(1)}")
  }

  test("Snyder PP-1395 worked TM example (Clarke 1866, published coordinates)") {
    // Snyder, "Map Projections — A Working Manual", p. 269-270: Clarke
    // 1866 ellipsoid, lon0 = -75°, k0 = 0.9996, point 40°30'N 73°30'W
    // → x = 127,106.5 m east of CM, y = 4,484,124.4 m (published).
    val clarke = Proj.Tm(a = 6378206.4, f = 21622.6 / 6378206.4,
      lat0Deg = 0.0, lon0Deg = -75.0, k0 = 0.9996, fe = 0.0, fn = 0.0)
    val row = Seq((-73.5, 40.5)).toDF("lon", "lat")
      .select(Proj.forward(col("lon"), col("lat"), clarke).as("p"))
      .select("p.x", "p.y").head()
    assert(math.abs(row.getDouble(0) - 127106.5) < 0.5, s"x=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 4484124.4) < 0.5, s"y=${row.getDouble(1)}")
  }

  test("EPSG:32652 (UTM 52N): central-meridian identities + round-trip") {
    val utm = Proj.epsg(32652)
    // natural origin: equator × 129E → exactly (500000, 0)
    val o = Seq((129.0, 0.0)).toDF("lon", "lat")
      .select(Proj.forward(col("lon"), col("lat"), utm).as("p"))
      .select("p.x", "p.y").head()
    assert(math.abs(o.getDouble(0) - 500000.0) < 1e-6)
    assert(math.abs(o.getDouble(1)) < 1e-6)
    val rt = Derive.wgsPoints(spark, sfDir)
      .withColumn("p", Proj.forward(col("lon"), col("lat"), utm))
      .withColumn("g", Proj.inverse(col("p.x"), col("p.y"), utm))
      .select(max(abs(col("g.lon") - col("lon"))).as("dlon"),
              max(abs(col("g.lat") - col("lat"))).as("dlat"))
      .head()
    // Korea window reaches 3° from the zone-52 CM; the standard TM
    // series truncates at λ⁶, leaving ~3e-9 deg (≈0.3 mm) there
    assert(rt.getDouble(0) < 1e-8, s"lon err ${rt.getDouble(0)}")
    assert(rt.getDouble(1) < 1e-8, s"lat err ${rt.getDouble(1)}")
  }

  test("EPSG:5186 (Korea central belt): origin + round-trip") {
    val belt = Proj.epsg(5186)
    val o = Seq((127.0, 38.0)).toDF("lon", "lat")
      .select(Proj.forward(col("lon"), col("lat"), belt).as("p"))
      .select("p.x", "p.y").head()
    assert(math.abs(o.getDouble(0) - 200000.0) < 1e-6)
    assert(math.abs(o.getDouble(1) - 600000.0) < 1e-6)
    val rt = Derive.wgsPoints(spark, sfDir)
      .withColumn("p", Proj.forward(col("lon"), col("lat"), belt))
      .withColumn("g", Proj.inverse(col("p.x"), col("p.y"), belt))
      .select(max(abs(col("g.lon") - col("lon"))).as("dlon"),
              max(abs(col("g.lat") - col("lat"))).as("dlat"))
      .head()
    assert(rt.getDouble(0) < 1e-9)
    assert(rt.getDouble(1) < 1e-9)
  }

  test("fromXY ingest transforms any supported EPSG to the working CRS") {
    // same ground points expressed in 5186 must ingest to the same
    // 5179 coordinates as direct WGS84 ingest (sub-mm)
    val wgs = Derive.wgsPoints(spark, sfDir).limit(200)
    val in5186 = wgs.withColumn("p",
        Proj.forward(col("lon"), col("lat"), Proj.epsg(5186)))
      .select(col("id"), col("p.x").as("bx"), col("p.y").as("by"))
    val viaBelt = graft.api.GeoCalculator.fromXY(in5186, "bx", "by", 5186)
      .coordinates().resultLong
      .filter(col("varname").isin("TM_X", "TM_Y"))
    val direct = graft.api.GeoCalculator.fromWgs84(wgs, "lon", "lat")
      .coordinates().resultLong
      .filter(col("varname").isin("TM_X", "TM_Y"))
      .select(col("id"), col("varname"), col("value").as("dvalue"))
    val err = viaBelt.join(direct, Seq("id", "varname"))
      .select(max(abs(col("value") - col("dvalue")))).head().getDouble(0)
    assert(err < 1e-3, s"max 5186→5179 ingest error $err m")
    intercept[IllegalArgumentException](Proj.epsg(9999))
  }

  test("known EPSG:5179 fixture: Seoul City Hall vicinity") {
    // 126.9780 E, 37.5665 N → ~ (953,929 E, 1,952,050 N) in Korea 2000
    // Unified CS (public EPSG parameters; value cross-checked against
    // the projection series itself at mm level, sanity bounds here).
    val row = Seq((126.9780, 37.5665)).toDF("lon", "lat")
      .select(Proj.forward(col("lon"), col("lat")).as("p"))
      .select("p.x", "p.y").head()
    assert(math.abs(row.getDouble(0) - 953929.0) < 200.0)
    assert(math.abs(row.getDouble(1) - 1952050.0) < 200.0)
  }
}
