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

  test("Snyder PP-1395 worked LCC example (Clarke 1866, published coordinates)") {
    // Snyder p. 296-297 (ellipsoidal Lambert conformal conic): Clarke
    // 1866, φ1=33°, φ2=45°, φ0=23°, λ0=-96°, point 35°N 75°W →
    // x = 1,894,410.9 m, y = 1,564,649.5 m (published).
    val clarke = Proj.Lcc(a = 6378206.4,
      f = 1 - math.sqrt(1 - 0.00676866), // Clarke 1866 via e²
      lat1Deg = 33.0, lat2Deg = 45.0, lat0Deg = 23.0, lon0Deg = -96.0,
      fe = 0.0, fn = 0.0)
    val row = Seq((-75.0, 35.0)).toDF("lon", "lat")
      .select(Proj.forwardLcc(col("lon"), col("lat"), clarke).as("p"))
      .select("p.x", "p.y").head()
    assert(math.abs(row.getDouble(0) - 1894410.9) < 0.5, s"x=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 1564649.5) < 0.5, s"y=${row.getDouble(1)}")
  }

  test("Snyder PP-1395 worked Albers example (Clarke 1866, published coordinates)") {
    // Snyder p. 292 (ellipsoidal Albers equal-area conic): Clarke 1866,
    // φ1=29.5°, φ2=45.5°, φ0=23°, λ0=-96°, point 35°N 75°W →
    // x = 1,885,472.7 m, y = 1,535,925.0 m (published).
    val clarke = Proj.Aea(a = 6378206.4,
      f = 1 - math.sqrt(1 - 0.00676866),
      lat1Deg = 29.5, lat2Deg = 45.5, lat0Deg = 23.0, lon0Deg = -96.0,
      fe = 0.0, fn = 0.0)
    val row = Seq((-75.0, 35.0)).toDF("lon", "lat")
      .select(Proj.forwardAea(col("lon"), col("lat"), clarke).as("p"))
      .select("p.x", "p.y").head()
    assert(math.abs(row.getDouble(0) - 1885472.7) < 0.5, s"x=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 1535925.0) < 0.5, s"y=${row.getDouble(1)}")
  }

  test("conic CRSs: scale = 1 on standard parallels, round-trip < 1e-8 deg") {
    for (code <- Seq(2154, 3034, 5070)) {
      val crs = Proj.epsg(code)
      val (lat1, lat2, lon0) = crs match {
        case l: Proj.Lcc => (l.lat1Deg, l.lat2Deg, l.lon0Deg)
        case a: Proj.Aea => (a.lat1Deg, a.lat2Deg, a.lon0Deg)
        case _ => fail(s"EPSG:$code should be conic")
      }
      // distance along a standard parallel must project at scale 1
      // (both conics hold their standard parallels true); a parallel
      // midway between them must NOT (the conic distortion signature)
      val dl = 0.01
      def parallelScale(latDeg: Double): Double = {
        val r = Seq((lon0, latDeg), (lon0 + dl, latDeg)).toDF("lon", "lat")
          .select(Proj.fwd(crs, col("lon"), col("lat")).as("p"))
          .select("p.x", "p.y").collect()
        val proj = math.hypot(r(1).getDouble(0) - r(0).getDouble(0),
          r(1).getDouble(1) - r(0).getDouble(1))
        val phi = math.toRadians(latDeg)
        val e2 = 2 * (1.0 / 298.257222101) - math.pow(1.0 / 298.257222101, 2)
        val trueDist = 6378137.0 * math.cos(phi) /
          math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi)) *
          math.toRadians(dl)
        proj / trueDist
      }
      assert(math.abs(parallelScale(lat1) - 1.0) < 1e-6,
        s"EPSG:$code scale at lat1")
      assert(math.abs(parallelScale(lat2) - 1.0) < 1e-6,
        s"EPSG:$code scale at lat2")
      assert(math.abs(parallelScale((lat1 + lat2) / 2) - 1.0) > 1e-5,
        s"EPSG:$code should distort between the parallels")
      // round-trip identity across a ±2° window
      val mid = (lat1 + lat2) / 2
      val pts = (0 until 50).map(i =>
        (lon0 - 2.0 + i * 0.08, mid - 1.0 + (i * 7 % 50) * 0.04))
        .toDF("lon", "lat")
      val rt = pts
        .withColumn("p", Proj.fwd(crs, col("lon"), col("lat")))
        .withColumn("g", Proj.inv(crs, col("p.x"), col("p.y")))
        .select(max(abs(col("g.lon") - col("lon"))).as("dlon"),
          max(abs(col("g.lat") - col("lat"))).as("dlat"))
        .head()
      assert(rt.getDouble(0) < 1e-8, s"EPSG:$code lon err ${rt.getDouble(0)}")
      assert(rt.getDouble(1) < 1e-8, s"EPSG:$code lat err ${rt.getDouble(1)}")
    }
  }

  test("EPSG:32652 (UTM 52N): central-meridian identities + round-trip") {
    val utm = Proj.epsg(32652).asInstanceOf[Proj.Tm]
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
    val belt = Proj.epsg(5186).asInstanceOf[Proj.Tm]
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
        Proj.fwd(Proj.epsg(5186), col("lon"), col("lat")))
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
    // unknown EPSG fails loudly AND the error lists the supported
    // registry, so a user with an exotic CRS knows what to reproject to
    val e = intercept[IllegalArgumentException](Proj.epsg(9999))
    assert(e.getMessage.contains("EPSG:9999"))
    for (family <- Seq("5179", "32601-32660", "2154", "5070", "3031",
        "3413"))
      assert(e.getMessage.contains(family), s"registry entry $family missing")
  }

  test("Snyder PP-1395 worked polar stereographic example " +
    "(International 1924, published coordinates)") {
    // Snyder p. 315 (ellipsoidal stereographic, south polar aspect):
    // International ellipsoid, φc = 71°S, λ0 = 100°W, point φ = 75°S,
    // λ = 150°E → x = -1,540,033.6 m, y = -560,526.4 m
    val ps = Proj.Ps(a = 6378388.0, f = 1 / 297.0,
      latFDeg = -71.0, lon0Deg = -100.0, north = false, fe = 0.0, fn = 0.0)
    val row = Seq((150.0, -75.0)).toDF("lon", "lat")
      .select(Proj.forwardPs(col("lon"), col("lat"), ps).as("p"))
      .select("p.x", "p.y").head()
    assert(math.abs(row.getDouble(0) - -1540033.6) < 0.5,
      s"x=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - -560526.4) < 0.5,
      s"y=${row.getDouble(1)}")
  }

  test("polar stereographic 3031/3413: pole at origin, scale = 1 on " +
    "the standard parallel, round-trip < 1e-9 deg") {
    for ((code, poleLat, latF, window) <- Seq(
        (3031, -90.0, -71.0, (100.0, 140.0, -85.0, -65.0)),
        (3413, 90.0, 70.0, (-90.0, 0.0, 60.0, 88.0)))) {
      val crs = Proj.epsg(code).asInstanceOf[Proj.Ps]
      // the pole projects exactly onto (FE, FN)
      val pole = Seq((0.0, poleLat)).toDF("lon", "lat")
        .select(Proj.fwd(crs, col("lon"), col("lat")).as("p"))
        .select("p.x", "p.y").head()
      assert(math.abs(pole.getDouble(0)) < 1e-6)
      assert(math.abs(pole.getDouble(1)) < 1e-6)
      // local scale on the standard parallel = 1 (measure along the
      // parallel: project two nearby longitudes, compare chord to arc)
      val dLon = 1e-4
      val two = Seq((10.0, latF), (10.0 + dLon, latF)).toDF("lon", "lat")
        .select(Proj.fwd(crs, col("lon"), col("lat")).as("p"))
        .select("p.x", "p.y").collect()
      val chord = math.hypot(two(1).getDouble(0) - two(0).getDouble(0),
        two(1).getDouble(1) - two(0).getDouble(1))
      val phiF = math.toRadians(latF)
      val arc = math.toRadians(dLon) * crs.a * math.cos(phiF) /
        math.sqrt(1 - crs.e2 * math.sin(phiF) * math.sin(phiF))
      assert(math.abs(chord / arc - 1.0) < 1e-6,
        s"EPSG:$code standard-parallel scale ${chord / arc}")
      // round-trip across the working window
      val (lo, hi, la, lb) = window
      val pts = (0 until 400).map { i =>
        (lo + (hi - lo) * (i % 20) / 19.0, la + (lb - la) * (i / 20) / 19.0)
      }.toDF("lon", "lat")
      val rt = pts
        .withColumn("p", Proj.fwd(crs, col("lon"), col("lat")))
        .withColumn("g", Proj.inv(crs, col("p.x"), col("p.y")))
        .select(max(abs(col("g.lon") - col("lon"))).as("dlon"),
          max(abs(col("g.lat") - col("lat"))).as("dlat"))
        .head()
      assert(rt.getDouble(0) < 1e-9, s"EPSG:$code lon err ${rt.getDouble(0)}")
      assert(rt.getDouble(1) < 1e-9, s"EPSG:$code lat err ${rt.getDouble(1)}")
    }
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
