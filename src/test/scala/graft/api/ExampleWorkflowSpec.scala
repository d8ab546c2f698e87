package graft.api

import graft.SparkSpec
import graft.geo.Derive
import org.apache.spark.sql.functions._

/** The reference's own end-to-end example (reference test/example.py:
  * load CSV points → transform to EPSG:5179 → coordinate + airport
  * distance + landuse ratios + relative elevation + road distance +
  * road LLW → get_result(pivot=True)), re-run through graft's fluent
  * surface. A duckpipe user's workflow maps call-for-call.
  */
class ExampleWorkflowSpec extends SparkSpec {

  test("reference example.py workflow runs end-to-end on the fluent API") {
    // stand-ins: WGS84 point table (lon/lat) like sample_point_korea.csv
    val raw = Derive.wgsPoints(spark, sfDir).limit(100)
    val feats = Derive.feats(spark, sfDir)
    val sites = Derive.sites(spark, sfDir)

    val wide = GeoCalculator
      .fromWgs84(raw.withColumn("id", col("id")), "lon", "lat")
      .coordinates()                                   // calculate_coordinate
      .nearestDistance(sites, "D_Airport")             // calculate_airport_distance
      .landuseAreaRatio(feats, Seq(100.0, 300.0, 500.0)) // calculate_landuse_area_ratio
      .relativeElevation(feats.select("x", "y", "elev"),
        refRadius = 600.0, radii = Seq(1000.0), thickness = 300.0)
      .bufferLineStats(feats, Seq(500.0, 1000.0))      // calculate_road_llw
      .resultWide(Seq("TM_X", "TM_Y", "WGS_X", "WGS_Y", "D_Airport",
        "LS0_0100_a", "LS0_0100_p", "LS2_0500_a",
        "Alt_k_above20_1000", "Alt_k_ref",
        "Road_L_0500", "Road_LL_1000", "Road_LLW_1000"))

    assert(wide.count() == 100)
    val cols = wide.columns.toSet
    Seq("TM_X", "WGS_X", "D_Airport", "LS2_0500_a", "Alt_k_ref",
      "Road_LLW_1000").foreach(c => assert(cols.contains(c), c))
    // round-trip sanity: WGS_X recovered from the projected points
    // matches the input longitude (which rides along onto the result,
    // like the reference's attribute merge in get_result)
    val err = wide
      .select(max(abs(col("WGS_X") - col("lon")))).head().getDouble(0)
    assert(err < 1e-9, s"lon round-trip err $err")
    // every point got an airport distance
    assert(wide.filter(col("D_Airport").isNull).count() == 0)
  }

  test("WKT ingest entry point feeds the same fluent chain") {
    // same workflow, but the points arrive as WKT text in EPSG:4326 —
    // the reference's ST_AsText registration path
    val raw = Derive.wgsPoints(spark, sfDir).limit(50)
      .select(col("id"), concat(lit("POINT ("),
        col("lon").cast("string"), lit(" "),
        col("lat").cast("string"), lit(")")).as("wkt"))
    val viaWkt = GeoCalculator.fromWkt(raw, "wkt", epsg = 4326)
      .nearestDistance(Derive.sites(spark, sfDir), "D_Supp")
      .resultWide(Seq("D_Supp"))
    val direct = GeoCalculator
      .fromWgs84(Derive.wgsPoints(spark, sfDir).limit(50), "lon", "lat")
      .nearestDistance(Derive.sites(spark, sfDir), "D_Supp")
      .resultWide(Seq("D_Supp"))
    val a = viaWkt.select("id", "D_Supp")
    val b = direct.select("id", "D_Supp")
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "WKT-ingested chain diverged from direct lon/lat ingest")
  }
}
