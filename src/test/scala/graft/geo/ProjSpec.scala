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
