package graft.geo

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gridNearest equals broadcastNearest (exhaustive) on derived data") {
    val pts = Derive.points(spark, sfDir)
    val feats = Derive.feats(spark, sfDir).select("x", "y")
    val brute = NearestDistance.broadcastNearest(pts, feats)
      .withColumnRenamed("distance", "d_brute")
    val grid = NearestDistance.gridNearest(pts, feats, cellSize = 500.0)
    val diff = brute.join(grid, Seq("id"))
      .select(max(abs(col("d_brute") - col("distance"))).as("err")).head()
    assert(diff.getDouble(0) == 0.0)
    assert(grid.count() == pts.count())
  }

  test("gridKnn equals broadcastKnn (exhaustive) on derived data") {
    val pts = Derive.points(spark, sfDir)
    val sites = Derive.sites(spark, sfDir)
    val brute = NearestDistance.broadcastKnn(pts, sites, 3)
      .select(col("id"), col("rank"), col("fid").as("b_fid"),
        col("distance").as("b_d"))
    val grid = NearestDistance.gridKnn(pts, sites, k = 3, cellSize = 500.0)
    assert(grid.count() == pts.count() * 3)
    val joined = brute.join(grid, Seq("id", "rank"))
    assert(joined.count() == pts.count() * 3)
    val bad = joined.filter(col("b_fid") =!= col("fid") ||
      col("b_d") =!= col("distance")).count()
    assert(bad == 0)
  }

  test("grid ring guarantee holds across odd cell sizes (brute-force equality)") {
    val pts = Derive.points(spark, sfDir)
    val feats = Derive.feats(spark, sfDir).select("x", "y")
    val brute = NearestDistance.broadcastNearest(pts, feats)
      .withColumnRenamed("distance", "d_brute")
    // a big cell (single ring resolves everything) and a small odd cell
    // (forces the ladder through later rings + possibly the fallback)
    Seq(123.4, 2000.0).foreach { cell =>
      val grid = NearestDistance.gridNearest(pts, feats, cellSize = cell)
      val joined = brute.join(grid, Seq("id"))
      assert(joined.count() == pts.count(), s"cell=$cell row count")
      val bad = joined.filter(col("d_brute") =!= col("distance")).count()
      assert(bad == 0, s"cell=$cell mismatches")
    }
  }

  test("gridKnn at k=1 agrees with gridNearest") {
    val pts = Derive.points(spark, sfDir)
    val sites = Derive.sites(spark, sfDir)
    val knn1 = NearestDistance.gridKnn(pts, sites, k = 1, cellSize = 500.0)
      .select(col("id"), col("distance").as("dk"))
    val near = NearestDistance.gridNearest(pts,
      sites.select("x", "y"), cellSize = 500.0)
    val bad = knn1.join(near, Seq("id"))
      .filter(col("dk") =!= col("distance")).count()
    assert(bad == 0)
  }

  test("gridNearest and gridKnn return empty frames on empty input") {
    val pts = Derive.points(spark, sfDir).filter(lit(false))
    val feats = Derive.feats(spark, sfDir).select("x", "y")
    val near = NearestDistance.gridNearest(pts, feats, cellSize = 500.0)
    assert(near.columns.toSeq == Seq("id", "distance"))
    assert(near.count() == 0)
    val knn = NearestDistance.gridKnn(pts, Derive.sites(spark, sfDir),
      k = 3, cellSize = 500.0)
    assert(knn.columns.toSeq == Seq("id", "rank", "fid", "distance"))
    assert(knn.count() == 0)
  }

  test("capped clustering honors the size cap and partitions each cell") {
    val out = graft.ops.GeoQueries.clusterCapped(spark, sfDir)
    assert(out.filter(col("n") > 10).count() == 0)
    // chunk counts per cell reassemble the uncapped cell counts
    val capped = out.groupBy("cluster").agg(sum("n").as("n2"))
    val plain = graft.ops.GeoQueries.cluster(spark, sfDir)
      .select(col("cluster"), col("n"))
    val bad = plain.join(capped, Seq("cluster"), "full")
      .filter(col("n").isNull || col("n2").isNull || col("n") =!= col("n2"))
    assert(bad.isEmpty)
    // every non-final chunk is exactly full
    val notLast = out.withColumn("maxc",
        max("chunk").over(org.apache.spark.sql.expressions.Window
          .partitionBy("cluster")))
      .filter(col("chunk") < col("maxc"))
    assert(notLast.filter(col("n") =!= 10).count() == 0)
  }

  test("zKey interleaves bits (scala reference impl)") {
    def spreadRef(v: Long): Long = {
      var x = v & 0xFFFF
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      (x | (x << 1)) & 0x55555555L
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 511L), (777L, 333L))
    val df = cases.toDF("ix", "iy")
      .select(col("ix"), col("iy"),
        SpatialCurve.zKey(col("ix"), col("iy")).as("z"))
    df.collect().foreach { r =>
      val expected = spreadRef(r.getLong(0)) | (spreadRef(r.getLong(1)) << 1)
      assert(r.getLong(2) == expected, s"(${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("partitionBySpace keeps row count and reduces per-partition spread") {
    val pts = Derive.points(spark, sfDir)
    val parted = SpatialCurve.partitionBySpace(pts, cellSize = 100.0, numPartitions = 8)
    assert(parted.count() == pts.count())
  }

  test("GeoCalculator fluent pipeline produces expected wide columns") {
    val pts = Derive.points(spark, sfDir)
    val wide = graft.api.GeoCalculator(pts)
      .nearestDistance(Derive.sites(spark, sfDir), "D_Supp")
      .bufferLineStats(Derive.feats(spark, sfDir), Seq(500.0))
      .coordinates()
      .resultWide(Seq("D_Supp", "Road_L_0500", "Road_LL_0500",
        "Road_LLW_0500", "TM_X", "TM_Y", "WGS_X", "WGS_Y"))
    assert(wide.columns.toSet.contains("D_Supp"))
    assert(wide.columns.toSet.contains("Road_LLW_0500"))
    val row = wide.orderBy("id").head()
    assert(!row.isNullAt(row.fieldIndex("D_Supp")))
    assert(wide.count() == pts.count())
    // TM_X equals raw x (points are already in the projected CRS)
    val err = wide.select(max(abs(col("TM_X") - col("x")))).head().getDouble(0)
    assert(err == 0.0)
  }

  test("asof join: union+window and range-join strategies agree on real data") {
    val dedupW = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey", "o_orderdate").orderBy(col("o_orderkey").desc)
    val od = graft.Tables.load(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(dedupW)).filter(col("rn") === 1)
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"),
        col("o_orderkey"))
    val e = graft.Tables.loadEventsUs(spark, sfDir)
      .select("event_id", "user_id", "ts_us")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("_match.o_orderkey").as("mo"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val a = norm(graft.ops.AsofJoin.leftAsof(e, od,
      "user_id", "o_custkey", "ts_us", "o_us", Seq("o_orderkey")))
    val b = norm(graft.ops.AsofJoin.leftAsofRangeJoin(e, od,
      "user_id", "o_custkey", "ts_us", "o_us", Seq("o_orderkey")))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("GeoCalculator exact landuse area matches the standalone operator") {
    val pts = Derive.points(spark, sfDir)
    val long = graft.api.GeoCalculator(pts)
      .landuseAreaExact(Derive.triangles(spark, sfDir), Seq(500.0), 722.0)
      .resultLong
    assert(long.select("varname").distinct().collect()
      .map(_.getString(0)).toSet == Set("AreaX_0500"))
    val direct = AreaClip.areaExact(pts, Derive.triangles(spark, sfDir),
      Seq(500.0), 722.0)
    val diff = long.select(col("id"), col("value"))
      .join(direct.select(col("id"), col("A")), Seq("id"))
      .filter(col("value") =!= col("A")).count()
    assert(diff == 0)
    assert(long.count() == pts.count())
  }

  test("GeoCalculator relativeElevation + intersectingOa emit reference-style varnames") {
    val pts = Derive.points(spark, sfDir)
    val long = graft.api.GeoCalculator(pts)
      .relativeElevation(Derive.feats(spark, sfDir).select("x", "y", "elev"),
        refRadius = 600.0, radii = Seq(1000.0), thickness = 300.0)
      .intersectingOa(Derive.feats(spark, sfDir), Seq(800.0))
      .resultLong
    val names = long.select("varname").distinct()
      .collect().map(_.getString(0)).toSet
    assert(names.contains("Alt_k_above20_1000"))
    assert(names.contains("Alt_k_ref"))
    assert(names.exists(_.startsWith("OA_")))
  }

  test("asof join matches a hand-computed case") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 11L, 50L))
      .toDF("event_id", "k", "t")
    val right = Seq((10L, 100L, "a"), (10L, 200L, "b"), (11L, 60L, "c"))
      .toDF("k", "t", "v")
    val out = graft.ops.AsofJoin.leftAsof(left, right,
        "k", "k", "t", "t", Seq("v"))
      .select(col("event_id"), col("_match.v").as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == Some("a"))   // exact-time match (>= semantics)
    assert(out(2L) == Some("b"))   // most recent of two
    assert(out(3L) == None)        // nothing at or before t=50
  }

  test("packed argmin keys fail loudly outside their packable range") {
    import org.apache.spark.sql.functions.expr
    // geo_bearing: sid must fit 21 bits; a larger site id would
    // silently corrupt the argmin without the guard
    val okRow = Seq((0.0, 0.0, 3.0, 4.0, 5L))
      .toDF("x", "y", "fx", "fy", "sid")
    assert(okRow.select(expr(graft.ops.GeoQueries.bearingPackedSql))
      .collect().head.getLong(0) == (25L * 100) * 2097152L + 5L)
    val badSid = Seq((0.0, 0.0, 3.0, 4.0, 1L << 21))
      .toDF("x", "y", "fx", "fy", "sid")
    val e1 = intercept[Exception] {
      badSid.select(expr(graft.ops.GeoQueries.bearingPackedSql)).collect()
    }
    assert(e1.getMessage.contains("packable range") ||
      e1.getCause.getMessage.contains("packable range"))
    // d² term: coordinates beyond ~6,600 km overflow the 42-bit field
    val badD2 = Seq((0.0, 0.0, 7.0e6, 7.0e6, 5L))
      .toDF("x", "y", "fx", "fy", "sid")
    intercept[Exception] {
      badD2.select(expr(graft.ops.GeoQueries.bearingPackedSql)).collect()
    }
    // events packedVer: event_id must fit its 10^12 decimal field
    val badEvent = Seq((1000L, 1000000000000L)).toDF("ts_us", "event_id")
    intercept[Exception] {
      badEvent.select(graft.ops.Events.packedVer).collect()
    }
  }

  test("segDist is the true segment distance, not the vertex distance") {
    // point above the middle of a long horizontal segment: the foot of
    // the perpendicular is interior, so the true distance (5) is FAR
    // below both vertex distances (sqrt(125) ≈ 11.18) — the case where
    // distance-to-vertices overstates the reference's
    // MIN(ST_Distance(point, LINE)) semantics
    val row = Seq((0.0, 5.0, -10.0, 0.0, 10.0, 0.0))
      .toDF("x", "y", "x1", "y1", "x2", "y2")
    val d = row.select(Geo.segDist(col("x"), col("y"),
      col("x1"), col("y1"), col("x2"), col("y2")).as("d")).head.getDouble(0)
    assert(d == 5.0)
    // clamped ends: beyond either endpoint the distance is to the endpoint
    val past = Seq((15.0, 0.0, -10.0, 0.0, 10.0, 0.0))
      .toDF("x", "y", "x1", "y1", "x2", "y2")
    assert(past.select(Geo.segDist(col("x"), col("y"), col("x1"), col("y1"),
      col("x2"), col("y2")).as("d")).head.getDouble(0) == 5.0)
    // degenerate segment (a == b) collapses to the vertex distance
    val degen = Seq((3.0, 4.0, 0.0, 0.0, 0.0, 0.0))
      .toDF("x", "y", "x1", "y1", "x2", "y2")
    assert(degen.select(Geo.segDist(col("x"), col("y"), col("x1"), col("y1"),
      col("x2"), col("y2")).as("d")).head.getDouble(0) == 5.0)
  }

  test("gridNearestSegments equals exhaustive segment distance") {
    val pts = Derive.points(spark, sfDir)
    val segs = Derive.segments(spark, sfDir)
    val sd = Geo.segDist(col("x"), col("y"),
      col("x1"), col("y1"), col("x2"), col("y2"))
    val brute = pts.join(broadcast(segs.select("x1", "y1", "x2", "y2")))
      .groupBy("id").agg(min(sd).as("d_brute"))
    // big cells (one ring resolves all) and small odd cells (segments
    // span multiple cells; ladder + fallback both exercised)
    Seq(500.0, 37.3).foreach { cell =>
      val grid = NearestDistance.gridNearestSegments(pts, segs, cellSize = cell)
      val joined = brute.join(grid, Seq("id"))
      assert(joined.count() == pts.count(), s"cell=$cell row count")
      val bad = joined.filter(col("d_brute") =!= col("distance")).count()
      assert(bad == 0, s"cell=$cell mismatches")
    }
    // and at least one point's true segment distance beats ALL its
    // vertex distances (the semantic gap this operator closes)
    val vertexMin = pts.join(broadcast(segs.select("x1", "y1", "x2", "y2")))
      .groupBy("id")
      .agg(min(least(Geo.dist(col("x"), col("y"), col("x1"), col("y1")),
        Geo.dist(col("x"), col("y"), col("x2"), col("y2")))).as("d_vertex"))
    val tighter = brute.join(vertexMin, Seq("id"))
      .filter(col("d_brute") < col("d_vertex")).count()
    assert(tighter > 0)
  }

  test("chunkOrder slices the id order into consecutive <=maxSize chunks") {
    val rows = graft.ops.GeoQueries.chunkOrder(spark, sfDir).collect()
    val n = Derive.points(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == n, "every point lands in a chunk")
    // all chunks full except possibly the last, in chunk order
    rows.dropRight(1).foreach(r => assert(r.getLong(1) == 10,
      s"chunk ${r.getLong(0)} not full"))
    assert(rows.last.getLong(1) <= 10)
    // chunks partition the id ORDER: consecutive, non-overlapping ranges
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2),
        s"chunk ${a.getLong(0)} id range overlaps chunk ${b.getLong(0)}")
      case _ =>
    }
    // the rank window partitions by the id-range bucket — never a
    // global single-partition sort over the points
    val plan = graft.ops.GeoQueries.chunkOrder(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bkt"), "bucketed rank window missing from plan")
  }
}
