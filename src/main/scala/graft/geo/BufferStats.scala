package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Buffer statistics: aggregate features within radius r of each point,
  * for several radii in ONE pass — the semantics of the reference's
  * RoadLLW / MainRoadLLW (length · lanes · width sums within buffers,
  * reference duckpipe/calculator/RoadLLWCalculator.py:66-115), Landuse
  * area/ratio (per-code area + proportion of buffer area,
  * LanduseCalculator.py:99-157) and IntersectingOA ratio
  * (_IntersectingOACalculator.py).
  *
  * Physical plan: features are bucketed into grid cells of maxRadius;
  * each point hash-joins its 3×3 cell neighborhood (equi join on a
  * packed cell key — the analogue of the reference's AOI bbox prefilter
  * + RTree, but shuffle-partitioned instead of per-chunk). All radii are
  * evaluated with conditional aggregation over that single candidate
  * set — the reference rescans parquet per (year, buffer) pair; graft
  * scans once.
  */
object BufferStats {

  /** Hash-join each point to every feature within `reach`, using grid
    * cells of `cellSize` and a (2k+1)² offset ring, k = ceil(reach /
    * cellSize). Smaller cells cost more probe rows (points × offsets)
    * but shrink the candidate box toward (2·reach)² — for reach=1500,
    * cell=500 the box area drops 1.65× vs cell=reach. `cellSize`
    * defaults to reach/3, capping offsets at 9×9.
    *
    * `minReach` > 0 prunes offsets that cannot contain any feature at
    * distance ≥ minReach (annulus queries: the donut's hollow center
    * never joins). An offset cell's distance to the point is at most
    * sqrt((|dx|+1)² + (|dy|+1)²)·cell, so offsets below that bound are
    * dropped exactly.
    */
  def neighborJoin(points: DataFrame, features: DataFrame,
                                reach: Double,
                                cellSize: Double = 0.0,
                                minReach: Double = 0.0): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val cell = if (cellSize > 0) cellSize else reach / 3
    val k = math.ceil(reach / cell).toLong
    val offsets = (-k to k)
      .flatMap(dx => (-k to k).map(dy => (dx, dy)))
      .filter { case (dx, dy) =>
        val ub = math.sqrt((math.abs(dx) + 1.0) * (math.abs(dx) + 1.0) +
          (math.abs(dy) + 1.0) * (math.abs(dy) + 1.0)) * cell
        ub >= minReach
      }
      .toDF("dx", "dy")
    val f = features
      .withColumn("ck", Geo.cellKey(
        Geo.cellOf(col("x"), cell), Geo.cellOf(col("y"), cell)))
      .withColumnRenamed("x", "fx").withColumnRenamed("y", "fy")
    Geo.fanout(points)
      .join(broadcast(offsets))
      .withColumn("ck", Geo.cellKey(
        Geo.cellOf(col("x"), cell) + col("dx"),
        Geo.cellOf(col("y"), cell) + col("dy")))
      .join(f, Seq("ck"))
      .withColumn("_d2", Geo.dist2(col("x"), col("y"), col("fx"), col("fy")))
  }

  /** Zero-filled (id, radius, <stat…>) shaping shared by the separate
    * and fused aggregation paths. */
  private def shapeLine(points: DataFrame, agged: DataFrame,
                        radii: Seq[Double],
                        statNames: Seq[String]): DataFrame = {
    val perRadius = radii.map { r =>
      struct(lit(r).as("radius") +:
        statNames.map(n => coalesce(col(s"${n}_${r.toInt}"), lit(0.0)).as(n)): _*)
    }
    points.select("id")
      .join(agged, Seq("id"), "left")
      .select(col("id"), explode(array(perRadius: _*)).as("s"))
      .select(col("id") +: col("s.radius") +:
        statNames.map(n => col(s"s.$n").as(n)): _*)
  }

  /** Weighted sums of features within each radius, zero-filled.
    * `stats` maps output-column prefix → weight expression over feature
    * columns (e.g. "L" -> col("weight"), "LL" -> col("weight")*col("lanes")).
    * Output: (id, radius, <stat…>) one row per point × radius.
    */
  def lineStats(points: DataFrame, features: DataFrame,
                radii: Seq[Double], stats: Seq[(String, Column)]): DataFrame = {
    val cell = radii.max
    val aggs = for {
      r <- radii; (name, w) <- stats
    } yield sum(when(col("_d2") < lit(r * r), w).otherwise(lit(0.0)))
      .as(s"${name}_${r.toInt}")
    val agged = neighborJoin(points, features, cell)
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
    shapeLine(points, agged, radii, stats.map(_._1))
  }

  /** Per-code area within radius + proportion of the buffer disk area,
    * zero-filled over the full (id × code × radius) skeleton — the
    * reference's result_skeleton RIGHT JOIN (LanduseCalculator.py:52-61,
    * 127-142). Features: (x, y, code, area).
    * Output: (id, code, radius, a, p).
    */
  def areaRatio(points: DataFrame, features: DataFrame,
                radii: Seq[Double]): DataFrame = {
    val cell = radii.max
    val aggs = radii.map(r =>
      sum(when(col("_d2") < lit(r * r), col("area")).otherwise(lit(0.0)))
        .as(s"a_${r.toInt}"))
    val agged = neighborJoin(points, features, cell)
      .groupBy("id", "code").agg(aggs.head, aggs.tail: _*)
    shapeArea(points, features, agged, radii)
  }

  /** Zero-filled (id, code, radius, a, p) shaping shared by the
    * separate and fused aggregation paths. */
  private def shapeArea(points: DataFrame, features: DataFrame,
                        agged: DataFrame, radii: Seq[Double]): DataFrame = {
    val skeleton = points.select("id")
      .join(features.select("code").distinct())
    val perRadius = radii.map { r =>
      struct(lit(r).as("radius"),
        coalesce(col(s"a_${r.toInt}"), lit(0.0)).as("a"),
        (coalesce(col(s"a_${r.toInt}"), lit(0.0)) / lit(math.Pi * r * r)).as("p"))
    }
    skeleton
      .join(agged, Seq("id", "code"), "left")
      .select(col("id"), col("code"), explode(array(perRadius: _*)).as("s"))
      .select(col("id"), col("code"), col("s.radius").as("radius"),
        col("s.a").as("a"), col("s.p").as("p"))
  }

  /** Fused line-stats + area-ratio: ONE neighbor join and one
    * per-(id, code) aggregation feed both families; line stats roll up
    * from the per-code partials with a second (tiny) aggregation.
    * Order-exact whenever the stat weights are integer-valued (sums of
    * integers in double are associative below 2^53) — which the
    * reference's length/lanes/width/area columns are. Returns
    * (lineStats-shaped, areaRatio-shaped). */
  def lineAndAreaStats(points: DataFrame, features: DataFrame,
                       radii: Seq[Double],
                       stats: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val cell = radii.max
    val lineAggs = for {
      r <- radii; (name, w) <- stats
    } yield sum(when(col("_d2") < lit(r * r), w).otherwise(lit(0.0)))
      .as(s"${name}_${r.toInt}")
    val areaAggs = radii.map(r =>
      sum(when(col("_d2") < lit(r * r), col("area")).otherwise(lit(0.0)))
        .as(s"a_${r.toInt}"))
    val perCode = graft.Tables.hot(
      neighborJoin(points, features, cell)
        .groupBy("id", "code")
        .agg((lineAggs ++ areaAggs).head, (lineAggs ++ areaAggs).tail: _*))
    val lineAgged = perCode.groupBy("id")
      .agg(
        (for { r <- radii; (name, _) <- stats }
          yield sum(col(s"${name}_${r.toInt}")).as(s"${name}_${r.toInt}")).head,
        (for { r <- radii; (name, _) <- stats }
          yield sum(col(s"${name}_${r.toInt}")).as(s"${name}_${r.toInt}")).tail: _*)
    (shapeLine(points, lineAgged, radii, stats.map(_._1)),
      shapeArea(points, features, perCode, radii))
  }

  /** Intersection ratio per (point, area-unit, radius): the share of an
    * area unit (e.g. an output area, modeled as cells sharing `key`)
    * lying within the point's buffer — the reference's OA-ratio cache
    * (_IntersectingOACalculator.py:66-90: ST_Area(∩)/ST_Area(oa)).
    * Features: (x, y, key, area) — one row per cell of the unit.
    * Output: (id, key, radius, ratio), intersecting pairs only.
    */
  def intersectRatio(points: DataFrame, features: DataFrame,
                     radii: Seq[Double]): DataFrame = {
    val cell = radii.max
    val totals = features.groupBy("key").agg(sum("area").as("total_area"))
    val aggs = radii.map(r =>
      sum(when(col("_d2") < lit(r * r), col("area")).otherwise(lit(0.0)))
        .as(s"a_${r.toInt}"))
    val agged = neighborJoin(points, features, cell)
      .groupBy("id", "key").agg(aggs.head, aggs.tail: _*)
    val perRadius = radii.map { r =>
      struct(lit(r).as("radius"),
        (coalesce(col(s"a_${r.toInt}"), lit(0.0)) / col("total_area")).as("ratio"))
    }
    agged.join(broadcast(totals), Seq("key"))
      .select(col("id"), col("key"), explode(array(perRadius: _*)).as("s"))
      .filter(col("s.ratio") > 0)
      .select(col("id"), col("key"), col("s.radius").as("radius"),
        col("s.ratio").as("ratio"))
  }
}
