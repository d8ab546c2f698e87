package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Brute-force cross-checks for the graph analytics + time-series
  * operators: the distributed constructions (degree-oriented triangle
  * join, bucket-carry prefix sum) must equal the small-scale naive
  * constructions exactly.
  */
class GraphTimeSeriesSpec extends SparkSpec {

  test("graph_triangles equals the brute-force count at sf0.001") {
    val edges = Graph.coEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive: for every vertex pair path a-b, b-c check closing edge
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
    def hasEdge(a: Long, b: Long): Boolean =
      edges.contains((math.min(a, b), math.max(a, b)))
    val verts = adj.keys.toSeq.sorted
    var naive = Map.empty[Long, Long].withDefaultValue(0L)
    for {
      u <- verts
      v <- adj(u) if v > u
      w <- adj(u) if w > v && hasEdge(v, w)
    } {
      naive = naive.updated(u, naive(u) + 1)
        .updated(v, naive(v) + 1).updated(w, naive(w) + 1)
    }
    val got = Graph.triangleCounts(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "expected triangles in the co-purchase graph")
    assert(got === naive.filter(_._2 > 0))
  }

  test("graph_pagerank conserves mass and stays positive") {
    val rows = Graph.pageRank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // r_rel = rank·N, so mean of r_rel over vertices must be ~1
    val mean = rows.map(_.getDouble(1)).sum / rows.length
    assert(math.abs(mean - 1.0) < 1e-3,
      s"PageRank mass not conserved: mean r_rel = $mean")
    assert(rows.forall(_.getDouble(1) > 0.0))
  }

  test("q_interval_sweep equals the single global running sum") {
    import graft.Tables
    val ev = Tables.loadEventsUs(spark, sfDir)
      .select(col("event_type"), col("ts_us"), col("event_id"))
    val deltas = ev.select(col("event_type"), col("ts_us").as("t"),
        lit(1).as("d"), col("event_id"))
      .unionAll(ev.select(col("event_type"),
        (col("ts_us") + lit(1800000000L)).as("t"), lit(-1).as("d"),
        col("event_id")))
    // textbook construction: ONE window per type (serial at scale —
    // the operator's bucket-carry decomposition must match it exactly)
    val sweep = deltas.withColumn("c",
      sum(col("d")).over(Window.partitionBy("event_type")
        .orderBy(col("t"), col("d"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val naive = sweep.groupBy("event_type").agg(max(col("c")).as("mc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = TimeSeries.intervalSweep(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === naive)
  }

  test("q_ewma: first observation is its own smooth; constant series fixed") {
    val rows = TimeSeries.ewma(spark, sfDir).collect()
    val first = rows.groupBy(_.getString(0))
      .map { case (_, rs) => rs.minBy(_.getLong(1)) }
    first.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-6,
        s"first-day ewma must equal x: $r")
    }
    // smoothing stays inside the observed range per type
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val xs = rs.map(_.getDouble(2))
      val (lo, hi) = (xs.min - 1e-6, xs.max + 1e-6)
      assert(rs.forall(r => r.getDouble(3) >= lo && r.getDouble(3) <= hi))
    }
  }

  test("q_seasonal: shares normalize; totals reconcile with the event count") {
    val out = TimeSeries.seasonal(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    }
    val nEvents = graft.Tables.load(spark, sfDir, "events").count()
    assert(out.map(_.getAs[Long]("total")).sum == nEvents)
  }

  test("q_roll_corr: windows bounded at 14, r within [-1, 1]") {
    val out = TimeSeries.rollCorr(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n") >= 1 && r.getAs[Long]("n") <= 14)
      if (!r.isNullAt(2))
        assert(math.abs(r.getAs[Double]("r")) <= 1.0 + 1e-9)
    }
  }

  test("q_hier_rollup: root absorbs everything, children partition the parent") {
    import org.apache.spark.sql.functions._
    val out = Graph.hierRollup(spark, sfDir).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_desc"), r.getAs[Double]("subtree_sum"))).toMap
    val cust = graft.Tables.load(spark, sfDir, "customer")
    assert(out(1L)._1 == cust.count(), "root subtree = every node")
    // each node's subtree = itself + its two children's subtrees
    for (id <- 2L to 7L; if out.contains(id)) {
      val kids = Seq(2 * id, 2 * id + 1).flatMap(out.get)
      assert(out(id)._1 == 1 + kids.map(_._1).sum, s"count mismatch at $id")
    }
  }

  test("ancestorClosure: exact pair set on a handcrafted irregular tree") {
    import spark.implicits._
    // 1 ← 2 ← {4,5,6}, 1 ← 3, 4 ← 7: mixed arity, depth 3
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 2L),
      (7L, 4L)).toDF("id", "parent")
    val got = Graph.ancestorClosure(nodes, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set((1L, 1L), (2L, 2L), (2L, 1L), (3L, 3L), (3L, 1L),
      (4L, 4L), (4L, 2L), (4L, 1L), (5L, 5L), (5L, 2L), (5L, 1L),
      (6L, 6L), (6L, 2L), (6L, 1L), (7L, 7L), (7L, 4L), (7L, 2L), (7L, 1L))
    assert(got == want)
  }

  test("ancestorClosure: multi-root forest certifies on BOTH routes") {
    import spark.implicits._
    // two trees, roots 1 and 2 (neither has an edge row): the broadcast
    // route's old coverage guard hard-coded root id 1 and raise_error'd
    // any chain rooted elsewhere — this pins the root-agnostic guard
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    val edges = Seq((3L, 1L), (4L, 1L), (5L, 2L), (6L, 3L), (7L, 5L))
      .toDF("id", "parent")
    val want = Set((1L, 1L), (2L, 2L), (3L, 3L), (3L, 1L), (4L, 4L),
      (4L, 1L), (5L, 5L), (5L, 2L), (6L, 6L), (6L, 3L), (6L, 1L),
      (7L, 7L), (7L, 5L), (7L, 2L))
    for (bound <- Seq(Long.MaxValue.toString, "0")) {
      spark.conf.set(Graph.BroadcastVerticesKey, bound)
      try {
        val got = Graph.ancestorClosure(nodes, edges).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want, s"route bound=$bound diverges")
      } finally spark.conf.unset(Graph.BroadcastVerticesKey)
    }
  }

  test("q_hier_rollup_edges equals a driver-side parent-chain replay") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val out = Graph.hierRollupEdges(spark, sfDir).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_desc"), r.getAs[Double]("subtree_sum"))).toMap
    val nodes = graft.Tables.load(spark, sfDir, "customer")
      .select((col("c_custkey") + 1).as("id"),
        col("c_acctbal").cast(dec).as("v")).collect()
      .map(r => r.getAs[Long]("id") ->
        BigDecimal(r.getAs[java.math.BigDecimal]("v")))
    def parent(k: Long): Long = math.max(1L, k / (2 + k % 3))
    // ground truth: walk each node's parent chain to the root
    var n = Map.empty[Long, Long].withDefaultValue(0L)
    var sv = Map.empty[Long, BigDecimal].withDefaultValue(BigDecimal(0))
    for ((id, v) <- nodes) {
      var a = id
      while ({
        if (a <= 15) { n = n.updated(a, n(a) + 1); sv = sv.updated(a, sv(a) + v) }
        a > 1
      }) a = parent(a)
    }
    assert(out.keySet == n.keySet.filter(_ <= 15))
    for ((id, (cnt, s)) <- out) {
      assert(cnt == n(id), s"count mismatch at $id")
      assert(math.abs(s - sv(id).toDouble) < 1e-9, s"sum mismatch at $id")
    }
    // root absorbs every node; parent ≡ self + children over the replay
    assert(n(1L) == nodes.length)
    val kids = nodes.map(_._1).filter(_ > 1).groupBy(parent)
    for (p <- n.keys if p <= 3) {
      var cnts = Map.empty[Long, Long].withDefaultValue(0L)
      for ((id, _) <- nodes) { // full-range subtree counts for identity
        var a = id
        while ({ cnts = cnts.updated(a, cnts(a) + 1); a > 1 }) a = parent(a)
      }
      assert(cnts(p) == 1 + kids.getOrElse(p, Array.empty[Long])
        .map(cnts).sum, s"parent!=self+children at $p")
    }
  }

  test("graph_assortativity: a correlation, over the real edge count") {
    val row = Graph.assortativity(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_edges") ==
      Graph.coEdges(spark, sfDir).count())
    if (!row.isNullAt(2))
      assert(math.abs(row.getAs[Double]("assortativity")) <= 1.0 + 1e-9)
    assert(row.getAs[Double]("mean_deg") > 0)
  }

  test("q_ab_cuped: adjustment does not inflate variance; means consistent") {
    val out = TimeSeries.abCuped(spark, sfDir).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_users") > 0)
      val (vp, va) = (r.getAs[Double]("var_post"), r.getAs[Double]("var_adj"))
      assert(va >= -1e-9)
      // pooled theta minimizes the pooled variance; per-variant it can
      // deviate only marginally on balanced assignment
      assert(va <= vp * 1.1 + 1e-9, s"variance inflated: $vp -> $va")
      // the adjustment shifts the mean by theta * (x-dev from pooled)
      val shift = r.getAs[Double]("mean_post") - r.getAs[Double]("mean_adj")
      assert(math.abs(shift) < math.abs(r.getAs[Double]("theta")) * 10 + 1e-6)
    }
  }

  test("q_trend_ols equals a driver-side least-squares replay") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.loadEventsUs(spark, sfDir)
      .withColumn("day", expr("ts_us DIV 86400000000"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      .collect().groupBy(_.getString(0))
    val expect = daily.map { case (t, rows) =>
      val d0 = rows.map(_.getLong(1)).min
      val pts = rows.map(r => ((r.getLong(1) - d0).toDouble, r.getLong(2).toDouble))
      val n = pts.length
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      t -> (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    TimeSeries.trendOls(spark, sfDir).collect().foreach { r =>
      if (!r.isNullAt(2))
        assert(math.abs(r.getDouble(2) - expect(r.getString(0))) < 1e-4,
          s"slope mismatch for ${r.getString(0)}")
      if (!r.isNullAt(4)) {
        val r2 = r.getDouble(4)
        assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
      }
    }
  }

  test("q_forecast_naive: error metrics nonnegative, backtests bounded") {
    val out = TimeSeries.forecastNaive(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n7") >= 0)
      if (!r.isNullAt(2)) assert(r.getAs[Double]("mae_seasonal") >= 0.0)
      if (!r.isNullAt(3)) assert(r.getAs[Double]("mape_seasonal") >= 0.0)
      if (!r.isNullAt(4)) assert(r.getAs[Double]("mae_naive") >= 0.0)
    }
  }

  test("q_autocorr: r bounded, pair counts shrink with lag") {
    val rows = TimeSeries.autocorr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3))
        assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9, s"out-of-range r: $r")
    }
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byLag = rs.map(r => r.getInt(1) -> r.getLong(2)).toMap
      (2 to 7).foreach { k =>
        for (a <- byLag.get(k); b <- byLag.get(k - 1)) assert(a <= b)
      }
    }
  }

  test("q_cusum equals a driver-side argmax replay") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.loadEventsUs(spark, sfDir)
      .withColumn("day", expr("ts_us DIV 86400000000"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) =>
        t -> rs.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      }
    val expect = daily.map { case (t, series) =>
      val n = series.length.toLong
      val s = series.map(_._2).sum
      var p = 0L
      val cus = series.zipWithIndex.map { case ((day, x), i) =>
        p += x; (day, n * p - (i + 1) * s)
      }
      val cmax = cus.map(c => math.abs(c._2)).max
      t -> cus.filter(c => math.abs(c._2) == cmax).minBy(_._1)._1
    }
    val got = TimeSeries.cusum(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === expect)
    // direction consistent with the before/after segment means
    TimeSeries.cusum(spark, sfDir).collect().foreach { r =>
      if (!r.isNullAt(5)) {
        val (before, after) = (r.getDouble(4), r.getDouble(5))
        if (r.getString(6) == "down") assert(before >= after - 1e-9)
        else assert(before <= after + 1e-9)
      }
    }
  }

  test("q_roll_median matches a plain-Scala trailing-frame recomputation") {
    val daily = graft.Tables.loadEventsUs(spark, sfDir)
      .select(col("event_type"), expr("ts_us DIV 86400000000").as("day"),
        col("value")).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val want = daily.groupBy(_._1._1).flatMap { case (et, m) =>
      val days = m.toSeq.sortBy(_._1._2)
      days.zipWithIndex.map { case (((_, day), cents), i) =>
        val fr = days.slice(math.max(0, i - 6), i + 1).map(_._2).sorted
        val med2 = fr((fr.size - 1) / 2) + fr(fr.size / 2)
        (et, day, cents, med2, med2 / 200.0)
      }
    }.toSet
    val got = TimeSeries.rollMedian(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got.nonEmpty && got == want,
      "rolling median diverges from the recompute")
  }
}
