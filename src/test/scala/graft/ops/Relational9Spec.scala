package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class Relational9Spec extends SparkSpec {

  test("q_integrity computes zero orphans on the generator's star schema") {
    val rows = Relational9.qIntegrity(spark, sfDir).collect()
    assert(rows.length == 7)
    rows.foreach(r => assert(r.getLong(1) == 0L,
      s"edge ${r.getString(0)}: expected 0 orphans, got ${r.getLong(1)}"))
  }

  test("q_incr_quantile: binned estimates land within one bin of the exact percentile") {
    val vals = Tables.load(spark, sfDir, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val lo = vals.map(_._2).min
    val hi = vals.map(_._2).max
    val binW = (hi - lo) / 1000.0
    def exact(xs: Array[Double], q: Double): Double = {
      val s = xs.sorted
      s(math.min(s.length - 1, math.ceil(s.length * q).toInt - 1))
    }
    val got = Relational9.qIncrQuantile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    vals.groupBy(_._1).foreach { case (t, rows) =>
      val xs = rows.map(_._2)
      val (p50, p90) = got(t)
      assert(math.abs(p50 - exact(xs, 0.5)) <= binW + 1e-9,
        s"$t p50: est $p50 vs exact ${exact(xs, 0.5)} (bin $binW)")
      assert(math.abs(p90 - exact(xs, 0.9)) <= binW + 1e-9,
        s"$t p90: est $p90 vs exact ${exact(xs, 0.9)}")
    }
  }

  test("q_streaks equals a brute-force streak computation") {
    val day = 86400000000L
    val du = Tables.loadEventsUs(spark, sfDir)
      .select(col("user_id"), expr(s"ts_us DIV $day").as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = du.groupBy(_._1).map { case (u, pairs) =>
      val days = pairs.map(_._2).distinct.sorted
      val runs = days.foldLeft(List.empty[List[Long]]) {
        case (acc, d) if acc.nonEmpty && acc.head.head == d - 1 =>
          (d :: acc.head) :: acc.tail
        case (acc, d) => List(d) :: acc
      }
      u -> (runs.map(_.length).max.toLong, runs.length.toLong)
    }
    val got = Relational9.qStreaks(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q_benford: both share columns normalize; every order is counted") {
    import org.apache.spark.sql.functions._
    val out = Relational9.qBenford(spark, sfDir).collect()
    assert(out.map(_.getAs[Int]("d")).toSet.subsetOf((1 to 9).toSet))
    assert(math.abs(out.map(_.getAs[Double]("obs_frac")).sum - 1.0) < 1e-4)
    assert(math.abs(out.map(_.getAs[Double]("benford_frac")).sum - 1.0) < 1e-3)
    val nOrders = graft.Tables.load(spark, sfDir, "orders").count()
    assert(out.map(_.getAs[Long]("n")).sum == nOrders)
  }

  test("q_rfm: cells partition customers; spend rises with the M quintile") {
    import org.apache.spark.sql.functions._
    val out = Relational9.qRfm(spark, sfDir).collect()
    val nCust = graft.Tables.load(spark, sfDir, "orders")
      .select("o_custkey").distinct().count()
    assert(out.map(_.getAs[Long]("n_cust")).sum == nCust)
    out.foreach { r =>
      Seq("r_q", "f_q", "m_q").foreach(c =>
        assert(r.getAs[Int](c) >= 1 && r.getAs[Int](c) <= 5))
    }
    // the M-quintile marginal mean spend must be nondecreasing: bins
    // order by value, so a higher quintile can never average less
    val byM = out.groupBy(_.getAs[Int]("m_q")).toSeq.sortBy(_._1)
      .map { case (q, rows) =>
        val n = rows.map(_.getAs[Long]("n_cust")).sum
        val s = rows.map(r => r.getAs[Double]("avg_spend") * r.getAs[Long]("n_cust")).sum
        (q, s / n)
      }
    byM.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a <= b + 0.05) // 2-dp cell rounding
      case _ =>
    }
  }
}
