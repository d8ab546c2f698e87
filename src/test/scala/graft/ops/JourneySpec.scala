package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class JourneySpec extends SparkSpec {

  test("markov: rows normalize to 1 and transitions total events minus users") {
    val out = Journey.markov(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("from_type")).foreach { case (_, rows) =>
      val psum = rows.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-4)
    }
    val ev = Tables.load(spark, sfDir, "events")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n")).sum == nEvents - nUsers)
  }

  test("sequence_match equals a driver-side regex replay") {
    val seqs = Tables.loadEventsUs(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (_, rows) =>
        rows.sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
          .map(r => r.getAs[String]("event_type").head).mkString
      }.toSeq
    val expect = Map(
      "browse_buy" -> seqs.count(_.matches(".*v[^p]*c[^p]*p.*")),
      "error_churn" -> seqs.count(s => "e[^p]*$".r.findFirstIn(s).isDefined),
      "direct_buy" -> seqs.count(s => "^[^vc]*p".r.findFirstIn(s).isDefined))
    val out = Journey.sequenceMatch(spark, sfDir).collect()
      .map(r => r.getAs[String]("pattern") -> r.getAs[Long]("n_matched")).toMap
    assert(out.keySet == expect.keySet)
    expect.foreach { case (k, v) => assert(out(k) == v.toLong, s"pattern $k") }
    assert(Journey.sequenceMatch(spark, sfDir).collect()
      .forall(_.getAs[Long]("n_users") == seqs.size))
  }

  test("sequence_match_nfa equals the string-render form on real data") {
    val str = Journey.sequenceMatch(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nfa = Journey.sequenceMatchNfa(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(str.toSeq == nfa.toSeq)
  }

  test("sequence_match_nfa equals the regex on adversarial synthetic journeys") {
    import spark.implicits._
    // journeys stressing every state transition: p inside the v..c gap,
    // p-terminal reuse, e-then-p vs p-then-e, p-first prefixes, empty
    // and single-code journeys — deterministic pseudo-random fill
    val codes = "vceps"
    val rows = (0 until 300).flatMap { u =>
      val len = u % 23
      (0 until len).map { i =>
        val c = codes(((u * 31 + i * 17 + (i * i) % 7) % 5 + 5) % 5).toString
        (u.toLong, 1000000L + i * 1000L, (u * 100 + i).toLong, c)
      }
    }.filter(_ => true)
    val ev = rows.toDF("user_id", "ts_us", "event_id", "code")
    val got = Journey.nfaMatchesFrom(ev.withColumn("k", Events.packedVer))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val journeys = rows.groupBy(_._1).map { case (_, rs) =>
      rs.sortBy(r => (r._2, r._3)).map(_._4).mkString
    }.toSeq
    assert(got("browse_buy") == journeys.count(_.matches(".*v[^p]*c[^p]*p.*")))
    assert(got("error_churn") ==
      journeys.count(s => "e[^p]*$".r.findFirstIn(s).isDefined))
    assert(got("direct_buy") ==
      journeys.count(s => "^[^vc]*p".r.findFirstIn(s).isDefined))
  }

  test("past the cap: string render aborts loudly, NFA form answers") {
    import spark.implicits._
    // one user with 5000 views then a click then a purchase — beyond
    // the 4096-event journey-string cap
    val rows = (0 until 5000).map(i =>
      (7L, 1000000L + i * 1000L, i.toLong, "v")) ++
      Seq((7L, 7000000L, 9001L, "c"), (7L, 8000000L, 9002L, "p"))
    val ev = rows.toDF("user_id", "ts_us", "event_id", "code")
    val e = intercept[Exception] {
      Journey.renderMatchesFrom(ev).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("journey longer")))
    val nfa = Journey.nfaMatchesFrom(ev.withColumn("k", Events.packedVer))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(nfa("browse_buy") == 1L)   // v...vcp matches v[^p]*c[^p]*p
    assert(nfa("error_churn") == 0L)
    assert(nfa("direct_buy") == 0L)   // 5000 views precede the purchase
  }

  test("path3 matches a driver-side trigram count") {
    val seqs = Tables.loadEventsUs(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (_, rows) =>
        rows.sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
          .map(_.getAs[String]("event_type"))
      }
    val expect = seqs.toSeq.flatMap(_.sliding(3).filter(_.size == 3))
      .groupBy(_.mkString(">")).view.mapValues(_.size.toLong).toMap
    val got = Journey.path3(spark, sfDir).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n"))
    assert(got.nonEmpty && got.length <= 10)
    got.foreach { case (p, n) => assert(expect(p) == n, s"path $p") }
    // top-1 really is the global max
    assert(got.head._2 == expect.values.max)
  }

  test("q_attribution matches a driver-side last-touch replay") {
    val byUser = Tables.loadEventsUs(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
    val expect = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    byUser.values.foreach { rows =>
      val sorted = rows.sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
      var lastTouch: Option[(Long, String)] = None
      sorted.foreach { r =>
        val t = r.getAs[String]("event_type")
        if (t == "purchase") {
          val key = lastTouch match {
            case Some((ts, tt)) if r.getAs[Long]("ts_us") - ts <= 86400000000L => tt
            case _ => "none"
          }
          expect(key) += 1
        }
        if (t == "click" || t == "view")
          lastTouch = Some((r.getAs[Long]("ts_us"), t))
      }
    }
    val got = Journey.attribution(spark, sfDir).collect()
      .map(r => r.getAs[String]("touch") -> r.getAs[Long]("n_purchases")).toMap
    assert(got == expect.toMap.filter(_._2 > 0))
  }

  test("q_new_vs_returning: new users sum to the user base; day one all new") {
    val out = Events.newVsReturning(spark, sfDir).collect()
    assert(out.nonEmpty)
    val nUsers = Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_new")).sum == nUsers)
    out.foreach(r => assert(r.getAs[Long]("n_active") ==
      r.getAs[Long]("n_new") + r.getAs[Long]("n_returning")))
    val firstDay = out.minBy(_.getAs[Long]("day"))
    assert(firstDay.getAs[Long]("n_returning") == 0L)
  }

  test("q_cohort_ltv: cumulative revenue is nondecreasing per cohort") {
    val out = Events.cohortLtv(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("cohort_wk")).foreach { case (_, rows) =>
      val byAge = rows.sortBy(_.getAs[Long]("age_wk"))
      assert(byAge.head.getAs[Long]("age_wk") == 0L)
      byAge.map(_.getAs[Double]("cum_revenue")).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a <= b + 1e-9)
        case _ =>
      }
    }
  }

  test("q_dau_stickiness: monotone windows, stickiness bounded") {
    val out = Journey.dauStickiness(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (d, w, m) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
        r.getAs[Long]("mau"))
      assert(d <= w && w <= m, s"window nesting violated: $r")
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
  }

  test("q_gini within [0, 1)") {
    val out = Relational9.qGini(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $r")
    }
  }
}
