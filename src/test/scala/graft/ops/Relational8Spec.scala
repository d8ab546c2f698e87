package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class Relational8Spec extends SparkSpec {

  test("q_incr_agg: merged partial state equals direct recompute, and the cut actually splits") {
    val e = Tables.loadEventsUs(spark, sfDir)
    val direct = e
      .withColumn("day_us", col("ts_us") - (col("ts_us") % lit(86400000000L)))
      .groupBy("day_us", "event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double")
          .as("sum_value"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .orderBy("day_us", "event_type")
      .collect()
    val merged = Relational8.qIncrAgg(spark, sfDir).collect()
    assert(merged.toSeq == direct.toSeq)

    val Array(mn, mx) = e.agg(min("ts_us"), max("ts_us")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val cut = (mn + mx) / 2
    val nBase = e.filter(col("ts_us") <= cut).count()
    val nAll = e.count()
    assert(nBase > 0 && nBase < nAll, "cut must leave both a base and a delta slice")
  }

  test("q_bloom_join: digest prefilter is semantics-invisible and never drops a matching row") {
    val dimKeys = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val fact = Tables.load(spark, sfDir, "lineitem").select("l_orderkey")
    val nMatching = fact.join(dimKeys,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()

    // replicate the digest stage: pruned must be a superset of matches
    val m = 1L << 16
    val digest = dimKeys.select(explode(array(
      pmod(xxhash64(lit(1), col("o_orderkey")), lit(m)),
      pmod(xxhash64(lit(2), col("o_orderkey")), lit(m)) + lit(m))).as("b"))
      .distinct()
    val pruned = fact
      .join(broadcast(digest),
        pmod(xxhash64(lit(1), col("l_orderkey")), lit(m)) === col("b"),
        "left_semi")
      .join(broadcast(digest),
        pmod(xxhash64(lit(2), col("l_orderkey")), lit(m)) + lit(m) === col("b"),
        "left_semi")
      .count()
    assert(pruned >= nMatching, "bloom digest must have zero false negatives")
    assert(pruned <= fact.count())

    // end-to-end equality with the plain join
    val expected = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("ym"))
      .agg(count(lit(1)).as("n_lines"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy("ym")
      .collect()
    assert(Relational8.qBloomJoin(spark, sfDir).collect().toSeq == expected.toSeq)
  }

  test("q_hll_sketch: estimates land within HLL error bounds") {
    val rows = Relational8.qHllSketch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est, rel) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(exact > 0 && est > 0.0)
      // m=256 → σ ≈ 6.5%; 0.5 is a very loose 7σ-plus sanity bound
      assert(math.abs(rel) < 0.5,
        s"HLL estimate $est vs exact $exact: rel_err $rel out of bounds")
    }
  }

  test("q_gap_fill: dense grid, LOCF semantics") {
    val rows = Relational8.qGapFill(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val bySeries = rows.groupBy(_._1)
    val gridSizes = bySeries.values.map(_.length).toSet
    assert(gridSizes.size == 1, "every series spans the same dense grid")
    bySeries.values.foreach { sr =>
      val sorted = sr.sortBy(_._2)
      var lastObserved: Option[Double] = None
      sorted.foreach { case (_, _, v, observed) =>
        if (observed) {
          assert(v.isDefined)
          lastObserved = v
        } else {
          assert(v == lastObserved,
            "carried value must equal the last observation (or stay null)")
        }
      }
    }
  }

  test("q_profile: one pass yields per-column null/distinct/min-max facts") {
    val o = Tables.load(spark, sfDir, "orders")
    val nRows = o.count()
    val nMedium = o.filter(col("o_orderpriority") === "3-MEDIUM").count()
    val nPrio = o.select("o_orderpriority").distinct().count()
    assert(nMedium > 0, "fixture must exercise the null path")

    val prof = Relational8.qProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.size == 5)
    prof.values.foreach(r => assert(r.getLong(1) == nRows))

    val key = prof("o_orderkey")
    assert(key.getLong(2) == nRows && key.getLong(3) == nRows,
      "primary key: no nulls, all distinct")

    val prio = prof("o_orderpriority")
    assert(prio.getLong(2) == nRows - nMedium, "nullif rows drop from n_filled")
    assert(prio.getLong(3) == nPrio - 1, "null is not a distinct value")
    assert(prio.getString(4) != null && !prio.getString(4).contains("MEDIUM"))
  }
}
