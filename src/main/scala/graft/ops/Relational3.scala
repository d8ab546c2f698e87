package graft.ops

import graft.{QueryDef, Tables}
import graft.QueryDef.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third wave: range window frames, correlated-subquery shapes, and
  * approximate aggregates (HLL distinct, approx quantiles — rows-only:
  * sketch implementations differ across engines by design; specs bound
  * their error against exact answers instead).
  */
object Relational3 {

  /** 30-day trailing revenue per customer (RANGE frame over event-time
    * seconds) — the windowed-range idiom AQE can't replan away; one
    * sort per customer partition. */
  def qRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.withMicros(Tables.load(s, dir, "orders"), "o_orderdate", "t_us")
      .select(col("o_custkey"), col("o_orderkey"), col("t_us"),
        col("o_totalprice"))
    val w = Window.partitionBy("o_custkey").orderBy("t_us")
      .rangeBetween(-30L * 86400 * 1000000, 0)
    o.select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("trailing_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val qRangeFrameSql: String = """
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
        RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS trailing_30d
    FROM orders
    ORDER BY o_custkey, o_orderkey"""

  /** Parts priced above their brand's average — the correlated-scalar-
    * subquery shape, decorrelated into a broadcast join of per-brand
    * averages. */
  def qCorrelated(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
    val brandAvg = p.groupBy("p_brand")
      .agg((sum(col("p_retailprice").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("brand_avg"))
    p.join(broadcast(brandAvg), Seq("p_brand"))
      .filter(col("p_retailprice") > col("brand_avg"))
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        round(col("brand_avg"), 6).as("brand_avg"))
      .orderBy("p_partkey")
  }

  val qCorrelatedSql: String = """
    WITH b AS (
      SELECT p_brand,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS brand_avg
      FROM part GROUP BY p_brand)
    SELECT p.p_partkey, p.p_brand, p.p_retailprice,
           ROUND(b.brand_avg, 6) AS brand_avg
    FROM part p JOIN b ON p.p_brand = b.p_brand
    WHERE p.p_retailprice > b.brand_avg
    ORDER BY p.p_partkey"""

  /** HLL approximate distinct + approximate quantiles, gated as a
    * BOUNDED-ERROR AUDIT: the sketch values are engine-specific (no
    * DuckDB replay exists), so the row the gate hashes is the exact
    * computation PLUS booleans asserting the approx landed inside its
    * documented bound — HLL rsd 0.01 → |apx−exact| ≤ 5%·exact (5σ);
    * percentile_approx accuracy 10000 → rank error 1e-4, asserted by
    * bracketing between the exact 0.49/0.51 quantiles. The oracle
    * computes the same exact side and asserts TRUE literally: a sketch
    * drifting out of bounds flips the boolean and fails the hash gate
    * loudly. AccuracySpec additionally bounds the raw sketch error. */
  def qApprox(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    // separate legs ON PURPOSE: folding the distinct leg in with the
    // sketch/percentile aggregates plans an Expand that re-feeds the
    // percentile sort-aggregates the duplicated input (measured 11 s
    // vs 3.4 s at sf0.1)
    val apx = li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("apx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("apx_med"))
    // exact countDistinct as a TWO-LEVEL aggregate (the q_profile /
    // multi-countDistinct precedent): the single-shot form planned the
    // distinct rewrite that also dragged percentile() buffers through
    // a per-(flag, partkey) ObjectHashAggregate — ~200k OpenHashMap
    // buffers built and merged per pass
    val exactParts = li.filter(col("l_partkey").isNotNull)
      .select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag").agg(count(lit(1)).as("exact_parts"))
    // exact percentiles WITHOUT percentile()'s value-map buffers:
    // count-by-value (map-side-combinable codegen HashAggregate), one
    // flag-partitioned sort, cumulative + total counts as two window
    // sums over the SAME exchange, then Spark's own interpolation
    // (Percentile.getPercentile: pos = p·(n−1); lower/higher =
    // floor/ceil; (hi−pos)·v_lo + (pos−lo)·v_hi with the two equal-key
    // short-circuits) replayed bit-exactly on the ≤4 covering rows per
    // flag. Value v covers 0-indexed rank r iff cum−c ≤ r < cum.
    val byVal = li.filter(col("l_extendedprice").isNotNull)
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("l_returnflag")
    val cum = byVal.select(col("l_returnflag"), col("v"), col("c"),
        sum("c").over(wCum).as("cum"), sum("c").over(wAll).as("n"))
      .select(col("l_returnflag"), col("v"), col("c"), col("cum"),
        (lit(0.49) * (col("n") - lit(1L)).cast("double")).as("pos49"),
        (lit(0.51) * (col("n") - lit(1L)).cast("double")).as("pos51"))
      .select(col("*"),
        floor(col("pos49")).as("lo49"), ceil(col("pos49")).as("hi49"),
        floor(col("pos51")).as("lo51"), ceil(col("pos51")).as("hi51"))
    def covers(r: String) =
      col("cum") - col("c") <= col(r) && col(r) < col("cum")
    def vAt(r: String) = max(when(covers(r), col("v")))
    val hits = cum
      .filter(covers("lo49") || covers("hi49") ||
              covers("lo51") || covers("hi51"))
      .groupBy("l_returnflag")
      .agg(vAt("lo49").as("v_lo49"), vAt("hi49").as("v_hi49"),
        vAt("lo51").as("v_lo51"), vAt("hi51").as("v_hi51"),
        max(col("pos49")).as("pos49"), max(col("pos51")).as("pos51"),
        max(col("lo49")).as("lo49"), max(col("hi49")).as("hi49"),
        max(col("lo51")).as("lo51"), max(col("hi51")).as("hi51"))
    def interp(pos: String, lo: String, hi: String,
               vlo: String, vhi: String) =
      when(col(hi) === col(lo), col(vlo))
        .when(col(vhi) === col(vlo), col(vlo))
        .otherwise(
          (col(hi).cast("double") - col(pos)) * col(vlo) +
          (col(pos) - col(lo).cast("double")) * col(vhi))
    val meds = hits.select(col("l_returnflag"),
      interp("pos49", "lo49", "hi49", "v_lo49", "v_hi49").as("med_lo"),
      interp("pos51", "lo51", "hi51", "v_lo51", "v_hi51").as("med_hi"))
    apx.join(exactParts, "l_returnflag").join(meds, "l_returnflag")
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("apx_parts") - col("exact_parts"))
          <= col("exact_parts") * lit(0.05)).as("parts_within_5pct"),
        (col("apx_med") >= col("med_lo") && col("apx_med") <= col("med_hi"))
          .as("median_within_rank_eps"))
      .orderBy("l_returnflag")
  }

  val qApproxSql: String = """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS parts_within_5pct,
           TRUE AS median_within_rank_eps
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Q4-style: orders with at least one late lineitem, counted per
    * priority (EXISTS decorrelated to a semi join). */
  def qExistsAgg(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.load(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val qExistsAggSql: String = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Q14-style: promo revenue share — conditional share of a decimal-
    * exact revenue sum. */
  def qCondShare(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_type")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,6)")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(round(
        sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0).cast("decimal(18,6)")))
          .cast("double") * 100.0 /
          sum(rev).cast("double"), 6).as("promo_share"))
  }

  val qCondShareSql: String = """
    SELECT ROUND(
      CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
               THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) * 100.0 /
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
      6) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-02-01'"""

  /** Q12-style: shipmode-ish buckets via CASE over two tables. */
  def qCaseBuckets(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_orderpriority")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0)).cast("long").as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0)).cast("long").as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val qCaseBucketsSql: String = """
    SELECT l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_linestatus ORDER BY l_linestatus"""

  /** Q7-style: shipping volume between two nation pairs per year. */
  def qNationVolume(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
    val sup = Tables.load(s, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.load(s, dir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    val l = Tables.load(s, dir, "lineitem")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,6)")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation").isin("NATION_1", "NATION_2") &&
              col("cust_nation").isin("NATION_1", "NATION_2") &&
              col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val qNationVolumeSql: String = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name != cn.n_name
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** Q10-style: top-20 customers by returned-item revenue. */
  def qReturnedTop(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.load(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,6)")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal")
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val qReturnedTopSql: String = """
    SELECT c_custkey, c_name, c_acctbal,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** Q15-style: suppliers achieving the maximum quarterly revenue
    * (aggregate reused twice — Catalyst plans the "view" once per
    * branch; the max is a broadcast scalar). */
  def qTopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,6)")).cast("double").as("total_revenue"))
    val maxRev = rev.agg(max("total_revenue").as("m"))
    val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")
    rev.join(broadcast(maxRev))
      .filter(col("total_revenue") === col("m"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  val qTopSupplierSql: String = """
    WITH rev AS (
      SELECT l_suppkey,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey"""

  /** Q18-style: customers with any large-quantity order (HAVING
    * subquery → semi join on the aggregated key). */
  def qLargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.load(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity"), 2).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    val o = Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.load(s, dir, "customer").select("c_custkey", "c_name")
    o.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
      .limit(50)
  }

  val qLargeOrdersSql: String = """
    WITH big AS (
      SELECT l_orderkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150)
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
    FROM orders
    JOIN big ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY sum_qty DESC, o_orderkey LIMIT 50"""

  /** Q19-style: disjunctive multi-clause predicate (OR of ANDs) — an
    * optimizer CNF/pushdown exercise. */
  def qDisjunctive(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_brand", "p_size")
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(18,6)")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 40)))
      .agg(sum(rev).cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  val qDisjunctiveSql: String = """
    SELECT
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 40)"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_top_supplier", qTopSupplier, Some(qTopSupplierSql)),
    QueryDef("q_large_orders", qLargeOrders, Some(qLargeOrdersSql)),
    QueryDef("q_disjunctive", qDisjunctive, Some(qDisjunctiveSql)),
    QueryDef("q_nation_volume", qNationVolume, Some(qNationVolumeSql)),
    QueryDef("q_returned_top", qReturnedTop, Some(qReturnedTopSql)),
    QueryDef("q_range_frame", qRangeFrame, Some(qRangeFrameSql)),
    QueryDef("q_correlated", qCorrelated, Some(qCorrelatedSql)),
    QueryDef("q_exists_agg", qExistsAgg, Some(qExistsAggSql)),
    QueryDef("q_cond_share", qCondShare, Some(qCondShareSql)),
    QueryDef("q_case_buckets", qCaseBuckets, Some(qCaseBucketsSql)),
    QueryDef("q_approx", qApprox, Some(qApproxSql)))
}
