package graft.ops

import graft.{QueryDef, Tables}
import graft.QueryDef.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixth relational wave — completes the TPC-H plan-shape family on
  * the trimmed test schema (no partsupp, no commitdate/shipmode, so
  * the supplier↔part relation derives from distinct lineitem pairs
  * and "late" derives from l_shipdate − o_orderdate):
  *
  *   Q4  exists-decorrelated priority counts
  *   Q9  multi-join profit by nation × year
  *   Q11 group-having vs a global scalar threshold
  *   Q13 distribution-of-distribution (counts of counts)
  *   Q16 distinct-count with NOT IN supplier exclusion
  *   Q17 per-key average threshold join-back
  *   Q20 nested semi-join chain (having-filtered pair sums)
  *
  * Numeric policy unchanged (QueryDef.dsum decimal routing, single
  * IEEE divisions, fully deterministic ORDER BY). All joins keep dims
  * broadcast and the single shuffle on the fact edge.
  */
object Relational6 {

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q4 order-priority checking: orders in a 6-month window having at
    * least one lineitem shipped >60 days after the order date. The
    * EXISTS is a left-semi join whose extra predicate compares both
    * sides, so it rides the join condition (no pre-join filter). */
  def q4(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
    o.join(l,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1 ORDER BY 1"""

  /** Q9 product-type profit: revenue minus a retail-price-proportional
    * cost (the schema has no partsupp supplycost), for one part-name
    * token, grouped by supplier nation × ship year. Part and supplier
    * dims broadcast; lineitem shuffles once for the aggregate. */
  def q9(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
      .filter(col("p_name").contains("widget"))
      .select("p_partkey", "p_retailprice")
    val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
    val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.load(s, dir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_shipdate", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("l_shipdate")).as("o_year"))
      .agg(dsum(rev - col("p_retailprice") * lit(0.7) * col("l_quantity"), 6)
        .as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String = """
    SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                    - p_retailprice * 0.7 * l_quantity
               AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY nation, o_year DESC"""

  /** Q11 important keys: parts whose revenue exceeds 1.5× the mean
    * per-part revenue — per-key aggregate HAVING against a one-row
    * scalar aggregate, broadcast instead of recomputed per group. The
    * mean-relative threshold (vs Q11's fixed fraction) keeps the
    * selectivity scale-invariant; the threshold mean is decimal-routed
    * so both engines compute bit-identical cut lines. */
  def q11(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
      .select(col("l_partkey"), rev.as("v"))
    val perPart = Tables.hot(
      l.groupBy("l_partkey").agg(dsum(col("v"), 6).as("value")))
    val thr = perPart.agg(
      (lit(1.5) * (dsum(col("value"), 4) / count(lit(1)))).as("thr"))
    perPart.join(broadcast(thr))
      .filter(col("value") > col("thr"))
      .select("l_partkey", "value")
      .orderBy(col("value").desc, col("l_partkey"))
  }

  val q11Sql: String = """
    WITH v AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS value
      FROM lineitem GROUP BY 1),
    t AS (
      SELECT 1.5 * (CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) AS thr
      FROM v)
    SELECT l_partkey, value FROM v, t
    WHERE value > thr
    ORDER BY value DESC, l_partkey"""

  /** Q13 customer order distribution: orders-per-customer histogram —
    * a left outer join (condition on the right side only, so it pushes
    * below the join) and two cascaded aggregations. */
  def q13(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").select("c_custkey")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY 1)
    GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""

  /** Q16 supplier counts by part attributes: distinct suppliers (via
    * the observed lineitem part↔supplier pairs) per (brand, type,
    * size), excluding one brand and a NOT-IN supplier denylist. */
  def q16(s: SparkSession, dir: String): DataFrame = {
    val ps = Tables.load(s, dir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct()
    val p = Tables.load(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO")
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSupp = Tables.load(s, dir, "supplier")
      .filter(col("s_suppkey") % 7 === 0).select("s_suppkey")
    ps.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16Sql: String = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_suppkey % 7 = 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Q17 small-quantity revenue: lineitems below 20% of their part's
    * average quantity, for one brand — the per-key scalar threshold is
    * aggregated once and joined back (never a correlated rescan). */
  def q17(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val thr = l.groupBy(col("l_partkey").as("pk"))
      .agg((lit(0.2) * (dsum(col("l_quantity"), 2) / count(lit(1))))
        .as("thr"))
    val brand = Tables.load(s, dir, "part")
      .filter(col("p_brand") === "Brand#3").select("p_partkey")
    l.join(broadcast(brand), col("l_partkey") === col("p_partkey"))
      .join(thr, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("thr"))
      .agg((dsum(col("l_extendedprice"), 2) / lit(7.0)).as("avg_yearly"))
  }

  val q17Sql: String = """
    WITH t AS (
      SELECT l_partkey AS pk,
        0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS thr
      FROM lineitem GROUP BY 1)
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN t ON l_partkey = t.pk
    WHERE p_brand = 'Brand#3' AND l_quantity < t.thr"""

  /** Q20 excess-shipment suppliers: suppliers that shipped more than a
    * threshold quantity of any 'large%' part during 1997 — a HAVING on
    * per-(supplier, part) sums feeding a semi join, then the nation
    * dim. Everything left of the fact scan is broadcast. */
  def q20(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
      .filter(col("p_name").startsWith("large")).select("p_partkey")
    val hot = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(dsum(col("l_quantity"), 2).as("qty"))
      .filter(col("qty") > 50.0)
      .select("l_suppkey").distinct()
    val n = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
    Tables.load(s, dir, "supplier")
      .join(hot, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("s_name", "n_name")
      .orderBy("s_name")
  }

  val q20Sql: String = """
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'large%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 50.0)
    ORDER BY s_name"""

  /** LATERAL top-k subquery: each customer's two most expensive
    * orders via a correlated ORDER BY … LIMIT lateral join — the
    * decorrelated plan is the same bounded per-key top-k as
    * q_topk_group, but exercises the SQL lateral-subquery surface
    * (Catalyst's DecorrelateInnerQuery path). */
  def qLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer_lat")
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders_lat")
    s.sql("""
      SELECT c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer_lat, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders_lat
        WHERE o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c_custkey % 10 = 0
      ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
  }

  val qLateralSql: String = """
    SELECT c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c_custkey % 10 = 0
    ORDER BY c_custkey, o_totalprice DESC, o_orderkey"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_lateral", qLateral, Some(qLateralSql)),
    QueryDef("q4_priority", q4, Some(q4Sql)),
    QueryDef("q9_profit", q9, Some(q9Sql)),
    QueryDef("q11_important", q11, Some(q11Sql)),
    QueryDef("q13_custdist", q13, Some(q13Sql)),
    QueryDef("q16_supplier_cnt", q16, Some(q16Sql)),
    QueryDef("q17_small_qty", q17, Some(q17Sql)),
    QueryDef("q20_excess", q20, Some(q20Sql)))
}
