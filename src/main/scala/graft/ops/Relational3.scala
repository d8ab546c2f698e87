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
    val o = Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t_us"),
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

  /** HLL approximate distinct + approximate quantiles — rows-only (the
    * sketches are engine-specific); AccuracySpec bounds their error. */
  def qApprox(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("apx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("apx_median_price"))
      .orderBy("l_returnflag")
  }

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

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_range_frame", qRangeFrame, Some(qRangeFrameSql)),
    QueryDef("q_correlated", qCorrelated, Some(qCorrelatedSql)),
    QueryDef("q_exists_agg", qExistsAgg, Some(qExistsAggSql)),
    QueryDef("q_cond_share", qCondShare, Some(qCondShareSql)),
    QueryDef("q_case_buckets", qCaseBuckets, Some(qCaseBucketsSql)),
    QueryDef("q_approx", qApprox, None))
}
