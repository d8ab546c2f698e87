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

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_range_frame", qRangeFrame, Some(qRangeFrameSql)),
    QueryDef("q_correlated", qCorrelated, Some(qCorrelatedSql)),
    QueryDef("q_approx", qApprox, None))
}
