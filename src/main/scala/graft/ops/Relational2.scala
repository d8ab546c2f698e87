package graft.ops

import graft.{QueryDef, Tables}
import graft.QueryDef.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second wave of relational coverage: set operations, semi/anti joins,
  * exact statistical moments, percentiles, correlated-style filters and
  * funnel analytics. Statistical aggregates are derived from
  * decimal-exact power sums so both engines compute bit-identical
  * doubles (never engine-native stddev/corr, whose accumulation order
  * differs).
  */
object Relational2 {

  // ---- semi / anti joins ---------------------------------------------
  def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > 400000)
    val withBig = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_big_order").as("status"))
    val withoutBig = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_big_order").as("status"))
    withBig.unionByName(withoutBig).orderBy("c_custkey")
  }

  val qSemiAntiSql: String = """
    WITH big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000)
    SELECT c_custkey, 'has_big_order' AS status FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM big)
    UNION ALL
    SELECT c_custkey, 'no_big_order' AS status FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM big)
    ORDER BY c_custkey"""

  // ---- set operations ------------------------------------------------
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val buyers = Tables.load(s, dir, "orders").select(col("o_custkey").as("k"))
    val sessionUsers = Tables.loadEventsUs(s, dir)
      .select(col("user_id").as("k"))
    val both = buyers.intersect(sessionUsers)
      .select(col("k"), lit("both").as("src"))
    val buyersOnly = buyers.except(sessionUsers)
      .select(col("k"), lit("buyer_only").as("src"))
    both.unionByName(buyersOnly).orderBy("k", "src")
  }

  val qSetOpsSql: String = """
    SELECT k, 'both' AS src FROM
      (SELECT o_custkey AS k FROM orders INTERSECT SELECT user_id FROM events)
    UNION ALL
    SELECT k, 'buyer_only' AS src FROM
      (SELECT o_custkey AS k FROM orders EXCEPT SELECT user_id FROM events)
    ORDER BY k, src"""

  // ---- exact statistical moments -------------------------------------
  /** stddev/variance/correlation from decimal-exact power sums:
    * var = (n·Σx² − (Σx)²) / (n·(n−1)) etc. Divisions and sqrt are
    * single deterministic IEEE ops over exact inputs.
    */
  def qStats(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val x = col("l_quantity"); val y = col("l_extendedprice")
    // power sums through the native dsum128 (x, y are 2 dp, so the
    // squares/cross terms are exactly 4 dp — inside the envelope; the
    // oracle's DECIMAL(28,s) casts produce the identical values)
    l.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        QueryDef.dsum(x, 2).as("sum_x"),
        QueryDef.dsum(x * x, 4).as("sum_x2"),
        QueryDef.dsum(y, 2).as("sum_y"),
        QueryDef.dsum(y * y, 4).as("sum_y2"),
        QueryDef.dsum(x * y, 4).as("sum_xy"))
      .select(col("l_returnflag"), col("n"),
        round((col("sum_x2") * col("n") - col("sum_x") * col("sum_x")) /
          (col("n") * (col("n") - 1)), 6).as("var_qty"),
        round(sqrt((col("sum_x2") * col("n") - col("sum_x") * col("sum_x")) /
          (col("n") * (col("n") - 1))), 6).as("sd_qty"),
        round((col("n") * col("sum_xy") - col("sum_x") * col("sum_y")) /
          (sqrt(col("n") * col("sum_x2") - col("sum_x") * col("sum_x")) *
           sqrt(col("n") * col("sum_y2") - col("sum_y") * col("sum_y"))), 6)
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  val qStatsSql: String = """
    WITH m AS (
      SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_x,
        CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_x2,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_y,
        CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_y2,
        CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_xy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
      ROUND((sum_x2 * n - sum_x * sum_x) / (n * (n - 1)), 6) AS var_qty,
      ROUND(sqrt((sum_x2 * n - sum_x * sum_x) / (n * (n - 1))), 6) AS sd_qty,
      ROUND((n * sum_xy - sum_x * sum_y) /
            (sqrt(n * sum_x2 - sum_x * sum_x) * sqrt(n * sum_y2 - sum_y * sum_y)), 6)
        AS corr_qty_price
    FROM m ORDER BY l_returnflag"""

  // ---- exact percentiles (interpolated, computed from sorted rank) ---
  /** Median + p90 of order totals per priority. Both engines implement
    * the same interpolated-quantile definition; values come out of one
    * arithmetic interpolation between two exact doubles. */
  def qPercentile(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    val ranked = o.select(col("o_orderpriority"), col("o_totalprice"),
      row_number().over(w).as("rk"),
      count(lit(1)).over(Window.partitionBy("o_orderpriority")).as("n"))
    def interp(p: Double) = {
      val h = lit(p) * (col("n") - 1) + 1 // 1-based rank position
      val lo = floor(h).cast("long"); val hi = ceil(h).cast("long")
      val frac = h - floor(h)
      round(max(when(col("rk") === lo, col("o_totalprice") * (lit(1.0) - frac))) +
        max(when(col("rk") === hi, col("o_totalprice") * frac)), 6)
    }
    ranked.groupBy("o_orderpriority")
      .agg(interp(0.5).as("p50"), interp(0.9).as("p90"))
      .orderBy("o_orderpriority")
  }

  val qPercentileSql: String = """
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS rk,
        COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders)
    SELECT o_orderpriority,
      ROUND(MAX(CASE WHEN rk = CAST(floor(0.5 * (n - 1) + 1) AS BIGINT)
                THEN o_totalprice * (1.0 - (0.5 * (n - 1) + 1 - floor(0.5 * (n - 1) + 1))) END) +
            MAX(CASE WHEN rk = CAST(ceil(0.5 * (n - 1) + 1) AS BIGINT)
                THEN o_totalprice * (0.5 * (n - 1) + 1 - floor(0.5 * (n - 1) + 1)) END), 6) AS p50,
      ROUND(MAX(CASE WHEN rk = CAST(floor(0.9 * (n - 1) + 1) AS BIGINT)
                THEN o_totalprice * (1.0 - (0.9 * (n - 1) + 1 - floor(0.9 * (n - 1) + 1))) END) +
            MAX(CASE WHEN rk = CAST(ceil(0.9 * (n - 1) + 1) AS BIGINT)
                THEN o_totalprice * (0.9 * (n - 1) + 1 - floor(0.9 * (n - 1) + 1)) END), 6) AS p90
    FROM ranked
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- funnel analytics over the event stream ------------------------
  /** signup → click → purchase funnel: per user, did each step happen
    * after the previous one (first qualifying occurrence)? */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEventsUs(s, dir)
    val steps = e.groupBy("user_id").agg(
      min(when(col("event_type") === "signup", col("ts_us"))).as("t_signup"))
      .join(e.select(col("user_id"), col("event_type"), col("ts_us")), Seq("user_id"))
      .groupBy("user_id")
      .agg(
        first(col("t_signup")).as("t_signup"),
        min(when(col("event_type") === "click" &&
          col("ts_us") > col("t_signup"), col("ts_us"))).as("t_click"))
    val funnel = steps
      .join(e.select(col("user_id"), col("event_type"), col("ts_us")), Seq("user_id"))
      .groupBy("user_id")
      .agg(
        first(col("t_signup")).as("t_signup"),
        first(col("t_click")).as("t_click"),
        min(when(col("event_type") === "purchase" &&
          col("ts_us") > col("t_click"), col("ts_us"))).as("t_purchase"))
    funnel.select(col("user_id"),
        col("t_signup").isNotNull.cast("int").as("s1"),
        col("t_click").isNotNull.cast("int").as("s2"),
        col("t_purchase").isNotNull.cast("int").as("s3"))
      .groupBy("s1", "s2", "s3")
      .agg(count(lit(1)).as("users"))
      .orderBy("s1", "s2", "s3")
  }

  val qFunnelSql: String = """
    WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
    s1 AS (SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts_us END) AS t_signup
           FROM e GROUP BY user_id),
    s2 AS (SELECT e.user_id, MAX(s1.t_signup) AS t_signup,
             MIN(CASE WHEN e.event_type = 'click' AND e.ts_us > s1.t_signup
                 THEN e.ts_us END) AS t_click
           FROM s1 JOIN e ON s1.user_id = e.user_id GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MAX(s2.t_signup) AS t_signup,
             MAX(s2.t_click) AS t_click,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts_us > s2.t_click
                 THEN e.ts_us END) AS t_purchase
           FROM s2 JOIN e ON s2.user_id = e.user_id GROUP BY e.user_id)
    SELECT CAST(t_signup IS NOT NULL AS INTEGER) AS s1,
           CAST(t_click  IS NOT NULL AS INTEGER) AS s2,
           CAST(t_purchase IS NOT NULL AS INTEGER) AS s3,
           COUNT(*) AS users
    FROM s3 GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  // ---- semi-structured JSON column processing ------------------------
  def qJson(s: SparkSession, dir: String): DataFrame = {
    Tables.loadEventsUs(s, dir)
      .select(from_json(col("props"), lit("k INT")).getField("k").as("k"),
        col("value"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("total_value"))
      .orderBy("k_mod")
  }

  val qJsonSql: String = """
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1 ORDER BY 1"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_json", qJson, Some(qJsonSql)),
    QueryDef("q_semi_anti", qSemiAnti, Some(qSemiAntiSql)),
    QueryDef("q_setops", qSetOps, Some(qSetOpsSql)),
    QueryDef("q_stats", qStats, Some(qStatsSql)),
    QueryDef("q_percentile", qPercentile, Some(qPercentileSql)),
    QueryDef("q_funnel", qFunnel, Some(qFunnelSql)))
}
