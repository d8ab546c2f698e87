package graft.ops

import graft.{QueryDef, Tables}
import graft.QueryDef.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventh relational wave — the last two TPC-H plan shapes missing
  * from the family (the test schema has no l_shipmode / l_commitdate /
  * l_receiptdate, so Q12's "late by ship mode" becomes "late by
  * ship-delay band"):
  *
  *   Q12 conditional two-way counts over a joined band (high- vs
  *       low-priority orders per shipping-delay band)
  *   Q14 conditional-numerator revenue share (promo parts / all parts)
  *
  * With these, all 22 TPC-H shapes have an oracle-gated analogue
  * (Q10=q_returned_top, Q15=q_top_supplier, Q18=q_large_orders,
  * Q19=q_disjunctive; the rest carry their own q{N} keys).
  * Numeric policy unchanged: decimal-routed sums, single IEEE
  * division, deterministic ORDER BY.
  */
object Relational7 {

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q12 shipping-priority counts: 1997 lineitems bucketed by how many
    * days after the order date they shipped; per band, how many came
    * from high-priority (1-URGENT / 2-HIGH) vs other orders. Orders is
    * the smaller side here only by projection — the join shuffles on
    * the order key and the two counts fold into one conditional
    * aggregation pass (no second scan per class). */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_shipdate")
    val o = Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val highPrio = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_band",
        when(datediff(col("l_shipdate"), col("o_orderdate")) > 90, "90+")
          .when(datediff(col("l_shipdate"), col("o_orderdate")) > 30, "31-90")
          .otherwise("0-30"))
      .groupBy("delay_band")
      .agg(
        sum(when(highPrio, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(highPrio, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("delay_band")
  }

  val q12Sql: String = """
    SELECT
      CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90 THEN '90+'
           WHEN datediff('day', o_orderdate, l_shipdate) > 30 THEN '31-90'
           ELSE '0-30' END AS delay_band,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1 ORDER BY 1"""

  /** Q14 promo revenue share: percentage of one quarter's revenue from
    * PROMO-type parts — conditional numerator over the same rows as
    * the denominator, so one aggregation pass; part dim broadcast.
    * Both sums are decimal-routed and the division happens once in
    * double space, matching the oracle bit-for-bit. */
  def q14(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_type")
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)), 6) /
        dsum(rev, 6)).as("promo_revenue"))
  }

  val q14Sql: String = """
    SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
        AS DECIMAL(18,6))) AS DOUBLE)
      / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'"""

  /** Explicit GROUPING SETS — the third grouping-lattice shape next to
    * q_rollup and q_cube: user-chosen set list rather than the full
    * lattice ((nation, priority), (nation), (priority) — but NOT the
    * grand total, which neither ROLLUP nor CUBE can omit). One
    * Expand + one hash aggregate; GROUPING() markers disambiguate the
    * NULL-as-subtotal rows from genuine NULLs. */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders_gs")
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer_gs")
    Tables.load(s, dir, "nation").createOrReplaceTempView("nation_gs")
    s.sql("""
      SELECT n_name, o_orderpriority,
             CAST(GROUPING(n_name) AS INT) AS g_n,
             CAST(GROUPING(o_orderpriority) AS INT) AS g_p,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders_gs
      JOIN customer_gs ON o_custkey = c_custkey
      JOIN nation_gs ON c_nationkey = n_nationkey
      GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), (o_orderpriority))
      ORDER BY g_n, g_p, n_name, o_orderpriority""")
  }

  val qGroupingSetsSql: String = """
    SELECT n_name, o_orderpriority,
           CAST(GROUPING(n_name) AS INTEGER) AS g_n,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_p,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), (o_orderpriority))
    ORDER BY g_n, g_p, n_name, o_orderpriority"""

  /** percent_rank + cume_dist per order priority — the rank-family
    * windows q_ntile/q_nth_value don't cover. Fully tie-broken order
    * (totalprice, orderkey) makes both fractions deterministic exact
    * divisions of identical integers — hash-exact cross-engine. One
    * sort per priority partition, no global window. */
  def qPercentRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  val qPercentRankSql: String = """
    SELECT o_orderpriority, o_orderkey,
           PERCENT_RANK() OVER (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey) AS pr,
           CUME_DIST() OVER (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey) AS cd
    FROM orders
    ORDER BY o_orderpriority, o_orderkey"""

  /** Wide→long UNPIVOT — the inverse of the pivot family, as the
    * declarative unpivot operator (compiles to one Expand, a pure map
    * stage: zero shuffle beyond the presentation sort). Sampled down
    * so the oracle artifact stays bounded. */
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("quantity"),
        col("l_extendedprice").cast("double").as("extendedprice"),
        col("l_discount").cast("double").as("discount"),
        col("l_tax").cast("double").as("tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("quantity"), col("extendedprice"),
          col("discount"), col("tax")),
        "measure", "value")
      .orderBy("l_orderkey", "l_linenumber", "measure")

  /** UNION ALL mirror — value-identical to the Expand, engine-portable. */
  val qUnpivotSql: String = """
    WITH src AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS DOUBLE) AS quantity,
             CAST(l_extendedprice AS DOUBLE) AS extendedprice,
             CAST(l_discount AS DOUBLE) AS discount,
             CAST(l_tax AS DOUBLE) AS tax
      FROM lineitem WHERE l_orderkey % 100 = 0)
    SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure, quantity AS value FROM src
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice', extendedprice FROM src
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', discount FROM src
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', tax FROM src)
    ORDER BY l_orderkey, l_linenumber, measure"""

  /** Ordered string aggregation (LISTAGG/string_agg): per nation, the
    * 5 richest customers' names joined in rank order. Bounded top-k
    * via map-side sorted-slice aggregation (k structs of state per
    * group), then one in-row concat — never a window over the full
    * customer set, and the unbounded-group-string risk is capped by
    * construction. Deterministic: total order (acctbal DESC, name). */
  def qStringAgg(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        slice(array_sort(collect_list(struct(
          (-col("c_acctbal")).cast("double").as("na"),
          col("c_name").as("name")))), 1, 5).as("top"),
        count(lit(1)).as("n_cust"))
      .select(col("n_name"),
        concat_ws(",", transform(col("top"), t => t.getField("name")))
          .as("top_names"),
        col("n_cust"))
      .orderBy("n_name")
  }

  val qStringAggSql: String = """
    WITH ranked AS (
      SELECT n_name, c_name,
             ROW_NUMBER() OVER (PARTITION BY n_name
               ORDER BY c_acctbal DESC, c_name) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey),
    agg AS (
      SELECT n_name, string_agg(c_name, ',' ORDER BY rn) AS top_names
      FROM ranked WHERE rn <= 5 GROUP BY n_name),
    cnt AS (
      SELECT n_name, COUNT(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT agg.n_name, agg.top_names, cnt.n_cust
    FROM agg JOIN cnt USING (n_name)
    ORDER BY n_name"""

  /** FULL OUTER JOIN — the one join type the registry didn't cover
    * (inner/left/semi/anti/lateral/asof all have rows). Key domains
    * deliberately mismatch (custkey%40 vs suppkey%55) so BOTH null
    * sides appear and the outer semantics are hash-certified, nulls
    * included. Aggregate-then-join: both sides shrink to ≤55 rows
    * before the join, so the outer join itself is trivial at any
    * scale. */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
      .groupBy((col("c_custkey") % 40).as("k"))
      .agg(count(lit(1)).as("n_cust"))
    val su = Tables.load(s, dir, "supplier")
      .groupBy((col("s_suppkey") % 55).as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(su, col("k") === col("sk"), "full_outer")
      .select(coalesce(col("k"), col("sk")).as("bucket"),
        col("n_cust"), col("n_supp"))
      .orderBy("bucket")
  }

  val qFullOuterSql: String = """
    WITH c AS (
      SELECT c_custkey % 40 AS k, COUNT(*) AS n_cust
      FROM customer GROUP BY 1),
    s AS (
      SELECT s_suppkey % 55 AS sk, COUNT(*) AS n_supp
      FROM supplier GROUP BY 1)
    SELECT COALESCE(c.k, s.sk) AS bucket, c.n_cust, s.n_supp
    FROM c FULL OUTER JOIN s ON c.k = s.sk
    ORDER BY bucket"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("q12_delay_bands", q12, Some(q12Sql)),
    QueryDef("q_percent_rank", qPercentRank, Some(qPercentRankSql)),
    QueryDef("q_unpivot", qUnpivot, Some(qUnpivotSql)),
    QueryDef("q_string_agg", qStringAgg, Some(qStringAggSql)),
    QueryDef("q_full_outer", qFullOuter, Some(qFullOuterSql)),
    QueryDef("q14_promo_share", q14, Some(q14Sql)),
    QueryDef("q_grouping_sets", qGroupingSets, Some(qGroupingSetsSql)))
}
