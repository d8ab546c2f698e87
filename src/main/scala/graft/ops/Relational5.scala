package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fifth relational wave: argmin join-back (TPC-H Q2's core shape),
  * anti-join against a scalar-subquery threshold (Q22), and analytic
  * function breadth (ntile / cume_dist / percent_rank, frame-bounded
  * first/last/nth values). Numeric policy unchanged: exact decimal
  * sums, single IEEE divisions, fully tie-broken window orders.
  */
object Relational5 {

  /** Q2-core argmin join-back: per part, the cheapest sale and the
    * smallest supplier key achieving it. The min is computed once per
    * key (partial-aggregated) and joined back — no window over the
    * whole fact table. */
  def q2(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice")
    val mins = l.groupBy("l_partkey")
      .agg(min("l_extendedprice").as("min_price"))
    l.join(mins, Seq("l_partkey"))
      .filter(col("l_extendedprice") === col("min_price"))
      .groupBy("l_partkey", "min_price")
      .agg(min("l_suppkey").as("best_supp"))
      .orderBy("l_partkey")
      .limit(100)
  }

  val q2Sql: String = """
    WITH mins AS (
      SELECT l_partkey, MIN(l_extendedprice) AS min_price
      FROM lineitem GROUP BY 1)
    SELECT l.l_partkey AS l_partkey, m.min_price, MIN(l.l_suppkey) AS best_supp
    FROM lineitem l JOIN mins m
      ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.min_price
    GROUP BY 1, 2 ORDER BY 1 LIMIT 100"""

  /** Q22-style idle high-balance customers: above-average balance,
    * no recent orders — scalar-subquery threshold (one tiny aggregate,
    * broadcast) + left-anti join against the date-filtered fact. */
  def q22(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").select("c_custkey", "c_acctbal")
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double") /
        count(lit(1))).as("a"))
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("a"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")
          .as("totacctbal"))
  }

  val q22Sql: String = """
    WITH a AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0.0)
    SELECT COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, a
    WHERE c_acctbal > a.a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1998-01-01')"""

  /** Analytic-function breadth: quartile, cumulative distribution and
    * percent rank of each order's price within its priority class.
    * Fully tie-broken order ⇒ the rank-arithmetic doubles are
    * bit-equal cross-engine. */
  def qNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") % 97 === 0) // small deterministic sample
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        cume_dist().over(w).as("cd"),
        percent_rank().over(w).as("pr"))
      .orderBy("o_orderkey")
  }

  val qNtileSql: String = """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
      CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
      CUME_DIST() OVER w AS cd,
      PERCENT_RANK() OVER w AS pr
    FROM orders
    WHERE o_orderkey % 97 = 0
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey"""

  /** Frame-bounded value functions: cheapest/most-expensive/second
    * order price per customer from an unbounded frame. */
  def qNth(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        first_value(col("o_totalprice")).over(w).as("cheapest"),
        last_value(col("o_totalprice")).over(w).as("dearest"),
        nth_value(col("o_totalprice"), 2).over(w).as("second"))
      .filter(col("o_custkey") % 50 === 0)
      .orderBy("o_custkey", "o_orderkey")
  }

  val qNthSql: String = """
    SELECT o_custkey, o_orderkey, o_totalprice,
      FIRST_VALUE(o_totalprice) OVER w AS cheapest,
      LAST_VALUE(o_totalprice) OVER w AS dearest,
      NTH_VALUE(o_totalprice, 2) OVER w AS second
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey"""

  /** Salted fact⋈dim join under the oracle gate: row-identical to the
    * plain join by construction (SkewJoin.saltedJoin), aggregated per
    * supplier so the oracle is a plain-join GROUP BY. */
  def qSalted(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.load(s, dir, "lineitem")
      .select("l_suppkey", "l_quantity")
    val dim = Tables.load(s, dir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    SkewJoin.saltedJoin(fact, dim, "l_suppkey", buckets = 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
          .as("qty"))
      .orderBy("s_nationkey")
  }

  val qSaltedSql: String = """
    SELECT s_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1 ORDER BY 1"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("q2_argmin", q2, Some(q2Sql)),
    QueryDef("q22_idle_rich", q22, Some(q22Sql)),
    QueryDef("q_ntile", qNtile, Some(qNtileSql)),
    QueryDef("q_nth_value", qNth, Some(qNthSql)),
    QueryDef("q_salted_join", qSalted, Some(qSaltedSql)))
}
