package graft.ops

import graft.{QueryDef, Tables}
import graft.QueryDef.{davg, dsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational core of the engine: scan → filter → join → aggregate →
  * window plans, declared with the DataFrame API so Catalyst handles
  * pushdown, pruning, join selection and AQE re-planning.
  *
  * Numeric policy (shared with every oracle): double sums go through an
  * exact DECIMAL so Spark's partial-aggregation order and DuckDB's
  * sequential order cannot diverge; results are CAST back to DOUBLE.
  * Every query ends in a deterministic ORDER BY.
  */
object Relational {

  private def ts(s: String) = lit(s).cast("timestamp")

  /** TPC-H Q1-style pricing summary. Group cardinality is tiny (RF×LS),
    * so partial map-side aggregation collapses 100 TB of scan into a
    * handful of rows per partition before the single small shuffle.
    */
  def q1(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("2001-09-01"))
    val disc  = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = disc * (lit(1.0) + col("l_tax"))
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(disc, 6).as("sum_disc_price"),
        dsum(charge, 6).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
      ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** Q3-style shipping priority: dim-filtered fact join + top-N.
    * `customer` is broadcast (small dim); lineitem⋈orders shuffles on
    * the order key only once; TakeOrdered handles the limit without a
    * global sort.
    */
  def q3(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") < ts("1999-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") > ts("1999-01-01"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(dsum(disc, 6).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String = """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate  > TIMESTAMP '1999-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10"""

  /** Q5-style local-supplier revenue: 5-way join. region/nation/supplier/
    * customer broadcast; only the orders⋈lineitem edge shuffles.
    */
  def q5(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = Tables.load(s, dir, "nation")
    val sup = Tables.load(s, dir, "supplier")
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
              col("o_orderdate") <  ts("1997-01-01"))
    val l = Tables.load(s, dir, "lineitem")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val dims = sup
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    o.join(l, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(dsum(disc, 6).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String = """
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name"""

  /** Q6-style forecast revenue change: pure scan+filter+agg. The three
    * predicates reach the parquet scan as PushedFilters; only the two
    * needed columns are read.
    */
  def q6(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
              col("l_shipdate") <  ts("1997-01-01") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"))
  }

  val q6Sql: String = """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24"""

  /** Running per-customer spend: one window sort per customer partition;
    * both window functions share a single exchange+sort.
    */
  def qWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("running_spend"),
        row_number().over(w).as("rn"))
      .orderBy("o_custkey", "rn")
  }

  val qWindowSql: String = """
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_spend,
      ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
    ORDER BY o_custkey, rn"""

  /** Top-3 orders per market segment — the row_number-filter idiom; rank
    * runs after a broadcast dim join, no extra shuffle beyond the window.
    */
  def qTopkGroup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").select("c_custkey", "c_mktsegment")
    val o = Tables.load(s, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
      .orderBy("c_mktsegment", "rn")
  }

  val qTopkGroupSql: String = """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey)
    WHERE rn <= 3
    ORDER BY c_mktsegment, rn"""

  /** Multi-level ROLLUP totals; NULL grouping keys are folded to 'ALL' so
    * the output carries no nulls (stable cross-engine ordering).
    */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    // SQL path: the rollup's Expand duplicates grouping attributes, which
    // the DataFrame ambiguous-self-join check rejects when re-selecting
    // them; SQL-scoped resolution has no such issue. Same Catalyst plan.
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
    Tables.load(s, dir, "nation").createOrReplaceTempView("nation")
    Tables.load(s, dir, "region").createOrReplaceTempView("region")
    s.sql(qRollupSql)
  }

  val qRollupSql: String = """
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           COUNT(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY region_name, nation_name"""

  /** Exact multi-column distinct counts per group (expand + two-phase agg
    * under the hood; Catalyst plans the distinct expansion).
    */
  def qDistinct(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")
  }

  val qDistinctSql: String = """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("q1_agg", q1, Some(q1Sql)),
    QueryDef("q3_join_topn", q3, Some(q3Sql)),
    QueryDef("q5_multijoin", q5, Some(q5Sql)),
    QueryDef("q6_filter_agg", q6, Some(q6Sql)),
    QueryDef("q_window", qWindow, Some(qWindowSql)),
    QueryDef("q_topk_group", qTopkGroup, Some(qTopkGroupSql)),
    QueryDef("q_rollup", qRollup, Some(qRollupSql)),
    QueryDef("q_distinct", qDistinct, Some(qDistinctSql)))
}
