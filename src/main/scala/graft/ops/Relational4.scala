package graft.ops

import graft.{QueryDef, Tables}
import graft.QueryDef.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth relational wave — the remaining classic TPC-H plan shapes:
  * bi-directional nation-pair volume (Q7), market share via
  * conditional aggregation over a multi-join (Q8), the
  * exists/not-exists self-join pattern (Q21), and CUBE grouping sets.
  * Same numeric policy as Relational (decimal-routed double sums,
  * deterministic ORDER BY everywhere).
  */
object Relational4 {

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q7 volume shipping: revenue between two nations in both
    * directions, by ship year. Nation dims broadcast; one fact
    * shuffle for the two-key aggregate. */
  def q7(s: SparkSession, dir: String): DataFrame = {
    val n1 = "NATION_9"; val n2 = "NATION_10"
    val nations = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
    val supp = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        rev.as("volume"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("volume"), 6).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_9' AND cn.n_name = 'NATION_10')
       OR (sn.n_name = 'NATION_10' AND cn.n_name = 'NATION_9')
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** Q8 market share: one supplier nation's share of regional order
    * revenue per order year — conditional aggregation over the same
    * multi-join spine as q5. */
  def q8(s: SparkSession, dir: String): DataFrame = {
    val target = "NATION_3"
    val nations = Tables.load(s, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    val region = Tables.load(s, dir, "region")
      .filter(col("r_name") === "ASIA").select("r_regionkey")
    val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val supp = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(nations.select(col("n_nationkey").as("sk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sk"))
      .select("s_suppkey", "supp_nation")
    val o = Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), rev.as("volume"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((dsum(when(col("supp_nation") === target, col("volume"))
          .otherwise(lit(0.0)), 6) /
        dsum(col("volume"), 6)).as("mkt_share"))
      .orderBy("o_year")
  }

  val q8Sql: String = """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
                         THEN l_extendedprice * (1.0 - l_discount)
                         ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        AS mkt_share
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    GROUP BY 1 ORDER BY 1"""

  /** Q21-style waiting suppliers: orders where a supplier shipped
    * late (>90 days after the order date) while some other supplier
    * on the same order did not. The exists + not-exists pair
    * collapses into ONE aggregation over the order key: per order,
    * count distinct suppliers and distinct LATE suppliers — the
    * blamed supplier exists iff n_late_supp = 1 and n_supp ≥ 2, and
    * it IS that single late supplier (max over the when-late key).
    * One fact shuffle (the orders join) + one hash aggregate replace
    * the semi- and anti- self-joins' two extra fact shuffles; every
    * order contributes at most one row, so numwait is a plain count. */
  def q21(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_orderdate")
    // SHUFFLE_HASH, build=orders: ONE l_orderkey exchange per side that
    // BOTH downstream aggregation levels then reuse (an l_orderkey hash
    // partitioning satisfies groupBy(l_orderkey, l_suppkey) and
    // groupBy(l_orderkey) alike — zero further full-data exchanges).
    // The default route paid broadcast at sf0.1 but flipped to
    // sort-merge past the 10 MB orders estimate at the 10× scale bench:
    // two sorted exchanges for the join PLUS the (okey, skey) and
    // (okey) aggregate exchanges — four full-data shuffles vs this
    // plan's two, and no sort at all.
    val l = Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(o.hint("SHUFFLE_HASH"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
    // two-level, Expand-free: per (order, supplier) fold the line rows
    // to one was-late flag (map-side combinable), then per order count
    // suppliers and late suppliers — no countDistinct row triplication
    l.groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("late")).as("sl"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        sum(col("sl").cast("long")).as("n_late_supp"),
        max(when(col("sl"), col("l_suppkey"))).as("supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .groupBy("supp").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("supp"))
      .limit(20)
  }

  val q21Sql: String = """
    WITH l AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate,
             l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT l1.l_suppkey AS supp, COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM l l1
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY 1 ORDER BY numwait DESC, supp LIMIT 20"""

  /** CUBE grouping sets over the Q1 dimensions with GROUPING()
    * markers — all four grouping sets in one pass (via spark.sql: the
    * DataFrame rollup/cube API re-resolves grouping columns into an
    * ambiguous self-join). */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_cube")
    s.sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
             CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem_cube
      GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""")
  }

  val qCubeSql: String = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag, l_linestatus"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("q7_nation_pair", q7, Some(q7Sql)),
    QueryDef("q8_mkt_share", q8, Some(q8Sql)),
    QueryDef("q21_sole_late", q21, Some(q21Sql)),
    QueryDef("q_cube", qCube, Some(qCubeSql)))
}
