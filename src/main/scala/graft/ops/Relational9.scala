package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ninth relational wave — warehouse data-quality and sequence shapes:
  *
  *   q_integrity  referential-integrity audit across the star schema
  *                (orphan counts per foreign-key edge, one anti-join
  *                aggregate per edge, results unioned)
  *   q_streaks    gaps-and-islands: longest consecutive-day activity
  *                streak per user (the day − dense_rank island trick)
  */
object Relational9 {

  /** Orphan counts for every foreign-key edge of the schema. Each edge
    * is one left-anti join reduced to a single count — the anti side
    * is the key set only (column-pruned scan), and small key sets
    * broadcast. The edges audit in parallel as independent plans
    * under one union — Spark runs them as one job with shared scans
    * where possible. Zero orphans expected on the generator's data;
    * the oracle certifies the zeros are COMPUTED, not assumed. */
  def qIntegrity(s: SparkSession, dir: String): DataFrame = {
    def edge(name: String, fact: DataFrame, fk: String,
             dim: DataFrame, pk: String): DataFrame =
      fact.select(col(fk))
        .join(dim.select(col(pk)), col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("edge"), col("n_orphans"))
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val l = Tables.load(s, dir, "lineitem")
    val p = Tables.load(s, dir, "part")
    val su = Tables.load(s, dir, "supplier")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    Seq(
      edge("orders->customer", o, "o_custkey", c, "c_custkey"),
      edge("lineitem->orders", l, "l_orderkey", o, "o_orderkey"),
      edge("lineitem->part", l, "l_partkey", p, "p_partkey"),
      edge("lineitem->supplier", l, "l_suppkey", su, "s_suppkey"),
      edge("customer->nation", c, "c_nationkey", n, "n_nationkey"),
      edge("supplier->nation", su, "s_nationkey", n, "n_nationkey"),
      edge("nation->region", n, "n_regionkey", r, "r_regionkey"))
      .reduce(_ unionByName _)
      .orderBy("edge")
  }

  val qIntegritySql: String = """
    SELECT * FROM (
      SELECT 'orders->customer' AS edge, COUNT(*) AS n_orphans
      FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      UNION ALL
      SELECT 'lineitem->orders', COUNT(*)
      FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      UNION ALL
      SELECT 'lineitem->part', COUNT(*)
      FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
      UNION ALL
      SELECT 'lineitem->supplier', COUNT(*)
      FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
      UNION ALL
      SELECT 'customer->nation', COUNT(*)
      FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
      UNION ALL
      SELECT 'supplier->nation', COUNT(*)
      FROM supplier WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)
      UNION ALL
      SELECT 'nation->region', COUNT(*)
      FROM nation WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region))
    ORDER BY edge"""

  /** Gaps-and-islands: each user's LONGEST run of consecutive active
    * days plus their island count. Islands form with the classic
    * day_index − dense_rank trick (constant within a consecutive run,
    * jumps across gaps) — all integer arithmetic. Two windows over the
    * same (user × day) partitioning (dedup + dense_rank share one
    * shuffle) and two aggregates; no self-join against shifted copies,
    * which is the naive O(n²)-ish shape. */
  def qStreaks(s: SparkSession, dir: String): DataFrame = {
    val day = 86400000000L
    // integer DIV: epoch-µs exceeds double's 2^53 exact range, so a
    // float division here would round before truncating
    val du = Tables.loadEventsUs(s, dir)
      .select(col("user_id"), expr(s"ts_us DIV $day").as("d"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    du.withColumn("island", col("d") - dense_rank().over(w))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max("len").as("longest_streak"),
        count(lit(1)).as("n_islands"))
      .orderBy("user_id")
  }

  val qStreaksSql: String = """
    WITH du AS (
      SELECT DISTINCT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d
      FROM events),
    isl AS (
      SELECT user_id, d,
             d - DENSE_RANK() OVER (PARTITION BY user_id ORDER BY d)
               AS island
      FROM du),
    runs AS (
      SELECT user_id, island, COUNT(*) AS len
      FROM isl GROUP BY 1, 2)
    SELECT user_id, MAX(len) AS longest_streak,
           COUNT(*) AS n_islands
    FROM runs GROUP BY 1 ORDER BY user_id"""

  /** Mergeable binned quantiles — the percentile companion to
    * q_incr_agg (count/sum/min/max) and q_hll_sketch (distinct):
    * per-type p50/p90 from a FIXED 1000-bin histogram whose state
    * (per-bin counts) merges associatively across partitions, days,
    * or streams — the property exact rank-based percentiles lack, and
    * the reason production pipelines maintain quantiles as sketches.
    * Bin edges come from the global (min, max) via a broadcast 1-row
    * aggregate; the estimate is the midpoint of the first bin whose
    * cumulative count reaches the rank. All boundary decisions are
    * single IEEE ops on identical doubles, so the estimate itself is
    * hash-exact cross-engine. Shape: two aggregates (bin counts, then
    * per-type fold over ≤1000 sorted bins) — the fold runs inside a
    * bounded sorted-slice aggregation, never a window over rows. */
  def qIncrQuantile(s: SparkSession, dir: String): DataFrame = {
    val nBins = 1000
    val e = Tables.load(s, dir, "events").select("event_type", "value")
    val span = e.agg(min("value").as("lo"), max("value").as("hi"))
    val binned = e.crossJoin(broadcast(span))
      .withColumn("bin",
        least(lit(nBins - 1), greatest(lit(0),
          floor((col("value") - col("lo")) / (col("hi") - col("lo"))
            * nBins).cast("int"))))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("c"),
        first("lo").as("lo"), first("hi").as("hi"))
    def est(q: Double) =
      expr(s"""aggregate(bins, named_struct('cum', 0L, 'found', -1),
        (acc, b) -> named_struct(
          'cum', acc.cum + b.c,
          'found', CASE WHEN acc.found >= 0 THEN acc.found
                        WHEN acc.cum + b.c >= CAST(ceil(n * $q) AS BIGINT)
                        THEN b.bin ELSE -1 END),
        acc -> acc.found)""")
    binned
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("bin"), col("c")))).as("bins"),
        sum("c").as("n"), first("lo").as("lo"), first("hi").as("hi"))
      .select(col("event_type"), col("n"),
        (col("lo") + (est(0.5) + 0.5) * ((col("hi") - col("lo")) / nBins))
          .as("p50_est"),
        (col("lo") + (est(0.9) + 0.5) * ((col("hi") - col("lo")) / nBins))
          .as("p90_est"))
      .orderBy("event_type")
  }

  val qIncrQuantileSql: String = """
    WITH span AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
    binned AS (
      SELECT event_type,
        least(999, greatest(0, CAST(floor((value - lo) / (hi - lo) * 1000)
          AS INTEGER))) AS bin,
        COUNT(*) AS c, first(lo) AS lo, first(hi) AS hi
      FROM events CROSS JOIN span
      GROUP BY 1, 2),
    tot AS (
      SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
             first(lo) AS lo, first(hi) AS hi
      FROM binned GROUP BY 1),
    cum AS (
      SELECT event_type, bin, c,
        SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                     ROWS UNBOUNDED PRECEDING) AS cc
      FROM binned),
    pick AS (
      SELECT t.event_type, t.n, t.lo, t.hi,
        (SELECT MIN(bin) FROM cum
         WHERE cum.event_type = t.event_type
           AND cc >= CAST(ceil(t.n * 0.5) AS BIGINT)) AS b50,
        (SELECT MIN(bin) FROM cum
         WHERE cum.event_type = t.event_type
           AND cc >= CAST(ceil(t.n * 0.9) AS BIGINT)) AS b90
      FROM tot t)
    SELECT event_type, n,
           lo + (b50 + 0.5) * ((hi - lo) / 1000) AS p50_est,
           lo + (b90 + 0.5) * ((hi - lo) / 1000) AS p90_est
    FROM pick ORDER BY event_type"""

  /** Day-over-day trend detection: the 10 largest absolute changes in
    * daily event volume per type. Aggregates FIRST (the per-type-day
    * rollup is tiny at any scale), one lag window over the rollup, and
    * a sort-limit (TakeOrdered — never a global row window over the
    * events). Fully tie-broken ordering keeps the top-10 set
    * deterministic cross-engine. */
  def qTopMovers(s: SparkSession, dir: String): DataFrame = {
    val day = 86400000000L
    val w = Window.partitionBy("event_type").orderBy("d")
    Tables.loadEventsUs(s, dir)
      .groupBy(col("event_type"), expr(s"ts_us DIV $day").as("d"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_n", lag("n", 1).over(w))
      .filter(col("prev_n").isNotNull)
      .withColumn("delta", col("n") - col("prev_n"))
      .orderBy(abs(col("delta")).desc, col("event_type"), col("d"))
      .limit(10)
  }

  val qTopMoversSql: String = """
    WITH c AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    l AS (
      SELECT event_type, d, n,
             LAG(n) OVER (PARTITION BY event_type ORDER BY d) AS prev_n
      FROM c)
    SELECT event_type, d, n, prev_n, n - prev_n AS delta
    FROM l WHERE prev_n IS NOT NULL
    ORDER BY abs(n - prev_n) DESC, event_type, d LIMIT 10"""

  /** Incremental JOIN maintenance — the join leg of the IVM family
    * (q_incr_agg = aggregates, q_incr_quantile = percentiles,
    * q_hll_sketch = distincts): a fact⋈dim rollup maintained from two
    * independent fact slices (materialized base before a cut date,
    * delta batch after it), each joined to the static dim and
    * partially aggregated, then MERGED. The oracle recomputes the
    * rollup from the full join, so hash-equality certifies
    * merge(agg(base ⋈ dim), agg(delta ⋈ dim)) ≡ agg((base ∪ delta) ⋈
    * dim) — at 100 TB only the new day's facts ever join again. The
    * cut derives from a broadcast 1-row aggregate (no driver
    * round-trip); dim broadcasts; both aggregations map-side combine. */
  def qIncrJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.withMicros(Tables.load(s, dir, "orders"),
      "o_orderdate", "o_us")
      .select("o_custkey", "o_totalprice", "o_us")
    val cut = o.agg(min("o_us").as("mn"), max("o_us").as("mx"))
      .select(expr("(mn + mx) DIV 2").as("cut_us"))
    val c = Tables.load(s, dir, "customer")
      .select("c_custkey", "c_mktsegment")
    val partials = o.crossJoin(broadcast(cut))
      .withColumn("is_base", (col("o_us") <= col("cut_us")).cast("int"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "is_base")
      .agg(count(lit(1)).as("pn"),
        sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("ps"))
    partials.groupBy("c_mktsegment")
      .agg(sum("pn").as("n_orders"),
        sum("ps").cast("double").as("total"))
      .orderBy("c_mktsegment")
  }

  val qIncrJoinSql: String = """
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY 1"""

  /** Null-safe equality join (<=>): the join-semantics class where
    * NULL keys MATCH each other instead of silently dropping — the
    * behavior "join on a nullable column" usually needs and plain `=`
    * never gives. Keys are routed through nullif so both sides carry
    * genuine NULLs (the generator's data has none), and the aggregate
    * proves the NULL↔NULL bucket actually joined. Spark's <=> compiles
    * into the hash join's key (EqualNullSafe is a valid equi-key), so
    * this stays a plain shuffled/broadcast equi-join — no fallback to
    * a nested-loop condition. Oracle mirrors with IS NOT DISTINCT
    * FROM. */
  def qNullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(nullif((col("o_custkey") % 50), lit(0L)).as("k"),
        col("o_totalprice"))
    val c = Tables.load(s, dir, "customer")
      .groupBy(nullif((col("c_custkey") % 50), lit(0L)).as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    o.join(c, col("k") <=> col("ck"))
      .groupBy(coalesce(col("k"), lit(-1L)).as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"),
        max("n_cust").as("n_cust"))
      .orderBy("bucket")
  }

  val qNullSafeJoinSql: String = """
    WITH o AS (
      SELECT nullif(o_custkey % 50, 0) AS k, o_totalprice FROM orders),
    c AS (
      SELECT nullif(c_custkey % 50, 0) AS ck, COUNT(*) AS n_cust
      FROM customer GROUP BY 1)
    SELECT COALESCE(o.k, -1) AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           MAX(c.n_cust) AS n_cust
    FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.ck
    GROUP BY 1 ORDER BY bucket"""

  /** explode_outer semantics: exploding a possibly-EMPTY array while
    * PRESERVING the parent row (NULL element) — the lateral-view-outer
    * class a plain explode silently violates by dropping rows, which
    * corrupts denominators downstream. Docs shorter than 5 tokens
    * produce empty 5-gram arrays and must survive as NULL-gram rows;
    * the aggregate counts them separately so the preservation is
    * provable. Oracle emulates with the [NULL]-substitution idiom
    * (unnest of CASE WHEN empty THEN [NULL] END). */
  def qExplodeOuter(s: SparkSession, dir: String): DataFrame = {
    Tables.fanout(Tables.load(s, dir, "documents"))
      .select(col("source"), explode_outer(Text.grams(5)).as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_rows"),
        count(col("g")).as("n_grams"),
        sum(when(col("g").isNull, 1L).otherwise(0L)).as("n_short_docs"))
      .orderBy("source")
  }

  val qExplodeOuterSql: String = """
    WITH t AS (
      SELECT source, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT source,
        CASE WHEN len(w) >= 5 THEN
          list_transform(generate_series(1, len(w) - 4),
            i -> array_to_string(w[i:i+4], ' '))
        ELSE [NULL] END AS gs
      FROM t),
    e AS (SELECT source, unnest(gs) AS g FROM g)
    SELECT source, COUNT(*) AS n_rows, COUNT(g) AS n_grams,
           CAST(SUM(CASE WHEN g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_short_docs
    FROM e GROUP BY 1 ORDER BY source"""

  /** Centered RANGE frame — the smoothing window class q_range_frame's
    * trailing frame doesn't cover: each day's value averaged with its
    * neighbors within ±1 day BY VALUE (RANGE, not ROWS — a missing
    * day genuinely shrinks the frame instead of grabbing the next
    * row). Aggregate first (per-type-day rollup, tiny at any scale),
    * then one range window over the rollup. Decimal-routed daily sums
    * make the frame sums exact; the mean divides once. */
  def qCenteredFrame(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = 86400000000L
    val daily = Tables.loadEventsUs(s, dir)
      .groupBy(col("event_type"), expr(s"ts_us DIV $day").as("d"))
      .agg(QueryDef.dsum(col("value"), 4).as("v"), count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("d")
      .rangeBetween(-1, 1)
    daily
      .withColumn("sm",
        round(sum(col("v").cast(org.apache.spark.sql.types.DecimalType(18, 4))).over(w)
          .cast("double") / count(lit(1)).over(w), 6))
      .select("event_type", "d", "n", "sm")
      .orderBy("event_type", "d")
  }

  val qCenteredFrameSql: String = """
    WITH daily AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type, d, n,
           ROUND(CAST(SUM(CAST(v AS DECIMAL(18,4))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w, 6) AS sm
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY d
                 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
    ORDER BY event_type, d"""

  /** SKYLINE (Pareto frontier) — suppliers no other supplier beats on
    * BOTH total cost (lower is better) and total quantity shipped
    * (higher is better): the multi-criteria "best offers" operator
    * some engines ship as SKYLINE OF. Aggregate FIRST (q_top_movers
    * rule): the per-supplier rollup is tiny at any corpus size, so the
    * dominance test runs as one broadcast anti-join over it — the
    * literal NOT EXISTS, which is what the oracle states, so the tie
    * semantics (equal on both axes → both survive; equal on one,
    * strictly worse on the other → dominated) hold by construction
    * rather than via a fragile sweep-order encoding. A raw-row skyline
    * at 100 TB would first reduce per partition (local skylines are a
    * superset of the global one) and anti-join only the survivors.
    */
  def qSkyline(s: SparkSession, dir: String): DataFrame = {
    val roll = Tables.hot(Tables.load(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(QueryDef.dsum(col("l_extendedprice"), 2).as("cost"),
        QueryDef.dsum(col("l_quantity"), 2).as("qty")))
    val dom = roll.as("a").join(broadcast(roll.as("b")),
      col("b.cost") <= col("a.cost") && col("b.qty") >= col("a.qty") &&
        (col("b.cost") < col("a.cost") || col("b.qty") > col("a.qty")),
      "left_anti")
    dom.select(col("l_suppkey"), col("cost"), col("qty"))
      .orderBy("l_suppkey")
  }

  val qSkylineSql: String = """
    WITH roll AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS cost,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY 1)
    SELECT a.l_suppkey, a.cost, a.qty
    FROM roll a
    WHERE NOT EXISTS (
      SELECT 1 FROM roll b
      WHERE b.cost <= a.cost AND b.qty >= a.qty
        AND (b.cost < a.cost OR b.qty > a.qty))
    ORDER BY a.l_suppkey"""

  /** Gini inequality coefficient of customer spend per nation — the
    * concentration metric (revenue concentration, wealth curves,
    * traffic skew) computed from the rank-weighted identity
    * G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx). Aggregate FIRST: the
    * window ranks the per-CUSTOMER rollup (one row per customer),
    * never raw orders; spend sums route through DECIMAL(18,2) so
    * x, Σx and Σ i·x are exact cross-engine, ties rank by (x,
    * custkey) — and since equal x contribute equal i·x under any
    * permutation, the statistic is tie-order invariant anyway. The
    * only doubles are the two final casts feeding one division.
    */
  def qGini(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val spend = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(col("o_totalprice").cast(dec)).as("x"))
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("ck"), col("c_nationkey"))
    val nat = Tables.load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val j = spend.join(broadcast(cust), "ck")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
    val w = Window.partitionBy("n_name").orderBy(col("x"), col("ck"))
    j.withColumn("i", row_number().over(w))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"), sum(col("x")).as("s"),
        sum(col("x") * col("i")).as("s1"))
      .select(col("n_name"), col("n_cust"),
        round(col("s").cast("double"), 2).as("total_spend"),
        round(
          (lit(2) * col("s1") - (col("n_cust") + 1) * col("s")).cast("double") /
            (col("n_cust") * col("s")).cast("double"), 6).as("gini"))
      .orderBy("n_name")
  }

  val qGiniSql: String = """
    WITH spend AS (
      SELECT o_custkey AS ck, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders GROUP BY 1),
    j AS (
      SELECT n.n_name, s.ck, s.x
      FROM spend s
      JOIN customer c ON c.c_custkey = s.ck
      JOIN nation n ON n.n_nationkey = c.c_nationkey),
    r AS (
      SELECT n_name, x,
             ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY x, ck) AS i
      FROM j),
    m AS (
      SELECT n_name, COUNT(*) AS n_cust, SUM(x) AS s, SUM(x * i) AS s1
      FROM r GROUP BY 1)
    SELECT n_name, n_cust, ROUND(CAST(s AS DOUBLE), 2) AS total_spend,
           ROUND(CAST(2 * s1 - (n_cust + 1) * s AS DOUBLE)
                 / CAST(n_cust * s AS DOUBLE), 6) AS gini
    FROM m ORDER BY n_name"""

  /** Attach a 1..5 quintile column derived from a 300-bin MERGEABLE
    * histogram of `xc` (cast to double): bin counts aggregate with
    * map-side combine, the four cut bins fold over the tiny bin table,
    * assignment is an integer comparison against the broadcast cuts —
    * never a global sort/ntile over the input (the q_incr_quantile /
    * text_ppl_bucket machinery, generalized). Cut positions are exact
    * integer ceilings ((i·n+4) DIV 5). */
  private def binnedQuintile(base: DataFrame, xc: String, qn: String): DataFrame = {
    val nb = 300
    val xd = col(xc).cast("double")
    val span = base.agg(min(xd).as("lo"), max(xd).as("hi"))
    val withBin = base.crossJoin(broadcast(span))
      .withColumn(s"${qn}_bin",
        when(col("hi") > col("lo"),
          least(lit(nb - 1), greatest(lit(0),
            floor((xd - col("lo")) / (col("hi") - col("lo")) * nb).cast("int"))))
          .otherwise(0))
      .drop("lo", "hi")
    val counts = withBin.groupBy(col(s"${qn}_bin").as("bin"))
      .agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cc", sum(col("c")).over(Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nn", sum(col("c")).over(Window.partitionBy()))
    val cutCols = (1 to 4).map(i =>
      min(when(col("cc") >= expr(s"($i * nn + 4) DIV 5"), col("bin"))).as(s"c$i"))
    val cuts = cum.agg(cutCols.head, cutCols.tail: _*)
    withBin.crossJoin(broadcast(cuts))
      .withColumn(qn,
        when(col(s"${qn}_bin") <= col("c1"), 1)
          .when(col(s"${qn}_bin") <= col("c2"), 2)
          .when(col(s"${qn}_bin") <= col("c3"), 3)
          .when(col(s"${qn}_bin") <= col("c4"), 4)
          .otherwise(5))
      .drop(s"${qn}_bin", "c1", "c2", "c3", "c4")
  }

  /** RFM customer segmentation — recency (last order day) / frequency
    * (order count) / monetary (decimal-exact spend) quintiles per
    * customer, rolled up to segment cells. Aggregate FIRST (the
    * per-customer rollup), then THREE binned-histogram quintile
    * assignments ([[binnedQuintile]]) — the scale story is that no
    * metric is ever globally sorted: each quintile costs one tiny bin
    * aggregate plus a broadcast of four cut points, which is also the
    * mergeable shape an incremental refresh keeps per day. Output is
    * the ≤125-cell segment matrix with counts and mean spend.
    */
  def qRfm(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val o = Tables.withMicros(Tables.load(s, dir, "orders"),
      "o_orderdate", "od_us")
    val cust = Tables.hot(o.groupBy(col("o_custkey").as("ck"))
      .agg(expr("MAX(od_us DIV 86400000000)").as("r"),
        count(lit(1)).as("f"),
        sum(col("o_totalprice").cast(dec)).as("m")))
    val seg = binnedQuintile(
      binnedQuintile(binnedQuintile(cust, "r", "r_q"), "f", "f_q"), "m", "m_q")
    seg.groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_cust"), sum(col("m")).as("sm"))
      // mean floored to the cent: (100·Σm) DIV n stays INTEGER end to
      // end — a ROUND(double) here hits .xx5 boundaries that the two
      // engines' double-vs-decimal rounding rules break differently
      .select(col("r_q"), col("f_q"), col("m_q"), col("n_cust"),
        (expr("CAST(sm * 100 AS BIGINT) DIV n_cust") / 100.0).as("avg_spend"))
      .orderBy("r_q", "f_q", "m_q")
  }

  val qRfmSql: String = {
    def metric(x: String, p: String): String = s"""
    ${p}span AS (
      SELECT MIN(CAST($x AS DOUBLE)) AS lo, MAX(CAST($x AS DOUBLE)) AS hi
      FROM cust),
    ${p}bin AS (
      SELECT ck, CASE WHEN hi > lo
        THEN least(299, greatest(0,
          CAST(floor((CAST($x AS DOUBLE) - lo) / (hi - lo) * 300) AS INTEGER)))
        ELSE 0 END AS bin
      FROM cust, ${p}span),
    ${p}cnt AS (SELECT bin, COUNT(*) AS c FROM ${p}bin GROUP BY 1),
    ${p}cum AS (
      SELECT bin, SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cc,
             SUM(c) OVER () AS nn
      FROM ${p}cnt),
    ${p}cut AS (
      SELECT MIN(CASE WHEN cc >= (1 * nn + 4) // 5 THEN bin END) AS c1,
             MIN(CASE WHEN cc >= (2 * nn + 4) // 5 THEN bin END) AS c2,
             MIN(CASE WHEN cc >= (3 * nn + 4) // 5 THEN bin END) AS c3,
             MIN(CASE WHEN cc >= (4 * nn + 4) // 5 THEN bin END) AS c4
      FROM ${p}cum),
    ${p}q AS (
      SELECT ck, CASE WHEN bin <= c1 THEN 1 WHEN bin <= c2 THEN 2
                      WHEN bin <= c3 THEN 3 WHEN bin <= c4 THEN 4
                      ELSE 5 END AS q
      FROM ${p}bin, ${p}cut)"""
    s"""
    WITH cust AS (
      SELECT o_custkey AS ck,
             MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000) AS r,
             COUNT(*) AS f,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
      FROM orders GROUP BY 1),
    ${metric("r", "r")},
    ${metric("f", "f")},
    ${metric("m", "m")}
    SELECT rq.q AS r_q, fq.q AS f_q, mq.q AS m_q,
           COUNT(*) AS n_cust,
           CAST(SUM(m) * 100 AS BIGINT) // COUNT(*) / 100.0 AS avg_spend
    FROM cust
    JOIN rq ON rq.ck = cust.ck
    JOIN fq ON fq.ck = cust.ck
    JOIN mq ON mq.ck = cust.ck
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
  }

  /** Benford first-digit audit of order totals — the classic
    * fabricated-numbers / data-quality screen: observed leading-digit
    * shares vs the Benford expectation log₁₀(1+1/d), with each digit's
    * standardized deviation. No runtime libm: the nine Benford
    * probabilities are compile-time LITERALS identical in both
    * engines, and the leading digit comes from the DECIMAL(18,2)
    * string rendering (both engines print plain digits for values
    * ≥ 1). One conditional-aggregation pass; z = (obs −
    * n·p)/√(n·p·(1−p)) is pure double arithmetic + one sqrt.
    */
  def qBenford(s: SparkSession, dir: String): DataFrame = {
    // log10(1 + 1/d) for d = 1..9, printed at 15 significant digits —
    // parsed identically to the same literals in the oracle text
    val p = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d)).toMap
    val dig = substring(col("o_totalprice")
      .cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("string"), 1, 1)
    val base = Tables.load(s, dir, "orders")
      .select(dig.cast("int").as("d"))
      .filter(col("d").between(1, 9))
      .groupBy("d").agg(count(lit(1)).as("n"))
      .withColumn("tot", sum(col("n")).over(Window.partitionBy()))
    val pCol = (1 to 9).map(d => when(col("d") === d, lit(p(d))))
      .reduceRight((a, b) => a.otherwise(b))
    base.select(col("d"), col("n"),
        round(col("n").cast("double") / col("tot"), 6).as("obs_frac"),
        round(pCol, 6).as("benford_frac"),
        round(
          (col("n").cast("double") - col("tot") * pCol) /
            sqrt(col("tot") * pCol * (lit(1.0) - pCol)), 4).as("z"))
      .orderBy("d")
  }

  val qBenfordSql: String = {
    val cases = (1 to 9).map { d =>
      val v = java.math.BigDecimal.valueOf(math.log10(1.0 + 1.0 / d)).toPlainString
      s"WHEN d = $d THEN CAST($v AS DOUBLE)"
    }.mkString(" ")
    s"""
    WITH digs AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
        1, 1) AS INTEGER) AS d
      FROM orders),
    cnt AS (
      SELECT d, COUNT(*) AS n FROM digs WHERE d BETWEEN 1 AND 9 GROUP BY 1),
    m AS (SELECT d, n, SUM(n) OVER () AS tot, CASE $cases END AS p FROM cnt)
    SELECT d, n,
           ROUND(CAST(n AS DOUBLE) / tot, 6) AS obs_frac,
           ROUND(p, 6) AS benford_frac,
           ROUND((CAST(n AS DOUBLE) - tot * p)
                 / sqrt(tot * p * (1 - p)), 4) AS z
    FROM m ORDER BY d"""
  }

  /** Header-vs-detail reconciliation — the double-entry audit every
    * finance warehouse runs: each order's header total against the sum
    * of its line items, classified into matched / header-only (no
    * lines) / discrepant buckets with the total absolute discrepancy.
    * Everything rides DECIMAL(18,2) so "equal" means cent-exact, not
    * within-epsilon; one outer join of the order header to the
    * per-order line rollup (both order-key partitioned — co-located
    * under bucketing at scale), one summary aggregate.
    */
  def qReconcile(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val li = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sum(col("l_extendedprice").cast(dec)).as("detail"))
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("ok"), col("o_totalprice").cast(dec).as("hdr"))
    o.join(li, Seq("ok"), "left")
      .select(
        when(col("detail").isNull, "header_only")
          .when(col("hdr") === col("detail"), "matched")
          .otherwise("discrepant").as("status"),
        coalesce(abs(col("hdr") - col("detail")), col("hdr")).as("gap"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("gap")).as("gd"))
      .select(col("status"), col("n_orders"),
        round(col("gd").cast("double"), 2).as("total_gap"))
      .orderBy("status")
  }

  val qReconcileSql: String = """
    WITH li AS (
      SELECT l_orderkey AS ok,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS detail
      FROM lineitem GROUP BY 1),
    o AS (
      SELECT o_orderkey AS ok, CAST(o_totalprice AS DECIMAL(18,2)) AS hdr
      FROM orders),
    cls AS (
      SELECT CASE WHEN detail IS NULL THEN 'header_only'
                  WHEN hdr = detail THEN 'matched'
                  ELSE 'discrepant' END AS status,
             COALESCE(abs(hdr - detail), hdr) AS gap
      FROM o LEFT JOIN li USING (ok))
    SELECT status, COUNT(*) AS n_orders,
           ROUND(CAST(SUM(gap) AS DOUBLE), 2) AS total_gap
    FROM cls GROUP BY 1 ORDER BY 1"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_reconcile", qReconcile, Some(qReconcileSql)),
    QueryDef("q_benford", qBenford, Some(qBenfordSql)),
    QueryDef("q_rfm", qRfm, Some(qRfmSql)),
    QueryDef("q_gini", qGini, Some(qGiniSql)),
    QueryDef("q_skyline", qSkyline, Some(qSkylineSql)),
    QueryDef("q_centered_frame", qCenteredFrame, Some(qCenteredFrameSql)),
    QueryDef("q_explode_outer", qExplodeOuter, Some(qExplodeOuterSql)),
    QueryDef("q_incr_join", qIncrJoin, Some(qIncrJoinSql)),
    QueryDef("q_null_safe_join", qNullSafeJoin, Some(qNullSafeJoinSql)),
    QueryDef("q_top_movers", qTopMovers, Some(qTopMoversSql)),
    QueryDef("q_integrity", qIntegrity, Some(qIntegritySql)),
    QueryDef("q_incr_quantile", qIncrQuantile, Some(qIncrQuantileSql)),
    QueryDef("q_streaks", qStreaks, Some(qStreaksSql)))
}
