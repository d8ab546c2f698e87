package graft.ops

import graft.{QueryDef, Tables}
import graft.QueryDef.dsum
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Eighth relational wave — three engine capabilities a 100 TB
  * deployment leans on that no earlier key exercises directly:
  *
  *   q_incr_agg   incremental materialized-aggregate MAINTENANCE:
  *                partial-state merge (the "never recompute the base"
  *                contract behind every streaming/batch rollup)
  *   q_bloom_join runtime pre-filter join: a 2-hash Bloom-style
  *                bucket digest of the filtered dim side prunes the
  *                fact BEFORE its shuffle — the manual twin of
  *                Spark's runtime row-level filtering
  *   q_profile    one-pass dataset profiling (null/distinct/min/max
  *                per column) via a single Expand — the data-quality
  *                report every ingest pipeline runs first
  */
object Relational8 {

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Incremental aggregate maintenance. The daily (day, event_type)
    * rollup is maintained as mergeable partial state — (count,
    * decimal sum, min, max) — in two independent slices (events up to
    * a cut instant = the "materialized base", events after it = the
    * "delta batch"), then MERGED by a second aggregation: counts and
    * decimal sums add, min/max fold. The oracle recomputes the rollup
    * directly over all events, so hash-equality certifies the merge
    * algebra (merge(agg(base), agg(delta)) ≡ agg(base ∪ delta)) —
    * the property that lets a 100 TB pipeline aggregate only the new
    * day's data. Decimal-routed sums make the certificate exact: the
    * one-sum and two-sums-then-add orders cannot diverge. The cut is
    * data-derived ((min+max) DIV 2 epoch-µs) via a one-row aggregate
    * broadcast — no driver round-trip. Two hash aggregates, both with
    * map-side partials; no window, no sort beyond presentation. */
  def qIncrAgg(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEventsUs(s, dir)
      .select(col("ts_us"), col("event_type"), col("value"))
    val cut = e.agg(min("ts_us").as("mn"), max("ts_us").as("mx"))
      .select(expr("(mn + mx) DIV 2").as("cut_us"))
    val partials = e.crossJoin(broadcast(cut))
      .withColumn("day_us", col("ts_us") - (col("ts_us") % lit(86400000000L)))
      .withColumn("is_base", (col("ts_us") <= col("cut_us")).cast("int"))
      .groupBy("day_us", "event_type", "is_base")
      .agg(
        count(lit(1)).as("pn"),
        sum(col("value").cast(DecimalType(18, 4))).as("psum"),
        min("value").as("pmin"),
        max("value").as("pmax"))
    partials
      .groupBy("day_us", "event_type")
      .agg(
        sum("pn").as("n"),
        sum("psum").cast("double").as("sum_value"),
        min("pmin").as("min_value"),
        max("pmax").as("max_value"))
      .orderBy("day_us", "event_type")
  }

  val qIncrAggSql: String = """
    SELECT epoch_us(CAST(ts AS TIMESTAMP))
             - epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 AS day_us,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Runtime pre-filter join. The selective dim side (URGENT orders)
    * is digested into a Bloom-style bucket set — TWO independent
    * xxhash64 buckets per key in disjoint ranges [0, m) and [m, 2m) —
    * and the fact side keeps a row only if BOTH of its buckets appear
    * (two broadcast left-semi joins, pure map stages). False
    * positives (~(k/m)² of the fact) flow into the exact equi-join,
    * which removes them, so the digest is semantics-invisible — the
    * oracle is the plain join. At 100 TB this is the shape that wins:
    * the digest is ≤2m ints no matter how large the dim, and fact
    * rows that cannot match never enter the join shuffle. (Spark's
    * own runtime filtering does this under AQE; registering it as an
    * explicit operator makes the contract testable and available on
    * plans the optimizer won't rewrite.) */
  def qBloomJoin(s: SparkSession, dir: String): DataFrame = {
    val m = 1L << 16
    def b1(k: Column): Column = pmod(xxhash64(lit(1), k), lit(m))
    def b2(k: Column): Column = pmod(xxhash64(lit(2), k), lit(m)) + lit(m)
    val dim = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val digest = dim.select(
      explode(array(b1(col("o_orderkey")), b2(col("o_orderkey")))).as("b"))
      .distinct()
    val fact = Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val pruned = fact
      .join(broadcast(digest), b1(col("l_orderkey")) === col("b"), "left_semi")
      .join(broadcast(digest), b2(col("l_orderkey")) === col("b"), "left_semi")
    pruned
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("ym"))
      .agg(count(lit(1)).as("n_lines"), dsum(rev, 4).as("revenue"))
      .orderBy("ym")
  }

  val qBloomJoinSql: String = """
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1 ORDER BY 1"""

  /** One-pass dataset profiling: per column — row count, non-null
    * count, exact distinct count, lexicographic min/max — the report
    * every ingest job emits before a table enters the pipeline. All
    * five columns profile in ONE scan: values are cast to strings
    * through type-stable renderings (decimal(18,2) for the money
    * column, DATE for the timestamp — both print identically in
    * Spark and DuckDB) and stacked to long form by a single Expand,
    * then one aggregation. Priority is routed through nullif so the
    * null-handling paths (count vs count(col), distinct, min/max
    * null-skipping) are actually exercised — the synthetic tables
    * carry no natural NULLs. Expand is a map stage: the only shuffle
    * is the 5-group aggregation. */
  def qProfile(s: SparkSession, dir: String): DataFrame = {
    // fanout FIRST: the 5× stack + distinct partials would otherwise
    // run on the single scan split (geo_bearing precedent; measured
    // 2.75 s wall on 5 CPU-s at sf0.1 before the exchange)
    Tables.fanout(Tables.load(s, dir, "orders"))
      .select(
        col("o_orderkey").cast("string").as("c_key"),
        col("o_custkey").cast("string").as("c_cust"),
        nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("c_prio"),
        col("o_totalprice").cast(DecimalType(18, 2)).cast("string")
          .as("c_price"),
        col("o_orderdate").cast("date").cast("string").as("c_date"))
      .select(expr(
        """stack(5,
             'o_orderkey', c_key,
             'o_custkey', c_cust,
             'o_orderpriority', c_prio,
             'o_totalprice', c_price,
             'o_orderdate', c_date) AS (col_name, v)"""))
      // TWO-LEVEL aggregation (the multi-countDistinct rule): the
      // single-shot countDistinct + min/max(string) form planned FOUR
      // SortAggregates — a string agg BUFFER is not hash-aggregable,
      // so every stage sorted the full stacked stream. Level 1 groups
      // by (col_name, v) with a pure count buffer (HashAggregate,
      // map-side combined — strings are fine as KEYS); level 2 derives
      // every statistic from the deduped value table: only it pays the
      // min/max sort, on |distinct values| rows instead of 5×|rows|.
      .groupBy("col_name", "v")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("col_name")
      .agg(
        sum(col("cnt")).as("n_rows"),
        sum(when(col("v").isNotNull, col("cnt")).otherwise(0L))
          .as("n_filled"),
        count(col("v")).as("n_distinct"),
        min("v").as("min_v"),
        max("v").as("max_v"))
      .orderBy("col_name")
  }

  val qProfileSql: String = """
    WITH src AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS c_key,
             CAST(o_custkey AS VARCHAR) AS c_cust,
             nullif(o_orderpriority, '3-MEDIUM') AS c_prio,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS c_price,
             CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS c_date
      FROM orders),
    long AS (
      SELECT 'o_orderkey' AS col_name, c_key AS v FROM src
      UNION ALL SELECT 'o_custkey', c_cust FROM src
      UNION ALL SELECT 'o_orderpriority', c_prio FROM src
      UNION ALL SELECT 'o_totalprice', c_price FROM src
      UNION ALL SELECT 'o_orderdate', c_date FROM src)
    SELECT col_name,
           COUNT(*) AS n_rows,
           COUNT(v) AS n_filled,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
           MIN(v) AS min_v,
           MAX(v) AS max_v
    FROM long GROUP BY 1 ORDER BY 1"""

  /** Trailing-window distinct: per event day, how many DISTINCT users
    * were active in the trailing 7 days. SQL window frames cannot
    * express COUNT(DISTINCT) OVER RANGE, and the naive per-day rescan
    * is quadratic — the scalable decomposition is contribution
    * explode: dedup to (user, day) once, fan each active day out to
    * the ≤7 report days it contributes to (map-side sequence explode
    * over epoch-µs day buckets), keep report days that exist in the
    * data (tiny day-list broadcast), and count distinct per report
    * day. Work is O(active-pairs × 7) with two narrow shuffles —
    * independent of the window's row count, the property that
    * survives 100 TB. The oracle states the same semantics as a
    * range join, so hash-equality certifies the decomposition. */
  def qSlidingDistinct(s: SparkSession, dir: String): DataFrame = {
    val day = lit(86400000000L)
    val du = Tables.loadEventsUs(s, dir)
      .select((col("ts_us") - (col("ts_us") % day)).as("day_us"),
        col("user_id"))
      .distinct()
    val days = du.select("day_us").distinct()
    du.withColumn("report_day_us",
        explode(sequence(col("day_us"), col("day_us") + day * 6, day)))
      .join(broadcast(days.withColumnRenamed("day_us", "report_day_us")),
        Seq("report_day_us"), "left_semi")
      .groupBy("report_day_us")
      .agg(countDistinct("user_id").as("n_active_7d"))
      .orderBy("report_day_us")
  }

  val qSlidingDistinctSql: String = """
    WITH du AS (
      SELECT DISTINCT
             epoch_us(CAST(ts AS TIMESTAMP))
               - epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 AS day_us,
             user_id
      FROM events),
    days AS (SELECT DISTINCT day_us FROM du)
    SELECT d.day_us AS report_day_us,
           COUNT(DISTINCT du.user_id) AS n_active_7d
    FROM days d JOIN du
      ON du.day_us BETWEEN d.day_us - 6 * 86400000000 AND d.day_us
    GROUP BY 1 ORDER BY 1"""

  /** Deterministic HyperLogLog whose ESTIMATE is itself hash-exact
    * cross-engine — unlike q_approx (Spark's HLL sketch, rows-only by
    * construction), this one puts an approximate-distinct sketch
    * under the full oracle gate. Everything is reproducible integer
    * arithmetic: a 60-bit md5-derived hash (the dedup_simhash trick),
    * bucket = h mod 256, rank ρ from the binary-string length (both
    * engines' bin/%b render without leading zeros), registers as a
    * MAX hash aggregate — the associative merge that makes HLL state
    * mergeable across partitions/days, which is the whole point at
    * 100 TB — and the harmonic sum as SCALED INTEGERS (Σ 2^(53−ρ) in
    * BIGINT): summing 2^−ρ in doubles would make the total depend on
    * accumulation order at ulp scale, the scaled-integer sum is exact
    * in any order. One IEEE division yields the raw estimate, and the
    * standard small-range correction (linear counting over empty
    * registers when raw ≤ 2.5m) applies on top — the branch condition
    * compares exact values, and the single ln rounds at 4 dp, so the
    * gate still holds. rel_err against the exact count is emitted as
    * evidence the estimator actually works. */
  def qHllSketch(s: SparkSession, dir: String): DataFrame = {
    val m = 256L
    val scale = 9007199254740992L // 2^53
    val e = Tables.load(s, dir, "events").select("event_type", "user_id")
    val regs = e
      .withColumn("h", expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("bucket", pmod(col("h"), lit(m)))
      .withColumn("rho", when(expr("h DIV 256") === 0, lit(53))
        .otherwise(lit(53) - length(bin(expr("h DIV 256")))))
      .groupBy("event_type", "bucket")
      .agg(max("rho").as("rho"))
    val est = regs.groupBy("event_type")
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - rho AS INT))"))
          .as("ss"),
        count(lit(1)).as("nb"))
      .select(col("event_type"), col("nb"),
        (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) *
          lit(scale.toDouble) /
          (col("ss") + (lit(m) - col("nb")) * lit(scale)).cast("double"))
          .as("raw"))
      .select(col("event_type"),
        when(col("nb") < m && col("raw") <= lit(2.5 * 256.0),
          lit(256.0) * log(lit(256.0) / (lit(m) - col("nb"))
            .cast("double")))
          .otherwise(col("raw")).as("raw"))
    val exact = e.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    est.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"),
        round(col("raw"), 4).as("hll_est"),
        round(col("raw") / col("n_exact") - 1.0, 6).as("rel_err"))
      .orderBy("event_type")
  }

  val qHllSketchSql: String = """
    WITH h AS (
      SELECT event_type, user_id,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
          AS UBIGINT)::BIGINT AS h
      FROM events),
    b AS (
      SELECT event_type, h % 256 AS bucket,
        CASE WHEN h // 256 = 0 THEN 53
             ELSE 53 - length(printf('%b', h // 256)) END AS rho
      FROM h),
    regs AS (
      SELECT event_type, bucket, MAX(rho) AS rho FROM b GROUP BY 1, 2),
    agg AS (
      SELECT event_type,
        SUM(CAST(1 AS BIGINT) << (53 - rho)) AS ss,
        COUNT(*) AS nb
      FROM regs GROUP BY 1),
    est0 AS (
      SELECT event_type, nb,
        0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0
          / CAST(ss + (256 - nb) * 9007199254740992 AS DOUBLE) AS raw
      FROM agg),
    est AS (
      SELECT event_type,
        CASE WHEN nb < 256 AND raw <= 2.5 * 256.0
             THEN 256.0 * ln(256.0 / CAST(256 - nb AS DOUBLE))
             ELSE raw END AS raw
      FROM est0),
    ex AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1)
    SELECT est.event_type, ex.n_exact,
           ROUND(raw, 4) AS hll_est,
           ROUND(raw / n_exact - 1.0, 6) AS rel_err
    FROM est JOIN ex ON est.event_type = ex.event_type
    ORDER BY est.event_type"""

  /** Time-series resampling with gap fill: per series, a dense daily
    * grid over the observed span with missing days carried forward
    * (LOCF — the standard sensor/metric resample before a model sees
    * the data; days before a series' first observation stay NULL,
    * flagged by `filled`). Scale shape: the day grid is a broadcast
    * 1-row span × per-series sequence-explode (bounded by the span,
    * never a cross join of rows), the observed rollup is one
    * map-side-combined aggregate, and the carry-forward is one
    * last_value(ignoreNulls) window per series — a single shuffle on
    * the series key. Decimal-routed observed sums make the carried
    * values exact cross-engine. */
  def qGapFill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = 86400000000L
    val obs = Tables.loadEventsUs(s, dir)
      .select((col("user_id") % 100).as("series"),
        (col("ts_us") - (col("ts_us") % lit(day))).as("day_us"),
        col("value"))
      .groupBy("series", "day_us")
      .agg(dsum(col("value"), 4).as("v"))
    val span = obs.agg(min("day_us").as("d0"), max("day_us").as("d1"))
    val grid = obs.select("series").distinct()
      .crossJoin(broadcast(span))
      .select(col("series"),
        explode(sequence(col("d0"), col("d1"), lit(day))).as("day_us"))
    val w = Window.partitionBy("series").orderBy("day_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("series", "day_us"), "left")
      .withColumn("observed", col("v").isNotNull)
      .withColumn("value", last(col("v"), ignoreNulls = true).over(w))
      .select("series", "day_us", "value", "observed")
      .orderBy("series", "day_us")
  }

  val qGapFillSql: String = """
    WITH obs AS (
      SELECT user_id % 100 AS series,
             epoch_us(CAST(ts AS TIMESTAMP))
               - epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 AS day_us,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2),
    span AS (SELECT MIN(day_us) AS d0, MAX(day_us) AS d1 FROM obs),
    days AS (
      SELECT unnest(generate_series(d0, d1, 86400000000)) AS day_us
      FROM span),
    grid AS (
      SELECT s.series, d.day_us
      FROM (SELECT DISTINCT series FROM obs) s CROSS JOIN days d)
    SELECT g.series, g.day_us,
           last_value(o.v IGNORE NULLS) OVER (
             PARTITION BY g.series ORDER BY g.day_us
             ROWS UNBOUNDED PRECEDING) AS value,
           o.v IS NOT NULL AS observed
    FROM grid g LEFT JOIN obs o
      ON g.series = o.series AND g.day_us = o.day_us
    ORDER BY g.series, g.day_us"""

  /** Statistical anomaly flagging — the outlier-filter stage of a
    * metrics/quality pipeline: per event type, events beyond ±3σ of
    * the type's value distribution. Two-pass shape: one map-side-
    * combined aggregate builds (n, Σv, Σv²) per type from DECIMAL
    * power sums (the q_stats policy — partial-order-proof), the tiny
    * stats table broadcasts back, and a second conditional aggregate
    * counts the flags. Every z is derived from identical doubles in
    * both engines, so the >3 threshold compares deterministically. */
  def qAnomaly(s: SparkSession, dir: String): DataFrame = {
    def d(c: Column, sc: Int) = c.cast(DecimalType(28, sc))
    val e = Tables.load(s, dir, "events").select("event_type", "value")
    val stats = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(d(col("value"), 6)).cast("double").as("sx"),
        sum(d(col("value") * col("value"), 8)).cast("double").as("sx2"))
      .select(col("event_type"), col("n"),
        (col("sx") / col("n")).as("mean"),
        sqrt((col("sx2") * col("n") - col("sx") * col("sx")) /
          (col("n") * (col("n") - 1))).as("sd"))
    val z = (col("value") - col("mean")) / col("sd")
    e.join(broadcast(stats), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(z > 3.0, 1L).otherwise(0L)).as("n_hi"),
        sum(when(z < -3.0, 1L).otherwise(0L)).as("n_lo"),
        round(max(z), 6).as("max_z"))
      .orderBy("event_type")
  }

  val qAnomalySql: String = """
    WITH stats AS (
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE) AS sx2
      FROM events GROUP BY 1),
    m AS (
      SELECT event_type, n, sx / n AS mean,
             sqrt((sx2 * n - sx * sx) / (n * (n - 1))) AS sd
      FROM stats)
    SELECT e.event_type, COUNT(*) AS n,
      CAST(SUM(CASE WHEN (e.value - m.mean) / m.sd > 3.0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
      CAST(SUM(CASE WHEN (e.value - m.mean) / m.sd < -3.0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      ROUND(MAX((e.value - m.mean) / m.sd), 6) AS max_z
    FROM events e JOIN m ON e.event_type = m.event_type
    GROUP BY 1 ORDER BY 1"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_incr_agg", qIncrAgg, Some(qIncrAggSql)),
    QueryDef("q_bloom_join", qBloomJoin, Some(qBloomJoinSql)),
    QueryDef("q_sliding_distinct", qSlidingDistinct, Some(qSlidingDistinctSql)),
    QueryDef("q_hll_sketch", qHllSketch, Some(qHllSketchSql)),
    QueryDef("q_gap_fill", qGapFill, Some(qGapFillSql)),
    QueryDef("q_anomaly", qAnomaly, Some(qAnomalySql)),
    QueryDef("q_profile", qProfile, Some(qProfileSql)))
}
