package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators: KMV (k-minimum-values) distinct sketches
  * with set-algebra estimates, and a Count-Min frequency sketch. Both are
  * the associative, bounded-size summaries that matter at 100 TB — a
  * sketch built per partition / per day / per stream merges into the
  * sketch of the union without touching raw rows again (the q_hll_sketch
  * contract, extended to set INTERSECTION and point frequencies).
  *
  * Reference analog: duckpipe publishes exact aggregates only
  * (duckpipe/core.py get_result); these are the approximate companions a
  * warehouse adds when exact distinct/frequency over the full corpus
  * stops being affordable.
  *
  * Determinism policy: hashes are md5-derived 60-bit longs (identical in
  * Spark `conv` and DuckDB's `'0x…'::UBIGINT`), estimates are single IEEE
  * divisions of exactly-representable integers rounded at 4 dp — so even
  * the APPROXIMATE outputs pass the hash gate.
  */
object Sketches {

  private val K = 256 // KMV sketch size
  private val TwoPow60 = 1152921504606846976L

  /** md5-derived 60-bit non-negative hash of a string column. */
  private[graft] def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Scala-side replica of [[h60]] — byte-identical, used by the
    * streaming KMV twin's typed state function (and certified against
    * the column form in SketchesSpec). */
  private[graft] def h60Scala(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** KMV bottom-k distinct sketch per event type over user ids, plus
    * pairwise UNION and INTERSECTION cardinality estimates — the
    * audience-overlap question (`users doing A who also do B`) answered
    * from 2 KB of state per set instead of a giant distinct join.
    *
    * Shape: dedup (type, hash) once, then a two-level tournament builds
    * each bottom-k (per-bucket bottom-k, then bottom-k of the ≤B·k
    * survivors — no type ever sorts its full user set; raise B with
    * corpus size). Union sketch = bottom-k of the two sketch arrays
    * merged (exactly the sketch the union of the sets would have built —
    * the KMV closure property); intersection by inclusion–exclusion on
    * the three estimates. The kth-min estimate (k−1)·2⁶⁰/h₍ₖ₎ divides
    * exactly-representable doubles, so it is bit-identical cross-engine;
    * a sketch with fewer than k values IS its exact set. The headline
    * op is SKETCH-ONLY — exactly the shape you'd run at 100 TB (no
    * user-key self-join anywhere in its plan, pinned); the exact
    * intersection lives in the guarded [[kmvCalibration]] twin (the
    * dedup_minhash_est pattern).
    */
  /** Bottom-k tournament: (t, h)-distinct rows → one (t, sk, nd) row per
    * key, sk = the k smallest hashes, nd = the exact distinct count that
    * flowed through. Two-level so no key ever sorts its full hash set. */
  private[graft] def kmvSketch(dp: DataFrame): DataFrame = {
    val stage1 = dp
      .groupBy(col("t"), pmod(col("h"), lit(32)).as("bk"))
      .agg(slice(array_sort(collect_list(col("h"))), 1, K).as("arr"),
        count(lit(1)).as("n"))
    stage1.groupBy("t")
      .agg(slice(array_sort(flatten(collect_list(col("arr")))), 1, K).as("sk"),
        sum(col("n")).as("nd"))
  }

  /** Merge two KMV sketch arrays: the sketch of the UNION of the
    * underlying sets (closure property — certified in SketchesSpec). */
  private[graft] def kmvMerge(a: Column, b: Column): Column =
    slice(array_sort(array_union(a, b)), 1, K)

  /** Pairwise sketch estimates (the shared core): one row per type pair
    * with distinct counts, per-set / union / intersection estimates. */
  private[graft] def kmvPairs(s: SparkSession, dir: String): DataFrame = {
    val dp = Tables.load(s, dir, "events")
      .select(col("event_type").as("t"),
        h60(expr("CAST(user_id AS STRING)")).as("h"))
      .distinct()
    val sk = kmvSketch(dp)

    def est(arr: Column, sz: Column): Column =
      when(sz < K, sz.cast("double"))
        .otherwise(round(
          lit(255d) * lit(TwoPow60).cast("double") /
            element_at(arr, K).cast("double"), 4))

    val x = broadcast(sk).as("x")
    val y = broadcast(sk).as("y")
    x.join(y, col("x.t") < col("y.t"))
      .select(col("x.t").as("type_a"), col("y.t").as("type_b"),
        col("x.nd").as("nd_a"), col("y.nd").as("nd_b"),
        est(col("x.sk"), col("x.nd")).as("est_a"),
        est(col("y.sk"), col("y.nd")).as("est_b"),
        kmvMerge(col("x.sk"), col("y.sk")).as("u"),
        size(array_union(col("x.sk"), col("y.sk"))).cast("long").as("usz"))
      .withColumn("est_union", est(col("u"), col("usz")))
      .withColumn("est_inter",
        round(col("est_a") + col("est_b") - col("est_union"), 4))
  }

  def kmvOverlap(s: SparkSession, dir: String): DataFrame =
    kmvPairs(s, dir)
      .select(col("type_a"), col("type_b"), col("nd_a"), col("nd_b"),
        col("est_a"), col("est_b"), col("est_union"), col("est_inter"))
      .orderBy("type_a", "type_b")

  /** Small-scale guard for the exact-intersection calibration audit. */
  private[graft] val KmvCalibMaxDistinct = 10000000L

  /** Calibration twin of [[kmvOverlap]]: the sketch intersection
    * estimate next to the EXACT intersection from a distinct user-key
    * self-join — the evidence column split out of the headline op (the
    * dedup_minhash_est pattern). The exact join is affordable only
    * while the distinct (type, user) table is small; past the guard it
    * fails loudly and you trust the sketches. */
  def kmvCalibration(s: SparkSession, dir: String,
                     cap: Long = KmvCalibMaxDistinct): DataFrame = {
    val du = Tables.load(s, dir, "events")
      .select(col("event_type").as("t"), col("user_id").as("u")).distinct()
    val n = du.count()
    require(n <= cap,
      s"q_kmv_calibration is the small-scale exact-intersection audit " +
        s"($n distinct (type, user) rows > cap $cap); " +
        s"at scale trust q_kmv_overlap's sketch estimates")
    val inter = du.as("p")
      .join(du.as("q"), col("p.u") === col("q.u") && col("p.t") < col("q.t"))
      .groupBy(col("p.t").as("ia"), col("q.t").as("ib"))
      .agg(count(lit(1)).as("ni"))
    kmvPairs(s, dir).join(broadcast(inter),
        col("type_a") === col("ia") && col("type_b") === col("ib"), "left")
      .select(col("type_a"), col("type_b"), col("est_inter"),
        coalesce(col("ni"), lit(0L)).as("n_inter"))
      .orderBy("type_a", "type_b")
  }

  /** Shared oracle CTE block through the per-pair estimates. */
  private val kmvEstCtes: String = s"""dp AS (
      SELECT DISTINCT event_type AS t,
        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
          AS BIGINT) AS h
      FROM events),
    ranked AS (
      SELECT t, h, ROW_NUMBER() OVER (PARTITION BY t ORDER BY h) AS rn,
             COUNT(*) OVER (PARTITION BY t) AS nd
      FROM dp),
    sk AS (SELECT t, h, rn, nd FROM ranked WHERE rn <= $K),
    stats AS (
      SELECT t, MAX(nd) AS nd, COUNT(*) AS sz,
             MAX(CASE WHEN rn = $K THEN h END) AS hk
      FROM sk GROUP BY t),
    pairs AS (SELECT a.t AS ta, b.t AS tb FROM stats a JOIN stats b ON a.t < b.t),
    uh AS (
      SELECT p.ta, p.tb, s.h FROM pairs p JOIN sk s ON s.t IN (p.ta, p.tb)
      GROUP BY p.ta, p.tb, s.h),
    ur AS (
      SELECT ta, tb, h,
             ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
      FROM uh),
    ustats AS (
      SELECT ta, tb, COUNT(*) AS usz, MAX(CASE WHEN rn = $K THEN h END) AS uhk
      FROM ur WHERE rn <= $K GROUP BY ta, tb),
    est AS (
      SELECT p.ta, p.tb, sa.nd AS nd_a, sb.nd AS nd_b,
        CASE WHEN sa.nd < $K THEN CAST(sa.nd AS DOUBLE)
             ELSE ROUND(255 * CAST($TwoPow60 AS DOUBLE)
                        / CAST(sa.hk AS DOUBLE), 4) END AS est_a,
        CASE WHEN sb.nd < $K THEN CAST(sb.nd AS DOUBLE)
             ELSE ROUND(255 * CAST($TwoPow60 AS DOUBLE)
                        / CAST(sb.hk AS DOUBLE), 4) END AS est_b,
        CASE WHEN u.usz < $K THEN CAST(u.usz AS DOUBLE)
             ELSE ROUND(255 * CAST($TwoPow60 AS DOUBLE)
                        / CAST(u.uhk AS DOUBLE), 4) END AS est_union
      FROM pairs p
      JOIN stats sa ON sa.t = p.ta
      JOIN stats sb ON sb.t = p.tb
      JOIN ustats u ON u.ta = p.ta AND u.tb = p.tb)"""

  val kmvOverlapSql: String = s"""
    WITH $kmvEstCtes
    SELECT ta AS type_a, tb AS type_b, nd_a, nd_b, est_a, est_b,
           est_union, ROUND(est_a + est_b - est_union, 4) AS est_inter
    FROM est ORDER BY 1, 2"""

  val kmvCalibrationSql: String = s"""
    WITH $kmvEstCtes,
    du AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
    exact_i AS (
      SELECT p.t AS ta, q.t AS tb, COUNT(*) AS ni
      FROM du p JOIN du q ON p.u = q.u AND p.t < q.t
      GROUP BY 1, 2)
    SELECT e.ta AS type_a, e.tb AS type_b,
           ROUND(est_a + est_b - est_union, 4) AS est_inter,
           CAST(COALESCE(x.ni, 0) AS BIGINT) AS n_inter
    FROM est e LEFT JOIN exact_i x ON x.ta = e.ta AND x.tb = e.tb
    ORDER BY 1, 2"""

  /** Count-Min frequency sketch (d=4 rows × w=1024 counters) over event
    * user ids, evaluated on the exact top-20 heaviest users: estimate =
    * min over the 4 hashed cells, never under the true count (the CMS
    * guarantee — `overest` column is provably ≥ 0). The sketch is ONE
    * hash aggregate over a 4× fanned-out scan (fanout FIRST, then the
    * explode — the CLAUDE.md rule) and is cell-wise ADDITIVE: sketches of
    * shards/days sum into the sketch of their union, so a 16 KB state
    * answers point-frequency queries over any subset of a 100 TB stream.
    */
  private val CmsW = 1024

  private[graft] def cmsCell(j: Column, u: Column): Column =
    pmod(h60(concat(lit("cms"), j.cast("string"), lit(":"),
      u.cast("string"))), lit(CmsW))

  /** Count-Min sketch of a (u) item stream: (j, cell, c) counter rows.
    * Cell-wise ADDITIVE — sketch(a ∪ b) = sketch(a) + sketch(b)
    * (certified in SketchesSpec). */
  private[graft] def cmsSketch(items: DataFrame): DataFrame = {
    val rows = Tables.fanout(items)
      .select(explode(sequence(lit(0), lit(3))).as("j"), col("u"))
    rows.groupBy(col("j"), cmsCell(col("j"), col("u")).as("cell"))
      .agg(count(lit(1)).as("c"))
  }

  def cmsFreq(s: SparkSession, dir: String): DataFrame = {
    def cell(j: Column, u: Column): Column = cmsCell(j, u)
    val sketch = cmsSketch(Tables.load(s, dir, "events")
      .select(col("user_id").as("u")))
    val top20 = Tables.load(s, dir, "events")
      .groupBy(col("user_id").as("u")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("u")).limit(20)
    val tj = top20.select(col("u"), col("n_exact"),
        explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("cell", cell(col("j"), col("u")))
    broadcast(tj).join(sketch, Seq("j", "cell"))
      .groupBy("u", "n_exact").agg(min(col("c")).as("n_est"))
      .select(col("u").as("user_id"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overest"))
      .orderBy(col("n_exact").desc, col("user_id"))
  }

  val cmsFreqSql: String = """
    WITH js AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS v(j)),
    hs AS (
      SELECT user_id AS u, j,
        CAST(('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':'
          || CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) % 1024
          AS cell
      FROM events CROSS JOIN js),
    sketch AS (SELECT j, cell, COUNT(*) AS c FROM hs GROUP BY 1, 2),
    top20 AS (
      SELECT user_id AS u, COUNT(*) AS n_exact FROM events GROUP BY 1
      ORDER BY n_exact DESC, u LIMIT 20),
    tj AS (
      SELECT u, n_exact, j,
        CAST(('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':'
          || CAST(u AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) % 1024 AS cell
      FROM top20 CROSS JOIN js)
    SELECT t.u AS user_id, t.n_exact, MIN(s.c) AS n_est,
           MIN(s.c) - t.n_exact AS overest
    FROM tj t JOIN sketch s ON s.j = t.j AND s.cell = t.cell
    GROUP BY t.u, t.n_exact
    ORDER BY n_exact DESC, user_id"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_kmv_overlap", kmvOverlap, Some(kmvOverlapSql)),
    QueryDef("q_kmv_calibration", (s, d) => kmvCalibration(s, d),
      Some(kmvCalibrationSql)),
    QueryDef("q_cms_freq", cmsFreq, Some(cmsFreqSql)))
}
