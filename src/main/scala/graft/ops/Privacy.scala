package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the privacy-scrub stage of an LLM data
  * pipeline (strip emails / phone numbers / IP addresses before text
  * reaches a training corpus). The denylist twin is `text_scrub`
  * (Corpus.scala); this operator targets *structured* identifiers via
  * pattern classes instead of literal words.
  *
  * Engine shape: a pure map stage — `regexp_extract_all` for counts and
  * chained `regexp_replace` for redaction, all codegen'd column
  * machinery, no UDF, no shuffle before the caller's own aggregation.
  * At 100 TB this scans once and never exchanges the text.
  *
  * Pattern portability: the patterns below restrict themselves to the
  * regex intersection of Java (Spark) and RE2 (DuckDB/Go — the common
  * production scrubber host): character classes, bounded repetition,
  * word boundaries; no backreferences, no lookaround. The same string
  * runs in both engines — that is what the oracle certifies.
  *
  * The synthetic `documents` table carries no PII, so the oracle
  * BINDING (`textPii`) first appends a deterministic contact line
  * derived from `doc_id` — same integer arithmetic in both engines,
  * exactly how the geo bindings derive coordinates from TPC-H keys
  * (Derive.scala). The library entry point `scrub` is generic over any
  * (textCol) DataFrame.
  */
object Privacy {

  /** Order-free by construction: the three classes cannot overlap
    * (emails require '@', IPs require three dots, phones are dash-
    * separated digit runs with no dots). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b"

  private def nMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Adds `n_email`, `n_phone`, `n_ip` (match counts over the original
    * text) and `clean_text` (all three classes redacted to
    * `<EMAIL>`/`<PHONE>`/`<IP>`). */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_email", nMatches(t, EmailRe))
      .withColumn("n_phone", nMatches(t, PhoneRe))
      .withColumn("n_ip", nMatches(t, IpRe))
      .withColumn("clean_text",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            IpRe, "<IP>"),
          PhoneRe, "<PHONE>"))
  }

  /** Oracle binding: enrich each document with a deterministic contact
    * line (a subset of docs gets each PII class, so zero counts are
    * exercised too), scrub, and emit exact per-doc evidence — counts
    * plus the md5 of the redacted text, which certifies the *entire*
    * replacement byte-for-byte, not just the tallies. */
  def textPii(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.fanout(Tables.load(s, dir, "documents"))
    val id = col("doc_id")
    val enriched = d.withColumn("text",
      concat(
        col("text"),
        when(id % 3 === 0,
          concat(lit(" reach user"), id, lit("@mail-"), id % 7,
            lit(".org now"))).otherwise(lit("")),
        when(id % 4 === 1,
          concat(lit(" call 010-"),
            lpad((id % 10000).cast("string"), 4, "0"), lit("-"),
            lpad(((id * 7) % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(id % 5 === 2,
          concat(lit(" from 192.168."), id % 256, lit("."),
            (id * 3) % 256)).otherwise(lit(""))))
    scrub(enriched, "text")
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy("doc_id")
  }

  val textPiiSql: String = """
    WITH enriched AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || doc_id
                  || '@mail-' || (doc_id % 7) || '.org now' ELSE '' END
             || CASE WHEN doc_id % 4 = 1 THEN ' call 010-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-'
                  || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END
             || CASE WHEN doc_id % 5 = 2 THEN ' from 192.168.'
                  || (doc_id % 256) || '.' || ((doc_id * 3) % 256)
                  ELSE '' END AS text
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_email,
           CAST(len(regexp_extract_all(text,
             '\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text,
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
             AS BIGINT) AS n_ip,
           md5(regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
               '<IP>', 'g'),
             '\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b', '<PHONE>', 'g'))
             AS clean_md5
    FROM enriched ORDER BY doc_id"""

  /** k-anonymity audit over quasi-identifiers — the re-identification
    * risk screen a privacy review runs BEFORE a table ships: customers
    * grouped by (nation, market segment, account-balance band); any
    * group smaller than k = 5 is re-identifiable by linking those
    * three public-ish attributes. One hash aggregate builds the
    * equivalence classes, one tiny re-aggregate folds the risk report
    * (class count, risky classes, exposed rows, exposure rate, the
    * smallest class). All integers except one exact-ratio division.
    */
  def kAnonymity(s: SparkSession, dir: String): DataFrame = {
    val classes = Tables.load(s, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").as("bal_band"))
      .agg(count(lit(1)).as("sz"))
    classes.agg(
        sum(col("sz")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        sum(when(col("sz") < 5, 1L).otherwise(0L)).as("n_risky_classes"),
        sum(when(col("sz") < 5, col("sz")).otherwise(lit(0L))).as("n_exposed"),
        min(col("sz")).as("min_class"))
      .select(col("n_rows"), col("n_classes"), col("n_risky_classes"),
        col("n_exposed"),
        round(col("n_exposed").cast("double") / col("n_rows"), 6)
          .as("exposure_rate"),
        col("min_class"))
  }

  val kAnonymitySql: String = """
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             COUNT(*) AS sz
      FROM customer GROUP BY 1, 2, 3)
    SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
           COUNT(*) AS n_classes,
           CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_risky_classes,
           CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
             AS n_exposed,
           ROUND(CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
                 / SUM(sz), 6) AS exposure_rate,
           CAST(MIN(sz) AS BIGINT) AS min_class
    FROM classes"""

  // ---- differentially-private release (q_dp_release) -----------------

  /** Truncation bound for the discrete-Laplace inverse CDF. */
  private[graft] val DpB = 64

  /** Inverse-CDF thresholds of the two-sided geometric (discrete
    * Laplace) at α = 3/4 EXACTLY — P(z) = (1/7)·(3/4)^|z|, i.e. pure
    * ε-DP at ε = ln(4/3) per released quantum. cum(k) = (4/7)·α^|k|
    * for k < 0 and 1 − (4/7)·α^(k+1) for k ≥ 0, scaled to 2⁶⁰ and
    * floored. Computed ONCE with 34-digit decimal arithmetic and
    * embedded as LITERALS in both the Spark plan and the generated
    * oracle SQL — cross-engine determinism is by construction (the
    * engines compare the same integers), not by trusting either
    * engine's transcendental library: no exp/ln ever evaluates in
    * the gate (the no-libm rule). */
  private[graft] val dpThresholds: Array[Long] = {
    val scale = BigDecimal(2).pow(60)
    def pw(e: Int) = BigDecimal(3).pow(e) / BigDecimal(4).pow(e)
    ((-DpB) until DpB).map { k =>
      val c =
        if (k < 0) BigDecimal(4) / 7 * pw(-k)
        else BigDecimal(1) - BigDecimal(4) / 7 * pw(k + 1)
      (c * scale).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    }.toArray
  }

  /** z(u) = −B + |{thresholds ≤ u}| for a 60-bit uniform u — the
    * clamped inverse CDF, z ∈ [−B, B]. */
  private def dpNoise(u: Column): Column =
    (lit(-DpB) + size(filter(typedlit(dpThresholds), t => t <= u)))
      .cast("long")

  /** Differentially-private corpus-statistics RELEASE — the privacy
    * trio's third member (text_pii scrubs content, q_k_anonymity
    * audits quasi-identifiers, this op releases aggregate statistics
    * with a formal guarantee): per-source document and token counts
    * with truncated discrete-Laplace noise at ε = ln(4/3) per
    * statistic. The token sum is CLIPPED per document at C = 1000 and
    * QUANTIZED to multiples of C before noising (clip-then-noise, the
    * standard recipe): one document then moves the quantized
    * statistic by ≤ 1 unit, so the unit-sensitivity mechanism is
    * valid — C·Z noise on the raw sum would be OFF-GRID for
    * neighboring datasets and not DP at all. Noise seeds are pure
    * md5 functions of (statistic, source) — rerunnable and
    * cluster-size independent (the sample_stratified contract), which
    * is exactly how production DP releases pin their noise for
    * reproducible publications. Small sources can release slightly
    * negative counts — the standard unbiased convention (clamping
    * post-hoc would bias sums and is left to the consumer).
    *
    * Scale shape: ONE map-side-combined aggregate to |sources| rows;
    * the noise inversion is a 128-literal array scan per released
    * statistic on ≤|sources| rows. Zero additional passes at any
    * corpus size. */
  def dpRelease(s: SparkSession, dir: String): DataFrame = {
    val C = 1000L
    def u60(tag: String) = expr(
      s"""CAST(conv(substring(md5(concat('dp:$tag:', source)), 1, 15),
         16, 10) AS BIGINT)""")
    Text.docToks(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_true"),
        sum(least(col("n_tok"), lit(C))).as("tok_clip"))
      .select(col("source"),
        (col("n_docs_true") + dpNoise(u60("docs"))).as("n_docs_dp"),
        ((expr("(tok_clip + 500) DIV 1000") + dpNoise(u60("toks")))
          * lit(C)).as("n_tok_dp"))
      .orderBy("source")
  }

  val dpReleaseSql: String = {
    val thr = dpThresholds.mkString(", ")
    def u(tag: String) =
      s"('0x' || substring(md5('dp:$tag:' || source), 1, 15))::UBIGINT::BIGINT"
    def z(tag: String) =
      s"(-64 + len(list_filter([$thr], t -> t <= ${u(tag)})))"
    s"""
    WITH d AS (
      SELECT source, COUNT(*) AS n_docs_true,
             SUM(LEAST(len(string_split(text, ' ')), 1000)) AS tok_clip
      FROM documents GROUP BY 1)
    SELECT source,
           CAST(n_docs_true + ${z("docs")} AS BIGINT) AS n_docs_dp,
           CAST(((tok_clip + 500) // 1000 + ${z("toks")}) * 1000
             AS BIGINT) AS n_tok_dp
    FROM d ORDER BY source"""
  }

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_k_anonymity", kAnonymity, Some(kAnonymitySql)),
    QueryDef("q_dp_release", dpRelease, Some(dpReleaseSql)),
    QueryDef("text_pii", textPii, Some(textPiiSql)))
}
