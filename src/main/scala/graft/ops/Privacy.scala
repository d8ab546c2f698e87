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

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_k_anonymity", kAnonymity, Some(kAnonymitySql)),
    QueryDef("text_pii", textPii, Some(textPiiSql)))
}
