package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-scale URL hygiene — the dedup key most crawl-derived training
  * corpora dedup on BEFORE any content pass (the same page crawled as
  * `HTTP://Example.COM:80/a/?utm_source=x&b=1#top` and
  * `http://example.com/a?b=1` is one document). Canonicalization is
  * pure column machinery (split/filter/sort HOFs — codegen, no UDF),
  * so the canonical key costs one projection at 100 TB and the dedup
  * itself is the standard hash-aggregate.
  *
  * Reference scope note: duckpipe has no web layer; this is part of
  * the LLM-training-data surface the brief mandates as first-class.
  */
object WebData {

  /** Canonical form of an absolute http(s) URL:
    *   - scheme + host lowercased, default port (:80/:443) stripped
    *   - fragment dropped
    *   - tracking params (utm_*, gclid, fbclid) dropped
    *   - remaining query params sorted for order-independence
    *   - trailing path slash normalized ('' and '/' both → '/')
    * Everything is deterministic string/array column ops mirrored
    * operation-for-operation in the oracle SQL. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val query = when(noFrag.contains("?"), substring_index(noFrag, "?", -1))
      .otherwise(lit(""))
    val rest = substring_index(noFrag, "?", 1)
    val scheme = lower(substring_index(rest, "://", 1))
    val after = substring_index(rest, "://", -1)
    val hostRaw = lower(substring_index(after, "/", 1))
    val host = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val pathRaw = substr(after, length(hostRaw) + 1, length(after))
    val path = when(regexp_replace(pathRaw, "/$", "") === "", lit("/"))
      .otherwise(regexp_replace(pathRaw, "/$", ""))
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !p.startsWith("gclid=") && !p.startsWith("fbclid="))
    val qs = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Deterministic messy-URL derivation for the gate (documents carry
    * no URL column): scheme/host case variants, a default port, a
    * trailing slash, tracking params, shuffled param order and a
    * fragment all vary by doc_id — groups that must collapse to one
    * canonical URL. Mirrored verbatim in SQL. */
  private def messyUrl: Column = expr("""
    CASE WHEN doc_id % 3 = 0 THEN 'HTTP' WHEN doc_id % 3 = 1 THEN 'http'
         ELSE 'https' END || '://' ||
    CASE WHEN doc_id % 2 = 0 THEN 'Crawl.Example.COM' ELSE 'crawl.example.com' END ||
    CASE WHEN doc_id % 4 = 0 AND doc_id % 3 < 2 THEN ':80'
         WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
    '/site/' || CAST(doc_id % 40 AS STRING) ||
    CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
    CASE WHEN doc_id % 2 = 0
         THEN '?b=' || CAST(doc_id % 7 AS STRING) || '&utm_source=feed&a=' || CAST(doc_id % 3 AS STRING)
         ELSE '?a=' || CAST(doc_id % 3 AS STRING) || '&b=' || CAST(doc_id % 7 AS STRING) END ||
    CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END""")

  private val messyUrlSql = """
    (CASE WHEN doc_id % 3 = 0 THEN 'HTTP' WHEN doc_id % 3 = 1 THEN 'http'
          ELSE 'https' END || '://' ||
     CASE WHEN doc_id % 2 = 0 THEN 'Crawl.Example.COM' ELSE 'crawl.example.com' END ||
     CASE WHEN doc_id % 4 = 0 AND doc_id % 3 < 2 THEN ':80'
          WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
     '/site/' || CAST(doc_id % 40 AS VARCHAR) ||
     CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
     CASE WHEN doc_id % 2 = 0
          THEN '?b=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_source=feed&a=' || CAST(doc_id % 3 AS VARCHAR)
          ELSE '?a=' || CAST(doc_id % 3 AS VARCHAR) || '&b=' || CAST(doc_id % 7 AS VARCHAR) END ||
     CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)"""

  /** URL-level dedup: canonicalize, group, report survivors — per
    * canonical URL the doc count, the distinct RAW forms collapsed,
    * and the canonical keeper (min doc_id). One hash aggregate. */
  def dedupUrl(s: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), messyUrl.as("url"))
      .withColumn("canonical_url", canonicalUrl(col("url")))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("url").as("n_raw_forms"),
        min("doc_id").as("keep_id"))
      .orderBy("canonical_url")

  val dedupUrlSql: String = s"""
    WITH raw AS (
      SELECT doc_id, $messyUrlSql AS url
      FROM documents),
    parts AS (
      SELECT doc_id, url,
        split_part(url, '#', 1) AS nofrag
      FROM raw),
    comps AS (
      SELECT doc_id, url,
        lower(split_part(split_part(nofrag, '?', 1), '://', 1)) AS scheme,
        split_part(split_part(nofrag, '?', 1), '://', 2) AS after,
        CASE WHEN contains(nofrag, '?') THEN split_part(nofrag, '?', 2)
             ELSE '' END AS query
      FROM parts),
    hostpath AS (
      SELECT doc_id, url, scheme, query,
        lower(split_part(after, '/', 1)) AS hostraw,
        substr(after, length(split_part(after, '/', 1)) + 1) AS pathraw
      FROM comps),
    canon AS (
      SELECT doc_id, url,
        scheme || '://' ||
        (CASE WHEN scheme = 'http' THEN regexp_replace(hostraw, ':80$$', '')
              WHEN scheme = 'https' THEN regexp_replace(hostraw, ':443$$', '')
              ELSE hostraw END) ||
        (CASE WHEN regexp_replace(pathraw, '/$$', '') = '' THEN '/'
              ELSE regexp_replace(pathraw, '/$$', '') END) ||
        (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS canonical_url
      FROM (
        SELECT *, array_to_string(list_sort(list_filter(
            string_split(query, '&'),
            p -> p <> '' AND NOT starts_with(p, 'utm_')
              AND NOT starts_with(p, 'gclid=')
              AND NOT starts_with(p, 'fbclid='))), '&') AS qs
        FROM hostpath))
    SELECT canonical_url, COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms,
           MIN(doc_id) AS keep_id
    FROM canon
    GROUP BY canonical_url ORDER BY canonical_url"""

  // ---- WebDataset tar shards -------------------------------------------
  final case class WdsShard(shard: Long, tar: Array[Byte])
  final case class WdsMember(shard: Long, name: String,
                             content: Array[Byte])

  /** WebDataset-style shard packing UNDER THE ORACLE GATE: documents
    * are written into real USTAR archives (one per 50-doc shard, the
    * de-facto LLM data-loading container), read BACK through the tar
    * parser, and per-shard statistics of the round-tripped members —
    * member count, byte sum, id sum parsed from member names, and an
    * md5-derived content checksum — must equal the oracle's direct
    * computation from the documents table. Any header/size/padding/
    * content defect in the archive breaks the hash. Scale shape:
    * repartition by shard + sortWithinPartitions, then ONE
    * mapPartitions pass builds consecutive shards with one bounded
    * shard buffer in memory (never a per-group collect of the whole
    * partition); parsing is a second mapPartitions codec pass. */
  def packWds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docsPerShard = 50L
    val sorted = Tables.fanout(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("text"),
        expr(s"doc_id DIV $docsPerShard").as("shard"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .select("shard", "doc_id", "text").as[(Long, Long, String)]
    val shards = sorted.mapPartitions { rows =>
      // consecutive rows of one shard are adjacent after the sort;
      // buffer exactly one shard at a time
      new Iterator[WdsShard] {
        private val it = rows.buffered
        def hasNext: Boolean = it.hasNext
        def next(): WdsShard = {
          val shard = it.head._1
          val members = scala.collection.mutable.ArrayBuffer
            .empty[(String, Array[Byte])]
          while (it.hasNext && it.head._1 == shard) {
            val (_, id, text) = it.next()
            members += ((s"$id.txt", text.getBytes("UTF-8")))
          }
          WdsShard(shard, graft.functions.Tar.archive(members.iterator))
        }
      }
    }
    val parsed = shards.flatMap { sh =>
      graft.functions.Tar.extract(sh.tar).map { case (n, c) =>
        WdsMember(sh.shard, n, c)
      }
    }.toDF()
    parsed
      .select(col("shard"),
        expr("CAST(substring_index(name, '.', 1) AS BIGINT)").as("mid"),
        length(col("content")).as("nbytes"), // byte length of binary
        expr("""CAST(conv(substring(md5(content), 1, 15), 16, 10)
                AS BIGINT) % 1000000007""").as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_members"),
        sum("nbytes").as("byte_sum"),
        sum("mid").as("id_sum"),
        sum("h").as("h_sum"))
      .orderBy("shard")
  }

  val packWdsSql: String = """
    SELECT doc_id // 50 AS shard, COUNT(*) AS n_members,
           CAST(SUM(strlen(text)) AS BIGINT) AS byte_sum,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(CAST(('0x' || substr(md5(text), 1, 15)) AS UBIGINT)::BIGINT
             % 1000000007) AS BIGINT) AS h_sum
    FROM documents
    GROUP BY 1 ORDER BY shard"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("dedup_url", dedupUrl, Some(dedupUrlSql)),
    QueryDef("pack_wds", packWds, Some(packWdsSql)))
}
