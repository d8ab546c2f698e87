package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink layer under the oracle gate: io_roundtrip writes the
  * documents table through three interchange formats (CSV with header,
  * JSON-lines, ORC), reads each back through graft.io.Sources, and
  * emits content-sensitive statistics per format. The oracle computes
  * the same statistics straight from the parquet table — equality
  * certifies every format round-trips losslessly (the md5-derived
  * h_sum flips if any character of any document is mangled by
  * quoting/escaping/encoding on the way through). Explicit schemas
  * keep every read one-pass (no inference scan) — the 100 TB rule.
  */
object IoQueries {

  def ioRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-io").toString
    val docs = Tables.load(s, dir, "documents")
    docs.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    docs.write.mode("overwrite").json(s"$tmp/jsonl")
    graft.io.Sources.writeOrc(docs, s"$tmp/orc")
    def stats(df: DataFrame, fmt: String) =
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(length(col("text"))).as("chars"),
        sum(col("doc_id")).as("id_sum"),
        sum(expr(
          "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT) % 1000000007"))
          .as("h_sum"))
        .select(lit(fmt).as("format"), col("n_rows"), col("chars"),
          col("id_sum"), col("h_sum"))
    stats(graft.io.Sources.readCsv(s, s"$tmp/csv", docs.schema), "csv")
      .unionByName(
        stats(graft.io.Sources.readJsonLines(s, s"$tmp/jsonl", docs.schema),
          "jsonl"))
      .unionByName(stats(graft.io.Sources.readOrc(s, s"$tmp/orc"), "orc"))
      .orderBy("format")
  }

  val ioRoundtripSql: String = """
    SELECT f.fmt AS format, COUNT(*) AS n_rows,
           CAST(SUM(len(text)) AS BIGINT) AS chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(CAST(('0x' || substr(md5(text), 1, 15)) AS UBIGINT)::BIGINT
             % 1000000007) AS BIGINT) AS h_sum
    FROM documents, (SELECT unnest(['csv', 'jsonl', 'orc']) AS fmt) f
    GROUP BY f.fmt ORDER BY format"""

  /** Bucketed-layout join under the gate: both sides are written as
    * metastore-backed bucketed tables on their join key (8 buckets,
    * sorted — Sources.writeBucketed) and then joined with NO exchange
    * on either side: the shuffle was paid once at write time, which
    * is the layout recurring 100 TB joins want. The merge hint keeps
    * the sort-merge join (a broadcast would hide the demonstration);
    * IoSpec asserts the join subplan really has zero shuffles. The
    * oracle computes the same aggregate from the plain tables, so
    * correctness of the bucketed path is hash-certified. */
  def qBucketJoin(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    graft.io.Sources.writeBucketed(
      Tables.load(s, dir, "orders")
        .select("o_custkey", "o_totalprice"),
      "b_orders", s"$tmp/o", "o_custkey", 8)
    graft.io.Sources.writeBucketed(
      Tables.load(s, dir, "customer")
        .select("c_custkey", "c_mktsegment"),
      "b_customer", s"$tmp/c", "c_custkey", 8)
    s.table("b_orders").hint("merge")
      .join(s.table("b_customer").hint("merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        graft.QueryDef.dsum(col("o_totalprice"), 2).as("total"))
      .orderBy("c_mktsegment")
  }

  val qBucketJoinSql: String = """
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY 1"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("io_roundtrip", ioRoundtrip, Some(ioRoundtripSql)),
    QueryDef("q_bucket_join", qBucketJoin, Some(qBucketJoinSql)))
}
