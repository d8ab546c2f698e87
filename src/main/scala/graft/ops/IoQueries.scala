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

  /** Scratch root for the sink demos. Local /tmp by default — fine in
    * local mode where driver and executors share a filesystem; on a
    * REAL cluster set SPARK_GRAFT_IO_DIR to a shared-FS root
    * (hdfs://…, s3a://…) so executors can read what was written.
    * Every dir is registered for recursive deletion at JVM exit, so
    * min-of-N Verify/Bench iterations don't accumulate under /tmp. */
  private val cleanupDirs =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      cleanupDirs.forEach { root =>
        try {
          java.nio.file.Files.walk(root)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        } catch { case _: Throwable => () }
      }
    }))
  }
  private val lastBucketTables =
    new java.util.concurrent.atomic.AtomicReference[Seq[String]](Seq.empty)

  private def scratchDir(prefix: String): String =
    sys.env.get("SPARK_GRAFT_IO_DIR") match {
      case Some(root) => // shared FS — leave cleanup to the lake's policy
        s"$root/$prefix-${java.util.UUID.randomUUID().toString.take(8)}"
      case None =>
        val p = java.nio.file.Files.createTempDirectory(prefix)
        cleanupDirs.add(p)
        p.toString
    }

  def ioRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("graft-io")
    val docs = Tables.load(s, dir, "documents")
    // writeCsv disables the writer's silent edge-whitespace trimming —
    // the h_sum checksum below would pass on trimmed data only because
    // the synthetic corpus has none; a library user's wouldn't
    graft.io.Sources.writeCsv(docs, s"$tmp/csv")
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
    val tmp = scratchDir("graft-buckets")
    // unique table names per invocation — fixed names were racy across
    // concurrent sessions and collided across min-of-N iterations;
    // the PREVIOUS invocation's pair is dropped so a long session's
    // catalog doesn't grow one dead table pair per bench iteration
    val tok = java.util.UUID.randomUUID().toString.take(8)
    val (tOrders, tCustomer) = (s"b_orders_$tok", s"b_customer_$tok")
    lastBucketTables.getAndSet(Seq(tOrders, tCustomer))
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    graft.io.Sources.writeBucketed(
      Tables.load(s, dir, "orders")
        .select("o_custkey", "o_totalprice"),
      tOrders, s"$tmp/o", "o_custkey", 8)
    graft.io.Sources.writeBucketed(
      Tables.load(s, dir, "customer")
        .select("c_custkey", "c_mktsegment"),
      tCustomer, s"$tmp/c", "c_custkey", 8)
    s.table(tOrders).hint("merge")
      .join(s.table(tCustomer).hint("merge"),
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

  /** Schema-evolution union: a vintage of the table written BEFORE a
    * column existed unions with the current vintage —
    * unionByName(allowMissingColumns) fills the absent column with
    * NULLs instead of failing or misaligning by position. The oracle
    * mirrors with an explicit NULL projection, and the aggregate
    * separates the vintages so the fill is provably NULL (not a
    * default). The everyday reality of a long-lived 100 TB lake:
    * old files never get rewritten. */
  def qSchemaUnion(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val oldVintage = o.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_totalprice") // written before priority existed
    val newVintage = o.filter(col("o_orderkey") % 2 === 1)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    oldVintage.unionByName(newVintage, allowMissingColumns = true)
      .groupBy(coalesce(col("o_orderpriority"), lit("<missing>"))
        .as("priority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"))
      .orderBy("priority")
  }

  val qSchemaUnionSql: String = """
    WITH u AS (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1)
    SELECT COALESCE(o_orderpriority, '<missing>') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM u GROUP BY 1 ORDER BY priority"""

  /** Dynamic partition pruning under the gate: the fact side is
    * written as Hive-partitioned parquet (partition column = the
    * dirname), and a join against a FILTERED dim lets Spark prune
    * fact partitions at RUNTIME from the dim's build side — the scan
    * never reads partitions no dim row can match. The oracle is the
    * plain filtered join; IoSpec asserts the dynamicpruning
    * subquery actually reached the scan. */
  def qDppJoin(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("graft-dpp")
    graft.io.Sources.writePartitioned(
      Tables.loadEventsUs(s, dir).select("event_type", "user_id", "value"),
      tmp, Seq("event_type"))
    val fact = s.read.parquet(tmp)
    val dim = Tables.load(s, dir, "events")
      .select(col("event_type").as("det")).distinct()
      .filter(col("det").isin("click", "purchase"))
    fact.join(dim, col("event_type") === col("det"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"))
      .orderBy("event_type")
  }

  val qDppJoinSql: String = """
    SELECT event_type, COUNT(*) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY 1 ORDER BY event_type"""

  /** Hive-partitioned SINK + statically pruned read-back: events land
    * partitioned by day (the layout every lake uses for time-series
    * facts — the write pays one shuffle-free partitioned fan-out, and
    * every later day-bounded query prunes at the LISTING level, before
    * any file is opened). The read back filters on a pure partition
    * predicate (day % 7 = 3), so the scan's partitionFilters prune
    * directories statically — IoQueriesSpec asserts the pruned
    * partition count — and the oracle computes the same aggregate from
    * raw events, certifying the values survived the partitioned
    * roundtrip (q_dpp_join covers the RUNTIME-pruning sibling).
    */
  def qPartitionSink(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("graft-part")
    Tables.loadEventsUs(s, dir)
      .withColumn("day", expr("ts_us DIV 86400000000"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(tmp)
    partitionedRead(s, tmp)
  }

  /** The pruned read-back, factored so the spec can assert the plan. */
  private[graft] def partitionedRead(s: SparkSession, tmp: String): DataFrame =
    s.read.parquet(tmp)
      .filter(pmod(col("day"), lit(7)) === 3)
      .groupBy(col("day").cast("long").as("day"))
      .agg(count(lit(1)).as("n"),
        round(QueryDef.dsum(col("value"), 6), 4).as("sum_value"))
      .orderBy("day")

  val qPartitionSinkSql: String = """
    WITH ev AS (
      SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, value
      FROM events)
    SELECT day, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS sum_value
    FROM ev WHERE day % 7 = 3
    GROUP BY day ORDER BY day"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_partition_sink", qPartitionSink, Some(qPartitionSinkSql)),
    QueryDef("io_roundtrip", ioRoundtrip, Some(ioRoundtripSql)),
    QueryDef("q_bucket_join", qBucketJoin, Some(qBucketJoinSql)),
    QueryDef("q_schema_union", qSchemaUnion, Some(qSchemaUnionSql)),
    QueryDef("q_dpp_join", qDppJoin, Some(qDppJoinSql)))
}
