package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** 10× scale smoke for the ROUTED iterative paths (VERDICT r13 task 5):
  * replicate the sf0.1 tables ~10× with key-shifted disjoint copies,
  * then run the routed operators (graph_pagerank, graph_kcore,
  * dedup_incremental, q_hier_rollup_edges) with the DEFAULT routing
  * bound and assert, per operator:
  *
  *   (a) the routing decision is justified BY MEASUREMENT at this
  *       scale — the vertex-state row count is printed next to the
  *       bound, so "the broadcast route's state stays under it" is a
  *       recorded fact, not an assumption (the shuffle route engaging
  *       would print the loud routeState warning instead);
  *   (b) the scale-critical plan pins hold on the SCALED plans — no
  *       CartesianProduct, no corpus-sized BroadcastExchange above the
  *       bound (the PlanAuditSpec assertions re-checked at 10×);
  *   (c) the queries complete and return sane row counts.
  *
  * Usage: tools/run.sh graft.tools.ScaleSmoke /root/testdata/sf0.1 /tmp/scale10
  * Output is committed per round as SCALE_SMOKE_r{N}.txt.
  */
object ScaleSmoke {
  private val Copies = 10

  private def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
    val c = explode(sequence(lit(0L), lit(Copies - 1L))).as("_copy")
    val base = df.select(col("*")).withColumn("_copy", c)
    shifts.foldLeft(base) { case (d, (colName, span)) =>
      d.withColumn(colName, col(colName) + col("_copy") * span)
    }.drop("_copy")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    // disjoint key-shifted copies: the co-purchase graph gains 10x
    // vertices AND 10x edges (orders and parts both shift); documents
    // gain 10x docs. Spans clear each table's key range at sf<=1.
    val li = Tables.load(spark, srcDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    replicate(li, Map("l_orderkey" -> 100000000L, "l_partkey" -> 10000000L,
        "l_suppkey" -> 1000000L))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    val docs = Tables.load(spark, srcDir, "documents")
    replicate(docs, Map("doc_id" -> 10000000L))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // customer ids INTERLEAVE (k*10 + copy) instead of shifting:
    // q_hier_rollup_edges derives parent(k) from the id closed form,
    // so the scaled id space must stay CONTIGUOUS from the root for
    // every parent to exist (shifted copies produce dangling parents —
    // the broadcast walk's per-row contract guard fires on them, which
    // is itself a useful negative certification of the loud path)
    val cust = Tables.load(spark, srcDir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    cust.withColumn("_copy",
        explode(sequence(lit(0L), lit(Copies - 1L))))
      .withColumn("c_custkey", col("c_custkey") * Copies + col("_copy"))
      .drop("_copy")
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    // events/embeddings and the dim tables are not touched by the
    // routed operators under test; point the loader at originals
    for (t <- Seq("region", "nation", "supplier", "part", "orders",
        "events", "embeddings")) {
      Tables.load(spark, srcDir, t)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }

    val nParts = spark.read.parquet(s"$outDir/lineitem.parquet")
      .select("l_partkey").distinct().count()
    val bound = graft.ops.Graph.BroadcastVerticesDefault
    println(s"[scale] lineitem rows x$Copies; distinct parts (graph " +
      s"vertices) = $nParts vs broadcast bound $bound -> " +
      (if (nParts <= bound) "broadcast route (measured under bound)"
       else "shuffle route must engage (watch for routeState warning)"))

    def pinCheck(name: String, df: DataFrame): Unit = {
      // sparkPlan, not executedPlan: AQE wraps the latter in a single
      // AdaptiveSparkPlanExec node whose children are invisible to
      // collect until execution finalizes the stages
      val plan = df.queryExecution.sparkPlan
      val all = plan.collect { case p => p }
      val cartesian = all.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec])
      assert(!cartesian, s"$name: CartesianProduct at 10x scale")
      println(s"[scale] $name: plan pins hold at 10x " +
        s"(nodes=${all.size}, cartesian=false)")
    }

    def run(name: String): Unit = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, outDir)
      pinCheck(name, df)
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(n > 0, s"$name: empty result at 10x scale")
      println(f"[scale] $name%-22s rows=$n%8d wall=$secs%7.2f s")
    }

    Seq("graph_pagerank", "graph_kcore", "dedup_incremental",
      "q_hier_rollup_edges",
      // the frozen-artifact text paths at 10x: docToks (50k docs),
      // bm25Stats, the minhash LSH band buckets and the langid
      // profile's measured broadcast-vs-shuffle routing
      "text_bm25", "dedup_minhash", "text_langid_stat").foreach(run)
    println("[scale] PASS: all routed operators complete at 10x with " +
      "measured routing decisions and pinned plans")
    spark.stop()
  }
}
