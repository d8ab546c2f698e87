package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every implemented operator's QueryDef (Spark plan + DuckDB
  * oracle SQL) from the per-area registries under graft.ops.
  */
object SparkEntry {

  private def registries: Seq[QueryDef] =
    ops.Relational.all ++ ops.Relational2.all ++ ops.Relational3.all ++
      ops.Relational4.all ++ ops.Relational5.all ++ ops.Relational6.all ++
      ops.Relational7.all ++ ops.Relational8.all ++ ops.Relational9.all ++
      ops.Events.all ++ ops.Corpus.all ++ ops.Privacy.all ++
      ops.LangModel.all ++ ops.IoQueries.all ++
      ops.GeoQueries.all ++ ops.TextDedup.all ++ ops.DedupCluster.all ++
      ops.VectorOps.all ++
      ops.Multimodal.all ++ ops.WebData.all ++ ops.Graph.all ++
      ops.TimeSeries.all ++ ops.Bpe.all ++ ops.Sketches.all ++
      ops.Journey.all ++ ops.Retrieval.all ++ ops.QualityLr.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    registries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
