package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the graft engine.
  *
  * Mirrors the reference's habit of scanning parquet per calculator
  * (see reference duckpipe/calculator/AirportDistanceCalculator.py:82),
  * but loads lazily through Spark's datasource so column pruning and
  * predicate pushdown reach the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Events carry a nanosecond parquet timestamp, which Spark only reads
    * as INT64 (spark.sql.legacy.parquet.nanosAsLong=true — set in Verify/
    * Bench/specs). Normalize either representation to an epoch-microsecond
    * `ts_us` BIGINT so downstream operators are unit-exact cross-engine.
    */
  def loadEventsUs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts_us", expr("ts DIV 1000"))
      case TimestampType => raw.withColumn("ts_us", unix_micros(col("ts")))
      case other => throw new IllegalStateException(s"events.ts: $other")
    }
  }

  /** Spread a compact input across the cluster BEFORE a fan-out stage
    * (offset explode, shingle explode, multi-plane folds). Scans of
    * small files arrive as one partition; exploding 9–64× inside that
    * one task serializes the whole operator. Shuffling the compact rows
    * first is cheap and restores full parallelism; at scale, inputs
    * with many splits pay one small shuffle of the pre-explosion rows.
    */
  def fanout(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Materialize a reused intermediate NOW and truncate its lineage.
    *
    * A lazy .cache() that several concurrent AQE stages hit before the
    * first materialization makes each stage recompute the full subtree
    * (no sharing until blocks exist) — a ~6× CPU storm observed on the
    * dedup pipelines. An eager localCheckpoint stores the partitions
    * once and every downstream stage reads the blocks; there is no
    * cache-manager plan matching and no lineage left to recompute.
    * (On a real cluster with lineage-failure concerns, swap for
    * checkpoint() to reliable storage — same call shape.)
    */
  def hot(df: DataFrame): DataFrame =
    df.localCheckpoint(true)

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
