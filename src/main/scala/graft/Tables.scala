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

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
