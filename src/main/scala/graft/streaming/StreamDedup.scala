package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming exact deduplication — the incremental twin of
  * ops.TextDedup.dedupExact: documents arriving on a stream are
  * deduplicated by content hash with `dropDuplicates` state, bounded
  * by a watermark on arrival time in production (here the synthetic
  * table has no arrival column, so state is unbounded — the pattern
  * is the point).
  */
object StreamDedup {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  def distinctDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .withColumn("h", md5(col("text")))
      .dropDuplicates("h")
      .select("doc_id", "h")

  /** Watermark-bounded streaming dedup — the production shape: state
    * for a key is dropped once the watermark passes it, so state stays
    * bounded no matter how long the stream runs (the unbounded
    * `distinctDocs` above exists because the documents table has no
    * arrival column). Works on any stream carrying (event_id,
    * event_ts); the events binding below uses real event time. */
  def dedupWatermarked(events: DataFrame): DataFrame =
    events.withWatermark("event_ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "ts_us")

  def dedupEventsWatermarked(spark: SparkSession, dir: String): DataFrame =
    dedupWatermarked(EventStream.readEvents(spark, dir))
}
