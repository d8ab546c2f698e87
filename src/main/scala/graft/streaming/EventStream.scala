package graft.streaming

import graft.ops.Events
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch event operators — same
  * results, incremental execution. `readStream` over the events parquet
  * directory stands in for any streaming source (Kafka etc. — the
  * transforms don't change).
  *
  * The nanosecond parquet timestamp arrives as INT64 under
  * nanosAsLong; `withTsCols` rebuilds both the µs bigint (exact) and a
  * TIMESTAMP column (for watermarks/windows).
  */
object EventStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema)
      // file-stream source wants a directory; select just the events file
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_us", expr("ts DIV 1000"))
      .withColumn("event_ts", timestamp_micros(col("ts_us")))

  /** Tumbling 1-hour windowed aggregation — streaming twin of
    * Events.tumbling. Watermark bounds state; Complete mode in specs. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir)
      .withWatermark("event_ts", "2 hours")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("total_value"))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("event_type"), col("n"), col("total_value"))

  // ---- stateful sessionization ---------------------------------------
  final case class Ev(user_id: Long, ts_us: Long)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class Session(user_id: Long, session_start_us: Long,
                           session_end_us: Long, n_events: Long)

  val GapUs: Long = Events.SessionGapUs

  /** Gap-based sessions via flatMapGroupsWithState: closed sessions are
    * emitted as soon as a later event proves the gap; the open tail
    * session per user is emitted on event-time timeout (or remains in
    * state at end of a bounded test run — see EventStreamSpec).
    */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // keep event_ts through to the stateful operator: a typed .map would
    // drop the watermarked column and break event-time timeouts
    val evs = readEvents(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_ts"))
      .withWatermark("event_ts", "1 hour")
      .as[(Long, Long, java.sql.Timestamp)]

    evs.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.end, s.n))
          } else {
            val sorted = rows.map(_._2).toArray.sorted
            var st = state.getOption.orNull
            val out = Iterator.newBuilder[Session]
            sorted.foreach { t =>
              st match {
                case null => st = SessionState(t, t, 1)
                case s if t - s.end > GapUs =>
                  out += Session(user, s.start, s.end, s.n)
                  st = SessionState(t, t, 1)
                case s => st = SessionState(s.start, t, s.n + 1)
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.end / 1000 + GapUs / 1000)
            }
            out.result()
          }
      }
      .toDF()
  }
}
