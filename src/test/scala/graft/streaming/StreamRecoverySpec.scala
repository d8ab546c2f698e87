package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.nio.file.Files

/** Checkpoint-recovery certification: a streaming aggregation stopped
  * mid-stream and restarted from its checkpoint must converge to
  * exactly the batch answer — no lost batches, no double counting.
  * The source is the events table split into multiple files consumed
  * one per micro-batch (maxFilesPerTrigger=1), so the kill point lands
  * strictly inside the stream.
  */
class StreamRecoverySpec extends SparkSpec {

  test("stopped-and-restarted tumbling aggregation converges to the batch result") {
    val work = Files.createTempDirectory("graft-recovery").toString
    val srcDir = s"$work/src"
    val ckpt = s"$work/ckpt"
    val outTable = "recovery_out"

    // split events into 4 files so the stream has 4 micro-batches
    val events = Tables.load(spark, sfDir, "events")
    events.repartition(4).write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    def agged(df: org.apache.spark.sql.DataFrame) =
      graft.Tables.withMicros(df, "ts", "ts_us")
        .withColumn("event_ts", timestamp_micros(col("ts_us")))
        .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("hour_us"),
          col("event_type"), col("n"))

    def start() = agged(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir))
      .writeStream.format("memory").queryName(outTable)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.ProcessingTime(50))
      .start()

    // phase 1: run only part of the stream, then stop (the "crash")
    val q1 = start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.nanoTime() < deadline) Thread.sleep(50)
      assert(q1.recentProgress.count(_.numInputRows > 0) >= 2,
        "stream must make partial progress before the kill")
    } finally q1.stop()
    val partial = spark.table(outTable).count()

    // phase 2: restart from the checkpoint; must finish the remainder
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.table(outTable)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val batch = agged(events)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch,
      s"recovered stream diverged from batch (partial had $partial rows)")
    assert(batch.nonEmpty)
  }
}
