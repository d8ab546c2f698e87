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

  test("stopped-and-restarted KMV sketch state recovers exactly (stateful)") {
    val work = Files.createTempDirectory("graft-recovery-kmv").toString
    val srcDir = s"$work/src"
    val ckpt = s"$work/ckpt"
    val outDir = s"$work/emissions"

    // two-phase source: phase-1 files hold 3/4 of the events; the rest
    // arrive only AFTER the restart, so post-recovery emissions exist
    // for every key by construction
    val events = Tables.load(spark, sfDir, "events")
    events.filter(col("event_id") % 4 =!= 0)
      .repartition(3).write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    // memory sinks cannot recover an Update-mode query from a
    // checkpoint; collect emissions through foreachBatch instead
    // (at-least-once appends are fine — the sketch fold is idempotent)
    def start() = EventStream.kmvSketchStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(outDir); ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(50))
      .start()

    // phase 1: absorb the first tranche into state, then stop
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // wipe phase-1 emissions: the certification must hold from
    // POST-recovery output alone — its first emission per key embeds
    // the recovered state, so lost state would be visible
    java.nio.file.Files.walk(java.nio.file.Paths.get(outDir))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })

    // phase 2: the remaining quarter lands, the query restarts from
    // its checkpoint and must carry the phase-1 sketches forward
    events.filter(col("event_id") % 4 === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    // a true global bottom-256 hash is never displaced once absorbed,
    // so bottom-256 of the union of post-recovery emissions IS the
    // final state — and it must include every phase-1-only hash
    val streamed = spark.read.parquet(outDir).collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.flatMap(_.getSeq[Long](1)).distinct.sorted.take(256).toSeq
      }
    val dp = events
      .select(col("event_type").as("t"),
        graft.ops.Sketches.h60(col("user_id").cast("string")).as("h"))
      .distinct()
    val batch = graft.ops.Sketches.kmvSketch(dp).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(batch.nonEmpty)
    assert(streamed == batch,
      "recovered sketch state diverged from the batch tournament")
  }

  test("stopped-and-restarted fluent-pipeline state recovers exactly (order-sensitive)") {
    val work = Files.createTempDirectory("graft-recovery-pipe").toString
    val srcDir = s"$work/src"
    val ckpt = s"$work/ckpt"
    val out1 = s"$work/emissions1"
    val out2 = s"$work/emissions2"

    // the pipeline state (session gaps, last touch) is ORDER-SENSITIVE,
    // so unlike the KMV cert the source must deliver micro-batches in
    // per-user event-time order: tranche the events by ts quartiles and
    // append each tranche as one file, oldest first (the file source
    // consumes oldest-mtime first at maxFilesPerTrigger=1)
    val events = graft.Tables.loadEventsUs(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"), col("value"))
    val Array(c1, c2, c3) =
      events.stat.approxQuantile("ts_us", Array(0.25, 0.5, 0.75), 0.0)
    def tranche(lo: Option[Double], hi: Option[Double]) = events
      .filter(lo.map(col("ts_us") >= _).getOrElse(lit(true)) &&
        hi.map(col("ts_us") < _).getOrElse(lit(true)))
    Seq(tranche(None, Some(c1)), tranche(Some(c1), Some(c2)),
        tranche(Some(c2), Some(c3)))
      .foreach(_.coalesce(1).write.mode("append").parquet(srcDir))
    val schema = spark.read.parquet(srcDir).schema

    def start(outDir: String) = EventStream.pipelineSummaryFrom(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(outDir); ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(50))
      .start()

    // phase 1: absorb the first three tranches into state, then stop
    val q1 = start(out1)
    try q1.processAllAvailable() finally q1.stop()

    // phase 2: the newest quartile lands, the query restarts from its
    // checkpoint and must carry forward every user's composed state
    tranche(Some(c3), None).coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = start(out2)
    try q2.processAllAvailable() finally q2.stop()

    def finals(dir: String) = spark.read.parquet(dir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("n_events").desc)))
      .filter(col("rn") === 1).drop("rn").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val pre = finals(out1)
    val post = finals(out2)
    val batch = graft.ops.Journey.eventsPipeline(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap

    // every user touched after the restart must land on the batch
    // answer — phase-2 rows alone cannot reach the batch n_events, so
    // equality proves the phase-1 counters were restored, not rebuilt
    assert(post.nonEmpty, "restart must process the final tranche")
    post.foreach { case (u, row) =>
      assert(row == batch(u), s"user $u diverged after recovery")
      assert(pre.get(u).forall(_._1 < row._1),
        s"user $u gained no post-recovery events — kill point not inside")
    }
    // and the union view (post wins, else pre) is exactly the batch
    val merged = pre ++ post
    assert(merged == batch,
      "merged pre/post emissions diverged from the batch pipeline")
  }

  test("stopped-and-restarted dsum128 aggregation state recovers exactly " +
    "(native-aggregate buffers through the state store)") {
    val work = Files.createTempDirectory("graft-recovery-bm25").toString
    val srcDir = s"$work/src"
    val ckpt = s"$work/ckpt"
    val outDir = s"$work/emissions"

    // two-phase source STRIPED WITHIN each source (doc ids stride the
    // source key mod 20), so every source holds back phase-2 docs and
    // must emit post-recovery — the emission that embeds its
    // recovered (count, 128-bit sum) buffers
    val docs = Tables.load(spark, sfDir, "documents")
    val phase2 = expr("(doc_id DIV 20) % 4 = 0")
    docs.filter(!phase2)
      .repartition(3).write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    def start() = StreamDedup.bm25SourceStream(spark, sfDir,
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(outDir); ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(50))
      .start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // certification must hold from POST-recovery output alone
    java.nio.file.Files.walk(java.nio.file.Paths.get(outDir))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })

    docs.filter(phase2).coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    // score_sum and n_hits are monotone per source (partial scores are
    // positive), so the max emission per source is the final state
    val streamed = spark.read.parquet(outDir)
      .groupBy("source")
      .agg(max(struct(col("n_hits"), col("score_sum"))).as("m"))
      .select(col("source"), col("m.n_hits"), col("m.score_sum"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    val batch = graft.ops.Retrieval.bm25Scores(spark, sfDir)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(sum(col("n_hit")).as("n_hits"),
        graft.QueryDef.dsum(col("score"), 6).as("score_sum"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(batch.nonEmpty)
    assert(streamed == batch,
      "recovered dsum128 per-source state diverged from the batch totals")
  }
}
