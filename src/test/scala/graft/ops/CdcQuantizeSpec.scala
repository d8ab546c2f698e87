package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcQuantizeSpec extends SparkSpec {

  test("q_cdc_compact: one surviving row per key, latest version wins") {
    val out = Events.cdcCompact(spark, sfDir).cache()
    val base = graft.Tables.loadEventsUs(spark, sfDir)

    // one row per key, version counts conserved
    val keys = out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(keys === 0L)
    val totalVersions = out.agg(sum("n_versions")).head.getLong(0)
    assert(totalVersions === base.count())

    // the surviving (ts, event_id) really is the per-key maximum
    val expected = base
      .groupBy("user_id", "event_type")
      .agg(max(struct(col("ts_us"), col("event_id"))).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.ts_us").as("latest_ts_us"),
        col("m.event_id").as("latest_event_id"))
    val mismatches = out
      .select("user_id", "event_type", "latest_ts_us", "latest_event_id")
      .exceptAll(expected).count()
    assert(mismatches === 0L)
    out.unpersist()
  }

  test("embed_quantize: codes bounded, max element hits ±127, error ≤ scale/2") {
    val out = VectorOps.embedQuantize(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (scale, cmin, cmax, err) = (r.getAs[Double]("scale9"),
        r.getAs[Long]("code_min"), r.getAs[Long]("code_max"),
        r.getAs[Double]("max_err6"))
      assert(cmin >= -127 && cmax <= 127,
        s"vec ${r.get(0)}: codes out of int8 range [$cmin, $cmax]")
      // the largest-|x| element quantizes to exactly ±127
      assert(cmax == 127L || cmin == -127L || scale == 0.0,
        s"vec ${r.get(0)}: no code saturates the range")
      // round-half-up bounds the per-element error by half a step;
      // max_err6 is reported rounded to 6 dp, so allow the half-ulp of
      // that rounding (5e-7) on top of the bound
      assert(err <= scale / 2 + 5.1e-7,
        s"vec ${r.get(0)}: err $err exceeds scale/2 ${scale / 2}")
    }
  }
}
