package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_funnel_window's two-chained-running-max construction compared to
  * the brute-force EXISTS definition (a triple self-join): user level
  * is 3 iff ∃ view v, click c, purchase p with v < c < p in
  * (ts, event_id) order and p.ts − v.ts ≤ 24 h; 2 iff ∃ v < c; 1 iff
  * any view. Brute force is quadratic-ish and test-only.
  */
class FunnelWindowSpec extends SparkSpec {

  test("funnel levels equal the brute-force EXISTS definition") {
    val winUs = 24L * 3600L * 1000000L
    val e = graft.Tables.loadEventsUs(spark, sfDir)
      .select("user_id", "event_id", "ts_us", "event_type")
    e.createOrReplaceTempView("fw_events")
    val brute = spark.sql(s"""
      WITH v AS (SELECT * FROM fw_events WHERE event_type = 'view'),
      c AS (SELECT * FROM fw_events WHERE event_type = 'click'),
      p AS (SELECT * FROM fw_events WHERE event_type = 'purchase'),
      l2 AS (
        SELECT DISTINCT v.user_id FROM v JOIN c
        ON v.user_id = c.user_id
          AND (v.ts_us < c.ts_us OR
               (v.ts_us = c.ts_us AND v.event_id < c.event_id))
          AND v.ts_us < c.ts_us),
      l3 AS (
        SELECT DISTINCT v.user_id FROM v
        JOIN c ON v.user_id = c.user_id AND v.ts_us < c.ts_us
        JOIN p ON c.user_id = p.user_id
          AND (c.ts_us < p.ts_us OR
               (c.ts_us = p.ts_us AND c.event_id < p.event_id))
          AND p.ts_us - v.ts_us <= $winUs)
      SELECT user_id,
        CASE WHEN user_id IN (SELECT user_id FROM l3) THEN 3
             WHEN user_id IN (SELECT user_id FROM l2) THEN 2
             ELSE 1 END AS funnel_level
      FROM (SELECT DISTINCT user_id FROM v)""")
    val got = Events.funnelWindow(spark, sfDir)
      .filter(col("funnel_level") >= 1)
    // levels >= 1 require a view on both sides; compare exact maps
    val g = got.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = brute.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(g == b, {
      val diff = (g.keySet ++ b.keySet).filter(k => g.get(k) != b.get(k))
      s"mismatch on ${diff.take(5).map(k => (k, g.get(k), b.get(k)))}"
    })
    // non-vacuous: the fixture exercises both the ordered-pair and the
    // full-chain levels (at sf0.001 every view-user happens to reach
    // level >= 2, so level 1 is certified by the map equality alone)
    assert(Set(2, 3).subsetOf(g.values.toSet),
      s"fixture should produce levels 2 and 3, got ${g.values.toSet}")
    // and level 3 is genuinely harder than level 2
    assert(g.values.count(_ == 3) < g.size,
      "window/order constraints should exclude someone from level 3")
  }
}
