package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fluent event-analytics pipeline — the events-domain sibling of
  * [[CorpusPipeline]] and [[GeoCalculator]] (the reference's fluent
  * Calculator chain, re-aimed at a clickstream): sessionization,
  * last-touch attribution and the per-user summary declared as lazy
  * column transforms over ONE shared per-user window, so the whole
  * chain compiles into a single Catalyst plan with ONE user-hash
  * exchange and ONE sort feeding every windowed signal
  * (PlanAuditSpec pins the single exchange).
  *
  * {{{
  * EventPipeline(eventsUs)          // (user_id, ts_us, event_id, event_type, value)
  *   .withSessions()                // 30-min gap session ids
  *   .withAttribution()             // 24 h last-touch carry
  *   .userSummary()                 // one row per user
  * }}}
  */
final case class EventPipeline(df: DataFrame,
                               sessionGapUs: Long = 1800000000L,
                               attributionUs: Long = 86400000000L) {

  private def w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
  private def run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Gap-based session ids per user (running count of gap starts). */
  def withSessions(gapUs: Long = sessionGapUs): EventPipeline = copy(
    df = df
      .withColumn("_prev", lag(col("ts_us"), 1).over(w))
      .withColumn("_start",
        when(col("_prev").isNull || col("ts_us") - col("_prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("_start")).over(run))
      .drop("_prev"),
    sessionGapUs = gapUs)

  /** Last click/view carried to each row (the attribution basis). */
  def withAttribution(windowUs: Long = attributionUs): EventPipeline = {
    val isTouch = col("event_type").isin("click", "view")
    copy(
      df = df
        .withColumn("_lt_ts",
          last(when(isTouch, col("ts_us")), ignoreNulls = true).over(run))
        .withColumn("_lt_type",
          last(when(isTouch, col("event_type")), ignoreNulls = true).over(run))
        .withColumn("touch",
          when(col("event_type") === "purchase",
            when(col("_lt_ts").isNotNull &&
              col("ts_us") - col("_lt_ts") <= windowUs, col("_lt_type"))
              .otherwise("none")))
        .drop("_lt_ts", "_lt_type"),
      attributionUs = windowUs)
  }

  /** Running ordered-funnel step per row — the q_funnel_window
    * construction (levels 1 view / 2 view→click / 3 chain purchase
    * within `chainUs` of its opening view) over the SAME shared user
    * window: both running maxima chain onto the one sort, so the step
    * costs no new exchange. */
  def withFunnel(chainUs: Long = attributionUs): EventPipeline = copy(
    df = {
      val withLv = df.withColumn("_lv",
        max(when(col("event_type") === "view", col("ts_us"))).over(run))
      withLv.withColumn("_lvc",
        max(when(col("event_type") === "click" && col("_lv").isNotNull &&
          col("_lv") < col("ts_us"), col("_lv"))).over(run))
        .withColumn("funnel_step", greatest(
          when(col("event_type") === "view", 1).otherwise(0),
          when(col("event_type") === "click" && col("_lv").isNotNull &&
            col("_lv") < col("ts_us"), 2).otherwise(0),
          when(col("event_type") === "purchase" && col("_lvc").isNotNull &&
            col("ts_us") - col("_lvc") <= chainUs, 3).otherwise(0)))
        .drop("_lv", "_lvc")
    })

  /** First-seen anchor, activity day, and period-1 return flag per row
    * (the q_retention signals). The first-seen minimum rides a
    * whole-partition frame over the SAME partition/order, so it shares
    * the one sort and exchange. */
  def withRetention(periodUs: Long = 7L * 86400000000L): EventPipeline =
    copy(df = df
      .withColumn("_first_ts",
        min(col("ts_us")).over(w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("_ret_p1",
        when(col("ts_us") - col("_first_ts") >= periodUs &&
          col("ts_us") - col("_first_ts") < 2 * periodUs, 1L)
          .otherwise(0L))
      .withColumn("_day",
        floor(col("ts_us") / lit(86400000000L)).cast("long")))

  private def dsum6(c: Column): Column = graft.QueryDef.dsum(c, 6)

  /** One row per user: activity, session and attributed-revenue
    * profile — plus the funnel level and retention columns when the
    * corresponding steps ran. All windowed inputs were computed over
    * the one shared user sort; this aggregate reuses the same hash
    * partitioning. Distinct active days use size(collect_set(day))
    * rather than COUNT(DISTINCT) — one hash aggregate with per-user
    * state bounded by calendar days, instead of the Expand-based
    * distinct plan that would add a second exchange. */
  def userSummary(): DataFrame = {
    val aggs = Seq.newBuilder[Column]
    aggs += max(col("session_id")).as("n_sessions")
    aggs += sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
      .as("n_purchases")
    aggs += round(coalesce(dsum6(when(col("touch") === "click",
      col("value"))), lit(0.0)), 4).as("rev_click")
    aggs += round(coalesce(dsum6(when(col("touch") === "view",
      col("value"))), lit(0.0)), 4).as("rev_view")
    aggs += round(coalesce(dsum6(when(col("touch") === "none",
      col("value"))), lit(0.0)), 4).as("rev_none")
    if (df.columns.contains("funnel_step"))
      aggs += max(col("funnel_step")).as("funnel_level")
    if (df.columns.contains("_day")) {
      aggs += size(collect_set(col("_day"))).cast("long").as("n_active_days")
      aggs += max(col("_ret_p1")).as("retained_p1")
    }
    df.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), aggs.result(): _*)
      .orderBy("user_id")
  }
}
