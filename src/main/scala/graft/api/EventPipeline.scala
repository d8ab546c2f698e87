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

  private def dsum6(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  /** One row per user: activity, session and attributed-revenue
    * profile. All windowed inputs were computed over the one shared
    * user sort; this aggregate reuses the same hash partitioning. */
  def userSummary(): DataFrame =
    df.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        max(col("session_id")).as("n_sessions"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        round(coalesce(dsum6(when(col("touch") === "click", col("value"))),
          lit(0.0)), 4).as("rev_click"),
        round(coalesce(dsum6(when(col("touch") === "view", col("value"))),
          lit(0.0)), 4).as("rev_view"),
        round(coalesce(dsum6(when(col("touch") === "none", col("value"))),
          lit(0.0)), 4).as("rev_none"))
      .orderBy("user_id")
}
