package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Long-form ⇄ wide-form result assembly — the reference's
  * get_result(pivot=True) (duckpipe/core.py:168-214: pivot_table on
  * (id, year) × varname with aggfunc "first").
  *
  * The varname list is passed explicitly so the pivot is a single
  * conditional-aggregation shuffle — no driver-side collect of distinct
  * varnames, which would stall a 100 TB run. (Spark's pivot(col, values)
  * compiles to exactly that.) When the caller genuinely doesn't know
  * the set, `pivotWideDiscover` pays one extra job to fetch it.
  */
object LongWide {

  /** long (id, varname, year, value) → wide (id, year, <varname…>). */
  def pivotWide(long: DataFrame, varnames: Seq[String]): DataFrame =
    long.groupBy("id", "year")
      .pivot("varname", varnames)
      .agg(first("value"))

  /** Convenience ONLY — runs a driver-side collect of the distinct
    * varnames (one extra job + a driver round-trip), so it must never
    * sit inside a registered pipeline. The varname domain is bounded
    * (it is about to become a column list), so the collect can't blow
    * the driver, but the extra job still serializes the chain; cap it
    * so a mistyped grouping column fails fast instead of pivoting
    * into thousands of columns. */
  def pivotWideDiscover(long: DataFrame, maxVars: Int = 10000): DataFrame = {
    val names = long.select("varname").distinct()
      .limit(maxVars + 1).collect().map(_.getString(0)).sorted.toSeq
    require(names.size <= maxVars,
      s"pivotWideDiscover found > $maxVars distinct varnames — " +
        "pass the known list to pivotWide instead")
    pivotWide(long, names)
  }
}
