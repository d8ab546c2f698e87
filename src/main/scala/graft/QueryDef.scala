package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named engine capability: a Spark plan plus (optionally) the ANSI-SQL
  * oracle that DuckDB runs over the same parquet tables. Keeping the pair
  * together keeps column aliases in sync — the driver's compare sorts
  * columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Deterministic double aggregation: route sums through an exact decimal
    * so partial-aggregation order (Spark) vs sequential order (DuckDB)
    * cannot change the result, then return a plain double column.
    * Oracle twin: CAST(SUM(CAST(x AS DECIMAL(18,s)) AS DOUBLE).
    *
    * Physical path: the native `dsum128` aggregate
    * (functions/Sum128.scala) — the same exact value on a 128-bit
    * integer accumulator in two LONG buffer slots, ~3.6× faster than
    * Spark's BigDecimal-backed DECIMAL(28,s) sum buffer on sum-heavy
    * whole queries (TPC-H Q1 at sf0.1: 2.35 s → 0.65 s) and loud outside
    * BOTH halves of its exactness envelope: |x|·10^s ≤ 2^51 (running
    * max magnitude) and ≤ s true decimal digits (running max
    * |x·10^s − rint(x·10^s)|, raised near a .5 boundary). `dsumDec`
    * keeps the plain decimal route for columns beyond the envelope.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    call_function("dsum128", c.cast("double"), lit(scale))

  /** The plain decimal-sum route (unbounded magnitude, slower). */
  def dsumDec(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** QUANTIZING 128-bit sum for CONTINUOUS doubles:
    * Σ floor(x·10^s + 0.5) / 10^s — pure IEEE quantization, identical
    * in both engines at any magnitude (a DECIMAL(38,s) cast is not:
    * the geo_wkt_mixed rule), overflow-proof accumulator. Oracle
    * mirror: CAST(SUM(CAST(floor(x*1e{s}+0.5) AS HUGEINT)) AS DOUBLE)
    * / 1e{s}. */
  def qsum(c: Column, scale: Int): Column =
    call_function("qsum128", c.cast("double"), lit(scale))

  /** Deterministic mean at 6 dp: exact decimal sum / count in double space. */
  def davg(c: Column, scale: Int = 4): Column =
    round(dsum(c, scale) / count(lit(1)), 6)
}
